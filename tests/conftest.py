# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu",
# overriding the env var — force CPU back explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")

# Numerical parity tests compare against fp64/torch oracles; force full-precision
# matmuls/convs in tests (production code inherits the platform default).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ASSETS = os.environ.get("AVA256_REFERENCE_ASSETS", "/root/reference/assets")


@pytest.fixture(scope="session")
def reference_assets():
    if not os.path.isdir(REFERENCE_ASSETS):
        pytest.skip(f"reference assets not available at {REFERENCE_ASSETS}")
    return REFERENCE_ASSETS


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1112)
