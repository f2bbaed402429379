# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Jitted model initialization helper.

model.init traced eagerly executes op-by-op (very slow over a remote-device
tunnel); wrapping it in jit compiles initialization into one program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ava256_tpu.train.step import BATCH_MODEL_KEYS


def init_model(model, rng: jax.Array, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Initialize model variables from one (host) batch; uses batch size 1."""
    b1 = {
        k: jnp.asarray(v)[:1]
        for k, v in batch.items()
        if k in set(BATCH_MODEL_KEYS) | {"idindex", "camindex"}
    }

    @jax.jit
    def _init(rng, b):
        return model.init(
            {"params": rng, "sample": rng},
            target_neut_avgtex=b["neut_avgtex"],
            target_neut_verts=b["neut_verts"],
            idindex=b.get("idindex"),
            camindex=b.get("camindex"),
            **{k: b[k] for k in BATCH_MODEL_KEYS},
        )

    return _init(rng, b1)
