# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_multihost.py: each process owns 2 virtual CPU devices,
joins a jax.distributed cluster, assembles a global batch from process-local
data via shard_batch, and runs a jitted global reduction — the multi-host
analogue of the reference's NCCL rendezvous + DistributedSampler
(reference: ddp-train.py:98-113,134).
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np

    from ava256_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    mesh = make_mesh()
    # Each host contributes a distinct per-host batch of 2 items.
    local = {"x": np.full((2, 3), float(pid + 1), np.float32)}
    batch = shard_batch(local, mesh)
    assert batch["x"].shape == (2 * nproc, 3), batch["x"].shape

    total = jax.jit(jnp.sum)(batch["x"])
    expected = 6.0 * sum(range(1, nproc + 1))
    np.testing.assert_allclose(np.asarray(total), expected)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
