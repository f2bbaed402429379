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
(reference: ddp-train.py:98-113,134). With mode="trainstep" it additionally
executes the FULL production train step (pallas raymarch backend, tiny
shapes) across the processes and prints the loss, which the parent test
compares against a single-process mesh run of the identical step
(reference: ddp-train.py:98-113,312).
"""

import os
import sys


def trainstep_loss(mesh, n_global_batch, local_slice=None):
    """Build the tiny flagship-topology model and run ONE production train
    step (warm-up protocol) on ``mesh``; returns the scalar loss. With
    ``local_slice`` the batch is assembled from process-local items via
    shard_batch (multi-host path); otherwise the full global batch is fed
    on a single process. Deterministic: fixed dataset + PRNGKey(0)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ava256_tpu.data.dataset import none_collate
    from ava256_tpu.parallel.mesh import shard_batch
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.state import create_train_state, make_optimizer
    from ava256_tpu.train.step import BATCH_MODEL_KEYS, make_train_step

    model, _, dataset = ge._build(
        texsize=64, nprims=1024, height=16, width=16, batch=1,
        raymarch_options={"tile": 8, "max_hit": 8, "nbuf": 32, "mesh": mesh},
        raymarch_backend="pallas",
    )
    items = [dataset[i] for i in range(n_global_batch)]
    if local_slice is not None:
        items = items[local_slice]
    batch_np = none_collate(items)
    mb = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k in set(BATCH_MODEL_KEYS) | {"idindex", "camindex", "image"}
    }
    mb = shard_batch(mb, mesh)

    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    loss_weights = {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01}
    train_step = make_train_step(
        model, tx, loss_weights, dataset.vertmean, dataset.vertstd
    )
    state, loss, _ = train_step(
        state, mb, rng, running_avg_scale=True, use_gt_geo=True,
        residuals_weight=0.0,
    )
    return float(jax.block_until_ready(loss))


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "shard"

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
    if mode == "trainstep":
        # Full production train step across the processes: each host feeds
        # its 2 local items; the loss is a globally-reduced scalar.
        n_global = 2 * nproc
        loss = trainstep_loss(
            mesh, n_global, local_slice=slice(2 * pid, 2 * pid + 2)
        )
        assert np.isfinite(loss), loss
        print(f"worker {pid} loss {loss!r}", flush=True)
        print(f"worker {pid} ok", flush=True)
        return

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
