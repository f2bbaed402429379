#!/usr/bin/env python3
"""Benchmark: flagship train-step throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference publishes no throughput
numbers; its 4-id config trains ~300k iterations in 1.5 days on 16 A100s at
batch 4/GPU (sbatch-4.sh, configs/config-4.yaml) => 300000 / (1.5*86400) / 16
~= 0.1447 train steps/sec per chip at batch 4, 512x334 rays. vs_baseline is
our per-chip steps/sec at the same per-chip batch and ray count divided by
that figure.

Env knobs: AVA256_BENCH_STEPS (default 5), AVA256_BENCH_BATCH (4),
AVA256_BENCH_NPRIMS (16384), AVA256_BENCH_HW ("512x334").
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_STEPS_PER_SEC_PER_CHIP = 300000 / (1.5 * 86400) / 16  # ~0.1447


def main() -> None:
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    import jax

    from __graft_entry__ import _build
    from ava256_tpu.parallel.mesh import make_mesh, shard_batch
    from ava256_tpu.train.state import create_train_state, make_optimizer
    from ava256_tpu.train.step import make_train_step

    steps = int(os.environ.get("AVA256_BENCH_STEPS", 5))
    batch = int(os.environ.get("AVA256_BENCH_BATCH", 4))
    nprims = int(os.environ.get("AVA256_BENCH_NPRIMS", 16384))
    h, w = map(int, os.environ.get("AVA256_BENCH_HW", "512x334").split("x"))

    model, mb, dataset = _build(
        texsize=1024, nprims=nprims, height=h, width=w, batch=batch,
        raymarch_options={"tile": 16, "max_hit": 64, "max_samples": 96,
                          "chunk_tiles": 128},
    )

    from ava256_tpu.train.init import init_model

    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    loss_weights = {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01}
    train_step = make_train_step(
        model, tx, loss_weights, dataset.vertmean, dataset.vertstd
    )

    mesh = make_mesh(axis_names=("data",))
    mb = shard_batch(mb, mesh)

    # Warm-up step uses the training warm-up protocol (populates the
    # adaptive primitive-scale EMA — without it primscale is zero and the
    # scene degenerates; reference ddp-train.py:374-377) and compiles.
    state, loss, _ = train_step(
        state, mb, rng, running_avg_scale=True, use_gt_geo=True,
        residuals_weight=0.0,
    )
    jax.block_until_ready(loss)
    # Compile the steady-state step too.
    state, loss, _ = train_step(state, mb, rng)
    jax.block_until_ready(loss)

    # Block every step, exactly like the real training loop (train.py logs
    # the loss each iteration, as the reference's ddp-train.py does). On the
    # tunneled-TPU platform, enqueueing several donated steps ahead of the
    # device also triggers a dispatch pathology that triples the apparent
    # step time; per-step blocking measures the actual executable time.
    t0 = time.time()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss, _ = train_step(state, mb, sub)
        jax.block_until_ready(loss)
    dt = (time.time() - t0) / steps
    assert np.isfinite(float(loss)), f"non-finite loss {loss}"

    n_chips = len(jax.devices())
    steps_per_sec_per_chip = (1.0 / dt) / n_chips * (batch / 4.0) * (h * w) / (512 * 334)

    # Kernel-level roofline (BASELINE.md: raymarch throughput vs HBM
    # speed-of-light): fwd/bwd wall time, Mrays/s, and the ratio of measured
    # forward time to the minimum HBM streaming time — measured on the SAME
    # scene the step above marches (the model's own march operands at the
    # benched state), not a synthetic stand-in.
    raymarch = {}
    if os.environ.get("AVA256_BENCH_RAYMARCH", "1") != "0":
        import sys

        import jax.numpy as jnp

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        from kbench import measure_raymarch_arrays

        from ava256_tpu.train.step import BATCH_MODEL_KEYS

        @jax.jit
        def march_inputs(params, stats, batch):
            out = model.apply(
                {"params": params, "stats": stats},
                target_neut_avgtex=batch["neut_avgtex"],
                target_neut_verts=batch["neut_verts"],
                idindex=batch.get("idindex"),
                camindex=batch.get("camindex"),
                deterministic=True,
                output_set=frozenset({"march_inputs"}),
                **{k: batch[k] for k in BATCH_MODEL_KEYS},
            )
            return out["march_inputs"]

        mi = jax.block_until_ready(march_inputs(state.params, state.stats, mb))
        rm_opts = dict(model.raymarcher.options)
        rep, _ = measure_raymarch_arrays(
            mi["raypos"], mi["raydir"], float(model.raymarcher.dt), mi["tminmax"],
            mi["primpos"], mi["primrot"], mi["primscale"], mi["template"],
            warp=mi.get("warp"), steps=max(steps - 2, 2),
            tile=int(rm_opts.get("tile", 16)),
            max_hit=int(rm_opts.get("max_hit", 64)),
            fadescale=model.raymarcher.fadescale,
            fadeexp=model.raymarcher.fadeexp,
        )
        raymarch = {
            k: rep[k]
            for k in (
                "fwd_s", "bwd_s", "bwd_over_fwd", "mrays_per_s_fwd",
                "x_hbm_speed_of_light", "cull_s", "candidates", "alpha_mean",
            )
        }
        raymarch["scene"] = "bench-step scene (model march operands)"

    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_per_chip_b4_512x334",
                "value": round(steps_per_sec_per_chip, 4),
                "unit": "steps/s/chip",
                "vs_baseline": round(
                    steps_per_sec_per_chip / REFERENCE_STEPS_PER_SEC_PER_CHIP, 3
                ),
                "raymarch": raymarch,
            }
        )
    )


if __name__ == "__main__":
    main()
