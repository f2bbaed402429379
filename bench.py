#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
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
    # primsize 2 pairs with nprims=262144 (the reference's large-prim-count
    # branch: 512^2 grid x 2 = the same 1024^2 slab; assembler.py:211-214)
    primsize = int(os.environ.get("AVA256_BENCH_PRIMSIZE", 8))
    h, w = map(int, os.environ.get("AVA256_BENCH_HW", "512x334").split("x"))

    # rows=8: 8 step rows per kernel loop trip — measured 19% faster fwd /
    # 12% faster bwd than rows=4 on this scene (docs/roofline_r5.md)
    model, mb, dataset = _build(
        texsize=1024, nprims=nprims, height=h, width=w, batch=batch,
        primsize=primsize,
        raymarch_options={"tile": 16, "max_hit": 64, "max_samples": 96,
                          "chunk_tiles": 128, "rows": 8},
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

    # Measure the step under three dispatch disciplines and record the raw
    # per-step wall times, so an environmental dispatch/tunnel constant can
    # never silently masquerade as compute time. Root cause of rounds 3/4
    # scoring 0.2523 steps/s while the same code measured ~0.53
    # interactively: on the axon tunnel the FIRST post-warm-up blocked step
    # costs ~13 s (a one-time dispatch anomaly; steps 2..N run ~1.65 s), and
    # averaging it over 5 steps gives (13 + 4*1.65)/5 = 3.9 s/step = 0.2523
    # steps/s exactly. The medians below are robust to it and the raw
    # per-step arrays make it visible:
    #   blocked   — block_until_ready after every step (a loop that
    #               synchronously logs the loss each iteration); pays any
    #               host<->device round-trip latency once per step.
    #   pipelined — keep 2 steps in flight, blocking on step i-1 before
    #               dispatching step i+1 (how train.py actually runs: the
    #               loss fetch trails the dispatch by one step).
    #   chained   — enqueue all steps, block once at the end; pure device
    #               throughput, immune to per-step round-trip latency.
    def run_mode(state, rng, mode):
        times, t0 = [], time.time()
        pending = []
        for i in range(steps):
            rng, sub = jax.random.split(rng)
            state, loss, _ = train_step(state, mb, sub)
            if mode == "blocked":
                jax.block_until_ready(loss)
            elif mode == "pipelined":
                pending.append(loss)
                if len(pending) > 1:
                    jax.block_until_ready(pending.pop(0))
            times.append(time.time() - t0)
            t0 = time.time()
        jax.block_until_ready(loss)
        times[-1] += time.time() - t0
        return state, rng, loss, times

    state, rng, loss, t_blocked = run_mode(state, rng, "blocked")
    state, rng, loss, t_pipe = run_mode(state, rng, "pipelined")
    state, rng, loss, t_chain = run_mode(state, rng, "chained")
    assert np.isfinite(float(loss)), f"non-finite loss {loss}"

    # Dispatch/tunnel overhead probes: a jitted no-op on 4 bytes, blocked
    # per call (~1 host<->device round trip) and chained.
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    x = jax.block_until_ready(noop(jnp.zeros(())))
    t0 = time.time()
    for _ in range(20):
        x = jax.block_until_ready(noop(x))
    rtt_s = (time.time() - t0) / 20
    t0 = time.time()
    for _ in range(20):
        x = noop(x)
    jax.block_until_ready(x)
    noop_chain_s = (time.time() - t0) / 20

    # Headline: the pipelined mode — it is how train.py's loop actually
    # executes (async loss logging), and unlike "blocked" it cannot be
    # dominated by an environment's per-step round-trip latency. All three
    # modes plus raw times ship in the JSON.
    dt = float(np.median(t_pipe))
    n_chips = len(jax.devices())
    steps_per_sec_per_chip = (1.0 / dt) / n_chips * (batch / 4.0) * (h * w) / (512 * 334)
    timing = {
        "steps": steps,
        "blocked_s": [round(t, 4) for t in t_blocked],
        "pipelined_s": [round(t, 4) for t in t_pipe],
        "chained_s": [round(t, 4) for t in t_chain],
        "blocked_median_s": round(float(np.median(t_blocked)), 4),
        "pipelined_median_s": round(dt, 4),
        # chained has one terminal block; only the mean is meaningful
        "chained_mean_s": round(float(np.sum(t_chain)) / steps, 4),
        "noop_roundtrip_s": round(rtt_s, 5),
        "noop_chained_s": round(noop_chain_s, 5),
        "device": str(jax.devices()[0]),
    }

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
        # AVA256_BENCH_SAVE_MARCH=path.npz dumps the exact scoreboard march
        # operands so kbench --scene can attribute/iterate on them offline.
        save_march = os.environ.get("AVA256_BENCH_SAVE_MARCH")
        if save_march:
            dump = {k: np.asarray(v) for k, v in mi.items() if v is not None}
            dump["stepsize"] = np.float32(model.raymarcher.dt)
            dump["fadescale"] = np.float32(model.raymarcher.fadescale)
            dump["fadeexp"] = np.float32(model.raymarcher.fadeexp)
            np.savez(save_march, **dump)
        rm_opts = dict(model.raymarcher.options)
        rep, _ = measure_raymarch_arrays(
            mi["raypos"], mi["raydir"], float(model.raymarcher.dt), mi["tminmax"],
            mi["primpos"], mi["primrot"], mi["primscale"], mi["template"],
            warp=mi.get("warp"), steps=max(steps - 2, 2),
            tile=int(rm_opts.get("tile", 16)),
            max_hit=int(rm_opts.get("max_hit", 64)),
            rows=int(rm_opts.get("rows", 4)),
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
                "metric": "train_steps_per_sec_per_chip_b4_512x334"
                if nprims == 16384
                else f"train_steps_per_sec_per_chip_b{batch}_{h}x{w}_K{nprims}",
                "value": round(steps_per_sec_per_chip, 4),
                "unit": "steps/s/chip",
                "vs_baseline": round(
                    steps_per_sec_per_chip / REFERENCE_STEPS_PER_SEC_PER_CHIP, 3
                ),
                "timing": timing,
                "raymarch": raymarch,
            }
        )
    )


if __name__ == "__main__":
    main()
