#!/usr/bin/env python3
"""Decompose the flagship train step: forward-only, loss, grad, optimizer.

Prints one JSON line with per-stage seconds so the hot side (model vs
raymarch vs optimizer) is visible without a trace viewer. Optionally writes
a jax.profiler trace with --trace <dir>.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=3, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    args = ap.parse_args()

    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.losses import compute_losses
    from ava256_tpu.train.state import create_train_state, make_optimizer
    from ava256_tpu.train.step import BATCH_MODEL_KEYS, make_train_step

    h, w = map(int, args.hw.split("x"))
    model, mb, dataset = _build(
        texsize=1024, nprims=16384, height=h, width=w, batch=args.batch,
        raymarch_options={"tile": 16, "max_hit": 64, "max_samples": 96,
                          "chunk_tiles": 128},
    )
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    loss_weights = {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01}
    train_step = make_train_step(
        model, tx, loss_weights, dataset.vertmean, dataset.vertstd
    )
    # populate EMA stats
    state, loss, _ = train_step(
        state, mb, rng, running_avg_scale=True, use_gt_geo=True,
        residuals_weight=0.0,
    )
    jax.block_until_ready(loss)

    @jax.jit
    def fwd_only(params, stats, batch, rng):
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=batch["neut_avgtex"],
            target_neut_verts=batch["neut_verts"],
            idindex=batch["idindex"],
            camindex=batch["camindex"],
            deterministic=True,
            **{k: batch[k] for k in BATCH_MODEL_KEYS},
        )
        return out["irgbrec"]

    @jax.jit
    def fwd_norender(params, stats, batch, rng):
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=batch["neut_avgtex"],
            target_neut_verts=batch["neut_verts"],
            idindex=batch["idindex"],
            camindex=batch["camindex"],
            deterministic=True,
            render=False,
            **{k: batch[k] for k in BATCH_MODEL_KEYS},
        )
        return out["template"]

    t_fwd = timeit(fwd_only, state.params, state.stats, mb, rng)
    try:
        t_fwd_nr = timeit(fwd_norender, state.params, state.stats, mb, rng)
    except Exception:
        t_fwd_nr = None

    # train_step donates the state: chain it through the timing loop
    state, loss, _ = train_step(state, mb, rng)
    jax.block_until_ready(loss)
    n = 3
    t0 = time.time()
    for _ in range(n):
        state, loss, _ = train_step(state, mb, rng)
    jax.block_until_ready(loss)
    t_step = (time.time() - t0) / n

    if args.trace:
        with jax.profiler.trace(args.trace):
            state, loss, _ = train_step(state, mb, rng)
            jax.block_until_ready(loss)

    print(json.dumps({
        "fwd_s": round(t_fwd, 4),
        "fwd_norender_s": None if t_fwd_nr is None else round(t_fwd_nr, 4),
        "train_step_s": round(t_step, 4),
        "bwd_plus_opt_s": round(t_step - t_fwd, 4),
    }))


if __name__ == "__main__":
    main()
