#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
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


def components(model, state, mb, rng, n=3):
    """Per-submodule fwd/grad seconds at the given batch shapes.

    Times each stage of the step in isolation (jitted separately) so the
    train-step budget is attributable: identity encoder, expression
    encoder+VAE, geometry decoder, RGB decoder, geomap/postex, full
    assembler, background model, optimizer update. The raymarch kernels are
    covered by scripts/kbench.py.
    """
    import jax
    import jax.numpy as jnp

    out = {}
    params, stats = state.params, state.stats

    def timed(name, method_fn, *args, grad=True):
        # args are jit operands (NOT closure captures: captured device arrays
        # become embedded HLO constants — the 1024^2 bias pyramids alone
        # overflow the remote-compile request limit).
        def run(p, *a):
            y = model.apply({"params": p, "stats": stats}, *a, method=method_fn,
                            rngs={"samples": rng})
            leaves = [x for x in jax.tree_util.tree_leaves(y)
                      if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        fwd = jax.jit(run)
        out[name + "_fwd_s"] = round(timeit(fwd, params, *args, n=n), 4)
        if grad:
            g = jax.jit(jax.grad(run))
            out[name + "_grad_s"] = round(timeit(g, params, *args, n=n), 4)
        # stream partial results so a late failure doesn't lose the breakdown
        print(f"# {name}: fwd {out[name + '_fwd_s']}s"
              + (f" grad {out[name + '_grad_s']}s" if grad else ""),
              file=sys.stderr, flush=True)

    nb = mb["neut_verts"].shape[0]
    timed("id_encoder",
          lambda m, v, t: m.identity_encoder(v, t),
          mb["neut_verts"], mb["neut_avgtex"])
    timed("expr_encoder_vae",
          lambda m, v, a, nv, na: m.bottleneck(
              m.expression_encoder(verts=v, avgtex=a, neut_verts=nv, neut_avgtex=na),
              deterministic=True)[0],
          mb["verts"], mb["avgtex"], mb["neut_verts"], mb["neut_avgtex"])

    # identity conditioning + expression code as fixed inputs downstream
    idc = jax.jit(lambda p: model.apply(
        {"params": p, "stats": stats},
        mb["neut_verts"], mb["neut_avgtex"],
        method=lambda m, v, t: m.identity_encoder(v, t)))(params)
    expr = jnp.zeros((nb, 4, 4, 16), mb["neut_avgtex"].dtype)
    viewpos = jnp.ones((nb, 3), jnp.float32)
    viewdirs = viewpos / jnp.sqrt(3.0)

    timed("geo_decoder",
          lambda m, e, z, b: m.decoder_assembler.geodec(e, z, list(b)),
          expr, idc["z_geo"], tuple(idc["b_geo"]))
    timed("rgb_decoder",
          lambda m, e, z, b, v: m.decoder_assembler.rgbdec(e, z, list(b), v),
          expr, idc["z_tex"], tuple(idc["b_tex"]), viewdirs)
    timed("geomap_postex",
          lambda m, g: m.decoder_assembler._postex(g),
          jnp.zeros((nb,) + tuple(jnp.asarray(model.decoder_assembler.vertmean).shape),
                    jnp.float32))
    timed("assembler_total",
          lambda m, i, e, v: m.decoder_assembler(i, e, v),
          idc, expr, viewpos)
    if model.bgmodel is not None:
        timed("bgmodel",
              lambda m, c, i, s: m.bgmodel(c, i, s),
              mb["camindex"], mb["idindex"],
              jnp.zeros(mb["pixelcoords"].shape, jnp.float32))

    # optimizer update alone (grads = params-shaped ones)
    from ava256_tpu.train.state import make_optimizer

    tx = make_optimizer()
    opt_state = jax.jit(tx.init)(params)

    def opt(g, os, p, step):
        updates, os = tx.update(g, os, p, step=step)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, updates), os

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    out["optimizer_s"] = round(
        timeit(jax.jit(opt), grads, opt_state, params, state.step, n=n), 4
    )
    print(f"# optimizer: {out['optimizer_s']}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    ap.add_argument("--components", action="store_true")
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

    comp = components(model, state, mb, rng) if args.components else None

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

    rep = {
        "fwd_s": round(t_fwd, 4),
        "fwd_norender_s": None if t_fwd_nr is None else round(t_fwd_nr, 4),
        "train_step_s": round(t_step, 4),
        "bwd_plus_opt_s": round(t_step - t_fwd, 4),
    }
    if comp is not None:
        rep["components"] = comp
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
