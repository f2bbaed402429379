#!/usr/bin/env python3
"""Train-step stage profiler: where does the flagship step's time go?

Times each stage of the autoencoder separately (forward, and forward+grad
wrt that stage's params and inputs) at the bench.py flagship geometry, plus
the full step, and prints a JSON breakdown. Complements scripts/kbench.py
(raymarch kernels only) by covering the encoder/decoder towers, geomap,
losses, and optimizer. Stage names print as they are measured so partial
runs still yield data.

Usage: python scripts/stepprof.py [--batch 4] [--hw 512x334]
       [--nprims 16384] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, steps=3):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def _identity(x):
    return x


def main() -> None:
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    ap.add_argument("--nprims", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))

    from __graft_entry__ import _build
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.losses import compute_losses
    from ava256_tpu.train.state import create_train_state, make_optimizer
    from ava256_tpu.train.step import BATCH_MODEL_KEYS, make_train_step

    model, mb, dataset = _build(
        texsize=1024, nprims=args.nprims, height=h, width=w, batch=args.batch,
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

    report = {}

    def note(k, v):
        report[k] = v
        print(f"{k}: {v:.4f}", flush=True)

    # ---- full step (steady state) + full value_and_grad --------------------
    # Warm-up protocol first so primscale EMA is sane (see bench.py).
    state, loss, _ = train_step(
        state, mb, rng, running_avg_scale=True, use_gt_geo=True,
        residuals_weight=0.0,
    )
    jax.block_until_ready(loss)
    # train_step donates its state argument: rebind every call.
    state, loss, _ = train_step(state, mb, rng)  # compile steady state
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(args.steps):
        state, loss, _ = train_step(state, mb, rng)
    jax.block_until_ready(loss)
    note("full_step_s", (time.time() - t0) / args.steps)

    vertmean = jnp.asarray(dataset.vertmean)

    def loss_fn(p):
        kwargs = {k: mb[k] for k in BATCH_MODEL_KEYS}
        out, _ = model.apply(
            {"params": p, "stats": state.stats},
            target_neut_avgtex=mb["neut_avgtex"],
            target_neut_verts=mb["neut_verts"],
            idindex=mb["idindex"], camindex=mb["camindex"],
            output_set=frozenset({"primscale"}),
            rngs={"sample": rng}, mutable=["stats"], **kwargs,
        )
        total, _terms = compute_losses(
            out, mb, loss_weights, vertmean, dataset.vertstd
        )
        return total

    note("fwd_loss_s", _timeit(jax.jit(loss_fn), state.params, steps=args.steps))
    note("value_and_grad_s", _timeit(
        jax.jit(lambda p: _identity(jax.value_and_grad(loss_fn)(p))),
        state.params, steps=args.steps))

    # ---- stage-level: identity encoder -------------------------------------
    id_enc = model.identity_encoder
    p_id = {"params": state.params["identity_encoder"]}
    nv, nav = mb["neut_verts"], mb["neut_avgtex"]

    id_fwd = jax.jit(lambda p, a, b: id_enc.apply(p, a, b))
    note("id_encoder_fwd_s", _timeit(id_fwd, p_id, nv, nav, steps=args.steps))

    def id_loss(p, a, b):
        out = id_enc.apply(p, a, b)
        return sum(jnp.sum(x) for x in jax.tree.leaves(out))

    note("id_encoder_grad_s", _timeit(
        jax.jit(lambda p, a, b: _identity(jax.grad(id_loss)(p, a, b))),
        p_id, nv, nav, steps=args.steps))

    # ---- stage-level: expression encoder -----------------------------------
    ex_enc = model.expression_encoder
    p_ex = {"params": state.params["expression_encoder"]}
    ex_args = (mb["verts"], mb["avgtex"], mb["neut_verts"], mb["neut_avgtex"])
    note("expr_encoder_fwd_s", _timeit(
        jax.jit(lambda p, *a: ex_enc.apply(p, *a)), p_ex, *ex_args,
        steps=args.steps))
    note("expr_encoder_grad_s", _timeit(
        jax.jit(lambda p, *a: _identity(
            jax.grad(lambda q: jnp.sum(ex_enc.apply(q, *a)))(p))),
        p_ex, *ex_args, steps=args.steps))

    # ---- stage-level: decoder assembler (geo+rgb towers, postex, TBN) ------
    id_cond = id_fwd(p_id, nv, nav)
    expr_raw = jax.jit(lambda p, *a: ex_enc.apply(p, *a))(p_ex, *ex_args)
    bn = model.bottleneck
    p_bn = {"params": state.params["bottleneck"]}
    expr = jax.jit(
        lambda p, e: bn.apply(p, e, deterministic=True)[0]
    )(p_bn, expr_raw)
    da = model.decoder_assembler
    v_da = {"params": state.params["decoder_assembler"],
            "stats": state.stats["decoder_assembler"]}
    viewpos = mb["campos"] / jnp.linalg.norm(mb["campos"], axis=-1, keepdims=True)

    da_fwd = jax.jit(lambda v, ic, ex: da.apply(v, ic, ex, viewpos))
    decout = da_fwd(v_da, id_cond, expr)
    note("assembler_fwd_s", _timeit(da_fwd, v_da, id_cond, expr,
                                    steps=args.steps))

    def da_loss(v, ic, ex):
        out = da.apply(v, ic, ex, viewpos)
        return (jnp.sum(out["template"] ** 2) * 1e-6 + jnp.sum(out["verts"]) +
                jnp.sum(out["primpos"]) + jnp.sum(out["primrot"]))

    note("assembler_grad_s", _timeit(
        jax.jit(lambda v, ic, ex: _identity(
            jax.grad(da_loss, argnums=(0, 1, 2))(v, ic, ex))),
        v_da, id_cond, expr, steps=args.steps))

    # ---- raymarch (in-situ shapes; kernel-only numbers live in kbench) -----
    from ava256_tpu.ops.raydirs import compute_raydirs

    raypos, raydir, tminmax = compute_raydirs(
        mb["campos"], mb["camrot"], mb["focal"], mb["princpt"],
        mb["pixelcoords"], model.raymarcher.volume_radius,
    )
    rm_in = {k: decout[k] for k in ("template", "primpos", "primrot", "primscale")}

    def rm_loss(d):
        rgb, alpha, _ = model.raymarcher(raypos, raydir, tminmax, dict(d))
        return jnp.sum(rgb) + jnp.sum(alpha)

    note("raymarch_fwd_s", _timeit(
        jax.jit(rm_loss), rm_in, steps=args.steps))
    note("raymarch_grad_s", _timeit(
        jax.jit(lambda d: _identity(jax.grad(rm_loss)(d))), rm_in,
        steps=args.steps))

    # Derived: everything not covered by the stage timings.
    staged = (report["id_encoder_grad_s"] + report["expr_encoder_grad_s"]
              + report["assembler_grad_s"] + report["raymarch_grad_s"])
    report["stages_grad_sum_s"] = staged
    report["unattributed_s"] = report["full_step_s"] - staged
    print(json.dumps({k: round(v, 4) for k, v in report.items()}))


if __name__ == "__main__":
    main()
