#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Raymarch kernel micro-benchmark + on-device parity check.

Times the Pallas forward and backward kernels separately at flagship scale
on the available accelerator and reports Mrays/s plus the HBM roofline
fraction. With --verify, additionally compares the compiled Pallas output
and gradients against the XLA backend on the same scene (the automatic
on-device counterpart of the interpret-mode oracle tests; reference
gradcheck: extensions/mvpraymarch/mvpraymarch.py:710-745).

Scene: nprims primitives jittered on a spherical shell (the shape the
decoder assembler converges to for a head), scales set from the inter-prim
spacing like the adaptwarps EMA would, camera at 3 volume radii.

Usage: python scripts/kbench.py [--verify] [--batch 4] [--hw 512x334]
       [--nprims 16384] [--steps 3] [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_flagship_scene(batch=4, h=512, w=334, nprims=16384, boxsize=8, seed=0):
    rng = np.random.RandomState(seed)
    n, K, M = batch, nprims, boxsize

    # primitives on a jittered spherical shell, radius 0.7 in volume units
    u = rng.rand(K).astype(np.float32)
    phi = rng.rand(K).astype(np.float32) * 2 * np.pi
    cz = 2 * u - 1
    s = np.sqrt(np.maximum(0.0, 1 - cz * cz))
    pts = np.stack([s * np.cos(phi), s * np.sin(phi), cz], -1) * 0.7
    spacing = np.sqrt(4 * np.pi * 0.49 / K)  # mean inter-prim distance
    primpos = (pts + rng.randn(K, 3).astype(np.float32) * spacing * 0.3)[None]
    primpos = np.tile(primpos, (n, 1, 1)).astype(np.float32)
    # world halfwidth ~= 1.5x spacing (overlapping shell like the EMA scale)
    primscale = np.full((n, K, 3), 1.0 / (1.5 * spacing), np.float32)
    ang = rng.randn(n, K, 3).astype(np.float32) * 0.1
    from ava256_tpu.ops.math3d import rodrigues
    import jax.numpy as jnp

    primrot = np.asarray(rodrigues(jnp.asarray(ang)))
    template = rng.randn(n, K, M, M, M, 4).astype(np.float32)
    template[..., 3] -= 2.0
    template = np.log1p(np.exp(template)) * np.array([60, 60, 60, 8], np.float32)

    # camera at 3 volume radii, rays through the unit cube
    campos = np.array([0.0, 0.0, -3.0], np.float32)
    focal = w * 1.2
    px, py = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    rd = np.stack([(px - w / 2) / focal, (py - h / 2) / focal, np.ones_like(px)], -1)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    raydir = np.tile(rd[None], (n, 1, 1, 1)).astype(np.float32)
    raypos = np.tile(campos[None, None, None], (n, h, w, 1)).astype(np.float32)
    # slab test against [-1,1]^3
    inv = 1.0 / np.where(np.abs(raydir) < 1e-9, 1e-9, raydir)
    t1 = (-1.0 - raypos) * inv
    t2 = (1.0 - raypos) * inv
    tmin = np.maximum(np.minimum(t1, t2).max(-1), 0.0)
    tmax = np.maximum(t1, t2).min(-1)
    tminmax = np.stack([tmin, np.maximum(tmax, tmin)], -1).astype(np.float32)
    stepsize = 1.0 / 256.0
    return dict(
        raypos=raypos, raydir=raydir, stepsize=stepsize, tminmax=tminmax,
        primpos=primpos, primrot=primrot, primscale=primscale, template=template,
    )



def measure_raymarch_arrays(rp, rd, stepsize, tmm, pp, pr, ps, tpl,
                            warp=None, prim_mask=None, steps=3, tile=16,
                            max_hit=64, hbm_gbps=None, rows=4, two_stage=None,
                            cull_max_groups=8, cull_group_size=256,
                            fadescale=8.0, fadeexp=8.0, candidates="dma",
                            bwd_stop=4, fwd_stop=2):
    """Time the Pallas raymarch fwd/bwd on the GIVEN kernel operands and
    derive the HBM speed-of-light fraction.

    Speed-of-light model: the march must at minimum stream every surviving
    (tile, candidate) RGBA box (bs^3*4 floats) from HBM once, plus the per-tile
    ray inputs and rgba output. sol_frac = that minimum time / measured time.
    """
    import os

    import jax
    import jax.numpy as jnp
    from ava256_tpu.ops.raymarch_pallas import _tile_and_cull, mvp_raymarch_pallas

    hbm_gbps = hbm_gbps or float(os.environ.get("AVA256_HBM_GBPS", 819.0))
    kw = dict(fadescale=fadescale, fadeexp=fadeexp, tile=tile, max_hit=max_hit,
              rows=rows, two_stage_cull=two_stage,
              cull_max_groups=cull_max_groups, cull_group_size=cull_group_size,
              prim_mask=prim_mask, candidates=candidates, bwd_stop=bwd_stop,
              fwd_stop=fwd_stop)

    def fwd(pp, pr, ps, tpl):
        return mvp_raymarch_pallas(
            rp, rd, stepsize, tmm, pp, pr, ps, tpl, warp, **kw
        )

    def loss(pp, pr, ps, tpl):
        return jnp.sum(fwd(pp, pr, ps, tpl))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    # Two timing hazards on the tunneled-TPU platform, both observed on the
    # --scene path: (1) chained same-input dispatches can be elided, so
    # every call is blocked; (2) even blocked, a repeat execution of the
    # SAME executable on the SAME input buffers returns instantly (a
    # result-dedup in the tunnel client), so each iteration alternates
    # between two equal-valued but distinct template buffers, forcing a
    # real execution. The per-call host round-trip (~30 ms, bench.py's
    # noop_roundtrip_s) is two orders below the march times measured here.
    # one-ulp perturbations, UNIQUE per timed call: numerically inert, but
    # distinct under any buffer-identity or content-addressed execution
    # dedup (a 2-cycle alternation still collided with the tunnel's cache)
    variants = [
        jax.block_until_ready(tpl * (1.0 + (i + 1) * 2.0**-23))
        for i in range(steps)
    ]
    # sync by VALUE FETCH, not block_until_ready: on the axon tunnel,
    # block_until_ready on some executables' outputs returns without a
    # real device sync (observed: 3 marches "completing" in 0.1 ms while
    # the grad loop measured real seconds); fetching bytes cannot lie.
    # The fetch costs one ~30 ms round trip per call (noop_roundtrip_s),
    # two orders below the march times measured here.
    def sync(x):
        return float(np.asarray(jax.device_get(x[(0,) * (x.ndim - 1)][0])))

    out = fwd(pp, pr, ps, tpl)
    sync(out)
    t0 = time.time()
    for i in range(steps):
        sync(fwd(pp, pr, ps, variants[i]))
    t_fwd = (time.time() - t0) / steps
    out = jax.block_until_ready(out)

    g = grad(pp, pr, ps, tpl)
    sync(g[0])
    t0 = time.time()
    for i in range(steps):
        sync(grad(pp, pr, ps, variants[i])[0])
    t_tot = (time.time() - t0) / steps
    t_bwd = t_tot - t_fwd

    # information-theoretic minimum HBM bytes for the forward march; the
    # cull is also timed alone (sub-linear-in-K check for the two-stage path)
    bs = tpl.shape[2]
    pm = (
        jnp.ones(pp.shape[:2], jnp.float32)
        if prim_mask is None
        else jnp.asarray(prim_mask)
    )
    cull = jax.jit(
        lambda pp, ps: _tile_and_cull(
            rp, rd, tmm, pp, ps, pm,
            tile, max_hit, stepsize, two_stage=two_stage,
            cull_max_groups=cull_max_groups, cull_group_size=cull_group_size,
        )
    )
    _, _, t_mm, _, cand_valid, _, meta = jax.block_until_ready(cull(pp, ps))
    t0 = time.time()
    for _ in range(steps):
        cres = cull(pp, ps)
    jax.block_until_ready(cres)
    t_cull = (time.time() - t0) / steps
    nval = int(jnp.sum(cand_valid))
    box_bytes = nval * bs * bs * bs * 4 * 4
    ray_bytes = int(meta["ntiles"]) * int(meta["tsz"]) * (3 + 3 + 2 + 4) * 4
    sol_s = (box_bytes + ray_bytes) / (hbm_gbps * 1e9)
    nrays = int(np.prod(rp.shape[:-1]))
    return {
        "fwd_s": round(t_fwd, 4),
        "cull_s": round(t_cull, 4),
        "bwd_s": round(t_bwd, 4),
        "bwd_over_fwd": round(t_bwd / t_fwd, 2),
        "grad_total_s": round(t_tot, 4),
        "mrays_per_s_fwd": round(nrays / t_fwd / 1e6, 2),
        "hbm_sol_s": round(sol_s, 5),
        "x_hbm_speed_of_light": round(t_fwd / sol_s, 1),
        "candidates": nval,
        "alpha_mean": round(float(jnp.mean(out[..., 3])), 4),
        "backend": jax.default_backend(),
    }, (fwd, grad)


def measure_raymarch(batch=4, h=512, w=334, nprims=16384, steps=3, tile=16,
                     max_hit=64, seed=0, hbm_gbps=None, rows=4, boxsize=8,
                     two_stage=None, cull_max_groups=8, cull_group_size=256,
                     candidates="dma", bwd_stop=4, mask_frac=0.0):
    """Time the Pallas raymarch fwd/bwd on the synthetic shell scene.
    mask_frac > 0 marks that fraction of primitives dead via prim_mask
    (the alpha-mask culling path, reference models/autoencoder.py:214-228)
    to measure the physical-culling speedup."""
    import jax.numpy as jnp

    s = make_flagship_scene(batch, h, w, nprims, boxsize=boxsize, seed=seed)
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    pp, pr, ps, tpl = (
        jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")
    )
    prim_mask = None
    if mask_frac > 0.0:
        mrng = np.random.RandomState(seed + 1)
        prim_mask = jnp.asarray(
            (mrng.rand(1, nprims) >= mask_frac).astype(np.float32).repeat(batch, 0)
        )
    rep, (fwd, grad) = measure_raymarch_arrays(
        rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, steps=steps, tile=tile,
        max_hit=max_hit, hbm_gbps=hbm_gbps, rows=rows, two_stage=two_stage,
        cull_max_groups=cull_max_groups, cull_group_size=cull_group_size,
        candidates=candidates, bwd_stop=bwd_stop, prim_mask=prim_mask,
    )
    return rep, (fwd, grad, s, (rp, rd, tmm, pp, pr, ps, tpl))


def load_scene_npz(path):
    """March operands dumped by bench.py (AVA256_BENCH_SAVE_MARCH): the exact
    scoreboard scene, for offline phase attribution and kernel iteration."""
    data = np.load(path)
    s = {k: data[k] for k in data.files}
    s["stepsize"] = float(s["stepsize"])
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--scene", default=None,
                    help="march-operand .npz from bench.py instead of the "
                    "synthetic shell scene")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    ap.add_argument("--nprims", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--max-hit", type=int, default=64)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--boxsize", type=int, default=8)
    ap.add_argument("--two-stage", choices=["auto", "on", "off"], default="auto")
    ap.add_argument("--cull-max-groups", type=int, default=8)
    ap.add_argument("--cull-group-size", type=int, default=256)
    ap.add_argument("--candidates", choices=["dma", "gathered"], default="dma")
    ap.add_argument("--bwd-stop", type=int, default=4, choices=[1, 2, 3, 4],
                    help="truncate the backward kernel after phase A/B/C "
                    "(timing instrumentation; gradients are wrong below 4)")
    ap.add_argument("--mask-frac", type=float, default=0.0,
                    help="fraction of primitives marked dead via prim_mask "
                    "(physical alpha-mask culling path)")
    ap.add_argument("--fwd-stop", type=int, default=2, choices=[1, 2],
                    help="truncate the forward kernel after the march "
                    "(timing instrumentation; output is wrong below 2)")
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))

    import jax
    import jax.numpy as jnp

    if args.scene:
        s = load_scene_npz(args.scene)
        rep, _ = measure_raymarch_arrays(
            jnp.asarray(s["raypos"]), jnp.asarray(s["raydir"]), s["stepsize"],
            jnp.asarray(s["tminmax"]), jnp.asarray(s["primpos"]),
            jnp.asarray(s["primrot"]), jnp.asarray(s["primscale"]),
            jnp.asarray(s["template"]),
            warp=(jnp.asarray(s["warp"]) if "warp" in s else None),
            steps=args.steps, tile=args.tile, max_hit=args.max_hit,
            rows=args.rows,
            two_stage={"auto": None, "on": True, "off": False}[args.two_stage],
            cull_max_groups=args.cull_max_groups,
            cull_group_size=args.cull_group_size,
            fadescale=float(s.get("fadescale", 8.0)),
            fadeexp=float(s.get("fadeexp", 8.0)),
            candidates=args.candidates, bwd_stop=args.bwd_stop,
            fwd_stop=args.fwd_stop,
        )
        rep["scene"] = args.scene
    else:
        rep, (fwd, grad, s, arrays) = measure_raymarch(
            args.batch, h, w, args.nprims, steps=args.steps, tile=args.tile,
            max_hit=args.max_hit, seed=args.seed, rows=args.rows,
            boxsize=args.boxsize,
            two_stage={"auto": None, "on": True, "off": False}[args.two_stage],
            cull_max_groups=args.cull_max_groups,
            cull_group_size=args.cull_group_size,
            candidates=args.candidates, bwd_stop=args.bwd_stop,
            mask_frac=args.mask_frac,
        )
    print(json.dumps(rep))

    if args.verify:
        # Compare the *compiled* kernels against the exact oracle (the XLA
        # backend truncates at max_samples on dense scenes, and the oracle is
        # O(K) per step, so verification runs on a reduced scene).
        from ava256_tpu.ops.raymarch_ref import mvp_raymarch_reference

        from ava256_tpu.ops.raymarch_pallas import mvp_raymarch_pallas

        s = make_flagship_scene(1, 16, 16, 16, seed=args.seed)
        rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
        pp, pr, ps, tpl = (
            jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")
        )

        def fwd_v(pp, pr, ps, tpl):
            return mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=8.0, fadeexp=8.0, tile=args.tile, max_hit=args.max_hit,
            )

        def loss_v(pp, pr, ps, tpl):
            return jnp.sum(fwd_v(pp, pr, ps, tpl))

        out = jax.block_until_ready(fwd_v(pp, pr, ps, tpl))
        g = jax.block_until_ready(
            jax.grad(loss_v, argnums=(0, 1, 2, 3))(pp, pr, ps, tpl)
        )
        maxsteps = int(np.ceil(float(tmm[..., 1].max()) / s["stepsize"])) + 2

        def loss_x(pp, pr, ps, tpl):
            return jnp.sum(
                mvp_raymarch_reference(
                    rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                    fadescale=8.0, fadeexp=8.0, max_steps=maxsteps,
                    within_step="summed",
                )
            )

        ox = jax.block_until_ready(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=8.0, fadeexp=8.0, max_steps=maxsteps,
                within_step="summed",
            )
        )
        gx = jax.block_until_ready(jax.grad(loss_x, argnums=(0, 1, 2, 3))(pp, pr, ps, tpl))
        rep = {}
        a, b = np.asarray(out), np.asarray(ox)
        rep["out_dp"] = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-30))
        rep["out_maxdiff"] = float(np.abs(a - b).max())
        for name, ga, gb in zip(("primpos", "primrot", "primscale", "template"), g, gx):
            ga, gb = np.asarray(ga), np.asarray(gb)
            rep[f"grad_{name}_dp"] = float(
                (ga * gb).sum() / np.sqrt((ga * ga).sum() * (gb * gb).sum() + 1e-30)
            )
        print(json.dumps({k: round(v, 6) for k, v in rep.items()}))


if __name__ == "__main__":
    main()
