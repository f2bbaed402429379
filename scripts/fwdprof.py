#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Forward raymarch call decomposition on the chip.

kbench's fwd_s wraps the whole custom-op call: cull -> table flatten ->
scal gather -> pallas kernel -> untile. This times each XLA-side piece in
isolation (jitted, blocked) plus the pallas call on precomputed operands, so
the kernel-vs-glue split of the forward number is measured, not inferred.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    ap.add_argument("--nprims", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--max-hit", type=int, default=64)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    h, w = map(int, args.hw.split("x"))

    import jax
    import jax.numpy as jnp

    from scripts.kbench import make_flagship_scene
    from ava256_tpu.ops import raymarch_pallas as rmp

    s = make_flagship_scene(args.batch, h, w, args.nprims, seed=0)
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    pp, pr, ps, tpl = (
        jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")
    )
    n, K = pp.shape[0], pp.shape[1]
    bs = tpl.shape[2]
    dt = float(s["stepsize"])
    nbuf = rmp._ceil_to(int(2.0 * 3.0**0.5 / dt) + 4, 8)
    tmm_c = jnp.stack(
        [tmm[..., 0], jnp.minimum(tmm[..., 1], tmm[..., 0] + nbuf * dt)], axis=-1
    )
    pr4 = pr.reshape(n, K, 3, 3)
    pm = jnp.ones((n, K), jnp.float32)

    rep = {}

    # 1. cull
    cull = jax.jit(
        lambda pp, ps: rmp._tile_and_cull(
            rp, rd, tmm_c, pp, ps, pm, args.tile, args.max_hit, dt,
        )
    )
    rep["cull_s"] = round(timeit(cull, pp, ps, steps=args.steps), 4)
    t_o, t_d, t_mm, cand_gid, cand_valid, cand_tstart, meta = jax.block_until_ready(
        cull(pp, ps)
    )

    # 2. flat table build (the DMA path's operand relayout)
    flat = jax.jit(
        lambda tpl: rmp._flatten_volT(tpl.reshape(n * K, bs, bs, bs, 4), bs, 4, 1)
    )
    rep["flatten_s"] = round(timeit(flat, tpl, steps=args.steps), 4)
    fp_boxT = jax.block_until_ready(flat(tpl))

    # 3. scal gather/pack
    def gather(pp, pr4, ps):
        return rmp._gather_and_pack(
            pp.reshape(n * K, 3), pr4.reshape(n * K, 9), ps.reshape(n * K, 3),
            None, cand_gid, cand_valid, cand_tstart, cand_gid.shape[1], bs, None,
        )[0]

    gat = jax.jit(gather)
    rep["scal_gather_s"] = round(timeit(gat, pp, pr4, ps, steps=args.steps), 4)
    scal = jax.block_until_ready(gat(pp, pr4, ps))

    # 4. pallas fwd kernel on precomputed operands (includes the R-tiling)
    cfg = dict(
        dt=dt, fadescale=8.0, fadeexp=8.0, tile=args.tile,
        max_hit=args.max_hit, nbuf=nbuf, interpret=False, rows=args.rows,
        bs=bs, pack=1,
    )
    kern = jax.jit(
        lambda gid, scal, t_o, t_d, t_mm, fp: rmp._forward_pallas_dma(
            gid, scal, t_o, t_d, t_mm, fp, None, cfg
        )
    )
    rep["kernel_s"] = round(
        timeit(kern, cand_gid, scal, t_o, t_d, t_mm, fp_boxT, steps=args.steps), 4
    )
    out_tiles = jax.block_until_ready(
        kern(cand_gid, scal, t_o, t_d, t_mm, fp_boxT)
    )

    # 5. untile
    unt = jax.jit(lambda o: rmp._untile(o, meta, args.tile))
    rep["untile_s"] = round(timeit(unt, out_tiles, steps=args.steps), 4)

    # whole fwd for reference
    whole = jax.jit(
        lambda pp, pr, ps, tpl: rmp.mvp_raymarch_pallas(
            rp, rd, dt, tmm, pp, pr, ps, tpl, None,
            fadescale=8.0, fadeexp=8.0, tile=args.tile, max_hit=args.max_hit,
            rows=args.rows,
        )
    )
    rep["whole_fwd_s"] = round(timeit(whole, pp, pr, ps, tpl, steps=args.steps), 4)
    rep["sum_parts_s"] = round(
        rep["cull_s"] + rep["flatten_s"] + rep["scal_gather_s"]
        + rep["kernel_s"] + rep["untile_s"], 4
    )
    rep["candidates"] = int(jnp.sum(cand_valid))
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
