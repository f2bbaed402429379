# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Pallas TPU kernels for MVP raymarching (forward + custom-VJP backward).

TPU-native replacement for the reference CUDA raymarcher's hot loop
(reference: extensions/mvpraymarch/mvpraymarch_subset_kernel.h:14-216). The
two-level culling (tile cones -> per-ray slab intervals) runs in XLA; the
Pallas kernels do the per-sample evaluation and compositing.

Layout: everything inside the kernel is *ray-lane-major* — per-ray vectors
are [T2] lane rows, the trilinear weights are [BZY, T2] / [bs*nch, T2] fully
packed vector registers, and the RGBA boxes are pre-transposed in XLA to
[bs*nch, BZY] (BZY = bs^2 zero-padded to a 128-lane multiple) so sampling is
two MXU matmuls:

    tmp[x*nch+c, t] = vol^T [bs*nch, BZY] @ wzy [BZY, T2]
    sample[c, t]    = Sx [nch, bs*nch] @ (wx * tmp)

Affine transforms travel as 13 scalars per candidate in SMEM (A row-major,
b, t_start); applying them is 24 scalar-broadcast multiply-adds on [T2]
rows — no [8,128] parameter blocks, no in-kernel box relayouts.

Warp fields (reference: extensions/mvpraymarch/primsampler.h:53-61) are a
second trilinear chain: the 3-channel warp volume is sampled at the ray's
local coordinate and the RGBA template is sampled at the warped coordinate;
the backward pass chains template -> warp -> position cotangents.

Within-step semantics: all primitives covering the same step row are summed
before saturation (order-independent and deterministic), matching the
reference up to its own unordered-atomics ambiguity (reference:
extensions/mvpraymarch/mvpraymarch.py:339-342 documents that ordering is
unspecified without sortprims; ops.raymarch_ref implements both members of
that family via within_step=).

Early termination is *exact*, not heuristic: candidates are depth-sorted by
a sound lower bound on their first reachable ray parameter
(t_c - radius - |v|*max_ray_axis_angle, computed per tile during culling).
The kernel keeps a scan pointer over the density step buffer and stops
marching candidates once every live ray has saturated strictly below the
next candidate's earliest reachable row — by construction the remaining
candidates cannot change the composite, so the early-out output equals the
full march. (The saturation scan sums rows in 8-row blocks; a conservative
1e-5 margin on the >=1 test absorbs the block-reorder rounding, so rounding
can only cause extra marching, never an early stop.)

nbuf (the step-row buffer depth) truncates the march: tmax is clamped to
tmin + nbuf*dt before culling, so a too-small nbuf means a shorter marching
range (same semantics as the oracle's max_steps), never a mis-composited
image. The default nbuf=None auto-sizes to cover the [-1,1]^3 cube diagonal.

Backward (mirroring the reference's re-marching backward kernel,
extensions/mvpraymarch/mvpraymarch_subset_kernel.h:102-216): phase A re-runs
the forward march to rebuild the step buffers; phase B converts the incoming
rgba cotangent into per-row density/color cotangents via a forward + reverse
scan over the saturating composite; phase C re-marches the candidates phase
A processed, chaining per-sample cotangents through the trilinear sample
(transpose matmuls on the MXU) and the fade/affine transform into per-tile
VMEM gradient buffers, which a drain loop then folds into global HBM
accumulators by read-modify-write DMA — race-free because the tile grid
executes sequentially on the TensorCore, so no atomics are needed (the
reference requires sortprims=True for deterministic gradients; ours are
always deterministic).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ava256_tpu.ops.raymarch_xla import _ceil_to


# ---------------------------------------------------------------------------
# Culling (XLA): tile the image, cone-cull primitives per tile
# ---------------------------------------------------------------------------


def _cone_test(centers, rads, live, apex, axis, tanmax, dmax, tile_tmin,
               tile_tmax, dt):
    """Per-tile cone-vs-sphere test. centers [NT,P,3], rads/live [NT,P];
    the remaining args are per-tile [NT(,3)] cone quantities. Returns
    (hit [NT,P] bool, t_start [NT,P]) where t_start is a sound lower bound
    on the first ray parameter at which the sphere can contribute for ANY
    ray of the tile: t >= t_c - rad - |v| * |d - axis|."""
    v = centers - apex[:, None, :]
    t_c = jnp.einsum("tpc,tc->tp", v, axis)
    dist = jnp.linalg.norm(v - t_c[..., None] * axis[:, None, :], axis=-1)
    hit = (
        (dist <= rads + jnp.maximum(t_c, 0.0) * tanmax[:, None] + dt)
        & (t_c + rads >= tile_tmin[:, None])
        & (t_c - rads <= tile_tmax[:, None])
        & (tile_tmax > tile_tmin)[:, None]
        & live
    )
    t_start = t_c - rads - jnp.hypot(t_c, dist) * dmax[:, None]
    return hit, t_start


def _morton_spread(x):
    """Spread the low 10 bits of a uint32 to every 3rd bit (Morton interleave
    helper; same bit trick the reference's LBVH builds its codes with,
    reference: extensions/mvpraymarch/bvh.cu:22-60)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _morton_order(primpos, live_nk):
    """[N, K] primitive ordering by 30-bit Morton code over each batch item's
    live bounding box; dead primitives sort to the end. This is the TPU
    stand-in for the reference's LBVH construction (bvh.cu:22-201): a radix
    sort by Morton code is exactly how that LBVH linearizes space, and
    contiguous runs of the sorted order play the role of its subtrees."""
    big = jnp.float32(1e9)
    masked = jnp.where(live_nk[..., None], primpos, big)
    lo = jnp.min(masked, axis=1, keepdims=True)
    masked = jnp.where(live_nk[..., None], primpos, -big)
    hi = jnp.max(masked, axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((primpos - lo) / span * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        (_morton_spread(q[..., 0]) << 2)
        | (_morton_spread(q[..., 1]) << 1)
        | _morton_spread(q[..., 2])
    )
    code = jnp.where(live_nk, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(code, axis=1).astype(jnp.int32)


def _tile_and_cull(raypos, raydir, tminmax, primpos, primscale, prim_mask,
                   tile, max_hit, dt, cull_group_size=256, cull_max_groups=8,
                   two_stage=None):
    n, h, w = raypos.shape[0], raypos.shape[1], raypos.shape[2]
    K = primpos.shape[1]
    hp, wp = _ceil_to(h, tile), _ceil_to(w, tile)
    pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
    raypos_p = jnp.pad(raypos, pad)
    raydir_p = jnp.pad(raydir, pad, constant_values=1.0)
    tmm_p = jnp.pad(tminmax, pad, constant_values=0.0)

    nty, ntx = hp // tile, wp // tile
    ntiles = n * nty * ntx
    tsz = tile * tile

    def tile_view(x):
        ch = x.shape[-1]
        x = x.reshape(n, nty, tile, ntx, tile, ch)
        # [ntiles, ch, tsz]: per-ray quantities are lane rows in the kernel
        return x.transpose(0, 1, 3, 5, 2, 4).reshape(ntiles, ch, tsz)

    t_o = tile_view(raypos_p)
    t_d = tile_view(raydir_p)
    t_mm = tile_view(tmm_p)
    tile_b = jnp.arange(ntiles, dtype=jnp.int32) // (nty * ntx)

    radii = jnp.linalg.norm(1.0 / primscale, axis=-1)  # [N, K]
    apex = t_o[:, :, 0]
    dsum = jnp.sum(t_d, axis=2)
    axis = dsum / jnp.linalg.norm(dsum, axis=-1, keepdims=True)
    cosang = jnp.einsum("tcp,tc->tp", t_d, axis)
    cosmin = jnp.clip(jnp.min(cosang, axis=1), 1e-3)
    tanmax = jnp.sqrt(jnp.clip(1.0 - cosmin**2, 0.0, 1.0)) / cosmin
    # max angle between any ray in the tile and the tile axis, as a chord:
    # |d - axis| = sqrt(2 (1 - cos)); used for the sound t_start lower bound
    dmax = jnp.sqrt(jnp.clip(2.0 * (1.0 - cosmin), 0.0, 4.0))
    live = t_mm[:, 0] < t_mm[:, 1]
    big = jnp.float32(1e9)
    tile_tmin = jnp.min(jnp.where(live, t_mm[:, 0], big), axis=1)
    tile_tmax = jnp.max(jnp.where(live, t_mm[:, 1], -big), axis=1)

    cone = (apex, axis, tanmax, dmax, tile_tmin, tile_tmax, dt)
    # physical primitive culling (reference: models/autoencoder.py:214-228
    # drops alpha-masked prims to shrink the march)
    live_nk = prim_mask > 0.5

    if two_stage is None:
        two_stage = K >= 65536
    if two_stage:
        # Two-stage cull — the TPU answer to the reference's LBVH
        # (reference: extensions/mvpraymarch/bvh.cu:22-201). A dense
        # [ntiles, K] test materializes O(ntiles*K) temporaries (8+ GB at
        # 262144 prims); instead Morton-sort the primitives (the same
        # spatial linearization the LBVH radix-sorts by), group contiguous
        # runs of the sorted order, test per-tile against the G = K/g group
        # bounding spheres, keep the earliest-reachable cull_max_groups
        # groups, and run the exact per-prim test only on their members.
        # Group spheres contain every member sphere, so a group miss
        # soundly implies a member miss; group truncation is ordered by
        # the same t_start bound the per-prim top_k uses. Member data for
        # surviving groups moves as whole packed rows ([g, 6] blocks), not
        # per-element gathers — block DMA is what the TPU gathers well.
        g = max(1, min(cull_group_size, K))
        G = -(-K // g)
        Kp = G * g
        order_s = _morton_order(primpos, live_nk)  # [N, K]
        pos_s = jnp.take_along_axis(primpos, order_s[..., None], axis=1)
        rad_s = jnp.take_along_axis(radii, order_s, axis=1)
        live_s = jnp.take_along_axis(live_nk, order_s, axis=1)
        if Kp > K:
            pos_s = jnp.pad(pos_s, ((0, 0), (0, Kp - K), (0, 0)))
            rad_s = jnp.pad(rad_s, ((0, 0), (0, Kp - K)))
            live_s = jnp.pad(live_s, ((0, 0), (0, Kp - K)))
            order_s = jnp.pad(order_s, ((0, 0), (0, Kp - K)))
        mem = pos_s.reshape(n, G, g, 3)
        mem_rad = rad_s.reshape(n, G, g)
        mem_live = live_s.reshape(n, G, g)
        lo = jnp.min(jnp.where(mem_live[..., None], mem, big), axis=2)
        hi = jnp.max(jnp.where(mem_live[..., None], mem, -big), axis=2)
        any_live = jnp.any(mem_live, axis=2)  # [N, G]
        cg = 0.5 * (lo + hi)
        rg = jnp.max(
            jnp.where(
                mem_live,
                jnp.linalg.norm(mem - cg[:, :, None], axis=-1) + mem_rad,
                0.0,
            ),
            axis=2,
        )
        ghit, gstart = _cone_test(cg[tile_b], rg[tile_b], any_live[tile_b], *cone)
        gkey = jnp.where(ghit, gstart, jnp.inf)
        M = min(cull_max_groups, G)
        gneg, gorder = jax.lax.top_k(-gkey, M)
        gvalid = jnp.isfinite(gneg)  # [NT, M]
        # packed per-group member rows: pos(3) rad(1) live(1) orig-id(1);
        # ids are exact as f32 (K << 2^24). One row gather of [M, g*6]
        # blocks per tile replaces M*g scattered element gathers.
        pk = jnp.concatenate(
            [
                mem,
                mem_rad[..., None],
                mem_live[..., None].astype(jnp.float32),
                order_s.reshape(n, G, g)[..., None].astype(jnp.float32),
            ],
            axis=-1,
        ).reshape(n * G, g * 6)
        rows = pk[tile_b[:, None] * G + gorder]  # [NT, M, g*6]
        memc = rows.reshape(ntiles, M, g, 6)
        centers = memc[..., 0:3].reshape(ntiles, M * g, 3)
        rads = memc[..., 3].reshape(ntiles, M * g)
        live_c = (memc[..., 4] > 0.5).reshape(ntiles, M * g) & jnp.repeat(
            gvalid, g, axis=1
        )
        cand_local = memc[..., 5].reshape(ntiles, M * g).astype(jnp.int32)
        hit, t_start = _cone_test(centers, rads, live_c, *cone)
        key = jnp.where(hit, t_start, jnp.inf)
        mh = min(max_hit, key.shape[1])
        neg_top, order = jax.lax.top_k(-key, mh)
        cand_tstart = -neg_top  # [NT, MH], +inf for invalid
        cand_valid = jnp.isfinite(cand_tstart)
        gids = tile_b[:, None] * K + jnp.take_along_axis(cand_local, order, axis=1)
        cand_gid = jnp.where(cand_valid, gids, 0)
    else:
        hit, t_start = _cone_test(primpos[tile_b], radii[tile_b],
                                  live_nk[tile_b], *cone)
        key = jnp.where(hit, t_start, jnp.inf)
        # top_k (earliest-reachable-first) instead of a full sort over K/tile
        mh = min(max_hit, key.shape[1])
        neg_top, order = jax.lax.top_k(-key, mh)
        cand_tstart = -neg_top  # [NT, MH], +inf for invalid
        cand_valid = jnp.isfinite(cand_tstart)
        cand_gid = tile_b[:, None] * K + order.astype(jnp.int32)
        cand_gid = jnp.where(cand_valid, cand_gid, 0)

    meta = dict(n=n, h=h, w=w, hp=hp, wp=wp, nty=nty, ntx=ntx, ntiles=ntiles, tsz=tsz)
    return t_o, t_d, t_mm, cand_gid, cand_valid, cand_tstart, meta


def _untile(out, meta, tile):
    n, nty, ntx = meta["n"], meta["nty"], meta["ntx"]
    out = out.reshape(n, nty, ntx, 4, tile, tile).transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n, meta["hp"], meta["wp"], 4)[:, : meta["h"], : meta["w"], :]


def _pack_affine(c_pos, c_rot, c_scale):
    """A = R diag(s), b = -c @ A (differentiable; used by the VJP router)."""
    A = c_rot * c_scale[..., None, :]
    b = -jnp.einsum("...i,...ij->...j", c_pos, A)
    return A, b


def _pack_factor(bs, K):
    """Boxes per flat-table row: P = 128 / bs^2 when the primsize is
    lane-starved (bs^2 < 128) and K divides evenly, else 1 (unpacked).
    P-packing keeps the HBM box/gradient tables fully dense — the TPU
    answer to small-primitive configs like the reference's 262,144-prim
    branch (reference: models/decoders/assembler.py:131-216), where an
    unpacked table's 8x lane padding alone exceeds HBM."""
    bsq = bs * bs
    if bsq >= 128 or 128 % bsq != 0:
        return 1
    P = 128 // bsq
    # only pack when the unpacked table would pad >= 4x (bs <= 4); at bs=8
    # the padding is 2x and the unpacked path is the proven hot path
    if P < 4:
        return 1
    return P if K % P == 0 else 1


def _flatten_volT(vol, bs, nch, pack=1):
    """[NK, bs, bs, bs, nch] -> transposed [NK, bs*nch, BZY] with the zy axis
    zero-padded to a 128-lane multiple (Mosaic dynamic-slice alignment);
    padded lanes hold zeros so they sample and backprop to nothing.

    With ``pack`` = P > 1 (only legal when P * bs^2 == 128), P consecutive
    boxes share one [bs*nch, 128] row — box k lives at lanes
    (k%P)*bs^2 : (k%P+1)*bs^2 of row k//P. The row shape the kernel DMAs is
    identical to the unpacked case (BZY == 128); the table just has NK/P
    fully dense rows instead of NK rows that are 1/P real data. At bs=4 and
    262,144 prims this is the difference between a 1 GB table and an 8 GB
    one (XLA pads any minor dim < 128 up to 128 in HBM)."""
    nk = vol.shape[0]
    flat = vol.reshape(nk, bs * bs, bs * nch)
    if pack == 1:
        flat = jnp.pad(flat, ((0, 0), (0, _bzy(bs) - bs * bs), (0, 0)))
        return flat.transpose(0, 2, 1)
    assert pack * bs * bs == 128 and nk % pack == 0
    rows = nk // pack
    # Chunk the relayout: a single transpose materializes a lane-padded
    # [rows, P, bs^2, bs*nch] temp (minor dim bs*nch < 128 pads 128/(bs*nch)x)
    # — at 262k prims that temp alone is 8 GB. ~256 MB chunks bound it.
    padded_bytes = nk * bs * nch * 128 * 4
    nchunks = min(rows, max(1, -(-padded_bytes // (256 * 1024 * 1024))))
    csz = -(-rows // nchunks)
    outs = []
    for i in range(0, rows, csz):
        c = min(csz, rows - i)
        blk = flat[i * pack:(i + c) * pack].reshape(c, pack, bs * bs, bs * nch)
        outs.append(blk.transpose(0, 3, 1, 2).reshape(c, bs * nch, 128))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _unflatten_grad(gbox, bs, nch, pack):
    """Inverse of the packed _flatten_volT for the gradient tables:
    [NK/P, bs*nch, 128] -> [NK, bs*bs, bs*nch] (chunked like the forward
    relayout to bound the lane-padded transpose temp)."""
    rows = gbox.shape[0]
    padded_bytes = rows * pack * bs * nch * 128 * 4
    nchunks = min(rows, max(1, -(-padded_bytes // (256 * 1024 * 1024))))
    csz = -(-rows // nchunks)
    outs = []
    for i in range(0, rows, csz):
        c = min(csz, rows - i)
        blk = gbox[i:i + c].reshape(c, bs * nch, pack, bs * bs)
        outs.append(blk.transpose(0, 2, 3, 1).reshape(c * pack, bs * bs, bs * nch))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _gather_and_pack(fp_pos, fp_rot, fp_scale, fp_boxT, cand_gid, cand_valid,
                     cand_tstart, mh, bs, fp_warpT=None):
    """Per-tile candidate tables: SMEM scalars [NT, MH, 16] (A row-major 0:9,
    b 9:12, t_start 12), pre-transposed boxes [NT, MH, bs*4, BZY], and
    (optionally) pre-transposed warp volumes [NT, MH, bs*3, BZY].
    fp_boxT=None skips the box/warp gathers (the DMA-candidate kernels fetch
    boxes straight from the flat tables)."""
    ntiles = cand_gid.shape[0]
    c_box = None if fp_boxT is None else fp_boxT[cand_gid]
    c_warp = None if fp_warpT is None else fp_warpT[cand_gid]
    A, b = _pack_affine(
        fp_pos[cand_gid], fp_rot[cand_gid].reshape(ntiles, mh, 3, 3), fp_scale[cand_gid]
    )
    valid_f = cand_valid.astype(jnp.float32)[..., None]
    A = A * valid_f[..., None]
    b = b * valid_f + (1.0 - valid_f) * 4.0  # empty slab interval if reached
    scal = jnp.concatenate(
        [
            A.reshape(ntiles, mh, 9),
            b,
            jnp.where(cand_valid, cand_tstart, 1e9)[..., None],
            jnp.zeros((ntiles, mh, 3), jnp.float32),
        ],
        axis=-1,
    )
    return scal, c_box, c_warp


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _pow_abs(x, p):
    """|x|^p; for small integer p uses multiplication only (no transcendental
    pow) — the production fade exponent is 8 (reference: utils.py default)."""
    if float(p).is_integer() and 1 <= int(p) <= 16:
        n = int(p)
        a = jnp.abs(x)
        out = None
        acc = a
        while n:
            if n & 1:
                out = acc if out is None else out * acc
            acc = acc * acc
            n >>= 1
        return out
    return jnp.abs(x) ** p


def _hat(cols, f):
    """Linear-interp weights as a triangle hat: w[c, t] = max(0, 1 - |c - f_t|)
    — identical to the (1-frac)/frac one-hot pair. cols [S,1], f [T2]."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(cols - f[None, :]))


def _hat_diff(cols, f):
    """d(w)/d(f): sign(c - f) on the hat's support, 0 elsewhere."""
    d = cols - f[None, :]
    return jnp.where(jnp.abs(d) < 1.0, jnp.sign(d), 0.0)


def _bzy(bs):
    return _ceil_to(bs * bs, 128)


def _col_consts(bs, nch, padded=False):
    """Loop-invariant index columns and the x-collapse matrix for an
    nch-channel volume (hoisted out of the marching loops; zy ordering
    matches _flatten_volT). By default the hat-weight builds run over the
    true bs^2 zy rows — the volume's zero-padded BZY lanes are sliced off
    before the matmul, so the dominant VPU weight build never touches
    padding. padded=True builds over the full BZY row space instead (the
    padding rows carry exactly-zero hat weights for in-box coordinates):
    the backward pass needs this so its dvol contraction lands directly at
    the 128-lane accumulator width.

    The hat weights are *separable* over z and y: only nz (=nzy//bs) and bs
    distinct rows exist, so the builds run at [nz, W] / [bs, W] and are
    expanded to the full [nzy, W] row space by sublane broadcast (zrep/yrep
    below) — ~3x fewer VPU ops than building the outer product directly."""
    nzy = _bzy(bs) if padded else bs * bs
    if nzy % bs != 0:
        # The separable z/y expansion (and the backward dvol contraction
        # landing at the [bs*nch, _bzy(bs)] accumulator width) require the
        # padded row space to be a whole number of z-planes.
        raise ValueError(
            f"primsize {bs} needs _bzy({bs})={_bzy(bs)} divisible by {bs}; "
            "use a power-of-two primsize"
        )
    nz = nzy // bs
    zsm = jax.lax.broadcasted_iota(jnp.int32, (nz, 1), 0).astype(jnp.float32)
    ysm = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0).astype(jnp.float32)
    xn = jax.lax.broadcasted_iota(jnp.int32, (bs * nch, 1), 0)
    xcol = (xn // nch).astype(jnp.float32)
    crow = jax.lax.broadcasted_iota(jnp.int32, (nch, bs * nch), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (nch, bs * nch), 1)
    SxT = (ccol % nch == crow).astype(jnp.float32)  # [nch, bs*nch]
    return zsm, ysm, xcol, SxT


def _zrep(w, bs, nzy):
    """Expand a [nz, W] z-row table to [nzy, W]: row zy -> w[zy // bs]."""
    nz, wd = w.shape
    return jnp.broadcast_to(w[:, None, :], (nz, bs, wd)).reshape(nzy, wd)


def _yrep(w, nz, nzy):
    """Expand a [bs, W] y-row table to [nzy, W]: row zy -> w[zy % bs]."""
    bs, wd = w.shape
    return jnp.broadcast_to(w[None, :, :], (nz, bs, wd)).reshape(nzy, wd)


def _read_affine(scal_ref, hh):
    A = [[scal_ref[0, hh, i * 3 + j] for j in range(3)] for i in range(3)]
    b = [scal_ref[0, hh, 9 + j] for j in range(3)]
    return A, b


def _prim_setup(A, b, ox, oy, oz, dx, dy, dz, tmin, tmax, dt, nbuf):
    """Slab-test one candidate from its affine scalars. Returns the local ray
    (origin/direction in primitive coords), the clipped interval, and the
    tile-coherent step-row range."""
    oyv = tuple(ox * A[0][j] + oy * A[1][j] + oz * A[2][j] + b[j] for j in range(3))
    dyv = tuple(dx * A[0][j] + dy * A[1][j] + dz * A[2][j] for j in range(3))

    def axis_range(oc, dc):
        dc = jnp.where(jnp.abs(dc) < 1e-9, jnp.where(dc >= 0, 1e-9, -1e-9), dc)
        t1 = (-1.0 - oc) / dc
        t2_ = (1.0 - oc) / dc
        return jnp.minimum(t1, t2_), jnp.maximum(t1, t2_)

    a0, b0 = axis_range(oyv[0], dyv[0])
    a1, b1 = axis_range(oyv[1], dyv[1])
    a2, b2 = axis_range(oyv[2], dyv[2])
    tin = jnp.maximum(jnp.maximum(jnp.maximum(a0, a1), a2), tmin)
    tout = jnp.minimum(jnp.minimum(jnp.minimum(b0, b1), b2), tmax)
    seg = tin < tout

    kin = jnp.floor((tin - tmin) / dt) - 1.0
    kout = jnp.ceil((tout - tmin) / dt) + 1.0
    r0 = jnp.maximum(jnp.min(jnp.where(seg, kin, jnp.float32(nbuf))), 0.0)
    r1 = jnp.minimum(jnp.max(jnp.where(seg, kout, 0.0)), float(nbuf))
    return oyv, dyv, tin, tout, seg, (r0.astype(jnp.int32), r1.astype(jnp.int32))


def _row_state(oyv, dyv, tmin, tmax, tin, tout, seg, rrf, dt, fadescale, fadeexp):
    """Local coords, fade, and validity mask for one candidate over a batch
    of step rows. All arguments are width-W vectors (W = rows * T2, the
    per-ray quantities lane-tiled ``rows`` times); ``rrf`` is the float row
    index of each lane."""
    t = tmin + rrf * dt  # [W]
    y0 = oyv[0] + t * dyv[0]
    y1 = oyv[1] + t * dyv[1]
    y2 = oyv[2] + t * dyv[2]
    fade = jnp.exp(
        -fadescale
        * (_pow_abs(y0, fadeexp) + _pow_abs(y1, fadeexp) + _pow_abs(y2, fadeexp))
    )
    inbox = (
        (y0 >= -1.0) & (y0 <= 1.0)
        & (y1 >= -1.0) & (y1 <= 1.0)
        & (y2 >= -1.0) & (y2 <= 1.0)
    )
    mask = (
        inbox & seg & (t >= tin) & (t < tout) & (t >= tmin) & (t < tmax)
    ).astype(jnp.float32)
    return t, y0, y1, y2, fade, mask


def _sample_T(volT, fx, fy, fz, consts):
    """Trilinear sample at cell coords (fx, fy, fz), ray-lane-major: one
    [bs*nch, bs^2] @ [bs^2, W] MXU matmul plus an [nch, bs*nch] x-collapse
    matmul (W = T2 * rows when step rows are batched). The volume's padded
    BZY lanes are sliced off; zero-padding outside the volume (hat weights
    vanish). Returns (sT [nch, W], saved-for-backward).

    Precision note (measured on v5e): XLA's DEFAULT matmul precision
    truncates fp32 MXU operands to a single bfloat16 pass, and an explicit
    bf16 cast of these operands produces bit-identical results — the
    sampling matmuls already run at bf16 input rounding / fp32 accumulation
    (the TPU analogue of the reference's -use_fast_math build,
    extensions/mvpraymarch/setup.py:29). The oracle gradient parity
    (kbench --verify dps >= 0.9997) is measured under exactly this
    rounding, so there is no cheaper matmul dtype left on the table, and
    no extra cost for fp32-typed operands either."""
    zsm, ysm, xcol, SxT = consts
    nz, bs = zsm.shape[0], ysm.shape[0]
    nzy = nz * bs
    vol = volT[:, :nzy]
    wz = _hat(zsm, fz)  # [nz, W] distinct z rows
    wy = _hat(ysm, fy)  # [bs, W] distinct y rows
    wzyT = _zrep(wz, bs, nzy) * _yrep(wy, nz, nzy)  # [nzy, W]
    tmpT = jnp.dot(vol, wzyT, preferred_element_type=jnp.float32)  # [bs*nch, W]
    wxT = _hat(xcol, fx)
    prodT = wxT * tmpT
    sT = jnp.dot(SxT, prodT, preferred_element_type=jnp.float32)  # [nch, W]
    return sT, (tmpT, wzyT, wz, wy, wxT)


def _sample_T_bwd(volT, dsT, saved, fx, fy, fz, consts):
    """VJP of _sample_T: returns (dvolT [bs*nch, bs^2], dfx, dfy, dfz [W]);
    dvolT sums over any batched step rows (the W-axis contraction)."""
    zsm, ysm, xcol, SxT = consts
    nz, bs = zsm.shape[0], ysm.shape[0]
    nzy = nz * bs
    vol = volT[:, :nzy]
    tmpT, wzyT, wz, wy, wxT = saved
    dprodT = jnp.dot(SxT.T, dsT, preferred_element_type=jnp.float32)  # [bs*nch, W]
    dtmpT = wxT * dprodT
    dvolT = jax.lax.dot_general(
        dtmpT, wzyT, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bs*nch, bs^2]
    dwzyT = jax.lax.dot_general(
        vol, dtmpT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bs^2, W]
    # separable reductions: contract z (resp. y) first at [nz,bs,W], then the
    # small distinct-row hat-derivative tables finish the job — no full-size
    # [nzy, W] index-column builds
    dwzy3 = dwzyT.reshape(nz, bs, dwzyT.shape[-1])
    ccy = jnp.sum(wz[:, None, :] * dwzy3, axis=0)  # [bs, W]
    dfy = jnp.sum(_hat_diff(ysm, fy) * ccy, axis=0)
    ccz = jnp.sum(wy[None, :, :] * dwzy3, axis=1)  # [nz, W]
    dfz = jnp.sum(_hat_diff(zsm, fz) * ccz, axis=0)
    dfx = jnp.sum(_hat_diff(xcol, fx) * tmpT * dprodT, axis=0)
    return dvolT, dfx, dfy, dfz


def _sample_chain(boxT, warpT, y0, y1, y2, half, c4, c3):
    """Sample the RGBA box at y (or, with a warp volume, at warp(y)).
    Returns (sampleT [4, T2], saved) where saved carries everything
    _sample_chain_bwd needs."""
    fx, fy, fz = (y0 + 1.0) * half, (y1 + 1.0) * half, (y2 + 1.0) * half
    if warpT is None:
        sampleT, sv = _sample_T(boxT, fx, fy, fz, c4)
        return sampleT, (sv, (fx, fy, fz), None, None)
    swT, sv_w = _sample_T(warpT, fx, fy, fz, c3)
    f2 = ((swT[0, :] + 1.0) * half, (swT[1, :] + 1.0) * half,
          (swT[2, :] + 1.0) * half)
    sampleT, sv_b = _sample_T(boxT, *f2, c4)
    return sampleT, (sv_b, f2, sv_w, (fx, fy, fz))


def _sample_chain_bwd(boxT, warpT, dST, saved, half, c4, c3):
    """VJP of _sample_chain: (dboxT, dwarpT-or-None, dy0, dy1, dy2)."""
    sv_b, f_b, sv_w, f_w = saved
    dboxT, dfx2, dfy2, dfz2 = _sample_T_bwd(boxT, dST, sv_b, *f_b, c4)
    if warpT is None:
        return dboxT, None, dfx2 * half, dfy2 * half, dfz2 * half
    dswT = jnp.stack([dfx2, dfy2, dfz2], axis=0) * half  # [3, T2]
    dwarpT, dfxw, dfyw, dfzw = _sample_T_bwd(warpT, dswT, sv_w, *f_w, c3)
    return dboxT, dwarpT, dfxw * half, dfyw * half, dfzw * half


def _rowoff(R, t2):
    """Float row offset of each lane of the batched width W = R * T2 (1-D
    iota then a layout-preserving (1, W) -> (W,) reshape — Mosaic supports
    neither 1-D iota nor sublane-to-lane reshapes)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R * t2), 1).reshape(R * t2)
    return (lane // t2).astype(jnp.float32)


def _box_src_gathered(boxes_ref, warps_ref):
    """Candidate boxes pre-gathered per tile by XLA (VMEM blocks)."""

    def start(hh):
        return None

    def get(hh):
        return boxes_ref[0, hh], (None if warps_ref is None else warps_ref[0, hh])

    def flush(hh_stop):
        return None

    return start, get, flush


def _pack_extract(off, bsq):
    """[128, 128] one-hot extractor for a P-packed row: E[l, c] = 1 iff
    l == c + off and c < bsq, so row @ E pulls the candidate's bsq lanes
    down to lanes 0:bsq and zeroes the rest (matching the unpacked table's
    zero padding — lanes >= bsq must be exactly zero or warp-displaced
    samples with out-of-range coords would read a neighboring box)."""
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return ((l - c == off) & (c < bsq)).astype(jnp.float32)


def _pack_scatter(off, bsq):
    """Transpose of _pack_extract: dvol @ S places gradient lanes 0:bsq at
    the candidate's packed offset before the HBM read-modify-write."""
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    return ((l - c == off) & (c < bsq)).astype(jnp.float32)


def _box_src_dma(fp_box_ref, fp_warp_ref, gid_ref, tile_i, boxbuf, sem_box,
                 warpbuf, sem_warp, max_hit, pack=1, bsq=None):
    """Double-buffered per-candidate DMA from the flat HBM box/warp tables.

    Kills the XLA candidate gather (~[NT, MH] x 16KB boxes materialized,
    written and re-read through HBM — the reference never pays this, its
    warps read the template in place, mvpraymarch_subset_kernel.h:76-97):
    the kernel fetches candidate hh's box while marching candidate hh-1,
    and tiles that terminate early never touch the candidates they skip.

    start(hh) begins the fetch of candidate hh into buffer hh%2; get(hh)
    waits for it and returns the box (and warp) values; flush(hh_stop)
    drains the one copy that is always left in flight when the march stops
    (every body iteration starts hh+1 and waits hh, and the pre-loop starts
    hh=0). Invalid gid rows (-1 padding) clamp to 0 — their fetch is
    harmless and never consumed."""

    def _copies(hh):
        h = jnp.clip(hh, 0, max_hit - 1)
        g = jnp.maximum(gid_ref[tile_i, h], 0)
        row = g // pack if pack > 1 else g
        p = jax.lax.rem(hh, 2)
        cs = [pltpu.make_async_copy(fp_box_ref.at[row], boxbuf.at[p], sem_box.at[p])]
        if fp_warp_ref is not None:
            cs.append(
                pltpu.make_async_copy(
                    fp_warp_ref.at[row], warpbuf.at[p], sem_warp.at[p]
                )
            )
        return cs, p, g

    def start(hh):
        cs, _, _ = _copies(hh)
        for c in cs:
            c.start()

    def get(hh):
        cs, p, g = _copies(hh)
        for c in cs:
            c.wait()
        if pack == 1:
            return boxbuf[p], (None if fp_warp_ref is None else warpbuf[p])
        # packed row: extract this candidate's lanes with a one-hot matmul
        # (one tiny MXU op per candidate; the march's sampling math then
        # sees exactly the unpacked layout)
        E = _pack_extract(jax.lax.rem(g, pack) * bsq, bsq)
        bx = jnp.dot(boxbuf[p], E, preferred_element_type=jnp.float32)
        wp = (
            None
            if fp_warp_ref is None
            else jnp.dot(warpbuf[p], E, preferred_element_type=jnp.float32)
        )
        return bx, wp

    def flush(hh_stop):
        cs, _, _ = _copies(hh_stop)
        for c in cs:
            c.wait()

    return start, get, flush


def _phase_march(
    scal_ref, box_src, acc, c4, c3,
    ox, oy, oz, dx, dy, dz, tmin, tmax,
    *, dt, fadescale, fadeexp, max_hit, nbuf, bs, rows,
):
    """March all needed candidates, accumulating density/color into the step
    buffers. Shared by the forward kernel and backward phase A. Returns
    (hh_stop, rmin, rmax). Terminates exactly (see module docstring).

    ``rows`` consecutive step rows are marched per loop iteration: the
    per-ray vectors arrive lane-tiled to width W = rows*T2 (tiled XLA-side —
    Mosaic cannot lane-concatenate in-kernel) so the trilinear sample is one
    wide MXU matmul and the VPU fade/mask work issues rows-at-a-time,
    amortizing loop and op overhead. Rows outside a candidate's slab
    interval mask to zero exactly as in the one-row formulation. The
    scan/termination state uses the untiled [0:T2] lane prefix."""
    t2 = acc.shape[-1]
    R = rows
    box_start, box_get, box_flush = box_src
    tmin_u = tmin[0:t2]
    tmax_u = tmax[0:t2]
    live = tmin_u < tmax_u
    dead = jnp.where(live, 0.0, 2.0)
    tmin_live_max = jnp.max(jnp.where(live, tmin_u, -jnp.inf))
    half = 0.5 * (bs - 1)
    rowoff = _rowoff(R, t2)

    def cond(carry):
        hh, tnext, r_scan, cum, rmin, rmax = carry
        boosted = cum + dead + jnp.where(tnext >= tmax_u, 2.0, 0.0)
        # Conservative saturation margin: the blocked scan sums 8 rows at a
        # time, which reorders the compositor's strictly row-sequential
        # accumulation. The densities are nonnegative, so when the true
        # sequential sum is < 1 the reorder error is bounded by
        # ~7 ulp(1) ≈ 4e-7 — a 1e-5 margin means rounding can only cause
        # extra marching, never a premature stop.
        return (hh < max_hit) & (tnext < 1e8) & (jnp.min(boosted) < 1.0 + 1e-5)

    def body(carry):
        hh, tnext, r_scan, cum, rmin, rmax = carry
        A, b = _read_affine(scal_ref, hh)
        oyv, dyv, tin, tout, seg, (r0i, r1i) = _prim_setup(
            A, b, ox, oy, oz, dx, dy, dz, tmin, tmax, dt, nbuf
        )
        rmin = jnp.where(r1i > r0i, jnp.minimum(rmin, r0i), rmin)
        rmax = jnp.where(r1i > r0i, jnp.maximum(rmax, r1i), rmax)
        box_start(hh + 1)
        boxT, warpT = box_get(hh)

        def rows_body(i, _):
            base = r0i + R * i
            rrf = base.astype(jnp.float32) + rowoff
            _, y0, y1, y2, fade, mask = _row_state(
                oyv, dyv, tmin, tmax, tin, tout, seg, rrf, dt,
                fadescale, fadeexp,
            )
            sampleT, _ = _sample_chain(boxT, warpT, y0, y1, y2, half, c4, c3)
            u = fade * dt * mask
            a = sampleT[3, :] * u
            rgba = jnp.concatenate(
                [sampleT[0:3, :] * a[None, :], a[None, :]], axis=0
            )  # [4, W]
            for r in range(R):
                rc = jnp.minimum(base + r, nbuf - 1)
                acc[rc] += rgba[:, r * t2 : (r + 1) * t2]
            return 0

        jax.lax.fori_loop(0, (r1i - r0i + R - 1) // R, rows_body, 0)

        nh = jnp.minimum(hh + 1, max_hit - 1)
        tnext2 = jnp.where(hh + 1 < max_hit, scal_ref[0, nh, 12], jnp.float32(1e9))
        # advance the saturation scan to the last row strictly before any
        # remaining candidate's earliest reachable ray parameter
        rhi = jnp.clip(
            jnp.floor((tnext2 - tmin_live_max) / dt), 0.0, float(nbuf)
        ).astype(jnp.int32)

        # advance the density scan in 8-row blocks (a serial row-by-row loop
        # here costs ~nbuf iterations per tile); rows outside [block start,
        # rhi2) are masked off, and the block base is clamped so the dynamic
        # slice never reads past nbuf (masking keeps clamped reads exact)
        rhi2 = jnp.maximum(rhi, r_scan)
        B = min(8, nbuf)
        srow = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

        def scan_blk(i, cum):
            start = r_scan + B * i
            base = jnp.maximum(jnp.minimum(start, nbuf - B), 0)
            rows = base + srow
            blk = acc[pl.ds(base, B), 3, :]  # [B, t2]
            blk = jnp.where((rows >= start) & (rows < rhi2), blk, 0.0)
            return cum + jnp.sum(blk, axis=0)

        cum = jax.lax.fori_loop(0, (rhi2 - r_scan + B - 1) // B, scan_blk, cum)
        return hh + 1, tnext2, rhi2, cum, rmin, rmax

    box_start(jnp.int32(0))
    t2f = jnp.zeros((t2,), jnp.float32)
    hh_stop, _, _, _, rmin, rmax = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), scal_ref[0, 0, 12], jnp.int32(0), t2f,
         jnp.int32(nbuf), jnp.int32(0)),
    )
    # exactly one fetch (index hh_stop) is still in flight when the loop
    # exits; drain it so the kernel ends with quiet semaphores
    box_flush(hh_stop)
    return hh_stop, jnp.minimum(rmin, rmax), rmax


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    *refs,
    dt, fadescale, fadeexp, max_hit, nbuf, bs, dowarp, rows, dma, pack=1,
    fwd_stop=2,
):
    """``fwd_stop`` mirrors the backward kernel's bwd_stop timing
    instrumentation (kbench --fwd-stop): 1 truncates after the march (the
    composite is replaced by a data-dependent probe so the march cannot be
    dead-coded; the OUTPUT IS WRONG), 2 is the full kernel."""
    if dma:
        gid_ref, scal_ref, o_ref, d_ref, mm_ref, fp_box_ref, *rest = refs
        if dowarp:
            (fp_warp_ref, out_ref, acc,
             boxbuf, sem_box, warpbuf, sem_warp) = rest
        else:
            out_ref, acc, boxbuf, sem_box = rest
            fp_warp_ref = warpbuf = sem_warp = None
        box_src = _box_src_dma(
            fp_box_ref, fp_warp_ref, gid_ref, pl.program_id(0),
            boxbuf, sem_box, warpbuf, sem_warp, max_hit,
            pack=pack, bsq=bs * bs,
        )
    else:
        scal_ref, o_ref, d_ref, mm_ref, boxes_ref, *rest = refs
        if dowarp:
            warps_ref, out_ref, acc = rest
        else:
            out_ref, acc = rest
            warps_ref = None
        box_src = _box_src_gathered(boxes_ref, warps_ref)
    t2 = acc.shape[-1]  # untiled tile size; refs are lane-tiled to rows*t2
    ox, oy, oz = o_ref[0, 0, :], o_ref[0, 1, :], o_ref[0, 2, :]
    dx, dy, dz = d_ref[0, 0, :], d_ref[0, 1, :], d_ref[0, 2, :]
    tmin = mm_ref[0, 0, :]
    tmax = mm_ref[0, 1, :]
    c4 = _col_consts(bs, 4)
    c3 = _col_consts(bs, 3)

    acc[...] = jnp.zeros_like(acc)
    _, rmin, rmax = _phase_march(
        scal_ref, box_src, acc, c4, c3,
        ox, oy, oz, dx, dy, dz, tmin, tmax,
        dt=dt, fadescale=fadescale, fadeexp=fadeexp,
        max_hit=max_hit, nbuf=nbuf, bs=bs, rows=rows,
    )

    if fwd_stop == 1:
        probe = acc[jnp.minimum(rmin, nbuf - 1), :, :]
        out_ref[0, :, :] = probe
        return

    def comp_body(rr, carry):
        cum, rgb0, rgb1, rgb2 = carry
        a = acc[rr, 3, :]
        new = cum + a
        contrib = jnp.minimum(new, 1.0) - jnp.minimum(cum, 1.0)
        scale = contrib / jnp.maximum(a, 1e-12)
        return (
            new,
            rgb0 + scale * acc[rr, 0, :],
            rgb1 + scale * acc[rr, 1, :],
            rgb2 + scale * acc[rr, 2, :],
        )

    zero = jnp.zeros((t2,), jnp.float32)
    cum, rgb0, rgb1, rgb2 = jax.lax.fori_loop(rmin, rmax, comp_body, (zero,) * 4)
    out_ref[0, 0, :] = rgb0
    out_ref[0, 1, :] = rgb1
    out_ref[0, 2, :] = rgb2
    out_ref[0, 3, :] = jnp.minimum(cum, 1.0)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    gid_ref,  # scalar-prefetch: [NT, MH] int32 (-1 = invalid)
    scal_ref, o_ref, d_ref, mm_ref, boxes_ref, *rest,
    dt, fadescale, fadeexp, max_hit, nbuf, bs, dowarp, rows, dma, pack=1,
    bwd_stop=4,
):
    """See module docstring. gbox/gaff (and gwarp with warp fields) are HBM
    accumulators aliased input->output; the sequential tile grid makes
    read-modify-write safe. With ``dma`` the boxes_ref argument is the flat
    HBM box table ([K, bs*4, BZY], indexed by this tile's gid row) instead
    of a per-tile VMEM block of gathered candidates.

    ``bwd_stop`` is timing instrumentation (kbench --bwd-stop): truncate the
    kernel after phase A (1), B (2), or C (3); 4 = the full kernel. Truncated
    variants write a data-dependent probe to the gradient accumulator so the
    compiler cannot dead-code the phases that did run — their gradients are
    WRONG and only the wall-clock is meaningful."""
    tile_i = pl.program_id(0)
    if dma:
        if dowarp:
            (fp_warp_ref, g_ref, _gb_in, _ga_in, _gw_in,
             gbox_out, gaff_out, gwarp_out,
             acc, comp, compw, dbuf, dafbuf, dwbuf, dbox, dafscr, dwarp,
             stage_box, stage_aff, stage_warp, sem_r, sem_w,
             boxbuf, sem_box, warpbuf, sem_warp, skipf, dafw) = rest
        else:
            (g_ref, _gb_in, _ga_in,
             gbox_out, gaff_out,
             acc, comp, compw, dbuf, dafbuf, dbox, dafscr,
             stage_box, stage_aff, sem_r, sem_w, boxbuf, sem_box,
             skipf, dafw) = rest
            fp_warp_ref = dwbuf = dwarp = stage_warp = gwarp_out = None
            warpbuf = sem_warp = None
        box_src = _box_src_dma(
            boxes_ref, fp_warp_ref, gid_ref, tile_i,
            boxbuf, sem_box, warpbuf, sem_warp, max_hit,
            pack=pack, bsq=bs * bs,
        )
    else:
        if dowarp:
            (warps_ref, g_ref, _gb_in, _ga_in, _gw_in,
             gbox_out, gaff_out, gwarp_out,
             acc, comp, compw, dbuf, dafbuf, dwbuf, dbox, dafscr, dwarp,
             stage_box, stage_aff, stage_warp, sem_r, sem_w, skipf,
             dafw) = rest
        else:
            (g_ref, _gb_in, _ga_in,
             gbox_out, gaff_out,
             acc, comp, compw, dbuf, dafbuf, dbox, dafscr,
             stage_box, stage_aff, sem_r, sem_w, skipf, dafw) = rest
            warps_ref = dwbuf = dwarp = stage_warp = gwarp_out = None
        box_src = _box_src_gathered(boxes_ref, warps_ref)
    t2 = acc.shape[-1]  # untiled tile size; refs are lane-tiled to rows*t2
    ox, oy, oz = o_ref[0, 0, :], o_ref[0, 1, :], o_ref[0, 2, :]
    dx, dy, dz = d_ref[0, 0, :], d_ref[0, 1, :], d_ref[0, 2, :]
    tmin = mm_ref[0, 0, :]
    tmax = mm_ref[0, 1, :]
    g0w, g1w, g2w = g_ref[0, 0, :], g_ref[0, 1, :], g_ref[0, 2, :]
    # untiled lane prefixes for the sequential phase-B scans
    g0, g1, g2, g3 = (g0w[0:t2], g1w[0:t2], g2w[0:t2], g_ref[0, 3, 0:t2])
    c4 = _col_consts(bs, 4)
    c3 = _col_consts(bs, 3)
    half = 0.5 * (bs - 1)

    # ---- phase A: rebuild the density/color step buffers ----
    acc[...] = jnp.zeros_like(acc)
    hh_stop, rmin, rmax = _phase_march(
        scal_ref, box_src, acc, c4, c3,
        ox, oy, oz, dx, dy, dz, tmin, tmax,
        dt=dt, fadescale=fadescale, fadeexp=fadeexp,
        max_hit=max_hit, nbuf=nbuf, bs=bs, rows=rows,
    )

    if bwd_stop == 1:
        stage_aff[0, 0, 0:128] = acc[0, 3, 0:128]
        cp = pltpu.make_async_copy(stage_aff.at[0], gaff_out.at[0], sem_w.at[1, 0])
        cp.start()
        cp.wait()
        return

    # ---- phase B: composite cotangents per row ----
    # forward scan: store contrib/a ("cscale") and post-row cumulative density
    def comp_fwd(rr, carry):
        cum, satrow = carry
        a = acc[rr, 3, :]
        new = cum + a
        contrib = jnp.minimum(new, 1.0) - jnp.minimum(cum, 1.0)
        comp[rr, 0, :] = contrib / jnp.maximum(a, 1e-12)
        comp[rr, 1, :] = new
        satrow = jnp.where((cum < 1.0) & (new >= 1.0), rr.astype(jnp.float32), satrow)
        return new, satrow

    cum_final, satrow = jax.lax.fori_loop(
        rmin, rmax, comp_fwd,
        (jnp.zeros((t2,), jnp.float32), jnp.full((t2,), float(nbuf), jnp.float32)),
    )
    q_final = (cum_final < 1.0).astype(jnp.float32)
    # All cotangents vanish past each ray's saturation row; rows beyond the
    # tile's last live saturation row can be skipped entirely in phase C.
    live = tmin[0:t2] < tmax[0:t2]
    tile_satrow = jnp.max(jnp.where(live, satrow, 0.0)) + 2.0
    tile_satrow_i = jnp.minimum(tile_satrow, float(nbuf)).astype(jnp.int32)

    # reverse scan: dL/da_r = -cscale_r * w_r + rev_r + g_a * q_final where
    # w_r = (g . c_r) / a_r and rev_r = sum_{p>=r} q_p (w_p - w_{p+1}).
    def comp_rev(i, carry):
        rev, w_next = carry
        rr = rmax - 1 - i
        a = acc[rr, 3, :]
        w = (g0 * acc[rr, 0, :] + g1 * acc[rr, 1, :] + g2 * acc[rr, 2, :]) / (
            jnp.maximum(a, 1e-12)
        )
        q = (comp[rr, 1, :] < 1.0).astype(jnp.float32)
        rev = rev + q * (w - w_next)
        comp[rr, 1, :] = -comp[rr, 0, :] * w + rev + g3 * q_final
        return rev, w

    zero = jnp.zeros((t2,), jnp.float32)
    jax.lax.fori_loop(0, rmax - rmin, comp_rev, (zero, zero))

    if bwd_stop == 2:
        stage_aff[0, 0, 0:128] = comp[0, 1, 0:128]
        cp = pltpu.make_async_copy(stage_aff.at[0], gaff_out.at[0], sem_w.at[1, 0])
        cp.start()
        cp.wait()
        return

    # ---- phase C: re-march, chain per-sample cotangents into VMEM buffers ----
    # Step rows are batched like phase A (width R*T2); the dbox/dafscr row
    # sums fall out of the W-axis matmul contractions for free. The comp
    # scratch is first relaid row-tiled (compw[b] packs rows b*R..b*R+R-1
    # side by side on the lane axis) so each batched iteration reads its R
    # rows of cotangents as one [2, W] vector — Mosaic cannot
    # lane-concatenate in-kernel. Rows outside [rmin, rmax) are zeroed
    # during the relayout (uninitialized scratch would inject NaN * 0), so
    # out-of-range rows contribute exactly nothing downstream.
    R = rows
    rowoff = _rowoff(R, t2)
    # Phase C samples with the UNPADDED consts (like the forward): the
    # padded build ran every z-weight table and vol matmul at the full BZY
    # width — 2x the contraction at bs=8 — only so dvolT landed at the
    # accumulators' 128-lane width. A static lane-slice accumulate into
    # dbox[:, :bs^2] costs nothing and halves the dominant phase-C matmuls.
    # (Values are identical either way: the padded rows hold zero data, so
    # they sample zero and their gradient lanes are dropped at unpack.)
    nzy = bs * bs

    def relayout(bb, _):
        for r in range(R):
            rr = bb * R + r
            rc = jnp.minimum(rr, nbuf - 1)
            ok = (rr >= rmin) & (rr < rmax)
            compw[bb, 0, r * t2:(r + 1) * t2] = jnp.where(ok, comp[rc, 0, :], 0.0)
            compw[bb, 1, r * t2:(r + 1) * t2] = jnp.where(ok, comp[rc, 1, :], 0.0)
        return 0

    jax.lax.fori_loop(rmin // R, (rmax + R - 1) // R, relayout, 0)

    box_start, box_get, box_flush = box_src

    def prim_bwd(hh, _):
        A, b = _read_affine(scal_ref, hh)
        oyv, dyv, tin, tout, seg, (r0i, r1i) = _prim_setup(
            A, b, ox, oy, oz, dx, dy, dz, tmin, tmax, dt, nbuf
        )
        box_start(hh + 1)
        boxT, warpT = box_get(hh)
        r1i = jnp.minimum(r1i, tile_satrow_i)
        # align the batch base to R so each iteration maps to one compw block
        r0a = (jnp.maximum(r0i, rmin) // R) * R
        blk0 = r0a // R
        # Candidate skip: a candidate whose clamped row range is empty (its
        # slab starts at/after the tile's last live saturation row, or it
        # never intersects [rmin, rmax)) contributes exactly zero cotangent
        # everywhere — skip its sampling loop AND its drain RMW round-trip.
        # Phase A marches conservatively past saturation (8-row scan blocks
        # + margins), so on dense scenes a tail of its candidates is dead
        # here. The DMA fetch protocol stays unconditional (ordering).
        live_c = r1i > r0a
        skipf[hh] = live_c.astype(jnp.int32)

        @pl.when(live_c)
        def _():
            dbox[...] = jnp.zeros_like(dbox)
            dafw[...] = jnp.zeros_like(dafw)
            if dowarp:
                dwarp[...] = jnp.zeros_like(dwarp)

        def rows_body(i, _):
            base = r0a + R * i
            rrf = base.astype(jnp.float32) + rowoff
            t, y0, y1, y2, fade, mask = _row_state(
                oyv, dyv, tmin, tmax, tin, tout, seg, rrf, dt,
                fadescale, fadeexp,
            )
            sampleT, saved = _sample_chain(boxT, warpT, y0, y1, y2, half, c4, c3)
            u = fade * dt * mask
            A_s = sampleT[3, :]
            cw = compw[blk0 + i]  # [2, W]; zero outside [rmin, rmax)
            csc = cw[0, :]
            da_r = cw[1, :]
            dldc0, dldc1, dldc2 = g0w * csc, g1w * csc, g2w * csc
            rgb_dot = (
                dldc0 * sampleT[0, :] + dldc1 * sampleT[1, :] + dldc2 * sampleT[2, :]
            )
            dS0 = dldc0 * A_s * u
            dS1 = dldc1 * A_s * u
            dS2 = dldc2 * A_s * u
            dS3 = (da_r + rgb_dot) * u
            g_u = (da_r + rgb_dot) * A_s  # dL/du

            dST = jnp.stack([dS0, dS1, dS2, dS3], axis=0)  # [4, W]
            dboxT, dwarpT, dy0s, dy1s, dy2s = _sample_chain_bwd(
                boxT, warpT, dST, saved, half, c4, c3
            )
            dbox[:, 0:nzy] += dboxT
            if dowarp:
                dwarp[:, 0:nzy] += dwarpT
            # fade path: dfade = g_u * dt * mask; dfade/dy = -fs*fe*|y|^(fe-1)*sign(y)*fade
            dfade = g_u * dt * mask
            c = -fadescale * fadeexp
            dy0 = dy0s + dfade * fade * c * _pow_abs(y0, fadeexp - 1) * jnp.sign(y0)
            dy1 = dy1s + dfade * fade * c * _pow_abs(y1, fadeexp - 1) * jnp.sign(y1)
            dy2 = dy2s + dfade * fade * c * _pow_abs(y2, fadeexp - 1) * jnp.sign(y2)

            # affine gradient: y = pos @ A + b; dA += pos^T dy, db += sum(dy).
            # Accumulated as 12 elementwise FMA rows (dafw[i*3+j] +=
            # pos4_i * dy_j) instead of a [4, W] @ [W, 3] dot_general: that
            # matmul runs a full W-length MXU contraction for a 3-lane
            # output every row batch — the single worst matmul shape in
            # phase C. The W reduction happens once per candidate below.
            pos4 = jnp.stack(
                [ox + dx * t, oy + dy * t, oz + dz * t, jnp.ones_like(t)],
                axis=0,
            )
            dyT = jnp.stack([dy0, dy1, dy2], axis=0)
            w = pos4.shape[-1]
            rep_pos = jnp.broadcast_to(pos4[:, None, :], (4, 3, w)).reshape(12, w)
            rep_dy = jnp.broadcast_to(dyT[None, :, :], (4, 3, w)).reshape(12, w)
            dafw[0:12] += rep_pos * rep_dy
            return 0

        @pl.when(live_c)
        def _():
            jax.lax.fori_loop(0, (r1i - r0a + R - 1) // R, rows_body, 0)
            # fold the per-lane affine partials down to [16, 128]
            # (sublane-grouped sum over W/128 lane blocks — fully aligned
            # stores; Mosaic cannot store scalars to VMEM). The final
            # 128-lane reduction happens host-side in XLA after the drain
            # (_bwd_impl sums gaff's lane axis).
            w = dafw.shape[-1]
            dafscr[...] = jnp.sum(dafw[...].reshape(16, w // 128, 128), axis=1)
            dbuf[hh] = dbox[...]
            dafbuf[hh] = dafscr[...]
            if dowarp:
                dwbuf[hh] = dwarp[...]

        return 0

    box_start(jnp.int32(0))
    jax.lax.fori_loop(0, hh_stop, prim_bwd, 0)
    box_flush(hh_stop)

    if bwd_stop == 3:
        stage_aff[0, 0, 0:128] = dbuf[0, 0, 0:128]
        cp = pltpu.make_async_copy(stage_aff.at[0], gaff_out.at[0], sem_w.at[1, 0])
        cp.start()
        cp.wait()
        return

    # ---- drain: fold per-tile gradient buffers into the HBM accumulators ----
    if pack == 1:
        # Pipelined RMW: candidate hh+1's row reads are issued while hh's
        # accumulate/write runs, and a write is only waited when its stage
        # slot is reused two candidates later — the HBM round-trip latency
        # hides behind the neighboring candidates' work instead of being
        # paid serially per candidate. Safe because gids are distinct
        # within a tile (top_k emits each prim at most once), so in-flight
        # writes never alias the next read's rows; the end-of-loop waits
        # order everything before the next tile touches shared rows (the
        # grid is sequential, but Mosaic does not fence DMAs across
        # iterations).
        def gid_at(h):
            return gid_ref[tile_i, jnp.clip(h, 0, max_hit - 1)]

        def live_at(h):
            # valid gid AND produced a nonzero gradient in phase C (skipped
            # candidates have no dbuf entry and nothing to accumulate)
            return (gid_at(h) >= 0) & (skipf[jnp.clip(h, 0, max_hit - 1)] > 0)

        def rmw_copies(h, p, sem):
            g = jnp.maximum(gid_at(h), 0)
            dirs = [(gbox_out.at[g], stage_box.at[p], 0),
                    (gaff_out.at[g], stage_aff.at[p], 1)]
            if dowarp:
                dirs.append((gwarp_out.at[g], stage_warp.at[p], 2))
            if sem is sem_w:  # writes go stage -> HBM
                return [
                    pltpu.make_async_copy(st, hbm, sem.at[i, p])
                    for hbm, st, i in dirs
                ]
            return [
                pltpu.make_async_copy(hbm, st, sem.at[i, p])
                for hbm, st, i in dirs
            ]

        # hh_stop >= 1 is required, not just gid validity: an all-dead tile
        # has hh_stop == 0 with a valid gid 0, and an issued-but-never-waited
        # read would leave semaphore counts mispaired for the next grid step
        @pl.when((hh_stop >= 1) & live_at(0))
        def _():
            for c in rmw_copies(0, 0, sem_r):
                c.start()

        def drain(hh, _):
            p = jax.lax.rem(hh, 2)
            q = 1 - p

            # slot q is candidate hh-1's; its writes must land before the
            # slot (and, same-row-wise, nothing else) is reused for hh+1
            @pl.when((hh >= 1) & live_at(hh - 1))
            def _():
                for c in rmw_copies(hh - 1, q, sem_w):
                    c.wait()

            @pl.when((hh + 1 < hh_stop) & live_at(hh + 1))
            def _():
                for c in rmw_copies(hh + 1, q, sem_r):
                    c.start()

            @pl.when(live_at(hh))
            def _():
                for c in rmw_copies(hh, p, sem_r):
                    c.wait()
                stage_box[p] += dbuf[hh]
                stage_aff[p] += dafbuf[hh]
                if dowarp:
                    stage_warp[p] += dwbuf[hh]
                for c in rmw_copies(hh, p, sem_w):
                    c.start()

            return 0

        jax.lax.fori_loop(0, hh_stop, drain, 0)
        # Exactly one write can still be in flight: candidate hh_stop-1's
        # (iteration hh waits write hh-1, so all earlier ones were waited).

        @pl.when((hh_stop >= 1) & live_at(hh_stop - 1))
        def _():
            for c in rmw_copies(
                hh_stop - 1, jax.lax.rem(hh_stop - 1, 2), sem_w
            ):
                c.wait()

    else:
        # Packed rows (pack > 1): two same-tile candidates may share a
        # packed gbox/gwarp row, so the RMW stays strictly sequential —
        # each iteration's write completes before the next read. gaff
        # stays per-prim (its [8, 128] rows are never packed).
        def drain(hh, _):
            gid = gid_ref[tile_i, hh]

            @pl.when((gid >= 0) & (skipf[hh] > 0))
            def _():
                # scatter the local gradient to the candidate's lane
                # offset inside its packed row before the RMW
                row = gid // pack
                S = _pack_scatter(jax.lax.rem(gid, pack) * (bs * bs), bs * bs)
                dval = jax.lax.dot_general(
                    dbuf[hh], S, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cp1 = pltpu.make_async_copy(
                    gbox_out.at[row], stage_box.at[0], sem_r.at[0, 0]
                )
                cp1.start()
                cp3 = pltpu.make_async_copy(
                    gaff_out.at[gid], stage_aff.at[0], sem_r.at[1, 0]
                )
                cp3.start()
                cp1.wait()
                stage_box[0] += dval
                cp2 = pltpu.make_async_copy(
                    stage_box.at[0], gbox_out.at[row], sem_w.at[0, 0]
                )
                cp2.start()
                cp3.wait()
                stage_aff[0] += dafbuf[hh]
                cp2.wait()
                cp4 = pltpu.make_async_copy(
                    stage_aff.at[0], gaff_out.at[gid], sem_w.at[1, 0]
                )
                cp4.start()
                cp4.wait()
                if dowarp:
                    dw = jax.lax.dot_general(
                        dwbuf[hh], S, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    cp5 = pltpu.make_async_copy(
                        gwarp_out.at[row], stage_warp.at[0], sem_r.at[2, 0]
                    )
                    cp5.start()
                    cp5.wait()
                    stage_warp[0] += dw
                    cp6 = pltpu.make_async_copy(
                        stage_warp.at[0], gwarp_out.at[row], sem_w.at[2, 0]
                    )
                    cp6.start()
                    cp6.wait()

            return 0

        jax.lax.fori_loop(0, hh_stop, drain, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _bspec(block, space=None):
    kw = {} if space is None else dict(memory_space=space)
    return pl.BlockSpec(block, lambda i, *_refs: (i,) + (0,) * (len(block) - 1), **kw)


def _forward_pallas(scal, t_o, t_d, t_mm, c_box, c_warp, cfg):
    """Gathered-candidate forward: per-tile candidate boxes arrive as
    pipelined VMEM blocks (XLA gathered them up front)."""
    ntiles, tsz = t_o.shape[0], t_o.shape[2]
    mh, bs = scal.shape[1], cfg["bs"]
    R = cfg["rows"]
    dowarp = c_warp is not None
    kernel = partial(
        _fwd_kernel, dt=cfg["dt"], fadescale=cfg["fadescale"],
        fadeexp=cfg["fadeexp"], max_hit=mh, nbuf=cfg["nbuf"], bs=bs,
        dowarp=dowarp, rows=R, dma=False, fwd_stop=cfg.get("fwd_stop", 2),
    )
    # lane-tile the per-ray vectors R times so the kernel marches R step
    # rows per iteration as one W = R*tsz wide register (Mosaic cannot
    # lane-concatenate in-kernel); untiled values are [0:tsz] prefixes
    t_o, t_d, t_mm = (jnp.tile(x, (1, 1, R)) for x in (t_o, t_d, t_mm))
    in_specs = [
        _bspec((1, mh, 16), pltpu.SMEM),
        _bspec((1, 3, R * tsz)),
        _bspec((1, 3, R * tsz)),
        _bspec((1, 2, R * tsz)),
        _bspec((1, mh, bs * 4, _bzy(bs))),
    ]
    args = [scal, t_o, t_d, t_mm, c_box]
    if dowarp:
        in_specs.append(_bspec((1, mh, bs * 3, _bzy(bs))))
        args.append(c_warp)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=_bspec((1, 4, tsz)),
        out_shape=jax.ShapeDtypeStruct((ntiles, 4, tsz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cfg["nbuf"], 4, tsz), jnp.float32),
        ],
        interpret=cfg["interpret"],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)


def _forward_pallas_dma(gid_sp, scal, t_o, t_d, t_mm, fp_boxT, fp_warpT, cfg):
    """DMA-candidate forward: the kernel fetches each candidate's box from
    the flat HBM table while marching the previous one (see _box_src_dma).
    Tiles are chunked so the scalar-prefetched gid table fits SMEM."""
    ntiles, tsz = t_o.shape[0], t_o.shape[2]
    mh, bs = scal.shape[1], cfg["bs"]
    R = cfg["rows"]
    dowarp = fp_warpT is not None
    kernel = partial(
        _fwd_kernel, dt=cfg["dt"], fadescale=cfg["fadescale"],
        fadeexp=cfg["fadeexp"], max_hit=mh, nbuf=cfg["nbuf"], bs=bs,
        dowarp=dowarp, rows=R, dma=True, pack=cfg.get("pack", 1),
        fwd_stop=cfg.get("fwd_stop", 2),
    )
    t_o, t_d, t_mm = (jnp.tile(x, (1, 1, R)) for x in (t_o, t_d, t_mm))
    chunk = max(1, min(ntiles, (256 * 1024) // (mh * 4)))
    nchunks = -(-ntiles // chunk)
    outs = []
    for i in range(nchunks):
        sl = slice(i * chunk, min((i + 1) * chunk, ntiles))
        nt_c = t_o[sl].shape[0]
        in_specs = [
            _bspec((1, mh, 16), pltpu.SMEM),
            _bspec((1, 3, R * tsz)),
            _bspec((1, 3, R * tsz)),
            _bspec((1, 2, R * tsz)),
            pl.BlockSpec(memory_space=pl.ANY),  # flat HBM box table
        ]
        args = [gid_sp[sl], scal[sl], t_o[sl], t_d[sl], t_mm[sl], fp_boxT]
        scratch = [
            pltpu.VMEM((cfg["nbuf"], 4, tsz), jnp.float32),
            pltpu.VMEM((2, bs * 4, _bzy(bs)), jnp.float32),  # boxbuf
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if dowarp:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            args.insert(6, fp_warpT)
            scratch += [
                pltpu.VMEM((2, bs * 3, _bzy(bs)), jnp.float32),  # warpbuf
                pltpu.SemaphoreType.DMA((2,)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt_c,),
            in_specs=in_specs,
            out_specs=_bspec((1, 4, tsz)),
            scratch_shapes=scratch,
        )
        outs.append(
            pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nt_c, 4, tsz), jnp.float32),
                interpret=cfg["interpret"],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*args)
        )
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _backward_pallas(gid_sp, scal, t_o, t_d, t_mm, c_box, c_warp, g_tiles, nk,
                     cfg, dma=False):
    """Runs the backward kernel over tile chunks (the scalar-prefetched gid
    table must fit SMEM), threading the HBM gradient accumulators through the
    chunk calls by input/output aliasing. With ``dma``, c_box/c_warp are the
    FLAT per-image box/warp tables ([K, ...]) the kernel DMA-fetches from,
    not per-tile gathers."""
    ntiles, tsz = t_o.shape[0], t_o.shape[2]
    mh, bs = scal.shape[1], cfg["bs"]
    nbuf = cfg["nbuf"]
    R = cfg["rows"]
    dowarp = c_warp is not None
    pack = cfg.get("pack", 1) if dma else 1
    kernel = partial(
        _bwd_kernel, dt=cfg["dt"], fadescale=cfg["fadescale"],
        fadeexp=cfg["fadeexp"], max_hit=mh, nbuf=nbuf, bs=bs, dowarp=dowarp,
        rows=R, dma=dma, pack=pack, bwd_stop=cfg.get("bwd_stop", 4),
    )
    # lane-tile the per-ray vectors and the incoming cotangent (see
    # _forward_pallas)
    t_o, t_d, t_mm, g_tiles = (
        jnp.tile(x, (1, 1, R)) for x in (t_o, t_d, t_mm, g_tiles)
    )
    nk_rows = nk // pack  # packed tables carry P boxes per row
    gbox = jnp.zeros((nk_rows, bs * 4, _bzy(bs)), jnp.float32)
    gaff = jnp.zeros((nk, 16, 128), jnp.float32)
    gwarp = (
        jnp.zeros((nk_rows, bs * 3, _bzy(bs)), jnp.float32) if dowarp else None
    )

    # SMEM holds ~1MB of prefetched scalars; keep each chunk's gid table small.
    chunk = max(1, min(ntiles, (256 * 1024) // (mh * 4)))
    nchunks = -(-ntiles // chunk)

    def call(args):
        if dowarp:
            (gid_c, scal_c, o_c, d_c, mm_c, box_c, warp_c, g_c,
             gbox_c, gaff_c, gwarp_c) = args
        else:
            gid_c, scal_c, o_c, d_c, mm_c, box_c, g_c, gbox_c, gaff_c = args
        nt_c = o_c.shape[0]
        in_specs = [
            _bspec((1, mh, 16), pltpu.SMEM),
            _bspec((1, 3, R * tsz)),
            _bspec((1, 3, R * tsz)),
            _bspec((1, 2, R * tsz)),
            pl.BlockSpec(memory_space=pl.ANY)  # flat HBM box table
            if dma
            else _bspec((1, mh, bs * 4, _bzy(bs))),
        ]
        if dowarp:
            in_specs.append(
                pl.BlockSpec(memory_space=pl.ANY)
                if dma
                else _bspec((1, mh, bs * 3, _bzy(bs)))
            )
        in_specs.append(_bspec((1, 4, R * tsz)))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # gbox acc
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # gaff acc
        out_specs = [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((nk_rows, bs * 4, _bzy(bs)), jnp.float32),
            jax.ShapeDtypeStruct((nk, 16, 128), jnp.float32),
        ]
        scratch = [
            pltpu.VMEM((nbuf, 4, tsz), jnp.float32),  # acc
            pltpu.VMEM((nbuf, 2, tsz), jnp.float32),  # comp (cscale, da)
            pltpu.VMEM((-(-nbuf // R), 2, R * tsz), jnp.float32),  # compw
            pltpu.VMEM((mh, bs * 4, _bzy(bs)), jnp.float32),  # dbuf
            pltpu.VMEM((mh, 16, 128), jnp.float32),  # dafbuf
        ]
        if dowarp:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # gwarp acc
            out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
            out_shape.append(
                jax.ShapeDtypeStruct((nk_rows, bs * 3, _bzy(bs)), jnp.float32)
            )
            scratch.append(pltpu.VMEM((mh, bs * 3, _bzy(bs)), jnp.float32))  # dwbuf
        scratch.append(pltpu.VMEM((bs * 4, _bzy(bs)), jnp.float32))  # dbox
        scratch.append(pltpu.VMEM((16, 128), jnp.float32))  # dafscr
        if dowarp:
            scratch.append(pltpu.VMEM((bs * 3, _bzy(bs)), jnp.float32))  # dwarp
        # double-buffered RMW stages (slot axis 2) for the pipelined drain
        scratch.append(pltpu.VMEM((2, bs * 4, _bzy(bs)), jnp.float32))  # stage_box
        scratch.append(pltpu.VMEM((2, 16, 128), jnp.float32))  # stage_aff
        if dowarp:
            scratch.append(pltpu.VMEM((2, bs * 3, _bzy(bs)), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((3, 2)))  # sem_r [table, slot]
        scratch.append(pltpu.SemaphoreType.DMA((3, 2)))  # sem_w
        if dma:
            scratch.append(pltpu.VMEM((2, bs * 4, _bzy(bs)), jnp.float32))  # boxbuf
            scratch.append(pltpu.SemaphoreType.DMA((2,)))  # sem_box
            if dowarp:
                scratch.append(pltpu.VMEM((2, bs * 3, _bzy(bs)), jnp.float32))
                scratch.append(pltpu.SemaphoreType.DMA((2,)))  # sem_warp
        scratch.append(pltpu.SMEM((mh,), jnp.int32))  # skipf (phase-C skip)
        # per-candidate affine-gradient partials [12, W]: the A/b cotangent
        # accumulates as elementwise FMAs instead of a [4, W] @ [W, 3]
        # matmul per row batch (a full W-length MXU contraction for a
        # 3-lane output — the worst shape in phase C); reduced across W
        # once per candidate.
        scratch.append(pltpu.VMEM((16, R * tsz), jnp.float32))  # dafw
        # inputs: gid(0) scal(1) o(2) d(3) mm(4) box(5) [warp(6)] g gbox gaff [gwarp]
        base = 7 if dowarp else 6
        aliases = {base + 1: 0, base + 2: 1}
        if dowarp:
            aliases[base + 3] = 2
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt_c,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shape),
            input_output_aliases=aliases,
            interpret=cfg["interpret"],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",), has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*args)

    for i in range(nchunks):
        sl = slice(i * chunk, min((i + 1) * chunk, ntiles))
        box_c = c_box if dma else c_box[sl]  # flat table is chunk-invariant
        warp_c = c_warp if dma else (None if c_warp is None else c_warp[sl])
        if dowarp:
            gbox, gaff, gwarp = call(
                (gid_sp[sl], scal[sl], t_o[sl], t_d[sl], t_mm[sl], box_c,
                 warp_c, g_tiles[sl], gbox, gaff, gwarp)
            )
        else:
            gbox, gaff = call(
                (gid_sp[sl], scal[sl], t_o[sl], t_d[sl], t_mm[sl], box_c,
                 g_tiles[sl], gbox, gaff)
            )
    return gbox, gaff, gwarp


# ---------------------------------------------------------------------------
# custom VJP plumbing
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_raymarch(cfg_key):
    cfg = dict(cfg_key)
    dowarp = cfg["dowarp"]

    def _fwd_impl(raypos, raydir, tminmax, prim_mask, primpos, primrot,
                  primscale, template, warp):
        n, K = primpos.shape[0], primpos.shape[1]
        bs = template.shape[2]
        t_o, t_d, t_mm, cand_gid, cand_valid, cand_tstart, meta = _tile_and_cull(
            raypos, raydir, tminmax,
            jax.lax.stop_gradient(primpos), jax.lax.stop_gradient(primscale),
            jax.lax.stop_gradient(prim_mask),
            cfg["tile"], cfg["max_hit"], cfg["dt"],
            cull_group_size=cfg["cull_group_size"],
            cull_max_groups=cfg["cull_max_groups"],
            two_stage=cfg["two_stage_cull"],
        )
        mh = cand_gid.shape[1]
        pack = _pack_factor(bs, K)
        # pack > 1 requires the DMA path: the gathered path would index an
        # unpacked flat table, whose 8x lane padding is what packing exists
        # to avoid (the 262,144-prim shapes OOM on it)
        dma = cfg["candidates"] == "dma" or pack > 1
        fp_pos = primpos.reshape(n * K, 3)
        fp_rot = primrot.reshape(n * K, 9)
        fp_scale = primscale.reshape(n * K, 3)
        fp_boxT = _flatten_volT(
            template.reshape(n * K, bs, bs, bs, 4), bs, 4, pack
        )
        fp_warpT = (
            None if warp is None
            else _flatten_volT(warp.reshape(n * K, bs, bs, bs, 3), bs, 3, pack)
        )
        scal, c_box, c_warp = _gather_and_pack(
            fp_pos, fp_rot, fp_scale, None if dma else fp_boxT, cand_gid,
            cand_valid, cand_tstart, mh, bs, None if dma else fp_warpT
        )
        if dma:
            out_tiles = _forward_pallas_dma(
                cand_gid, scal, t_o, t_d, t_mm, fp_boxT, fp_warpT,
                {**cfg, "bs": bs, "pack": pack}
            )
        else:
            out_tiles = _forward_pallas(
                scal, t_o, t_d, t_mm, c_box, c_warp, {**cfg, "bs": bs}
            )
        out = _untile(out_tiles, meta, cfg["tile"])
        # residuals hold only the small culling results; the big per-tile
        # gathers (scal, c_box, c_warp) are rebuilt in the backward pass
        res = (t_o, t_d, t_mm, cand_gid, cand_valid, cand_tstart,
               primpos, primrot, primscale, template, warp, meta)
        return out, res

    def _bwd_impl(res, g):
        (t_o, t_d, t_mm, cand_gid, cand_valid, cand_tstart,
         primpos, primrot, primscale, template, warp, meta) = res
        n, K = primpos.shape[0], primpos.shape[1]
        bs = template.shape[2]
        tile = cfg["tile"]
        pack = _pack_factor(bs, K)
        fp_pos = jax.lax.stop_gradient(primpos).reshape(n * K, 3)
        fp_rot = jax.lax.stop_gradient(primrot).reshape(n * K, 9)
        fp_scale = jax.lax.stop_gradient(primscale).reshape(n * K, 3)
        fp_boxT = _flatten_volT(
            jax.lax.stop_gradient(template).reshape(n * K, bs, bs, bs, 4),
            bs, 4, pack
        )
        fp_warpT = (
            None if warp is None
            else _flatten_volT(
                jax.lax.stop_gradient(warp).reshape(n * K, bs, bs, bs, 3),
                bs, 3, pack
            )
        )
        mh = cand_gid.shape[1]
        dma = cfg["candidates"] == "dma" or pack > 1
        scal, c_box, c_warp = _gather_and_pack(
            fp_pos, fp_rot, fp_scale, None if dma else fp_boxT, cand_gid,
            cand_valid, cand_tstart, mh, bs, None if dma else fp_warpT
        )

        # Tile the incoming cotangent exactly like the forward inputs.
        gp = jnp.zeros((n, meta["hp"], meta["wp"], 4), g.dtype)
        gp = gp.at[:, : meta["h"], : meta["w"], :].set(g)
        g_tiles = (
            gp.reshape(n, meta["nty"], tile, meta["ntx"], tile, 4)
            .transpose(0, 1, 3, 5, 2, 4)
            .reshape(meta["ntiles"], 4, tile * tile)
        ).astype(jnp.float32)

        # One backward sweep per batch element keeps the HBM gradient
        # accumulators at [K, ...] instead of [N*K, ...].
        tpe = meta["ntiles"] // n  # tiles per image
        gboxes, gaffs, gwarps = [], [], []
        for b in range(n):
            sl = slice(b * tpe, (b + 1) * tpe)
            gid_local = jnp.where(
                cand_valid[sl], cand_gid[sl] - b * K, -1
            ).astype(jnp.int32)
            if dma:
                kr = K // pack  # table rows per batch item
                box_b = fp_boxT[b * kr : (b + 1) * kr]
                warp_b = None if fp_warpT is None else fp_warpT[b * kr : (b + 1) * kr]
            else:
                box_b = c_box[sl]
                warp_b = None if c_warp is None else c_warp[sl]
            gbox_b, gaff_b, gwarp_b = _backward_pallas(
                gid_local, scal[sl], t_o[sl], t_d[sl], t_mm[sl], box_b,
                warp_b, g_tiles[sl], K, {**cfg, "bs": bs, "pack": pack},
                dma=dma,
            )
            gboxes.append(gbox_b)
            gaffs.append(gaff_b)
            gwarps.append(gwarp_b)
        gbox = jnp.stack(gboxes)  # [N, K/pack, bs*4, BZY]
        gaff = jnp.stack(gaffs)  # [N, K, 8, 128]

        if pack > 1:
            d_template = _unflatten_grad(
                gbox.reshape(n * K // pack, bs * 4, 128), bs, 4, pack
            ).reshape(n, K, bs, bs, bs, 4)
        else:
            d_template = gbox[:, :, :, : bs * bs].transpose(0, 1, 3, 2).reshape(
                n, K, bs, bs, bs, 4
            )
        d_warp = None
        if warp is not None:
            gw = jnp.stack(gwarps)
            if pack > 1:
                d_warp = _unflatten_grad(
                    gw.reshape(n * K // pack, bs * 3, 128), bs, 3, pack
                ).reshape(n, K, bs, bs, bs, 3)
            else:
                d_warp = gw[:, :, :, : bs * bs].transpose(
                    0, 1, 3, 2
                ).reshape(n, K, bs, bs, bs, 3)
        # gaff rows hold the 12 affine cotangents as 128 per-lane partials
        # (row i*3+j = dA[i][j] for i<3, rows 9:12 = db); the kernel's
        # reduction stops at the lane level (aligned VMEM stores only), so
        # the final lane sum happens here in XLA.
        aff12 = jnp.sum(gaff, axis=-1)  # [N, K, 16]
        dA = aff12[..., 0:9].reshape(gaff.shape[0], gaff.shape[1], 3, 3)
        db = aff12[..., 9:12]
        _, pack_vjp = jax.vjp(_pack_affine, primpos, primrot, primscale)
        d_pos, d_rot, d_scale = pack_vjp((dA, db))
        zeros_ray = (
            jnp.zeros((meta["n"], meta["h"], meta["w"], 3), jnp.float32),
            jnp.zeros((meta["n"], meta["h"], meta["w"], 3), jnp.float32),
            jnp.zeros((meta["n"], meta["h"], meta["w"], 2), jnp.float32),
            jnp.zeros((meta["n"], primpos.shape[1]), jnp.float32),  # prim_mask
        )
        return zeros_ray + (d_pos, d_rot, d_scale, d_template) + (
            (d_warp,) if dowarp else ()
        )

    if dowarp:

        @jax.custom_vjp
        def march(raypos, raydir, tminmax, prim_mask, primpos, primrot,
                  primscale, template, warp):
            out, _ = _fwd_impl(raypos, raydir, tminmax, prim_mask, primpos,
                               primrot, primscale, template, warp)
            return out

        march.defvjp(_fwd_impl, _bwd_impl)
        return march

    @jax.custom_vjp
    def march(raypos, raydir, tminmax, prim_mask, primpos, primrot, primscale,
              template):
        out, _ = _fwd_impl(raypos, raydir, tminmax, prim_mask, primpos,
                           primrot, primscale, template, None)
        return out

    def _fwd7(raypos, raydir, tminmax, prim_mask, primpos, primrot, primscale,
              template):
        return _fwd_impl(raypos, raydir, tminmax, prim_mask, primpos, primrot,
                         primscale, template, None)

    march.defvjp(_fwd7, _bwd_impl)
    return march


def mvp_raymarch_pallas(*args, interpret=None, **kwargs):
    """Dispatcher: runs the Mosaic kernels on TPU, the Pallas interpreter
    elsewhere (CPU tests / virtual meshes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mvp_raymarch_pallas_jit(*args, interpret=interpret, **kwargs)


@partial(
    jax.jit,
    static_argnames=(
        "stepsize", "fadescale", "fadeexp", "tile", "max_hit", "nbuf",
        "interpret", "rows", "cull_group_size", "cull_max_groups",
        "two_stage_cull", "candidates", "bwd_stop", "fwd_stop",
    ),
)
def _mvp_raymarch_pallas_jit(
    raypos: jnp.ndarray,
    raydir: jnp.ndarray,
    stepsize: float,
    tminmax: jnp.ndarray,
    primpos: jnp.ndarray,
    primrot: jnp.ndarray,
    primscale: jnp.ndarray,
    template: jnp.ndarray,
    warp: Optional[jnp.ndarray] = None,
    prim_mask: Optional[jnp.ndarray] = None,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    tile: int = 16,
    max_hit: int = 64,
    nbuf: Optional[int] = None,
    interpret: bool = False,
    rows: int = 4,
    cull_group_size: int = 256,
    cull_max_groups: int = 8,
    two_stage_cull: Optional[bool] = None,
    candidates: str = "dma",
    bwd_stop: int = 4,
    fwd_stop: int = 2,
    **_unused,
) -> jnp.ndarray:
    bs_check = template.shape[2]
    if (
        bs_check < 2
        or (bs_check & (bs_check - 1)) != 0
        or _bzy(bs_check) % bs_check != 0
    ):
        raise ValueError(
            "pallas backend needs a power-of-two primsize >= 2 with "
            f"ceil(primsize^2, 128) divisible by primsize, got {bs_check}. "
            "bs=2 (the reference's 262,144-prim shape) through bs=8 (the "
            "flagship) are oracle-tested."
        )
    if nbuf is None:
        # cover the [-1,1]^3 cube diagonal (raydirs clamps tminmax to it)
        nbuf = _ceil_to(int(2.0 * 3.0**0.5 / float(stepsize)) + 4, 8)
    # the step buffers hold nbuf rows: truncate the march there so any
    # overflow is a shorter range (oracle max_steps semantics), never a
    # mis-composited image
    tminmax = jnp.stack(
        [
            tminmax[..., 0],
            jnp.minimum(tminmax[..., 1], tminmax[..., 0] + nbuf * float(stepsize)),
        ],
        axis=-1,
    )
    primrot = primrot.reshape(primrot.shape[0], primrot.shape[1], 3, 3)
    cfg_key = tuple(
        sorted(
            dict(
                dt=float(stepsize), fadescale=float(fadescale),
                fadeexp=float(fadeexp), tile=int(tile), max_hit=int(max_hit),
                nbuf=int(nbuf), interpret=bool(interpret), rows=int(rows),
                dowarp=warp is not None,
                cull_group_size=int(cull_group_size),
                cull_max_groups=int(cull_max_groups),
                two_stage_cull=(
                    None if two_stage_cull is None else bool(two_stage_cull)
                ),
                candidates=str(candidates),
                bwd_stop=int(bwd_stop),
                fwd_stop=int(fwd_stop),
            ).items()
        )
    )
    march = _make_raymarch(cfg_key)
    if prim_mask is None:
        prim_mask = jnp.ones(primpos.shape[:2], jnp.float32)
    else:
        prim_mask = prim_mask.astype(jnp.float32)
    if warp is not None:
        return march(raypos, raydir, tminmax, prim_mask, primpos, primrot,
                     primscale, template, warp)
    return march(raypos, raydir, tminmax, prim_mask, primpos, primrot,
                 primscale, template)
