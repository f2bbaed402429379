# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Reference (oracle) MVP raymarcher in pure JAX.

This is the semantic ground truth for all production raymarchers, mirroring
the reference's pure-PyTorch gradcheck marcher (reference:
extensions/mvpraymarch/mvpraymarch.py:567-626) and the CUDA kernel semantics
(extensions/mvpraymarch/mvpraymarch_subset_kernel.h:14-100):

For each ray, march fixed steps of ``stepsize`` from tmin to tmax. At each
step, every primitive k contributes:

    y      = primscale_k * ((pos - primpos_k) @ primrot_k)      (local coords)
    fade   = exp(-fadescale * sum(|y|^fadeexp))
    valid  = all(|y| <= 1) and (tmin <= t < tmax)
    sample = trilinear(template_k, warp_k(y) or y)   (align_corners=True)
    alpha  = sample_a * fade * stepsize * valid
    contrib = min(acc_alpha + alpha, 1) - acc_alpha              (saturating)
    rgba  += contrib * [sample_rgb, 1]

Gradients flow to template, warp, primpos, primrot, primscale via JAX AD.
This implementation is O(K * steps) per ray — use it for correctness tests
and small scenes; the production paths live in raymarch_xla / raymarch_pallas.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def grid_sample_3d(
    vol: jnp.ndarray, coords: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """Trilinear sampling of a volume with zero padding.

    Args:
        vol: [D, H, W, C] volume (channels last).
        coords: [..., 3] normalized (x, y, z) in [-1, 1]; x indexes W,
            y indexes H, z indexes D.

    Returns:
        [..., C]
    """
    d, h, w, c = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    if align_corners:
        fx = (x + 1.0) / 2.0 * (w - 1)
        fy = (y + 1.0) / 2.0 * (h - 1)
        fz = (z + 1.0) / 2.0 * (d - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) / 2.0
        fy = ((y + 1.0) * h - 1.0) / 2.0
        fz = ((z + 1.0) * d - 1.0) / 2.0

    x0f, y0f, z0f = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    wx1, wy1, wz1 = fx - x0f, fy - y0f, fz - z0f

    flat = vol.reshape(-1, c)

    def corner(dx: int, dy: int, dz: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        xi = x0f + dx
        yi = y0f + dy
        zi = z0f + dz
        mask = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1) & (zi >= 0) & (zi <= d - 1)
        )
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        idx = (zc * h + yc) * w + xc
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))
        wgt = (
            jnp.where(dx == 1, wx1, 1.0 - wx1)
            * jnp.where(dy == 1, wy1, 1.0 - wy1)
            * jnp.where(dz == 1, wz1, 1.0 - wz1)
        )
        return vals * mask[..., None], wgt

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                vals, wgt = corner(dx, dy, dz)
                out = out + vals * wgt[..., None]
    return out


def mvp_raymarch_reference(
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
    max_steps: Optional[int] = None,
    within_step: str = "sequential",
) -> jnp.ndarray:
    """Oracle raymarcher.

    The reference CUDA accumulator applies each hitbox's saturating
    contribution in whatever order the warp processes them, which is
    undefined without sortprims (reference: extensions/mvpraymarch/
    mvpraymarch.py:339-342); ``within_step`` picks a deterministic member of
    that family: "sequential" composites prims in index order inside a step
    (the sorted-CUDA behaviour), "summed" adds all primitive densities at a
    step before saturating (the Pallas kernel's order-independent rule). The
    two differ only when a ray saturates inside a step covered by several
    primitives.

    Args:
        raypos: [N, H, W, 3] ray origins (volume units).
        raydir: [N, H, W, 3] unit directions.
        stepsize: scalar step in volume units.
        tminmax: [N, H, W, 2].
        primpos: [N, K, 3]; primrot: [N, K, 3, 3] (columns are local axes);
        primscale: [N, K, 3] inverse half-extents.
        template: [N, K, D, H, W, 4] channels-last RGBA boxes.
        warp: optional [N, K, D, H, W, 3] channels-last warp volumes.

    Returns:
        rayrgba [N, H, W, 4].
    """
    n, K = primpos.shape[0], primpos.shape[1]
    tmin, tmax = tminmax[..., 0], tminmax[..., 1]
    if max_steps is None:
        max_steps = 1024

    sample_vol = jax.vmap(jax.vmap(grid_sample_3d))  # [N,K,D,H,W,C],[N,K,...,3]

    def step_fn(i, acc):
        t = tmin + stepsize * i  # [N,H,W]
        pos = raypos + raydir * t[..., None]  # [N,H,W,3]
        tvalid = ((t >= tmin) & (t < tmax)).astype(raypos.dtype)[..., None]

        # Local coords for all prims: [N, K, H, W, 3]
        rel = pos[:, None] - primpos[:, :, None, None]
        y0 = (
            jnp.einsum("nkhwi,nkij->nkhwj", rel, primrot)
            * primscale[:, :, None, None]
        )
        fade = jnp.exp(
            -fadescale * jnp.sum(jnp.abs(y0) ** fadeexp, axis=-1, keepdims=True)
        )
        inbox = jnp.all((y0 >= -1.0) & (y0 <= 1.0), axis=-1, keepdims=True).astype(
            raypos.dtype
        )

        if warp is not None:
            y1 = sample_vol(warp, y0)
        else:
            y1 = y0
        sample = sample_vol(template, y1)  # [N,K,H,W,4]

        rgb = sample[..., 0:3]
        alpha = sample[..., 3:4] * fade * stepsize * inbox * tvalid[:, None]

        if within_step == "summed":
            acc_a = acc[..., 3:4]
            total = jnp.sum(alpha, axis=1)  # [N, H, W, 1]
            contrib = jnp.minimum(acc_a + total, 1.0) - jnp.minimum(acc_a, 1.0)
            share = contrib / jnp.maximum(total, 1e-12)
            crgb = jnp.sum(alpha * rgb, axis=1) * share
            return acc + jnp.concatenate([crgb, contrib], axis=-1)

        def prim_fn(k, acc):
            acc_a = acc[..., 3:4]
            newalpha = acc_a + alpha[:, k]
            contrib = (jnp.minimum(newalpha, 1.0) - acc_a) * inbox[:, k] * tvalid
            return acc + contrib * jnp.concatenate(
                [rgb[:, k], jnp.ones_like(acc_a)], axis=-1
            )

        return jax.lax.fori_loop(0, K, prim_fn, acc)

    init = jnp.zeros(raypos.shape[:-1] + (4,), dtype=raypos.dtype)
    return jax.lax.fori_loop(0, max_steps, step_fn, init)
