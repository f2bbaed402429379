# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Single-volume step raymarcher (un-fused correctness baseline).

Capability parity with the reference's pure-torch step raymarcher
(reference: models/raymarchers/stepraymarcher.py:19-64): marches a single
warped template volume with fixed steps, supporting additive (saturating)
and multiplicative ("multaccum", alpha-compositing) accumulation. Used as a
baseline/debugging renderer; the MVP raymarchers handle production work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ava256_tpu.ops.raymarch_ref import grid_sample_3d


def step_raymarch(
    raypos: jnp.ndarray,  # [N, H, W, 3]
    raydir: jnp.ndarray,  # [N, H, W, 3]
    stepsize: float,
    tminmax: jnp.ndarray,  # [N, H, W, 2]
    template: jnp.ndarray,  # [N, D, Hh, Ww, 4] single RGBA volume
    warp: Optional[jnp.ndarray] = None,  # [N, D, Hh, Ww, 3]
    accum: str = "add",  # "add" (saturating) | "mult" (alpha compositing)
    max_steps: int = 1024,
) -> jnp.ndarray:
    """Returns rayrgba [N, H, W, 4]."""
    tmin, tmax = tminmax[..., 0], tminmax[..., 1]
    sample_vol = jax.vmap(grid_sample_3d)

    def step_fn(i, carry):
        rgba, trans = carry
        t = tmin + stepsize * i
        pos = raypos + raydir * t[..., None]
        valid = ((t >= tmin) & (t < tmax)).astype(raypos.dtype)[..., None]
        inbox = jnp.all((pos >= -1.0) & (pos <= 1.0), axis=-1, keepdims=True).astype(
            raypos.dtype
        )
        coords = sample_vol(warp, pos) if warp is not None else pos
        sample = sample_vol(template, coords)
        alpha = sample[..., 3:4] * stepsize * valid * inbox
        rgb = sample[..., 0:3]

        if accum == "add":
            acc_a = rgba[..., 3:4]
            contrib = jnp.minimum(acc_a + alpha, 1.0) - acc_a
            rgba = rgba + contrib * jnp.concatenate([rgb, jnp.ones_like(alpha)], -1)
            return rgba, trans
        # multiplicative: front-to-back alpha compositing with transmittance
        a = jnp.clip(alpha, 0.0, 1.0)
        contrib = trans * a
        rgba = rgba + contrib * jnp.concatenate([rgb, jnp.ones_like(a)], -1)
        return rgba, trans * (1.0 - a)

    init = (
        jnp.zeros(raypos.shape[:-1] + (4,), raypos.dtype),
        jnp.ones(raypos.shape[:-1] + (1,), raypos.dtype),
    )
    rgba, _ = jax.lax.fori_loop(0, max_steps, step_fn, init)
    return rgba
