# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Camera-ray generation (pure vectorized JAX; no kernel needed on TPU).

TPU-native equivalent of the reference's CUDA extension
(reference: extensions/utils/utils_kernel.cu:12-52 and extensions/utils/
utils.py:21-51): per-pixel ray direction through the pinhole model, camera
position scaled to volume units, and slab-test tminmax against the [-1, 1]^3
volume cube. The reference's backward kernel is a no-op stub (it never
returns gradients), so the whole op is wrapped in stop_gradient.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_raydirs(
    viewpos: jnp.ndarray,
    viewrot: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    pixelcoords: jnp.ndarray,
    volradius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build rays for a batch of cameras.

    Args:
        viewpos: [N, 3] camera positions (world units).
        viewrot: [N, 3, 3] camera rotation matrices (world-to-camera rows).
        focal: [N, 2] focal lengths in pixels.
        princpt: [N, 2] principal points in pixels.
        pixelcoords: [N, H, W, 2] pixel coordinates to trace.
        volradius: world-units radius mapped to the unit volume cube.

    Returns:
        raypos: [N, H, W, 3] ray origins in volume units.
        raydir: [N, H, W, 3] unit ray directions.
        tminmax: [N, H, W, 2] entry/exit distances for the [-1,1]^3 cube,
            with tmin clamped to >= 0.
    """
    p = (pixelcoords - princpt[:, None, None, :]) / focal[:, None, None, :]
    d = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)  # [N,H,W,3]
    # raydir = R^T @ d == sum_i rows(R)_i * d_i
    raydir = jnp.einsum("nij,nhwi->nhwj", viewrot, d)
    raydir = raydir / jnp.sqrt(jnp.sum(raydir**2, axis=-1, keepdims=True))

    raypos = (viewpos / volradius)[:, None, None, :] * jnp.ones_like(raydir)

    t1 = (-1.0 - raypos) / raydir
    t2 = (1.0 - raypos) / raydir
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    tminmax = jnp.stack([jnp.maximum(tmin, 0.0), tmax], axis=-1)

    return (
        jax.lax.stop_gradient(raypos),
        jax.lax.stop_gradient(raydir),
        jax.lax.stop_gradient(tminmax),
    )
