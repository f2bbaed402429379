"""2D grid sampling and bilinear resize (pure JAX, NHWC).

Semantics match the samplers the reference model relies on:
- ``grid_sample_2d`` = torch.nn.functional.grid_sample(mode="bilinear",
  padding_mode="zeros") with selectable align_corners (used for the identity
  warp field, reference models/encoders/identity.py:64-65, and for sampling
  predicted geometry maps back to vertices, models/decoders/geometry.py:178-179).
- ``resize_bilinear`` = torch F.interpolate(mode="bilinear",
  align_corners=False), i.e. half-pixel-center resampling.

All gathers are expressed as jnp.take on flattened spatial indices so XLA
lowers them to efficient dynamic-gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear grid sample with zero padding.

    Args:
        img: [N, H, W, C]
        grid: [N, Ho, Wo, 2] with (x, y) in [-1, 1]; x indexes W, y indexes H.
        align_corners: coordinate convention (see module docstring).

    Returns:
        [N, Ho, Wo, C]
    """
    n, h, w, c = img.shape
    x = _unnormalize(grid[..., 0], w, align_corners)
    y = _unnormalize(grid[..., 1], h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xi: jnp.ndarray, yi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mask = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yc * w + xc  # [N, Ho, Wo]
        flat_img = img.reshape(n, h * w, c)
        vals = jnp.take_along_axis(
            flat_img, flat_idx.reshape(n, -1, 1), axis=1
        ).reshape(flat_idx.shape + (c,))
        return vals, mask.astype(img.dtype)[..., None]

    v00, m00 = corner(x0, y0)
    v01, m01 = corner(x1, y0)
    v10, m10 = corner(x0, y1)
    v11, m11 = corner(x1, y1)

    out = (
        v00 * m00 * (wx0 * wy0)[..., None]
        + v01 * m01 * (wx1 * wy0)[..., None]
        + v10 * m10 * (wx0 * wy1)[..., None]
        + v11 * m11 * (wx1 * wy1)[..., None]
    )
    return out


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (align_corners=False).

    img: [N, H, W, C] -> [N, out_hw[0], out_hw[1], C]
    """
    n, _, _, c = img.shape
    return jax.image.resize(
        img, (n, out_hw[0], out_hw[1], c), method="bilinear", antialias=False
    )
