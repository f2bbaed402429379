# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
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

from typing import Optional, Tuple

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
    packed: Optional[bool] = None,
) -> jnp.ndarray:
    """Bilinear grid sample with zero padding.

    Args:
        img: [N, H, W, C]
        grid: [N, Ho, Wo, 2] with (x, y) in [-1, 1]; x indexes W, y indexes H.
        align_corners: coordinate convention (see module docstring).
        packed: pack the 2x2 neighborhood into channels so the sample is ONE
            gather (and its transpose ONE scatter-add) instead of four. TPU
            gathers/scatters are row-serialized, so 4x fewer rows is ~4x
            faster backward; the cost is a transient 4C-wide neighbor image.
            Default (None) enables packing when the output has at least as
            many pixels as a quarter of the input (dense resampling); the
            sparse case (e.g. per-vertex sampling of a large map) keeps the
            4-gather form, which never materializes the 4x image.

    Returns:
        [N, Ho, Wo, C]
    """
    n, h, w, c = img.shape
    x = _unnormalize(grid[..., 0], w, align_corners)
    y = _unnormalize(grid[..., 1], h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    if packed is None:
        ho_wo = int(grid.shape[1]) * int(grid.shape[2])
        packed = 4 * ho_wo >= h * w
        # The packed path materializes a [n, h+1, w+1, 4c] neighbor image —
        # once in forward and again when recomputed under jax.checkpoint.
        # Cap the transient so wide batch/channel configs fall back to the
        # 4-gather form instead of OOMing HBM.
        nb_bytes = 4 * n * (h + 1) * (w + 1) * 4 * c
        packed = packed and nb_bytes <= 512 * 1024 * 1024

    if packed:
        # Zero-pad one pixel on every side and pack each pixel's 2x2
        # neighborhood into channels: a corner that falls in the padding
        # reads an exact zero, which IS the zeros padding-mode semantics, so
        # no per-corner masks are needed. Only samples more than one pixel
        # outside the image need the single all-corners-invalid mask.
        ipad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
        nb = jnp.concatenate(
            [ipad[:, :-1, :-1], ipad[:, :-1, 1:],
             ipad[:, 1:, :-1], ipad[:, 1:, 1:]],
            axis=-1,
        )  # [n, h+1, w+1, 4c]; (yi, xi) holds corners (yi-1+{0,1}, xi-1+{0,1})
        inr = (
            (x0 >= -1.0) & (x0 <= w - 1.0) & (y0 >= -1.0) & (y0 <= h - 1.0)
        )
        xi = jnp.clip(x0 + 1.0, 0, w).astype(jnp.int32)
        yi = jnp.clip(y0 + 1.0, 0, h).astype(jnp.int32)
        flat_idx = yi * (w + 1) + xi  # [N, Ho, Wo]
        vals = jnp.take_along_axis(
            nb.reshape(n, (h + 1) * (w + 1), 4 * c),
            flat_idx.reshape(n, -1, 1),
            axis=1,
        ).reshape(flat_idx.shape + (4 * c,))
        v00 = vals[..., 0 * c : 1 * c]
        v01 = vals[..., 1 * c : 2 * c]
        v10 = vals[..., 2 * c : 3 * c]
        v11 = vals[..., 3 * c : 4 * c]
        out = (
            v00 * (wx0 * wy0)[..., None]
            + v01 * (wx1 * wy0)[..., None]
            + v10 * (wx0 * wy1)[..., None]
            + v11 * (wx1 * wy1)[..., None]
        )
        return out * inr.astype(out.dtype)[..., None]

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
    v01, m01 = corner(x0 + 1.0, y0)
    v10, m10 = corner(x0, y0 + 1.0)
    v11, m11 = corner(x0 + 1.0, y0 + 1.0)

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
