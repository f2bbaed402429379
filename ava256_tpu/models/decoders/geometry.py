# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Geometry decoder: opacity slabs, predicted mesh vertices, and per-primitive
SRT (scale/rotation/translation) residual motion.

A transposed-conv tower upsamples the concatenated [expression ‖ identity]
code from 4x4 to a 1024^2 x boxsize opacity slab, adding the identity bias
pyramid at every matching level (scaled by 1/sqrt(2)). Two early-exit heads
branch off the tower: a 9-channel motion map at ``motion_size`` (one SRT
residual per primitive) and a 3-channel geometry image at ``geo_size`` that is
sampled back to mesh vertices through precomputed per-vertex UV coordinates.

Capability parity with the reference decoder
(reference: models/decoders/geometry.py:17-187); NHWC layouts.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.grid_sample import grid_sample_2d
from ava256_tpu.ops.layers import (
    LEAKY_GAIN,
    Conv2dWN,
    ConvTranspose2dWN,
    leaky_relu,
)


def vertex_uv_coords(uv: np.ndarray, tri: np.ndarray, uvtri: np.ndarray, nvtx: int) -> np.ndarray:
    """Per-vertex UV sampling coordinates in [-1, 1].

    For each mesh vertex, picks the first UV coordinate any face assigns to it
    (vertices on UV seams have several; one is used, mirroring the reference's
    nMaxUVsPerVertex=1 contract, reference: models/decoders/geometry.py:102-123).

    Returns [nvtx, 1, 2] float32.
    """
    uvspervert = np.zeros((nvtx,), dtype=np.int64)
    seen = np.zeros((nvtx,), dtype=bool)
    # First (face, corner) occurrence wins, scanning faces in order.
    for fi in range(tri.shape[0]):
        for fv in range(3):
            v = tri[fi, fv]
            if not seen[v]:
                uvspervert[v] = uvtri[fi, fv]
                seen[v] = True
    coords = uv[uvspervert].astype(np.float32) * 2.0 - 1.0
    return coords[:, None, :]


def _tower_sizes(imsize: int, inch: int, boxsize: int) -> List[int]:
    """Deconv tower channel schedule. 1024 matches the reference exactly
    (reference: models/decoders/geometry.py:69-74); smaller sizes truncate the
    schedule so every level (except the final slab) aligns with the identity
    encoder's bias pyramid channels — unlike the reference's vestigial 512
    branch, whose biases could never have matched its own encoder."""
    if imsize == 1024:
        return [inch, 256, 128, 128, 64, 64, 32, 16, boxsize]
    if imsize == 512:
        return [inch, 128, 128, 64, 64, 32, 16, boxsize]
    if imsize == 256:
        return [inch, 128, 64, 64, 32, 16, boxsize]
    raise ValueError(f"Unsupported image size: {imsize}")


class GeometryDecoder(nn.Module):
    uv: Any  # np.ndarray [Nt, 2] texcoords
    tri: Any  # np.ndarray [F, 3] vertex indices
    uvtri: Any  # np.ndarray [F, 3] texcoord indices
    nvtx: int
    motion_size: int
    geo_size: int
    imsize: int
    nboxes: int
    boxsize: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, ex_enc: jnp.ndarray, id_enc: jnp.ndarray, id_bias: List[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """
        Args:
            ex_enc: [N, 4, 4, 16] expression code.
            id_enc: [N, 4, 4, 16] identity code.
            id_bias: identity bias pyramid, deepest (8x8) first.

        Returns:
            opacity: [N, K, bs, bs, bs, 1]
            geo: [N, nvtx, 3] normalized predicted vertices
            primposresid / primrvecresid: [N, K, 3]
            primscaleresid: [N, K, 3]
        """
        n = ex_enc.shape[0]
        sizes = _tower_sizes(self.imsize, 32, self.boxsize)
        nlayers = len(sizes) - 1

        z = leaky_relu(
            Conv2dWN(16, 1, gain=LEAKY_GAIN, dtype=self.dtype, name="encmod")(ex_enc)
        )
        x = jnp.concatenate([z, id_enc], axis=-1)

        mot = None
        geo_map = None
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        # Bias levels are matched by spatial size (the pyramid may be shorter
        # than the tower when the encoder ran at a lower resolution).
        bias_by_size = {b.shape[1]: b for b in id_bias}
        for i in range(nlayers):
            is_last = i == nlayers - 1
            xx = ConvTranspose2dWN(
                sizes[i + 1],
                kernel_size=4,
                strides=2,
                padding=1,
                gain=1.0 if is_last else LEAKY_GAIN,
                dtype=self.dtype,
                name=f"t{i}",
            )(x)
            if not is_last:
                xx = leaky_relu(xx)

            b = bias_by_size.get(xx.shape[1])
            if b is not None and b.shape[-1] == xx.shape[-1]:
                x = (xx + b) * inv_sqrt2
            else:
                # final slab has boxsize channels vs 3 in the bias
                x = xx

            if x.shape[1] == self.motion_size:
                m = leaky_relu(
                    Conv2dWN(64, 1, gain=LEAKY_GAIN, dtype=self.dtype, name="motion0")(x)
                )
                mot = Conv2dWN(9, 1, gain=1.0, dtype=self.dtype, name="motion1")(m)
            if x.shape[1] == self.geo_size:
                gmap = leaky_relu(
                    Conv2dWN(64, 1, gain=LEAKY_GAIN, dtype=self.dtype, name="geo0")(x)
                )
                geo_map = Conv2dWN(3, 1, gain=1.0, dtype=self.dtype, name="geo1")(gmap)

        if mot is None or geo_map is None:
            raise ValueError("motion/geo early-exit sizes never matched the tower")

        bias = self.param(
            "slab_bias", nn.initializers.zeros, (self.imsize, self.imsize, self.boxsize)
        )
        opacity_slab = jnp.exp((x + bias[None]) * 0.1)

        # Motion map -> per-primitive SRT residuals (row-major prim order).
        mot = mot.reshape(n, self.nboxes, 9)
        primposresid = mot[..., 0:3] * 0.01
        primrvecresid = mot[..., 3:6] * 0.01
        primscaleresid = jnp.exp(0.01 * mot[..., 6:9])

        # Geometry image -> vertices via per-vertex UV sampling.
        coords = jnp.asarray(
            vertex_uv_coords(
                np.asarray(self.uv), np.asarray(self.tri), np.asarray(self.uvtri), self.nvtx
            )
        )
        coords = jnp.broadcast_to(coords[None], (n,) + coords.shape)
        # packed=False: sparse per-vertex sampling — the 4-gather form never
        # materializes the 4x neighbor image (see ops/grid_sample.py).
        geo = grid_sample_2d(
            geo_map, coords, align_corners=False, packed=False
        )  # [N, nvtx, 1, 3]
        geo = jnp.mean(geo, axis=2)

        # Slab -> [N, K, bs, bs, bs, 1] boxes: depth from channels, box rows/
        # cols from the 8x8 patch under each primitive's slab cell.
        bs = self.boxsize
        nh = int(np.sqrt(self.nboxes))
        opacity = opacity_slab.reshape(n, nh, bs, nh, bs, bs)
        opacity = opacity.transpose(0, 1, 3, 5, 2, 4)  # [N, hy, hx, z, by, bx]
        opacity = opacity.reshape(n, self.nboxes, bs, bs, bs, 1)

        return opacity, geo, primposresid, primrvecresid, primscaleresid
