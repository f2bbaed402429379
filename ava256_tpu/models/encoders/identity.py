# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Identity encoder.

Encodes a subject's neutral geometry image and neutral average texture into
identity codes (z_geo / z_tex, each [N, 4, 4, 16]) and two 8-level bias
pyramids (8^2 ... 1024^2 with channels [256,128,128,64,64,32,16,3]). A learned
low-resolution warp field is applied to every pyramid level via bilinear
grid sampling, letting the decoder's untextured lattice adapt to each
identity's facial layout.

Capability parity with the reference encoder
(reference: models/encoders/identity.py:17-164); NHWC layouts throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.geomap import generate_geomap
from ava256_tpu.ops.grid_sample import grid_sample_2d, resize_bilinear
from ava256_tpu.ops.layers import LEAKY_GAIN, Conv2dWN, leaky_relu

# Encoder tower / bias pyramid channel schedules (1024^2 reference inputs use
# all 8 levels; smaller power-of-two inputs truncate the schedule).
_ESIZE = [3, 16, 32, 64, 64, 128, 128, 256, 256]
_BSIZE = [3, 16, 32, 64, 64, 128, 128, 256, 256]


class UnetEncoder(nn.Module):
    """Downsampling encoder emitting a latent code and a bias pyramid.

    For 1024^2 input: returns (z [N,4,4,16], biases deepest-first:
    [N,8,8,256] ... [N,1024,1024,3]).
    """

    channel_mult: int = 1
    dtype: Optional[Any] = None
    # Downsampling convs whose input has fewer channels than this run as one
    # space-to-depth im2col matmul (exact; see ops/layers._conv_s2d_4x4s2) —
    # the lane-starved 1024^2 x (3..32)-channel levels are the dominant
    # non-march cost of the training step.
    s2d_max_ch: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        C = self.channel_mult
        imsize = x.shape[1]
        nlayers = int(np.log2(imsize)) - 2  # downsample to 4x4
        if 2 ** (nlayers + 2) != imsize or nlayers < 1 or nlayers > len(_ESIZE) - 1:
            raise ValueError(f"Unsupported image size: {imsize}")
        esize = [_ESIZE[0]] + [c * C for c in _ESIZE[1 : nlayers + 1]]

        biases: List[jnp.ndarray] = []
        for i in range(nlayers):
            # Bias tap from the *input* of level i: 1x1 conv; levels > 0 are
            # followed by a leaky relu (and initialized accordingly).
            b = Conv2dWN(
                features=_BSIZE[i],
                kernel_size=1,
                gain=LEAKY_GAIN if i > 0 else 1.0,
                dtype=self.dtype,
                name=f"b{i}",
            )(x)
            if i > 0:
                b = leaky_relu(b)
            biases.insert(0, b)

            x = Conv2dWN(
                features=esize[i + 1],
                kernel_size=4,
                strides=2,
                padding=1,
                gain=LEAKY_GAIN,
                dtype=self.dtype,
                s2d=x.shape[-1] < self.s2d_max_ch,
                name=f"e{i}",
            )(x)
            x = leaky_relu(x)

        z = Conv2dWN(features=16, kernel_size=1, gain=1.0, dtype=self.dtype, name="enc")(x)
        return z, biases

    @staticmethod
    def bias_channels(imsize: int) -> List[int]:
        nlayers = int(np.log2(imsize)) - 2
        return list(reversed(_BSIZE[:nlayers]))


class GeoTexCombiner(nn.Module):
    """Cross-talk between geometry and texture bias pyramids via 1x1 convs."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, b_geo: List[jnp.ndarray], b_tex: List[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        out_geo, out_tex = [], []
        for i in range(len(b_geo)):
            sg = b_geo[i].shape[-1]
            st = b_tex[i].shape[-1]
            t2g = leaky_relu(
                Conv2dWN(sg, 1, gain=LEAKY_GAIN, dtype=self.dtype, name=f"t2g{i}")(b_tex[i])
            )
            g2t = leaky_relu(
                Conv2dWN(st, 1, gain=LEAKY_GAIN, dtype=self.dtype, name=f"g2t{i}")(b_geo[i])
            )
            cg = jnp.concatenate([b_geo[i], t2g], axis=-1)
            ct = jnp.concatenate([b_tex[i], g2t], axis=-1)
            out_geo.append(
                leaky_relu(Conv2dWN(sg, 1, gain=LEAKY_GAIN, dtype=self.dtype, name=f"g{i}")(cg))
            )
            out_tex.append(
                leaky_relu(Conv2dWN(st, 1, gain=LEAKY_GAIN, dtype=self.dtype, name=f"t{i}")(ct))
            )
        return out_geo, out_tex


class IdentityEncoder(nn.Module):
    uv_tidx: Any  # np.ndarray [3, M, M]
    uv_bary: Any  # np.ndarray [3, M, M]
    wsize: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, neut_verts: jnp.ndarray, neut_avgtex: jnp.ndarray
    ) -> Dict[str, Union[jnp.ndarray, List[jnp.ndarray]]]:
        """
        Args:
            neut_verts: [N, V, 3] normalized neutral vertices.
            neut_avgtex: [N, 1024, 1024, 3] normalized neutral texture (NHWC).

        Returns:
            {"z_geo", "z_tex": [N,4,4,16], "b_geo", "b_tex": bias pyramids}
        """
        geo_img = generate_geomap(neut_verts, self.uv_tidx, self.uv_bary)

        UnetEncoderR = nn.remat(UnetEncoder)
        z_geo, b_geo = UnetEncoderR(dtype=self.dtype, name="geo")(geo_img)
        z_tex, b_tex = UnetEncoderR(dtype=self.dtype, name="tex")(neut_avgtex)
        b_geo, b_tex = GeoTexCombiner(dtype=self.dtype, name="comb")(b_geo, b_tex)

        # Learned warp: identity grid + trainable bias (scaled by 1/wsize).
        xs = np.linspace(-1.0, 1.0, self.wsize, dtype=np.float32)
        xg, yg = np.meshgrid(xs, xs)
        identity_grid = jnp.asarray(np.stack([xg, yg], axis=-1)[None])  # [1,w,w,2]
        bias = self.param(
            "warp_bias", nn.initializers.zeros, (1, self.wsize, self.wsize, 2)
        )
        warp = identity_grid + bias / self.wsize

        # The warp is a model parameter: one field shared by every batch item
        # and both pyramids. Pack (geo ‖ tex ‖ batch) into the channel axis and
        # sample each resolution once, so the gather — and its scatter-add
        # transpose in the backward pass — runs over H*W rows of wide data
        # instead of 2*N*H*W rows of thin, lane-padded data. TPU gathers and
        # scatters are row-serialized, so row count, not bytes, is the cost.
        # Checkpointed: the corner gathers at 512^2/1024^2 otherwise pin
        # several hundred MB of residuals.
        @jax.checkpoint
        def apply_warp_packed(
            geo: jnp.ndarray, tex: jnp.ndarray, warp: jnp.ndarray
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
            n, h, w, cg = geo.shape
            ct = tex.shape[-1]
            packed = jnp.concatenate(
                [
                    geo.transpose(1, 2, 0, 3).reshape(h, w, n * cg),
                    tex.transpose(1, 2, 0, 3).reshape(h, w, n * ct),
                ],
                axis=-1,
            )[None]
            grid = resize_bilinear(warp, (h, w))
            out = grid_sample_2d(packed, grid, align_corners=False, packed=True)[0]
            geo_out = out[..., : n * cg].reshape(h, w, n, cg).transpose(2, 0, 1, 3)
            tex_out = out[..., n * cg :].reshape(h, w, n, ct).transpose(2, 0, 1, 3)
            return geo_out, tex_out

        warped = [
            apply_warp_packed(g, t, warp) for g, t in zip(b_geo, b_tex)
        ]
        b_geo = [g for g, _ in warped]
        b_tex = [t for _, t in warped]

        return {"z_geo": z_geo, "z_tex": z_tex, "b_geo": b_geo, "b_tex": b_tex}
