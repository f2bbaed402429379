# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Expression encoder.

Encodes per-frame deltas (vertices minus neutral vertices rasterized as a
geometry image; average texture minus neutral average texture) through conv
towers into a [N, 4, 4, 64] expression code. Capability parity with the
reference encoder (reference: models/encoders/expression.py:19-102); layouts
are NHWC and the conv stacks run on the MXU via XLA.

The encoder's KL-regularized latent makes the expression space smooth and
consistent across captures; it is discarded after training (headset signals
drive the decoder in deployment).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.geomap import generate_geomap
from ava256_tpu.ops.layers import ConvSeq


def _conv(features: int, k: int = 4, s: int = 2, p: int = 1) -> dict:
    return dict(features=features, kernel_size=k, strides=s, padding=p)


class ExpressionEncoder(nn.Module):
    """uv_tidx/uv_bary: per-texel triangle corner indices and barycentrics
    ([3, M, M]) produced by geometry.create_uv_baridx."""

    uv_tidx: Any  # np.ndarray [3, M, M]
    uv_bary: Any  # np.ndarray [3, M, M]
    channel_mult: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        verts: jnp.ndarray,
        avgtex: jnp.ndarray,
        neut_verts: jnp.ndarray,
        neut_avgtex: jnp.ndarray,
    ) -> jnp.ndarray:
        """
        Args:
            verts / neut_verts: [N, V, 3] normalized vertices.
            avgtex / neut_avgtex: [N, H, W, 3] normalized textures (NHWC).

        Returns:
            [N, 4, 4, 64] expression code.
        """
        C = self.channel_mult
        geo_img = generate_geomap(verts - neut_verts, self.uv_tidx, self.uv_bary)
        tex_img = avgtex - neut_avgtex

        ConvSeqR = nn.remat(ConvSeq)
        tex = ConvSeqR(
            [_conv(16 * C), _conv(32 * C), _conv(64 * C)],
            final_activation=True,
            dtype=self.dtype,
            s2d_max_ch=64,
            name="tex",
        )(tex_img)
        geo = ConvSeqR(
            [_conv(16 * C), _conv(32 * C), _conv(32 * C)],
            final_activation=True,
            dtype=self.dtype,
            s2d_max_ch=64,
            name="geo",
        )(geo_img)

        # Combiner downsamples imsize/8 -> 4. The 1024 case reproduces the
        # reference stack exactly (reference: models/encoders/expression.py:66-74);
        # smaller power-of-two inputs truncate the leading stride-2 convs.
        import math

        imsize = avgtex.shape[1]
        n_down = int(math.log2(imsize)) - 5
        if n_down < 1 or 2 ** (n_down + 5) != imsize:
            raise ValueError(f"Unsupported image size: {imsize}")
        lead = [128 * C, 256 * C, 256 * C, 512 * C][: n_down - 1]
        comb = ConvSeqR(
            [_conv(ch) for ch in lead]
            + [
                _conv(256 * C, k=3, s=1, p=1),
                _conv(128 * C, k=3, s=1, p=1),
                _conv(64 * C, k=3, s=1, p=1),
                _conv(64),
            ],
            final_activation=True,
            dtype=self.dtype,
            name="comb",
        )(jnp.concatenate([tex, geo], axis=-1))
        return comb
