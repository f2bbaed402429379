# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""RGB decoder: per-primitive color volumes with view conditioning.

Same transposed-conv tower pattern as the geometry decoder; the input code is
additionally conditioned on the (normalized) viewing direction through a small
MLP, enabling view-dependent appearance. The 1024^2 x (boxsize*3) output slab
is reshaped to [N, K, bs, bs, bs, 3] box colors.

Capability parity with the reference decoder (reference: models/decoders/rgb.py:16-145).
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.layers import (
    LEAKY_GAIN,
    Conv2dWN,
    ConvTranspose2dWN,
    LinearWN,
    leaky_relu,
)
from ava256_tpu.models.decoders.geometry import _tower_sizes


class RGBDecoder(nn.Module):
    imsize: int
    nboxes: int
    boxsize: int
    outch: int = 3
    viewcond: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        ex_code: jnp.ndarray,
        id_code: jnp.ndarray,
        id_biases: List[jnp.ndarray],
        view: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """
        Args:
            ex_code/id_code: [N, 4, 4, 16].
            id_biases: texture bias pyramid, deepest first.
            view: [N, 3] normalized view direction (required if viewcond).

        Returns:
            [N, K, bs, bs, bs, outch] box colors (pre-denormalization).
        """
        n = ex_code.shape[0]
        inch = 32 + (8 if self.viewcond else 0)
        sizes = _tower_sizes(self.imsize, inch, self.boxsize * self.outch)
        nlayers = len(sizes) - 1

        z = leaky_relu(
            Conv2dWN(16, 1, gain=LEAKY_GAIN, dtype=self.dtype, name="encmod")(ex_code)
        )
        x = jnp.concatenate([z, id_code], axis=-1)

        if self.viewcond:
            assert view is not None, "viewcond=True requires a view direction"
            v = leaky_relu(
                LinearWN(16, gain=LEAKY_GAIN, dtype=self.dtype, name="viewmod0")(view)
            )
            v = leaky_relu(
                LinearWN(8 * 4 * 4, gain=LEAKY_GAIN, dtype=self.dtype, name="viewmod1")(v)
            )
            v = v.reshape(n, 4, 4, 8)
            x = jnp.concatenate([v, x], axis=-1)

        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        bias_by_size = {b.shape[1]: b for b in id_biases}
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
                x = xx

        bias = self.param(
            "slab_bias",
            nn.initializers.zeros,
            (self.imsize, self.imsize, self.boxsize * self.outch),
        )
        tex = x + bias[None]

        # Slab channels are (z-major, rgb-minor); spatial 8x8 patches become
        # box rows/cols — same layout contract as the geometry decoder.
        bs = self.boxsize
        nh = int(np.sqrt(self.nboxes))
        rgb = tex.reshape(n, nh, bs, nh, bs, bs, self.outch)
        rgb = rgb.transpose(0, 1, 3, 5, 2, 4, 6)  # [N, hy, hx, z, by, bx, c]
        return rgb.reshape(n, self.nboxes, bs, bs, bs, self.outch)
