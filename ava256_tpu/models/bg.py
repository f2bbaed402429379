# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Simple background model: per-camera and per-identity embeddings plus a
sin/cos positional encoding of screen coordinates through a 1x1-conv MLP.

Capability parity with the reference module (reference: models/bg/mlp2d.py:14-70).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.layers import LEAKY_GAIN, Conv2d, Linear, leaky_relu


class BackgroundModelSimple(nn.Module):
    ncams: int
    nident: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, camindex: jnp.ndarray, idindex: jnp.ndarray, samplecoords: jnp.ndarray
    ) -> jnp.ndarray:
        """samplecoords: [N, H, W, 2] in [-1, 1]. Returns [N, H, W, 3]."""
        n, h, w = samplecoords.shape[0], samplecoords.shape[1], samplecoords.shape[2]

        cam_onehot = jax.nn.one_hot(camindex, self.ncams, dtype=samplecoords.dtype)
        id_onehot = jax.nn.one_hot(idindex, self.nident, dtype=samplecoords.dtype)

        camenc = Linear(256, gain=LEAKY_GAIN, dtype=self.dtype, name="cammod0")(cam_onehot)
        camenc = Linear(40, gain=1.0, dtype=self.dtype, name="cammod1")(leaky_relu(camenc))
        idenc = Linear(256, gain=LEAKY_GAIN, dtype=self.dtype, name="idmod0")(id_onehot)
        idenc = Linear(40, gain=1.0, dtype=self.dtype, name="idmod1")(leaky_relu(idenc))

        camenc = jnp.broadcast_to(camenc[:, None, None, :], (n, h, w, 40))
        idenc = jnp.broadcast_to(idenc[:, None, None, :], (n, h, w, 40))

        freqs = (2.0 ** np.arange(10)) * np.pi  # [10]
        ang = samplecoords[..., None, :] * jnp.asarray(freqs, samplecoords.dtype)[:, None]
        posenc = jnp.concatenate(
            [jnp.sin(ang).reshape(n, h, w, -1), jnp.cos(ang).reshape(n, h, w, -1)],
            axis=-1,
        )  # [N, H, W, 40]

        x = jnp.concatenate([camenc, idenc, posenc], axis=-1)
        for i in range(5):
            x = leaky_relu(
                Conv2d(256, 1, gain=LEAKY_GAIN, dtype=self.dtype, name=f"mlp{i}")(x)
            )
        x = Conv2d(3, 1, gain=1.0, dtype=self.dtype, name="mlp5")(x)
        return x * 25.0 + 100.0
