# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Per-camera x per-identity affine color calibration.

Capability parity with the reference module
(reference: models/colorcals/colorcal.py:11-29).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class Colorcal(nn.Module):
    ncams: int
    nident: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, camindex: jnp.ndarray, idindex: jnp.ndarray
    ) -> jnp.ndarray:
        """image: [N, H, W, 3]; camindex/idindex: [N] int32."""
        wcam = self.param("wcam", nn.initializers.ones, (self.ncams, 3))
        bcam = self.param("bcam", nn.initializers.zeros, (self.ncams, 3))
        wident = self.param("wident", nn.initializers.zeros, (self.nident, 3))
        bident = self.param("bident", nn.initializers.zeros, (self.nident, 3))
        w = wcam[camindex] + wident[idindex]  # [N, 3]
        b = bcam[camindex] + bident[idindex]
        return w[:, None, None, :] * image + b[:, None, None, :]
