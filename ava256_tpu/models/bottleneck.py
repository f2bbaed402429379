# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""VAE bottleneck over the expression code.

Capability parity with the reference bottleneck
(reference: models/bottlenecks/vae.py:17-58): 1x1-conv mu/logstd heads with
output squashing (x0.1 / x0.01) and reparameterized sampling in train mode,
plus the numerically stable KL form.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.layers import Conv2dWN


def kl_loss_stable(mu: jnp.ndarray, logstd: jnp.ndarray) -> jnp.ndarray:
    """Stable KL(q || N(0,1)) averaged over the last axis."""
    return jnp.mean(
        -0.5 + jnp.abs(logstd) + 0.5 * mu**2 + 0.5 * jnp.exp(-2.0 * jnp.abs(logstd)),
        axis=-1,
    )


class VAEBottleneck(nn.Module):
    out_dim: int = 16
    mean_squash: float = 0.1
    std_squash: float = 0.01
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [N, H, W, C] -> (z, mu, logstd) each [N, H, W, out_dim]."""
        mu = Conv2dWN(self.out_dim, 1, dtype=self.dtype, name="mu")(x) * self.mean_squash
        logstd = (
            Conv2dWN(self.out_dim, 1, dtype=self.dtype, name="logstd")(x) * self.std_squash
        )
        if deterministic:
            z = mu
        else:
            noise = jax.random.normal(self.make_rng("sample"), logstd.shape, logstd.dtype)
            z = mu + jnp.exp(logstd) * noise
        return z, mu, logstd
