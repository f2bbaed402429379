# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Small 3D math ops (rotation representations, normalization).

Semantics match the reference's Rodrigues/Quaternion modules
(reference: models/utils.py:470-517) including the 1e-5 epsilon under the
square root that keeps the zero-vector differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation vectors -> rotation matrices.

    rvec: [..., 3] -> [..., 3, 3]. The zero vector maps (smoothly) to
    (approximately) the identity, as in the reference.
    """
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec**2, axis=-1))
    r = rvec / theta[..., None]
    costh = jnp.cos(theta)
    sinth = jnp.sin(theta)
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    one_m_c = 1.0 - costh
    mat = jnp.stack(
        [
            x * x + (1.0 - x * x) * costh,
            x * y * one_m_c - z * sinth,
            x * z * one_m_c + y * sinth,
            x * y * one_m_c + z * sinth,
            y * y + (1.0 - y * y) * costh,
            y * z * one_m_c - x * sinth,
            x * z * one_m_c - y * sinth,
            y * z * one_m_c + x * sinth,
            z * z + (1.0 - z * z) * costh,
        ],
        axis=-1,
    )
    return mat.reshape(rvec.shape[:-1] + (3, 3))


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (x, y, z, w) -> rotation matrices [..., 3, 3]."""
    theta = jnp.sqrt(1e-5 + jnp.sum(q**2, axis=-1))
    q = q / theta[..., None]
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    mat = jnp.stack(
        [
            1.0 - 2.0 * y * y - 2.0 * z * z,
            2.0 * (x * y - z * w),
            2.0 * (x * z + y * w),
            2.0 * (x * y + z * w),
            1.0 - 2.0 * x * x - 2.0 * z * z,
            2.0 * (y * z - x * w),
            2.0 * (x * z - y * w),
            2.0 * (x * w + y * z),
            1.0 - 2.0 * x * x - 2.0 * y * y,
        ],
        axis=-1,
    )
    return mat.reshape(q.shape[:-1] + (3, 3))
