"""Geometry-image rasterization: scatter mesh vertices into a UV texture.

TPU-native equivalent of the reference's ``generate_geomap``
(reference: models/encoders/utils.py:10-43): three gathers indexed by the
precomputed per-texel triangle corner indices, blended with barycentric
weights. Output is NHWC ([N, M, M, 3]) — the layout our conv stacks consume.
"""

from __future__ import annotations

import jax.numpy as jnp


def generate_geomap(
    geo: jnp.ndarray, uv_tidx: jnp.ndarray, uv_bary: jnp.ndarray
) -> jnp.ndarray:
    """Rasterize vertices into a geometry image.

    Args:
        geo: [N, V, 3] vertex positions.
        uv_tidx: [3, M, M] int vertex indices (3 triangle corners per texel).
        uv_bary: [3, M, M] barycentric weights.

    Returns:
        [N, M, M, 3] geometry image.
    """
    m = uv_tidx.shape[-1]
    out = None
    for k in range(3):
        idx = uv_tidx[k].reshape(-1)  # [M*M]
        vals = jnp.take(geo, idx, axis=1)  # [N, M*M, 3]
        term = vals * uv_bary[k].reshape(1, -1, 1)
        out = term if out is None else out + term
    return out.reshape(geo.shape[0], m, m, 3)
