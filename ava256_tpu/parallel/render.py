# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Ray-sharded rendering: split pixels across devices for offline rendering.

The per-ray computation is embarrassingly parallel — only primitive
parameters are shared — so high-resolution offline renders scale by sharding
the pixel rows of a single image across the mesh (SURVEY.md §5: the
reference's "long axis" analogue; its API already renders arbitrary pixel
subsets via pixelcoords, reference models/autoencoder.py:90).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def render_rays_sharded(
    decode_fn: Callable[..., jnp.ndarray],
    params,
    stats,
    batch: Dict[str, Any],
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Render one batch with pixel rows sharded across ``axis``.

    decode_fn(params, stats, batch) -> image [B, H, W, C]; ``batch`` must
    contain "pixelcoords" [B, H, W, 2]. H is padded to a multiple of the mesh
    axis size; each device renders its row slab and the result is stitched by
    XLA (params replicated, pixel tensors sharded on the H axis).
    """
    ndev = mesh.shape[axis]
    pix = batch["pixelcoords"]
    b, h, w = pix.shape[0], pix.shape[1], pix.shape[2]
    hp = ((h + ndev - 1) // ndev) * ndev
    if hp != h:
        pad = jnp.broadcast_to(pix[:, -1:, :, :], (b, hp - h, w, 2))
        pix = jnp.concatenate([pix, pad], axis=1)
    batch = dict(batch)
    batch["pixelcoords"] = pix

    pix_sharding = NamedSharding(mesh, P(None, axis))
    repl = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 2 and x.shape[:2] == (b, hp):
            return jax.device_put(x, pix_sharding)
        return jax.device_put(x, repl)

    batch = {k: put(v) for k, v in batch.items()}
    params = jax.device_put(params, repl)
    stats = jax.device_put(stats, repl)

    out = jax.jit(decode_fn)(params, stats, batch)
    return out[:, :h]
