# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Model factory: wires the full autoencoder from topology assets and dataset
normalization statistics.

Capability parity with the reference factory (reference: utils.py:52-122):
volradius 256, nprims 128^2, primsize (8,8,8), VAE 64->16, identity warp 128.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import linen as nn

from ava256_tpu.models.autoencoder import Autoencoder
from ava256_tpu.models.bg import BackgroundModelSimple
from ava256_tpu.models.bottleneck import VAEBottleneck
from ava256_tpu.models.colorcal import Colorcal
from ava256_tpu.models.decoders.assembler import DecoderAssembler
from ava256_tpu.models.encoders.expression import ExpressionEncoder
from ava256_tpu.models.encoders.identity import IdentityEncoder
from ava256_tpu.models.raymarcher import Raymarcher


def get_autoencoder(
    uvdata: Dict[str, np.ndarray],
    vertmean: np.ndarray,
    vertstd: float,
    ncams: int,
    nident: int,
    volradius: float = 256.0,
    nprims: int = 128 * 128,
    primsize: Tuple[int, int, int] = (8, 8, 8),
    colorcal: bool = True,
    bgmodel: bool = True,
    raymarch_backend: str = "pallas",
    raymarch_options: Optional[Dict[str, Any]] = None,
    dtype: Any = None,
) -> Autoencoder:
    """Build the flagship autoencoder.

    Args:
        uvdata: output of geometry.create_uv_baridx (uv_idx, uv_bary,
            uv_coord, uv_tri, tri).
        vertmean: [V, 3] vertex mean; vertstd: scalar vertex std.
        ncams/nident: camera and identity counts for colorcal/background.
    """
    vt = np.asarray(uvdata["uv_coord"], dtype=np.float32)
    vi = np.asarray(uvdata["tri"], dtype=np.int32)
    vti = np.asarray(uvdata["uv_tri"], dtype=np.int32)

    identity_encoder = IdentityEncoder(
        uv_tidx=uvdata["uv_idx"], uv_bary=uvdata["uv_bary"], wsize=128, dtype=dtype
    )
    expression_encoder = ExpressionEncoder(
        uv_tidx=uvdata["uv_idx"], uv_bary=uvdata["uv_bary"], dtype=dtype
    )
    bottleneck = VAEBottleneck(out_dim=16, dtype=dtype)
    decoder_assembler = DecoderAssembler(
        vt=vt,
        vi=vi,
        vti=vti,
        idxim=uvdata["uv_idx"],
        barim=uvdata["uv_bary"],
        vertmean=np.asarray(vertmean, dtype=np.float32),
        vertstd=float(vertstd),
        volradius=volradius,
        nprims=nprims,
        primsize=primsize,
        dtype=dtype,
    )
    rm_opts = dict(raymarch_options or {})
    raymarcher = Raymarcher(
        volradius, dt=rm_opts.pop("dt", 1.0), backend=raymarch_backend, **rm_opts
    )

    # The background MLP runs at full image resolution with 256 channels;
    # rematerialize it so its activations don't dominate HBM in the backward.
    BgR = nn.remat(BackgroundModelSimple)
    return Autoencoder(
        identity_encoder=identity_encoder,
        expression_encoder=expression_encoder,
        bottleneck=bottleneck,
        decoder_assembler=decoder_assembler,
        raymarcher=raymarcher,
        colorcal=Colorcal(ncams, nident, dtype=dtype) if colorcal else None,
        bgmodel=BgR(ncams, nident, dtype=dtype) if bgmodel else None,
    )
