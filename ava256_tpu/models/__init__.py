# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
from ava256_tpu.models.autoencoder import Autoencoder
from ava256_tpu.models.bottleneck import VAEBottleneck, kl_loss_stable
from ava256_tpu.models.colorcal import Colorcal
from ava256_tpu.models.bg import BackgroundModelSimple
from ava256_tpu.models.encoders.expression import ExpressionEncoder
from ava256_tpu.models.encoders.identity import IdentityEncoder
from ava256_tpu.models.decoders.geometry import GeometryDecoder
from ava256_tpu.models.decoders.rgb import RGBDecoder
from ava256_tpu.models.decoders.assembler import DecoderAssembler

__all__ = [
    "Autoencoder",
    "VAEBottleneck",
    "kl_loss_stable",
    "Colorcal",
    "BackgroundModelSimple",
    "ExpressionEncoder",
    "IdentityEncoder",
    "GeometryDecoder",
    "RGBDecoder",
    "DecoderAssembler",
]
