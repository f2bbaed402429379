# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
from ava256_tpu.ops.layers import (  # noqa
    LEAKY_GAIN,
    Conv2dWN,
    ConvTranspose2dWN,
    LinearWN,
    leaky_relu,
)
from ava256_tpu.ops.grid_sample import grid_sample_2d, resize_bilinear
from ava256_tpu.ops.geomap import generate_geomap
from ava256_tpu.ops.math3d import rodrigues, quaternion_to_matrix, normalize
from ava256_tpu.ops.raydirs import compute_raydirs

__all__ = [
    "LEAKY_GAIN",
    "Conv2dWN",
    "ConvTranspose2dWN",
    "LinearWN",
    "leaky_relu",
    "grid_sample_2d",
    "resize_bilinear",
    "generate_geomap",
    "rodrigues",
    "quaternion_to_matrix",
    "normalize",
    "compute_raydirs",
]
