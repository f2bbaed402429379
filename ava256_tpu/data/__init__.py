# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
from ava256_tpu.data.dataset import (
    CameraSplit,
    MugsyCapture,
    MultiCaptureDataset,
    SingleCaptureDataset,
    last_n_camindices,
    none_collate,
)
from ava256_tpu.data.synthetic import SyntheticDataset
from ava256_tpu.data.loader import ShardedLoader

__all__ = [
    "CameraSplit",
    "MugsyCapture",
    "MultiCaptureDataset",
    "SingleCaptureDataset",
    "SyntheticDataset",
    "ShardedLoader",
    "last_n_camindices",
    "none_collate",
]
