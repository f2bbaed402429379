from ava256_tpu.data.dataset import (
    MugsyCapture,
    MultiCaptureDataset,
    SingleCaptureDataset,
    none_collate,
)
from ava256_tpu.data.synthetic import SyntheticDataset
from ava256_tpu.data.loader import ShardedLoader

__all__ = [
    "MugsyCapture",
    "MultiCaptureDataset",
    "SingleCaptureDataset",
    "SyntheticDataset",
    "ShardedLoader",
    "none_collate",
]
