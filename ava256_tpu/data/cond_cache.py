# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Device-resident conditioning tables: keep per-identity / per-camera /
constant batch fields on the accelerator and gather them by index inside the
jitted step, instead of shipping them from the host every iteration.

The dominant batch payload is conditioning that never changes across a run:
the normalized neutral texture/geometry of each identity (the identity
encoder's input, reference: ddp-train.py builds it per batch element from
the dataset) and the per-camera calibration. At flagship shape two 1024^2
fp32 textures per element put ~100 MB/step on the host->device path — on a
tunneled or PCIe-attached TPU that transfer (and the worker-process pickling
feeding it) dwarfs the compute step. The reference never had this problem
statement (its DataLoader feeds local GPUs over NVLink/PCIe from pinned
memory); the TPU-native answer is to upload each table once and turn the
per-step payload into a handful of int32 indices plus the genuinely
per-frame arrays (target image, tracked vertices).

Tables layout::

    {"id":    {field: [nident, ...]},   # gathered by batch["idindex"]
     "cam":   {field: [ncams, ...]},    # gathered by batch["camindex"]
     "const": {field: [...]}}           # broadcast over the batch

Datasets opt in by providing ``conditioning_tables()`` returning numpy
tables in this layout; ``LeanView`` strips the cached fields from items in
the loader workers (saving the pickling/collate cost as well), and
``expand_batch`` re-materializes them on device inside jit, where the
gathers are free relative to a step. Under a data-parallel mesh the tables
are replicated (params-like) and the gathers inherit the batch sharding
from the index operands.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Set

import numpy as np

Tables = Dict[str, Dict[str, Any]]

_INDEX_OF = {"id": "idindex", "cam": "camindex"}


def cached_field_names(tables: Optional[Tables]) -> Set[str]:
    """All batch field names a table set covers."""
    if not tables:
        return set()
    names: Set[str] = set()
    for group in tables.values():
        names |= set(group)
    return names


def table_nbytes(tables: Optional[Tables]) -> int:
    if not tables:
        return 0
    return sum(
        np.asarray(v).nbytes for group in tables.values() for v in group.values()
    )


def expand_batch(batch: Dict[str, Any], tables: Optional[Tables]) -> Dict[str, Any]:
    """Re-materialize cached fields into ``batch`` (jit-traceable).

    Gathers id/cam tables by the batch's index fields and broadcasts const
    tables over the batch dimension. Fields already present in the batch are
    left untouched (so a full batch passes through unchanged).
    """
    if not tables:
        return batch
    import jax.numpy as jnp

    out = dict(batch)
    nbatch = None
    for group_name in ("id", "cam"):
        group = tables.get(group_name)
        if not group:
            continue
        idx = batch[_INDEX_OF[group_name]]
        nbatch = idx.shape[0]
        for k, v in group.items():
            if k not in out:
                out[k] = jnp.take(jnp.asarray(v), idx, axis=0)
    for k, v in tables.get("const", {}).items():
        if k in out:
            continue
        v = jnp.asarray(v)
        if nbatch is None:
            nbatch = next(iter(batch.values())).shape[0]
        out[k] = jnp.broadcast_to(v[None], (nbatch,) + v.shape)
    return out


def expand_batch_host(
    batch: Dict[str, Any], tables: Optional[Tables]
) -> Dict[str, Any]:
    """Numpy twin of :func:`expand_batch` for host-side consumers
    (progress renders, visualization) fed a lean batch."""
    if not tables:
        return batch
    out = {k: np.asarray(v) for k, v in batch.items()}
    nbatch = None
    for group_name in ("id", "cam"):
        group = tables.get(group_name)
        if not group:
            continue
        idx = out[_INDEX_OF[group_name]]
        nbatch = idx.shape[0]
        for k, v in group.items():
            if k not in out:
                out[k] = np.asarray(v)[idx]
    for k, v in tables.get("const", {}).items():
        if k in out:
            continue
        v = np.asarray(v)
        if nbatch is None:
            nbatch = next(iter(out.values())).shape[0]
        out[k] = np.broadcast_to(v[None], (nbatch,) + v.shape)
    return out


class LeanView:
    """Dataset view that drops table-covered fields from items.

    Used as the loader-side dataset when conditioning tables live on
    device: the workers then never materialize (or pickle) the big
    constant arrays. Attribute access forwards to the base dataset.
    """

    def __init__(self, dataset, drop_fields: Set[str]):
        self.dataset = dataset
        self.drop_fields = set(drop_fields)

    def __getattr__(self, name):
        # Never forward dunder lookups, and bail before __dict__ is
        # populated: pickle probes __setstate__/__reduce_ex__ on a bare
        # instance during unpickling, and unconditional forwarding would
        # recurse on self.dataset forever (breaking the spawn process pool,
        # which pickles the dataset via Pool initargs).
        if name.startswith("__") or "dataset" not in self.__dict__:
            raise AttributeError(name)
        return getattr(self.dataset, name)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int):
        item = self.dataset[idx]
        if item is None:
            return None
        return {k: v for k, v in item.items() if k not in self.drop_fields}
