# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Device meshes and shardings (SPMD over ICI).

The reference's only distribution strategy is data parallelism via DDP/NCCL
(reference: ddp-train.py:312, SURVEY.md §2.3). The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the "data" axis: batches are sharded along it,
parameters are replicated, and XLA inserts the psum for gradient reduction
when the jitted train step consumes sharded batches with replicated params —
collectives ride ICI with no hand-written communication.

A second optional axis, "rays", shards rendering work (pixels) across devices
for high-resolution offline rendering — the per-ray computation is
embarrassingly parallel and only primitive parameters are replicated
(SURVEY.md §5 "long-context" analogue).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: a 1-D DP mesh over every addressable device. Pass shape to split
    devices across several axes, e.g. shape=(4, 2) with
    axis_names=("data", "rays").
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the given mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Device-put every array in the batch with its batch axis sharded.

    Single-process: a plain ``device_put`` onto the sharding. Multi-process
    (``jax.distributed``): each host holds only its own shard of the global
    batch (the loader strides items per host, matching the reference's
    DistributedSampler — reference: ddp-train.py:134), so the global array is
    assembled from process-local data; the global batch size is the per-host
    batch times ``jax.process_count()``.
    """
    sh = batch_sharding(mesh, axis)

    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
