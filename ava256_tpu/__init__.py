# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""ava256_tpu — a TPU-native (JAX/XLA/Pallas) framework for training universal
codec avatars with Mixtures of Volumetric Primitives (MVP).

This is a ground-up TPU-first re-design of the capability set of
facebookresearch/ava-256 (reference layout documented in SURVEY.md):

- ``ava256_tpu.ops``      — compute primitives: weight-normalized conv layers,
  grid sampling, ray generation, and the MVP raymarcher (pure-JAX oracle +
  compacted production path + Pallas TPU kernels).
- ``ava256_tpu.models``   — encoder/decoder model families (identity encoder,
  expression encoder, VAE bottleneck, geometry/RGB decoders, assembler,
  color calibration, background model, full autoencoder).
- ``ava256_tpu.geometry`` — host-side geometry/asset utilities (OBJ, PLY, KRT,
  UV barycentric maps) in pure numpy/scipy.
- ``ava256_tpu.data``     — data pipeline (capture datasets, synthetic data,
  per-host sharded loading).
- ``ava256_tpu.parallel`` — SPMD meshes/shardings over ICI; DP training and
  ray-sharded rendering.
- ``ava256_tpu.train``    — losses, train state, jitted train step, checkpointing.
"""

__version__ = "0.1.0"
