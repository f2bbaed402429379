# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Training losses.

Capability parity with the reference (reference: losses.py:12-19 and the loss
assembly in ddp-train.py:404-430): image L1, vertex L1 on denormalized
vertices, primitive-volume penalty, and the stable KL divergence.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ava256_tpu.models.bottleneck import kl_loss_stable


def mean_ell_1(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def mean_ell_2(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def compute_losses(
    output: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    loss_weights: Dict[str, float],
    vertmean: jnp.ndarray,
    vertstd: float,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total, per-term scalar dict). Image tensors are NHWC."""
    losses: Dict[str, jnp.ndarray] = {}
    if "irgbl1" in loss_weights:
        losses["irgbl1"] = mean_ell_1(output["irgbrec"], batch["image"])
    if "vertl1" in loss_weights:
        losses["vertl1"] = mean_ell_1(
            output["verts"], batch["verts"] * vertstd + vertmean
        )
    if "primvolsum" in loss_weights:
        losses["primvolsum"] = jnp.mean(
            jnp.sum(jnp.prod(1.0 / output["primscale"], axis=-1), axis=-1)
        )
    if "kldiv" in loss_weights:
        losses["kldiv"] = jnp.mean(
            kl_loss_stable(output["expr_mu"], output["expr_logstd"])
        )
    if not losses:
        raise ValueError("No losses were computed. We can't train like that!")
    total = sum(loss_weights[k] * v for k, v in losses.items())
    return total, losses
