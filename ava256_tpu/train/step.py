# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Jitted SPMD train step (data parallelism over the "data" mesh axis).

The reference's hot loop (reference: ddp-train.py:362-567) is: forward ->
four weighted losses -> backward with implicit NCCL all-reduce -> NaN scrub ->
grad clip -> Adam step. Here the whole step is one jitted function: batches
arrive sharded over the mesh, parameters are replicated, and XLA/GSPMD inserts
the gradient all-reduce over ICI automatically. The warm-up behaviors
(running_avg_scale, gt-geo guide mesh, residual ramp — reference:
ddp-train.py:374-377) are static switches; flipping them at iteration 100
costs one recompile.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp
import optax

from ava256_tpu.train.losses import compute_losses
from ava256_tpu.train.state import TrainState

BATCH_MODEL_KEYS = (
    "camrot", "campos", "focal", "princpt", "modelmatrix",
    "avgtex", "verts", "neut_avgtex", "neut_verts", "pixelcoords",
)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_weights: Dict[str, float],
    vertmean,
    vertstd: float,
    output_set: FrozenSet[str] = frozenset({"primscale"}),
) -> Callable:
    """Returns train_step(state, batch, rng, *, running_avg_scale,
    use_gt_geo, residuals_weight, cond) -> (state, total_loss, loss_terms).

    ``cond`` is an optional device-resident conditioning-table pytree
    (data/cond_cache.py): lean batches are re-expanded by on-device gathers
    inside the jitted step, keeping the big constant conditioning arrays out
    of the per-step host->device path."""

    vertmean = jnp.asarray(vertmean)

    @partial(jax.jit, static_argnames=("running_avg_scale", "use_gt_geo"),
             donate_argnums=(0,))
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        running_avg_scale: bool = False,
        use_gt_geo: bool = False,
        residuals_weight: float = 1.0,
        cond=None,
    ) -> Tuple[TrainState, jnp.ndarray, Dict[str, jnp.ndarray]]:
        from ava256_tpu.data.cond_cache import expand_batch

        full_batch = expand_batch(batch, cond)

        def loss_fn(params):
            batch = full_batch
            kwargs = {k: batch[k] for k in BATCH_MODEL_KEYS}
            out, mutated = model.apply(
                {"params": params, "stats": state.stats},
                target_neut_avgtex=batch["neut_avgtex"],
                target_neut_verts=batch["neut_verts"],
                idindex=batch.get("idindex"),
                camindex=batch.get("camindex"),
                running_avg_scale=running_avg_scale,
                gt_geo=batch["verts"] if use_gt_geo else None,
                residuals_weight=residuals_weight,
                output_set=output_set | {"primscale"},
                rngs={"sample": rng},
                mutable=["stats"],
                **kwargs,
            )
            total, terms = compute_losses(out, batch, loss_weights, vertmean, vertstd)
            return total, (terms, mutated)

        (total, (terms, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            stats=mutated.get("stats", state.stats),
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, total, terms

    return train_step


def make_eval_step(model, output_set: FrozenSet[str] = frozenset()) -> Callable:
    """Deterministic forward (z = mu), e.g. for progress renders / xid eval."""

    @jax.jit
    def eval_step(params, stats, batch, target_neut_avgtex, target_neut_verts):
        kwargs = {k: batch[k] for k in BATCH_MODEL_KEYS}
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=target_neut_avgtex,
            target_neut_verts=target_neut_verts,
            idindex=batch.get("idindex"),
            camindex=batch.get("camindex"),
            deterministic=True,
            output_set=output_set,
            **kwargs,
        )
        return out

    return eval_step
