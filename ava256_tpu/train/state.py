# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Train state: optimizer, LR schedule, checkpointing.

Reference behaviors reproduced (reference: ddp-train.py:67-95,329-341,436-441,
468-492 and SURVEY.md §5):
- Adam(2e-4, betas 0.9/0.999) with a StepLR-style gamma bump: the reference
  steps its scheduler only while iternum <= lr_scheduler_iter, so the LR is
  init_lr for the first ``lr_scheduler_iter`` steps and init_lr*gamma after.
- NaN/Inf gradient scrubbing and global-norm clipping.
- Checkpointing improves on the reference (which saves params + optimizer but
  never reloads the optimizer and regexes the iteration out of filenames):
  Orbax saves params + stats + opt_state + step atomically.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    stats: Any  # mutable model statistics (adaptwarps EMA)
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def as_dict(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "stats": self.stats,
            "opt_state": self.opt_state,
            "step": self.step,
        }


def step_lr_schedule(init_lr: float, gamma: float, step_size: int) -> Callable:
    """LR = init_lr * gamma^(min(step // step_size, 1)) — the effective
    schedule the reference trains with."""

    def schedule(step):
        bumps = jnp.minimum(step // step_size, 1)
        return init_lr * (gamma ** bumps.astype(jnp.float32))

    return schedule


def scrub_nonfinite() -> optax.GradientTransformation:
    """Zero out NaN/Inf gradient entries (reference: ddp-train.py:436-439)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    optim_type: str = "adam",
    init_lr: float = 2e-4,
    gamma: float = 1.4,
    lr_scheduler_iter: int = 10_000,
    clip: float = 1.0,
) -> optax.GradientTransformation:
    schedule = step_lr_schedule(init_lr, gamma, lr_scheduler_iter)
    if optim_type == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999)
    elif optim_type == "adamw":
        core = optax.adamw(schedule, b1=0.9, b2=0.999)
        return optax.chain(scrub_nonfinite(), optax.clip_by_global_norm(clip), core)
    elif optim_type == "sgd":
        core = optax.trace(decay=0.9)
    else:
        raise ValueError(f"Unsupported optimizer: {optim_type}")
    return optax.chain(
        scrub_nonfinite(),
        optax.clip_by_global_norm(clip),
        core,
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(
    variables: Dict[str, Any], tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    stats = variables.get("stats", {})
    return TrainState(
        params=params,
        stats=stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


# ---------------- checkpointing (Orbax) ----------------


def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    path.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / f"step_{step:08d}", state.as_dict(), force=True)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    path = Path(ckpt_dir)
    if not path.is_dir():
        return None
    steps = []
    for p in path.iterdir():
        if p.name.startswith("step_") and (p / "_CHECKPOINT_METADATA").exists():
            steps.append(int(p.name.split("_")[1]))
        elif p.name.startswith("step_") and any(p.iterdir()):
            steps.append(int(p.name.split("_")[1]))
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, template: TrainState, step: Optional[int] = None) -> TrainState:
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path / f"step_{step:08d}", template.as_dict())
    return TrainState(**restored)
