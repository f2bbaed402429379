#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Train the universal codec avatar autoencoder (TPU-native).

CLI/loop parity with the reference trainer (reference: ddp-train.py):
YAML config + dot overrides, warm-up behaviors for the first 100 iterations,
loss logging every iteration, progress renders at 100/1000-iteration cadence,
cross-id visualization, checkpoints at 2k (<10k iters) then 20k cadence.

Distribution is SPMD data parallelism over a jax.sharding.Mesh: one process
per host (jax.distributed), batches sharded over the "data" axis, params
replicated, gradient all-reduce inserted by XLA over ICI.

Examples:
    python train.py --config configs/config.yaml
    python train.py --config configs/config-synthetic.yaml train.maxiter=50
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.config import load_config
from ava256_tpu.data.dataset import MultiCaptureDataset, train_csv_loader
from ava256_tpu.data.loader import ShardedLoader
from ava256_tpu.data.synthetic import SyntheticDataset
from ava256_tpu.factory import get_autoencoder
from ava256_tpu.geometry import create_uv_baridx
from ava256_tpu.parallel.mesh import make_mesh, shard_batch
from ava256_tpu.train.state import (
    create_train_state,
    latest_checkpoint_step,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
)
from ava256_tpu.train.profiling import StepTimer, trace
from ava256_tpu.train.step import BATCH_MODEL_KEYS, make_train_step
from ava256_tpu.utils import render_img, setup_logging

FRONTAL_CAMERAS = ["401168", "401875", "402040", "401031"]


def build_dataset(cfg, heldout: bool = False):
    """Build the configured dataset. ``data.holdout_cameras: N`` reserves the
    last N cameras as a held-out evaluation split: training (and rendering)
    iterate the remaining cameras; ``eval.py --holdout-cameras N`` evaluates
    on the reserved ones (heldout=True)."""
    ds = _build_base_dataset(cfg)
    n = int(cfg.data.get("holdout_cameras", 0) or 0)
    if n:
        from ava256_tpu.data import CameraSplit, last_n_camindices

        ds = CameraSplit(ds, last_n_camindices(ds, n), heldout=heldout)
    return ds


def _build_base_dataset(cfg):
    if cfg.data.synthetic:
        base_verts = None
        mesh_bin = Path(cfg.assets) / "021924.bin"
        if mesh_bin.exists():
            base_verts = np.fromfile(mesh_bin, dtype=np.float32).reshape(-1, 3)
        return SyntheticDataset(
            nident=cfg.train.nids,
            ncams=int(cfg.data.get("synthetic_cams", 4)),
            nframes=int(cfg.data.get("synthetic_frames", 8)),
            height=cfg.data.synthetic_height,
            width=cfg.data.synthetic_width,
            texsize=cfg.data.synthetic_texsize,
            base_verts=base_verts,
        )
    captures, dirs = train_csv_loader(
        cfg.train.dataset_dir, cfg.train.data_csv, cfg.train.nids
    )
    return MultiCaptureDataset(captures, dirs, downsample=cfg.train.downsample)


def to_model_batch(batch):
    keys = set(BATCH_MODEL_KEYS) | {"idindex", "camindex", "image"}
    return {k: np.asarray(v) for k, v in batch.items() if k in keys}


def main():
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    parser = argparse.ArgumentParser(description="Train an avatar autoencoder")
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--opts", default=[], nargs="+")
    parser.add_argument("opts_inline", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args()

    cfg = load_config(args.config, list(args.opts) + list(args.opts_inline))
    logger = setup_logging()

    if cfg.mesh.multihost:
        jax.distributed.initialize()
    host_id, num_hosts = jax.process_index(), jax.process_count()

    outpath = Path(cfg.progress.output_path)
    (outpath / "x-id").mkdir(parents=True, exist_ok=True)

    tb = None
    if cfg.progress.tensorboard.logdir and host_id == 0:
        try:
            from tensorboardX import SummaryWriter

            tb = SummaryWriter(str(outpath / cfg.progress.tensorboard.logdir))
            # hparams logging (reference: ddp-train.py:86-94)
            tb.add_hparams(
                {
                    "minibatchsize": cfg.train.batchsize,
                    "globalbatchsize": cfg.train.batchsize * num_hosts,
                    "learningrate": cfg.train.init_learning_rate,
                    "optimizer": cfg.train.get("optimizer", "adam"),
                },
                {"hp_metric": 1.0},
            )
        except ImportError:
            logger.warning("tensorboardX unavailable; scalar logging to stdout only")

    t0 = time.time()
    dataset = build_dataset(cfg)
    logger.info("Dataset instantiated (%.2f s), %d items", time.time() - t0, len(dataset))

    mesh = make_mesh(axis_names=tuple(cfg.mesh.axes))
    logger.info("Mesh: %s", mesh)

    uv_res = cfg.data.synthetic_texsize if cfg.data.synthetic else 1024
    uvdata = create_uv_baridx(f"{cfg.assets}/face_topology.obj", resolution=uv_res)
    raymarch_options = {
        k: v for k, v in cfg.model.raymarch.items() if k != "backend"
    }
    if cfg.model.raymarch.backend == "pallas":
        # march per batch shard under shard_map (pallas_call has no GSPMD rule)
        raymarch_options["mesh"] = mesh
    model = get_autoencoder(
        uvdata,
        vertmean=dataset.vertmean,
        vertstd=dataset.vertstd,
        ncams=len(dataset.get_allcameras()),
        nident=len(dataset.identities),
        volradius=cfg.model.volradius,
        nprims=cfg.model.nprims,
        primsize=(cfg.model.primsize,) * 3,
        colorcal=cfg.model.colorcal,
        bgmodel=cfg.model.bgmodel,
        raymarch_backend=cfg.model.raymarch.backend,
        raymarch_options=raymarch_options,
        # activation compute dtype; parameters stay fp32 (flax dtype policy)
        dtype=jnp.bfloat16 if cfg.model.get("dtype") == "bfloat16" else None,
    )

    # Device-resident conditioning tables: upload the per-identity /
    # per-camera constant fields once and gather them by index inside the
    # jitted step; the loader then only ships the per-frame payload
    # (see ava256_tpu/data/cond_cache.py).
    cond_tables_np = None
    cond = None
    loader_dataset = dataset
    if cfg.train.get("device_cond_cache", True) and hasattr(
        dataset, "conditioning_tables"
    ):
        from jax.sharding import NamedSharding, PartitionSpec

        from ava256_tpu.data.cond_cache import (
            LeanView,
            cached_field_names,
            table_nbytes,
        )

        cond_tables_np = dataset.conditioning_tables()
        cond = jax.device_put(
            cond_tables_np, NamedSharding(mesh, PartitionSpec())
        )
        loader_dataset = LeanView(dataset, cached_field_names(cond_tables_np))
        logger.info(
            "Conditioning tables on device: %.1f MB (%s), lean loader batches",
            table_nbytes(cond_tables_np) / 2**20,
            ", ".join(sorted(cached_field_names(cond_tables_np))),
        )

    loader = ShardedLoader(
        loader_dataset,
        batch_size=cfg.train.batchsize,
        shuffle=True,
        num_workers=cfg.train.num_workers,
        host_id=host_id,
        num_hosts=num_hosts,
    )

    # ---- init / restore ----
    # Build the init batch straight from the dataset: iterating the loader
    # here would advance its epoch counter and break the deterministic
    # resume alignment of set_position().
    from ava256_tpu.data.dataset import none_collate

    first = None
    for start in range(0, len(dataset), cfg.train.batchsize):
        b = none_collate(
            [dataset[start + j] for j in range(cfg.train.batchsize)]
        )
        if b is not None:
            first = to_model_batch(b)
            break
    assert first is not None, "dataset produced no valid batches"

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    from ava256_tpu.train.init import init_model

    variables = init_model(model, rng, first)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info("Model initialized (%.1f s): %s params", time.time() - t0, f"{nparams:_}")

    tx = make_optimizer(
        cfg.train.get("optimizer", "adam"),
        cfg.train.init_learning_rate,
        cfg.train.gamma,
        cfg.train.lr_scheduler_iter,
        cfg.train.clip,
    )
    state = create_train_state(variables, tx)

    ckpt_dir = str(outpath / "checkpoints")
    if cfg.train.checkpoint:
        state = restore_checkpoint(cfg.train.checkpoint, state)
        logger.info("Restored checkpoint at step %d", int(state.step))
    elif latest_checkpoint_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        logger.info("Resumed from %s at step %d", ckpt_dir, int(state.step))

    loss_weights = dict(cfg.train.losses)
    train_step = make_train_step(
        model, tx, loss_weights, dataset.vertmean, dataset.vertstd,
        output_set=frozenset(cfg.train.output_set),
    )

    neutral_conds = [
        dataset.get_neutral_conditioning(i) for i in range(len(dataset.identities))
    ]

    iternum = int(state.step)
    if iternum > 0:
        # resume the deterministic data order where the checkpoint left off
        loader.set_position(iternum)
    warmup = cfg.train.get("warmup_iters", 100)
    done = False
    lstart = time.time()
    timer = StepTimer()
    profile_at = cfg.progress.get("profile_at", -1)  # step to capture a trace
    profile_dir = str(outpath / "profile")

    from ava256_tpu.data.loader import device_prefetch

    def _to_device(batch):
        return shard_batch(to_model_batch(batch), mesh)

    iter_end = time.time()
    for epoch in range(cfg.train.num_epochs):
        if done:
            break
        # Background thread uploads batch i+1 while batch i computes.
        for mb in device_prefetch(loader, _to_device):
            iter_start = iter_end

            in_warmup = iternum < warmup
            # step rng is a pure function of the step index so a resumed run
            # replays the exact trajectory of an uninterrupted one
            step_rng = jax.random.fold_in(rng, iternum)
            with trace(profile_dir if iternum == profile_at else None):
                with timer.step():
                    state, loss, terms = train_step(
                        state,
                        mb,
                        step_rng,
                        running_avg_scale=in_warmup,
                        use_gt_geo=in_warmup,
                        residuals_weight=0.0 if in_warmup else 1.0,
                        cond=cond,
                    )
                    loss = jax.block_until_ready(loss)

            # ---- progress renders ----
            if (iternum < 10_000 and iternum % 100 == 0) or iternum % 1000 == 0:
                if host_id == 0:
                    if cond_tables_np is not None:
                        from ava256_tpu.data.cond_cache import expand_batch_host

                        vis_mb = expand_batch_host(mb, cond_tables_np)
                    else:
                        vis_mb = mb
                    _progress_render(model, state, vis_mb, outpath, iternum)
                    if cfg.progress.cross_id and len(neutral_conds) > 1:
                        _xid_render(model, state, vis_mb, neutral_conds, cfg, outpath, iternum)

            # ---- checkpoints ----
            # checkpoint_every: unset -> reference cadence (2k under 10k
            # iters, then 20k — reference ddp-train.py:468-471); 0 or
            # negative -> mid-run checkpoints disabled.
            ce = cfg.train.get("checkpoint_every")
            cadence = (2_000 if iternum < 10_000 else 20_000) if ce is None else int(ce)
            if cadence > 0 and iternum % cadence == 0 and host_id == 0 and iternum > 0:
                save_checkpoint(ckpt_dir, state)
                logger.info("Saved checkpoint at step %d", iternum)

            loss = float(loss)
            iter_end = time.time()
            # effective LR from the (deterministic) StepLR schedule — makes
            # the gamma bump at lr_scheduler_iter auditable in the log
            cur_lr = float(cfg.train.init_learning_rate) * (
                float(cfg.train.gamma)
                if iternum >= int(cfg.train.lr_scheduler_iter)
                else 1.0
            )
            logger.info(
                "Iteration %d loss = %.4f, %s lr = %.2e, time: %.3f s",
                iternum,
                loss,
                ", ".join(f"{k} = {float(v):.4f}" for k, v in terms.items()),
                cur_lr,
                iter_end - iter_start,
            )
            if tb is not None and iternum % cfg.progress.tensorboard.log_freq == 0:
                tb.add_scalar("Total Loss", loss, iternum)
                tb.add_scalar("lr", cur_lr, iternum)
                for k, v in terms.items():
                    tb.add_scalar(f"loss/{k}", float(v), iternum)

            iternum += 1
            if iternum >= cfg.train.maxiter:
                logger.info("Stopping at max iter %d", iternum)
                timer.save(str(outpath), rank=host_id)
                logger.info("Timing: %s", timer.summary())
                done = True
                break

    if host_id == 0:
        save_checkpoint(ckpt_dir, state)
        logger.info("Final checkpoint saved at step %d", int(state.step))


_EVAL_CACHE = {}


def _forward_eval(model, state, mb, target_tex=None, target_verts=None):
    """Deterministic forward for progress/x-id rendering (jitted per model)."""
    if id(model) not in _EVAL_CACHE:
        @jax.jit
        def eval_fn(params, stats, mb, tgt_tex, tgt_verts):
            return model.apply(
                {"params": params, "stats": stats},
                target_neut_avgtex=tgt_tex,
                target_neut_verts=tgt_verts,
                idindex=mb.get("idindex"),
                camindex=mb.get("camindex"),
                deterministic=True,
                **{k: mb[k] for k in BATCH_MODEL_KEYS},
            )

        _EVAL_CACHE[id(model)] = eval_fn
    eval_fn = _EVAL_CACHE[id(model)]
    return eval_fn(
        state.params,
        state.stats,
        {k: jnp.asarray(v) for k, v in mb.items()},
        jnp.asarray(target_tex if target_tex is not None else mb["neut_avgtex"]),
        jnp.asarray(target_verts if target_verts is not None else mb["neut_verts"]),
    )


def _progress_render(model, state, mb, outpath, iternum):
    from ava256_tpu.train.metrics import psnr

    out = _forward_eval(model, state, mb)
    rec = np.asarray(out["irgbrec"])
    gt = np.asarray(mb["image"])
    logging.getLogger().info(
        "Progress iter %d: PSNR %.2f dB", iternum, float(psnr(out["irgbrec"], mb["image"]))
    )
    rows = [[gt[b], rec[b], (gt[b] - rec[b]) ** 2 * 10] for b in range(gt.shape[0])]
    render_img(rows, str(Path(outpath) / f"progress_{iternum}.png"))


def _xid_render(model, state, mb, neutral_conds, cfg, outpath, iternum):
    """Drive the first batch element with other identities' neutral data."""
    one = {k: np.asarray(v)[:1] for k, v in mb.items()}
    rows = [np.asarray(one["image"])[0]]
    self_out = _forward_eval(model, state, one)
    rows.append(np.asarray(self_out["irgbrec"])[0])
    n = min(cfg.progress.cross_id_n_subjects, len(neutral_conds))
    for i in range(n):
        if i == int(np.asarray(one["idindex"])[0]):
            continue
        cond = neutral_conds[i]
        out = _forward_eval(
            model, state, one,
            target_tex=cond["neut_avgtex"][None],
            target_verts=cond["neut_verts"][None],
        )
        rows.append(np.asarray(out["irgbrec"])[0])
    render_img([rows], str(Path(outpath) / "x-id" / f"progress_{iternum}.png"))


if __name__ == "__main__":
    main()
