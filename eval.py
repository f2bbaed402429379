#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Quantitative evaluation: reconstruction PSNR/SSIM over dataset items.

The reference publishes no fidelity numbers and ships no eval script
(BASELINE.md); parity there is judged visually via render strips. This tool
makes the fidelity measurable: it loads a checkpoint, reconstructs N items
(self-driven, deterministic latents), and reports mean PSNR/SSIM as one JSON
line — the self-measured metric BASELINE.json defines for cross-stack parity.

    python eval.py --config configs/config.yaml --checkpoint run/checkpoints \
        --num-items 64
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.config import load_config
from ava256_tpu.data.dataset import none_collate
from ava256_tpu.factory import get_autoencoder
from ava256_tpu.geometry import create_uv_baridx
from ava256_tpu.train.init import init_model
from ava256_tpu.train.metrics import lpips, lpips_weights_path, psnr, ssim
from ava256_tpu.train.state import create_train_state, make_optimizer, restore_checkpoint
from ava256_tpu.train.step import BATCH_MODEL_KEYS
from ava256_tpu.utils import setup_logging


def main():
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    parser = argparse.ArgumentParser(description="Evaluate reconstruction quality")
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--num-items", type=int, default=32)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument(
        "--holdout-cameras", type=int, default=0,
        help="evaluate ONLY on the last N cameras (the held-out split); "
        "train with data.holdout_cameras=N so they never appear in training",
    )
    parser.add_argument("--opts", default=[], nargs="+")
    args = parser.parse_args()

    cfg = load_config(args.config, args.opts)
    logger = setup_logging()

    from train import build_dataset, to_model_batch

    if args.holdout_cameras:
        cfg.data.holdout_cameras = args.holdout_cameras
    dataset = build_dataset(cfg, heldout=bool(args.holdout_cameras))
    uv_res = cfg.data.synthetic_texsize if cfg.data.synthetic else 1024
    uvdata = create_uv_baridx(f"{cfg.assets}/face_topology.obj", resolution=uv_res)
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
        raymarch_options={k: v for k, v in cfg.model.raymarch.items() if k != "backend"},
    )

    first = None
    for i in range(len(dataset)):
        item = dataset[i]
        if item is not None:
            first = to_model_batch(none_collate([item]))
            break
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, first)
    state = restore_checkpoint(
        args.checkpoint, create_train_state(variables, make_optimizer())
    )
    logger.info("Restored checkpoint at step %d", int(state.step))

    @jax.jit
    def reconstruct(params, stats, mb):
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=mb["neut_avgtex"],
            target_neut_verts=mb["neut_verts"],
            idindex=mb.get("idindex"),
            camindex=mb.get("camindex"),
            deterministic=True,
            **{k: mb[k] for k in BATCH_MODEL_KEYS},
        )
        return out["irgbrec"]

    psnrs, ssims, lpipss, vert_l1s, n_done = [], [], [], [], 0
    for idx in range(0, len(dataset), args.stride):
        if n_done >= args.num_items:
            break
        item = dataset[idx]
        if item is None:
            continue
        mb = {k: jnp.asarray(v) for k, v in to_model_batch(none_collate([item])).items()}
        rec = reconstruct(state.params, state.stats, mb)
        psnrs.append(float(psnr(rec, mb["image"])))
        ssims.append(float(ssim(rec, mb["image"])))
        lpipss.append(float(lpips(rec, mb["image"])))
        n_done += 1

    # Trained-AlexNet weights report as "lpips"; the self-contained
    # random-feature fallback reports as "lpips_rf" — its values are orders
    # of magnitude smaller than trained LPIPS and must never be compared
    # against other stacks' numbers (see metrics.lpips docstring).
    lpips_key = "lpips" if lpips_weights_path() else "lpips_rf"
    result = {
        "metric": "reconstruction_quality",
        "split": "heldout_cameras" if args.holdout_cameras else "train",
        "items": n_done,
        "psnr_db": round(float(np.mean(psnrs)), 3),
        "ssim": round(float(np.mean(ssims)), 4),
        lpips_key: round(float(np.mean(lpipss)), 6),
        "checkpoint_step": int(state.step),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
