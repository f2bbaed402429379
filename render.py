#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Render frames from a trained model: self-driven and cross-identity-driven.

Capability parity with the reference renderer (reference: render.py:23-223):
loads a checkpoint, iterates driver frames from one capture, decodes them
(a) with the driver's own neutral conditioning and (b) with another subject's
neutral conditioning (cross-id reenactment), and saves [gt, self, cross]
strips.

    python render.py --config configs/config.yaml --checkpoint run/checkpoints \
        --driver-index 0 --driven-index 1 --num-frames 16 --output renders/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.config import load_config
from ava256_tpu.geometry import create_uv_baridx
from ava256_tpu.factory import get_autoencoder
from ava256_tpu.train.state import create_train_state, make_optimizer, restore_checkpoint
from ava256_tpu.train.step import BATCH_MODEL_KEYS
from ava256_tpu.utils import render_img, setup_logging

FRONTAL_CAMERAS = ["401168", "401875", "402040", "401031"]


def main():
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    parser = argparse.ArgumentParser(description="Render cross-id visualizations")
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", required=True, help="checkpoint directory")
    parser.add_argument("--driver-index", type=int, default=0)
    parser.add_argument("--driven-index", type=int, default=1)
    parser.add_argument("--num-frames", type=int, default=16)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--output", default="renders/")
    parser.add_argument("--opts", default=[], nargs="+")
    args = parser.parse_args()

    cfg = load_config(args.config, args.opts)
    logger = setup_logging()
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    from train import build_dataset, to_model_batch  # reuse builder

    dataset = build_dataset(cfg)
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

    # Initialize (for shapes) then restore weights.
    sample = None
    for i in range(len(dataset)):
        sample = dataset[i]
        if sample is not None:
            break
    from ava256_tpu.data.dataset import none_collate

    first = to_model_batch(none_collate([sample]))
    from ava256_tpu.train.init import init_model

    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, first)
    state = create_train_state(variables, make_optimizer())
    state = restore_checkpoint(args.checkpoint, state)
    logger.info("Restored checkpoint at step %d", int(state.step))

    driven_cond = dataset.get_neutral_conditioning(args.driven_index)

    @jax.jit
    def decode(params, stats, mb, tgt_tex, tgt_verts):
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=tgt_tex,
            target_neut_verts=tgt_verts,
            idindex=mb.get("idindex"),
            camindex=mb.get("camindex"),
            deterministic=True,
            **{k: mb[k] for k in BATCH_MODEL_KEYS},
        )
        return out["irgbrec"]

    rendered = 0
    for idx in range(0, len(dataset), args.stride):
        if rendered >= args.num_frames:
            break
        item = dataset[idx]
        if item is None or int(item["idindex"]) != args.driver_index:
            continue
        mb = to_model_batch(none_collate([item]))
        mb = {k: jnp.asarray(v) for k, v in mb.items()}
        self_rgb = decode(
            state.params, state.stats, mb, mb["neut_avgtex"], mb["neut_verts"]
        )
        cross_rgb = decode(
            state.params, state.stats, mb,
            jnp.asarray(driven_cond["neut_avgtex"][None]),
            jnp.asarray(driven_cond["neut_verts"][None]),
        )
        gt = np.asarray(mb["image"])[0]
        render_img(
            [[gt, np.asarray(self_rgb)[0], np.asarray(cross_rgb)[0]]],
            str(out_dir / f"render_{rendered:04d}.png"),
        )
        rendered += 1
        logger.info("Rendered frame %d (dataset idx %d)", rendered, idx)

    logger.info("Wrote %d frames to %s", rendered, out_dir)


if __name__ == "__main__":
    main()
