#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Dump cached identity conditioning for every subject.

Capability parity with the reference tool (reference: generate_id_cond.py):
runs the identity encoder on each subject's neutral data and pickles the
id_cond dict (z_geo/z_tex codes + bias pyramids) for decoder-only use.

    python generate_id_cond.py --config configs/config.yaml \
        --checkpoint run/checkpoints --output id_conds/
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.config import load_config
from ava256_tpu.geometry import create_uv_baridx
from ava256_tpu.factory import get_autoencoder
from ava256_tpu.train.state import create_train_state, make_optimizer, restore_checkpoint
from ava256_tpu.utils import setup_logging


def main():
    from ava256_tpu.platform import respect_env_platforms

    respect_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default="id_conds/")
    parser.add_argument("--opts", default=[], nargs="+")
    args = parser.parse_args()

    cfg = load_config(args.config, args.opts)
    logger = setup_logging()
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    from train import build_dataset, to_model_batch
    from ava256_tpu.data.dataset import none_collate

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
        raymarch_backend=cfg.model.raymarch.backend,
        raymarch_options={k: v for k, v in cfg.model.raymarch.items() if k != "backend"},
    )

    first = None
    for i in range(len(dataset)):
        item = dataset[i]
        if item is not None:
            first = to_model_batch(none_collate([item]))
            break
    from ava256_tpu.train.init import init_model

    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, first)
    state = create_train_state(variables, make_optimizer())
    state = restore_checkpoint(args.checkpoint, state)

    id_encoder = model.identity_encoder

    @jax.jit
    def encode(params, neut_verts, neut_avgtex):
        return id_encoder.apply({"params": params}, neut_verts, neut_avgtex)

    for i in range(len(dataset.identities)):
        cond = dataset.get_neutral_conditioning(i)
        id_cond = encode(
            state.params["identity_encoder"],
            jnp.asarray(cond["neut_verts"][None]),
            jnp.asarray(cond["neut_avgtex"][None]),
        )
        id_cond = jax.tree_util.tree_map(np.asarray, id_cond)
        ident = dataset.identities[i]
        name = ident.folder_name() if hasattr(ident, "folder_name") else f"id{i:03d}"
        with open(out_dir / f"{name}.pkl", "wb") as f:
            pickle.dump(id_cond, f)
        logger.info("Wrote id_cond for %s", name)


if __name__ == "__main__":
    main()
