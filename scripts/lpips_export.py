#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""One-shot converter: torch `lpips` package weights -> .npz for metrics.lpips.

The evaluation metric in ava256_tpu.train.metrics.lpips uses trained AlexNet
filters + linear calibration heads when AVA256_LPIPS_WEIGHTS points to an
.npz with arrays conv0..conv4 [k,k,cin,cout] and lin0..lin4 [cout]; without
them it falls back to deterministic random features and reports under the
key "lpips_rf". This tool produces that .npz from the reference pip package
(Zhang et al. 2018), so real LPIPS numbers are one command away on any host
with `pip install lpips torchvision`:

    python scripts/lpips_export.py --out assets/lpips_alexnet.npz
    AVA256_LPIPS_WEIGHTS=assets/lpips_alexnet.npz python eval.py ...

This container has no torchvision/lpips (and no network egress), so the
script is exercised here only by --self-test, which fabricates a state dict
with the right topology and round-trips it.
"""

from __future__ import annotations

import argparse

import numpy as np

# AlexNet feature-stack topology: (out_ch, kernel, stride) per conv layer,
# mirrored from metrics._LPIPS_LAYERS (must stay in sync).
LAYERS = ((64, 11, 4), (192, 5, 1), (384, 3, 1), (256, 3, 1), (256, 3, 1))


def export_from_state_dicts(alexnet_sd, lpips_sd, out_path):
    """alexnet_sd: torchvision alexnet.features state dict (conv weights at
    keys '0.weight', '3.weight', '6.weight', '8.weight', '10.weight');
    lpips_sd: lpips.LPIPS(net='alex') state dict with linear heads at
    'lin{i}.model.1.weight' [1, cout, 1, 1]. Writes conv{i} as HWIO (the
    NHWC conv layout metrics.lpips uses) and lin{i} as [cout]."""
    conv_keys = ["0.weight", "3.weight", "6.weight", "8.weight", "10.weight"]
    arrays = {}
    for i, key in enumerate(conv_keys):
        w = np.asarray(alexnet_sd[key], np.float32)  # [cout, cin, k, k] OIHW
        cout, cin, k, _ = w.shape
        assert (cout, k) == (LAYERS[i][0], LAYERS[i][1]), (
            f"conv{i}: expected {LAYERS[i][:2]}, got {(cout, k)}"
        )
        arrays[f"conv{i}"] = w.transpose(2, 3, 1, 0)  # -> HWIO
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        lin = np.asarray(lpips_sd[key], np.float32).reshape(-1)
        assert lin.shape[0] == LAYERS[i][0], f"lin{i}: bad width {lin.shape}"
        arrays[f"lin{i}"] = np.maximum(lin, 0.0)  # lpips clamps heads >= 0
    np.savez(out_path, **arrays)
    return arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/lpips_alexnet.npz")
    ap.add_argument("--self-test", action="store_true",
                    help="round-trip fabricated state dicts (no torch needed)")
    args = ap.parse_args()

    if args.self_test:
        rng = np.random.RandomState(0)
        cin = 3
        alexnet_sd, lpips_sd = {}, {}
        for i, (key, (cout, k, _)) in enumerate(
            zip(["0.weight", "3.weight", "6.weight", "8.weight", "10.weight"], LAYERS)
        ):
            alexnet_sd[key] = rng.randn(cout, cin, k, k).astype(np.float32)
            lpips_sd[f"lin{i}.model.1.weight"] = np.abs(
                rng.randn(1, cout, 1, 1)
            ).astype(np.float32)
            cin = cout
        arrays = export_from_state_dicts(alexnet_sd, lpips_sd, args.out)
        data = np.load(args.out)
        for name, a in arrays.items():
            assert np.array_equal(data[name], a), name
        # the metric must load it and differ from the random-feature fallback
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from ava256_tpu.train.metrics import lpips, lpips_weights_path

        assert lpips_weights_path(args.out) == args.out
        x = rng.rand(1, 64, 64, 3).astype(np.float32) * 255
        y = rng.rand(1, 64, 64, 3).astype(np.float32) * 255
        v_trained = float(lpips(x, y, weights_path=args.out))
        v_rf = float(lpips(x, y))
        assert np.isfinite(v_trained) and v_trained > 0 and v_trained != v_rf
        print(f"self-test OK: {args.out} (trained={v_trained:.4f}, rf={v_rf:.4f})")
        return

    import lpips as lpips_pkg  # noqa: F401  (pip install lpips torchvision)
    import torch
    from torchvision.models import alexnet

    net = alexnet(weights="IMAGENET1K_V1").features
    loss_fn = lpips_pkg.LPIPS(net="alex")
    with torch.no_grad():
        alexnet_sd = {k: v.numpy() for k, v in net.state_dict().items()}
        lpips_sd = {k: v.numpy() for k, v in loss_fn.state_dict().items()}
    export_from_state_dicts(alexnet_sd, lpips_sd, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
