#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Visualize registration meshes from a capture: camera-image overlay and 3D
scatter. Capability parity with the reference demo (reference: demos/mesh.py).

    python demos/mesh.py --capture-dir /data/.../decoder --frame 1 --camera 401168
"""

from __future__ import annotations

import argparse

import numpy as np

from ava256_tpu.data.dataset import MugsyCapture, SingleCaptureDataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capture-dir", required=True)
    p.add_argument("--frame", type=int, default=None, help="frame id (default: first)")
    p.add_argument("--camera", default=None, help="camera id (default: first)")
    p.add_argument("--downsample", type=int, default=8)
    p.add_argument("--output", default="mesh_demo.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ds = SingleCaptureDataset(
        MugsyCapture("0", "0", "demo"), args.capture_dir, downsample=args.downsample
    )
    camera = args.camera or ds.cameras[0]
    frame = str(args.frame) if args.frame is not None else ds.framelist[0][1]
    item = ds.fetch(frame, camera)
    if item is None:
        raise SystemExit(f"failed to load frame {frame} camera {camera}")

    # Project (denormalized, head-relative) vertices into the image.
    verts = item["verts"] * ds.vertstd + ds.vertmean  # [V, 3]
    cam = item["camrot"] @ verts.T + (  # world->camera
        -item["camrot"] @ item["campos"]
    ).reshape(3, 1)
    uv = cam[:2] / cam[2:]
    px = uv[0] * item["focal"][0] + item["princpt"][0]
    py = uv[1] * item["focal"][1] + item["princpt"][1]

    fig = plt.figure(figsize=(12, 6))
    ax = fig.add_subplot(1, 2, 1)
    img = item["image"] / 255.0
    ax.imshow(np.clip(img, 0, 1))
    ax.scatter(px, py, s=0.05, c="lime")
    ax.set_title(f"frame {frame} cam {camera}")
    ax.axis("off")

    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    ax3.scatter(verts[:, 0], verts[:, 1], verts[:, 2], s=0.2)
    ax3.set_title("registration mesh")
    fig.savefig(args.output, dpi=120, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
