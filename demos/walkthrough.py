#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Guided dataset walkthrough — the script equivalent of the reference's
Data_Visualization_Demo.ipynb (reference: Data_Visualization_Demo.ipynb runs
an image sample, keypoints-on-image/3D, mesh-on-image/3D, and a segmentation
demo over one capture).

Given a capture's decoder directory, this prints the on-disk release layout
(sections found/missing), loads one (frame, camera) item through the real
SingleCaptureDataset pipeline, and writes a single contact sheet
``walkthrough.png`` with: the camera image, the registration mesh projected
onto it, the unwrapped texture, and — when the capture ships them — 3D
keypoints and a segmentation frame. Sections whose assets are absent are
skipped with a note, so it runs on both full release captures and the small
CI fixture (scripts/loaderbench.py --keep-fixture builds one).

    python demos/walkthrough.py --capture-dir /data/.../decoder
"""

from __future__ import annotations

import argparse
import io
import zipfile
from pathlib import Path

import numpy as np

from ava256_tpu.data.dataset import MugsyCapture, SingleCaptureDataset

SECTIONS = (
    "camera_calibration.json", "frame_list.csv", "image", "uv_image",
    "kinematic_tracking", "head_pose", "keypoints_3d", "segmentation_parts",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capture-dir", required=True)
    p.add_argument("--frame", type=int, default=None)
    p.add_argument("--camera", default=None)
    p.add_argument("--downsample", type=int, default=8)
    p.add_argument("--output", default="walkthrough.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root = Path(args.capture_dir)
    print(f"capture: {root}")
    for s in SECTIONS:
        mark = "found  " if (root / s).exists() else "MISSING"
        print(f"  [{mark}] {s}")

    ds = SingleCaptureDataset(
        MugsyCapture("0", "0", "walkthrough"), str(root),
        downsample=args.downsample,
    )
    print(f"cameras: {len(ds.cameras)} {ds.cameras[:6]}{'...' if len(ds.cameras) > 6 else ''}")
    print(f"frames:  {len(ds.framelist)} (first: {ds.framelist[0]})")
    camera = args.camera or ds.cameras[0]
    frame = str(args.frame) if args.frame is not None else ds.framelist[0][1]
    item = ds.fetch(frame, camera)
    if item is None:
        raise SystemExit(f"failed to load frame {frame} camera {camera}")
    print(f"item fields: {sorted(item.keys())}")

    fig, axes = plt.subplots(1, 4, figsize=(20, 5))
    for ax in axes:
        ax.axis("off")

    # 1. camera image (the notebook's "Image Sample" cell)
    img = np.clip(item["image"] / 255.0, 0, 1)
    axes[0].imshow(img)
    axes[0].set_title(f"image — frame {frame} cam {camera}")

    # 2. registration mesh projected into the image (demos/mesh.py logic)
    verts = item["verts"] * ds.vertstd + ds.vertmean
    cam_xyz = item["camrot"] @ verts.T + (
        -item["camrot"] @ item["campos"]
    ).reshape(3, 1)
    uv = cam_xyz[:2] / cam_xyz[2:]
    px = uv[0] * item["focal"][0] + item["princpt"][0]
    py = uv[1] * item["focal"][1] + item["princpt"][1]
    axes[1].imshow(img)
    axes[1].scatter(px, py, s=0.05, c="lime")
    axes[1].set_title(f"registration mesh ({len(verts)} verts)")

    # 3. unwrapped texture
    if "avgtex" in item:
        tex = item["avgtex"]
        tex = (tex - tex.min()) / max(tex.max() - tex.min(), 1e-6)
        axes[2].imshow(np.clip(tex, 0, 1))
        axes[2].set_title("unwrapped uv texture")
    else:
        axes[2].set_title("uv texture: not in item")

    # 4. keypoints or segmentation, whichever the capture ships
    kp_dir = root / "keypoints_3d"
    seg = root / "segmentation_parts" / "segmentation_parts.zip"
    if kp_dir.exists():
        from demos.keypoints import load_keypoints

        kp = load_keypoints(str(root), int(frame))
        axes[3].remove()
        ax3 = fig.add_subplot(1, 4, 4, projection="3d")
        ax3.scatter(kp[:, 0], kp[:, 1], kp[:, 2], s=4)
        ax3.set_title(f"3D keypoints ({len(kp)})")
    elif seg.exists():
        with zipfile.ZipFile(seg) as z:
            name = sorted(n for n in z.namelist() if not n.endswith("/"))[0]
            from PIL import Image

            axes[3].imshow(
                np.asarray(Image.open(io.BytesIO(z.read(name)))), cmap="tab20"
            )
        axes[3].set_title(f"segmentation: {Path(name).stem}")
    else:
        axes[3].set_title("keypoints/segmentation: not shipped")
        print("note: no keypoints_3d or segmentation_parts in this capture")

    fig.savefig(args.output, dpi=110, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
