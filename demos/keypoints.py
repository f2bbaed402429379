#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Visualize 3D keypoints from a capture's keypoints_3d archive.
Capability parity with the reference demo (reference: demos/keypoints.py).

    python demos/keypoints.py --capture-dir /data/.../decoder --frame 1
"""

from __future__ import annotations

import argparse
import io
import zipfile
from pathlib import Path

import numpy as np


def load_keypoints(capture_dir: str, frame: int) -> np.ndarray:
    with zipfile.ZipFile(Path(capture_dir) / "keypoints_3d" / "keypoints_3d.zip") as z:
        names = z.namelist()
        target = f"{frame:06d}"
        for name in names:
            if target in name:
                data = z.read(name)
                if name.endswith(".npy"):
                    return np.load(io.BytesIO(data))
                return np.loadtxt(io.BytesIO(data), dtype=np.float32, ndmin=2)
    raise FileNotFoundError(f"no keypoints for frame {frame}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capture-dir", required=True)
    p.add_argument("--frame", type=int, default=1)
    p.add_argument("--output", default="keypoints_demo.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kp = load_keypoints(args.capture_dir, args.frame)
    xyz = kp[:, :3] if kp.shape[1] >= 3 else kp

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], s=4)
    ax.set_title(f"3D keypoints, frame {args.frame} ({len(xyz)} points)")
    fig.savefig(args.output, dpi=120, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
