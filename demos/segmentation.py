#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Visualize segmentation parts as a frame grid / animation.
Capability parity with the reference demo (reference: demos/segmentation.py).

    python demos/segmentation.py --capture-dir /data/.../decoder --frames 8
"""

from __future__ import annotations

import argparse
import io
import zipfile
from pathlib import Path

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capture-dir", required=True)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--output", default="segmentation_demo.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    archive = Path(args.capture_dir) / "segmentation_parts" / "segmentation_parts.zip"
    with zipfile.ZipFile(archive) as z:
        names = sorted(n for n in z.namelist() if not n.endswith("/"))[: args.frames]
        imgs = [np.asarray(Image.open(io.BytesIO(z.read(n)))) for n in names]

    cols = min(4, len(imgs))
    rows = -(-len(imgs) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    for i, ax in enumerate(axes.ravel()):
        ax.axis("off")
        if i < len(imgs):
            ax.imshow(imgs[i], cmap="tab20")
            ax.set_title(Path(names[i]).stem, fontsize=8)
    fig.savefig(args.output, dpi=120, bbox_inches="tight")
    print(f"wrote {args.output} ({len(imgs)} frames)")


if __name__ == "__main__":
    main()
