#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Input-pipeline throughput benchmark.

Builds an on-disk capture fixture at the real dome resolution (4096x2668)
in the release's own codec (AVIF, decoded natively by Pillow >= 12; --codec
png for comparison) and measures ShardedLoader items/s end to end for a
range of worker counts.

The flagship training rate needs batch(4) x steps/s items per host; compare
the printed items/s against that (reference loads with 4 worker processes,
reference: ddp-train.py:139).

Usage: python scripts/loaderbench.py [--frames 24] [--items 48] [--downsample 8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import time
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NVERTS = 7306


def _encode(img: np.ndarray, codec: str = "png") -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    if codec == "avif":
        # speed=10/quality=60 ~ the release's capture-pipeline settings ballpark
        Image.fromarray(img).save(buf, format="AVIF", quality=60, speed=10)
    else:
        Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _ply(verts: np.ndarray) -> bytes:
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        + f"element vertex {len(verts)}\n".encode()
        + b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    return header + verts.astype("<f4").tobytes()


def build_fixture(root: Path, n_frames: int, full_res: bool = True, codec: str = "png"):
    rng = np.random.RandomState(0)
    (root / "image").mkdir(parents=True)
    (root / "uv_image").mkdir()
    (root / "kinematic_tracking").mkdir()
    (root / "head_pose").mkdir()
    cameras = ["cam001", "cam002"]
    frames = [f"{i+1:06d}" for i in range(n_frames)]
    h, w = (4096, 2668) if full_res else (512, 334)

    krt = {
        "KRT": [
            {
                "cameraId": c,
                "K": [[2000, 0, 0], [0, 2000, 0], [1334, 2048, 1]],
                "T": [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1000.0]],
                "distortion": [0, 0, 0, 0],
            }
            for c in cameras
        ]
    }
    (root / "camera_calibration.json").write_text(json.dumps(krt))
    with open(root / "frame_list.csv", "w") as f:
        f.write("seg_id,frame_id\n")
        f.write("EXP_neutral_peak,1\n")
        for fr in frames[1:]:
            f.write(f"EXP_smile,{int(fr)}\n")

    # one real photo-sized image reused per frame entry (exercises decode+resize)
    img_bytes = _encode(rng.randint(0, 255, (h, w, 3), np.uint8), codec)
    for cam in cameras:
        with zipfile.ZipFile(root / "image" / f"cam{cam}.zip", "w") as z:
            for fr in frames:
                z.writestr(f"cam{cam}/{int(fr):06d}.{codec}", img_bytes)
    tex_bytes = _encode(rng.randint(0, 255, (1024, 1024, 3), np.uint8), codec)
    with zipfile.ZipFile(root / "uv_image" / "color.zip", "w") as z:
        for fr in frames:
            z.writestr(f"color/{int(fr):06d}.{codec}", tex_bytes)
    (root / "uv_image" / "color_mean.png").write_bytes(
        _encode(rng.randint(0, 255, (1024, 1024, 3), np.uint8))
    )
    (root / "uv_image" / "color_variance.txt").write_text("625.0")
    verts = rng.randn(NVERTS, 3).astype(np.float32) * 10
    with zipfile.ZipFile(
        root / "kinematic_tracking" / "registration_vertices.zip", "w"
    ) as z:
        for fr in frames:
            z.writestr(f"{int(fr):06d}.ply", _ply(verts))
    np.save(root / "kinematic_tracking" / "registration_vertices_mean.npy", verts)
    (root / "kinematic_tracking" / "registration_vertices_variance.txt").write_text(
        "4.0"
    )
    with zipfile.ZipFile(root / "head_pose" / "head_pose.zip", "w") as z:
        pose = np.eye(4, dtype=np.float32)[:3]
        for fr in frames:
            z.writestr(
                f"{int(fr):06d}.txt",
                "\n".join(" ".join(str(v) for v in row) for row in pose),
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--items", type=int, default=48)
    ap.add_argument("--downsample", type=int, default=8)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--processes", action="store_true")
    ap.add_argument("--small", action="store_true", help="512x334 source images")
    ap.add_argument("--codec", choices=["avif", "png"], default=None,
                    help="fixture image codec (default: avif when Pillow decodes it)")
    args = ap.parse_args()

    from ava256_tpu.data.dataset import MugsyCapture, SingleCaptureDataset
    from ava256_tpu.data.loader import ShardedLoader

    with tempfile.TemporaryDirectory() as td:
        codec = args.codec
        if codec is None:
            from PIL import features

            codec = "avif" if features.check("avif") else "png"
        root = Path(td) / "decoder"
        t0 = time.time()
        build_fixture(root, args.frames, full_res=not args.small, codec=codec)
        build_s = time.time() - t0

        cap = MugsyCapture(mcd="20260101", mct="0000", sid="bench")
        ds = SingleCaptureDataset(cap, str(root), downsample=args.downsample)
        n = min(args.items, len(ds))

        # single-thread decode cost
        t0 = time.time()
        for i in range(min(4, n)):
            ds[i]
        per_item_s = (time.time() - t0) / min(4, n)

        results = {}
        for nw in (int(x) for x in args.workers.split(",")):
            loader = ShardedLoader(
                ds, batch_size=4, shuffle=False, num_workers=nw,
                host_id=0, num_hosts=1, use_processes=args.processes,
            )
            got = 0
            t0 = time.time()
            for batch in loader:
                if batch is None:
                    continue
                got += len(batch["image"])
                if got >= n:
                    break
            dt = time.time() - t0
            results[f"items_per_s_w{nw}"] = round(got / dt, 2)

        flagship_need = 4 * 0.5  # batch 4 x ~0.5 steps/s target
        print(
            json.dumps(
                {
                    "source_px": "512x334" if args.small else "4096x2668",
                    "codec": codec,
                    "downsample": args.downsample,
                    "workers": "processes" if args.processes else "threads",
                    "single_thread_item_s": round(per_item_s, 3),
                    **results,
                    "flagship_need_items_per_s": flagship_need,
                    "fixture_build_s": round(build_s, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
