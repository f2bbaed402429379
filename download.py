#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Download the ava-256 dataset release.

Capability parity with the reference downloader (reference: download.py:27-64,
89-100, 134-245): fetches per-capture asset archives from the public S3
release at `.../ava-256/{size}/{mcd}--{mct}--{sid}/...`. Decoder camera
archives (`image/`, `segmentation_parts/`) are per-camera; the camera list is
discovered from each capture's `camera_calibration.json` KRT entries. Encoder
(headset) data is a frame list plus five fixed IR cameras.

    python download.py --output-dir /data/ava256 --size 4TB -n 4 \
        --captures-file 256_ids.csv --assets image kinematic_tracking
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import sys
import urllib.error
import urllib.request
from multiprocessing.pool import ThreadPool
from pathlib import Path
from typing import Dict, List, Optional, Tuple

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("ava256_download")

BASE_URL = "https://fb-baas-f32eacb9-8abb-11eb-b2b8-4857dd089e15.s3.amazonaws.com/ava-256/"

# Decoder-side asset groups; entries containing {camera} expand per camera
# discovered from the capture's KRT file (reference: download.py:30-66).
ASSETS: Dict[str, List[str]] = {
    "camera_calibration": ["camera_calibration.json"],
    "frame_list": ["frame_list.csv"],
    "head_pose": ["head_pose/head_pose.zip"],
    "image": ["image/cam{camera}.zip"],
    "keypoints_3d": ["keypoints_3d/keypoints_3d.zip"],
    "kinematic_tracking": [
        "kinematic_tracking/registration_vertices_mean.npy",
        "kinematic_tracking/registration_vertices_variance.txt",
        "kinematic_tracking/registration_vertices.zip",
    ],
    "segmentation_parts": ["segmentation_parts/cam{camera}.zip"],
    "uv_image": [
        "uv_image/color_mean.png",
        "uv_image/color_variance.txt",
        "uv_image/color.zip",
    ],
    # Encoder (headset) data: frame list + five fixed IR cameras.
    "encoder": [
        "frame_list.csv",
        "image/cam-cyclop.zip",
        "image/cam-left-eye-atl-temporal.zip",
        "image/cam-left-mouth.zip",
        "image/cam-right-eye-atl-temporal.zip",
        "image/cam-right-mouth.zip",
    ],
}


def read_captures(csv_path: str, n: Optional[int]) -> List[Dict[str, str]]:
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    return rows[:n] if n else rows


def fetch(url: str, dest: Path, retries: int = 3) -> Tuple[str, bool]:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists() and dest.stat().st_size > 0:
        return str(dest), True
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, timeout=60) as r, open(dest, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            return str(dest), True
        except (urllib.error.URLError, OSError) as e:
            logger.warning("retry %d for %s: %s", attempt + 1, url, e)
    return str(dest), False


def discover_cameras(dataset_url: str, folder: str) -> List[str]:
    """Camera IDs for a capture, from its KRT calibration file
    (reference: download.py:91-100)."""
    url = f"{dataset_url}{folder}/decoder/camera_calibration.json"
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            krt = json.load(r)
    except (urllib.error.URLError, OSError, ValueError) as e:
        logger.error("failed to read camera calibration for %s: %s", folder, e)
        return []
    return sorted(entry["cameraId"] for entry in krt["KRT"])


def main() -> int:
    p = argparse.ArgumentParser(description="Download the ava-256 dataset")
    p.add_argument("--output-dir", "-o", required=True)
    p.add_argument("--size", "-s", default="4TB", choices=["4TB", "8TB", "16TB", "32TB"])
    p.add_argument("--captures-file", default="256_ids.csv")
    p.add_argument("-n", type=int, default=None, help="only first N captures")
    p.add_argument("--workers", "-j", type=int, default=8)
    p.add_argument("--base-url", default=BASE_URL)
    p.add_argument(
        "--assets",
        nargs="+",
        default=["all"],
        help=f"asset groups to download: 'all' or any of {sorted(ASSETS)}",
    )
    args = p.parse_args()

    if "all" in args.assets:
        if len(args.assets) > 1:
            p.error("cannot combine 'all' with other asset groups")
        selected = dict(ASSETS)
    else:
        unknown = [a for a in args.assets if a not in ASSETS]
        if unknown:
            p.error(f"unknown asset groups {unknown}; choose from {sorted(ASSETS)}")
        selected = {a: ASSETS[a] for a in args.assets}

    captures = read_captures(args.captures_file, args.n)
    out = Path(args.output_dir)
    dataset_url = f"{args.base_url}{args.size}/"

    jobs: List[Tuple[str, Path]] = []
    for cap in captures:
        folder = f"{cap['mcd']}--{cap['mct']}--{cap['sid']}"
        cameras: Optional[List[str]] = None
        for group, paths in selected.items():
            side = "encoder" if group == "encoder" else "decoder"
            for asset in paths:
                if "{camera}" in asset:
                    if cameras is None:
                        cameras = discover_cameras(dataset_url, folder)
                        logger.info("%s: %d cameras", folder, len(cameras))
                    expanded = [asset.format(camera=c) for c in cameras]
                else:
                    expanded = [asset]
                for rel in expanded:
                    jobs.append(
                        (f"{dataset_url}{folder}/{side}/{rel}", out / folder / side / rel)
                    )

    logger.info("%d files to download", len(jobs))
    failed = []
    with ThreadPool(args.workers) as pool:
        for path, ok in pool.imap_unordered(lambda j: fetch(*j), jobs):
            if not ok:
                failed.append(path)
    if failed:
        logger.error("%d downloads failed: %s ...", len(failed), failed[:5])
        return 1
    logger.info("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
