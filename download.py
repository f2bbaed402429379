#!/usr/bin/env python3
"""Download the ava-256 dataset release.

Capability parity with the reference downloader (reference: download.py:30-249):
fetches per-capture asset archives (camera calibration, frame list, head pose,
images, keypoints, kinematic tracking, segmentation parts, uv images, and the
encoder IR cameras) from the public S3 bucket with a worker pool, supporting
the 4/8/16/32 TB release sizes and per-capture camera discovery.

    python download.py --output-dir /data/ava256 --size 4 --workers 8 \
        --captures 256_ids.csv --n 4
"""

from __future__ import annotations

import argparse
import csv
import logging
import sys
import urllib.error
import urllib.request
from multiprocessing.pool import ThreadPool
from pathlib import Path
from typing import Dict, List, Optional, Tuple

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("ava256_download")

BASE_URL = "https://fb-baas-f32eacb9-8abb-11eb-b2b8-4857dd089e15.s3.amazonaws.com/AvatarRES"

# Decoder-side assets present for every capture
DECODER_ASSETS = [
    "camera_calibration.json",
    "frame_list.csv",
    "head_pose/head_pose.zip",
    "keypoints_3d/keypoints_3d.zip",
    "kinematic_tracking/registration_vertices.zip",
    "kinematic_tracking/registration_vertices_mean.npy",
    "kinematic_tracking/registration_vertices_variance.txt",
    "segmentation_parts/segmentation_parts.zip",
    "uv_image/color.zip",
    "uv_image/color_mean.png",
    "uv_image/color_variance.txt",
]

# Encoder-side (headset) assets
ENCODER_ASSETS = [
    "camera_calibration.json",
    "frame_list.csv",
    "image/cam-cyclop.zip",
    "image/cam-left-eye-atl-temporal.zip",
    "image/cam-right-eye-atl-temporal.zip",
    "image/cam-left-mouth.zip",
    "image/cam-right-mouth.zip",
]


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


def discover_cameras(base: str, folder: str, size: str) -> List[str]:
    """Fetch the per-capture camera list (decoder image archives are
    per-camera; the release ships a cameras.txt manifest per capture)."""
    url = f"{base}/{size}TB/{folder}/decoder/image/cameras.txt"
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            return [line.strip() for line in r.read().decode().splitlines() if line.strip()]
    except (urllib.error.URLError, OSError):
        logger.warning("no camera manifest for %s; skipping image archives", folder)
        return []


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", required=True)
    p.add_argument("--size", default="4", choices=["4", "8", "16", "32"],
                   help="release size in TB")
    p.add_argument("--captures", default="256_ids.csv")
    p.add_argument("--n", type=int, default=None, help="only first N captures")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--base-url", default=BASE_URL)
    p.add_argument("--skip-encoder", action="store_true")
    args = p.parse_args()

    captures = read_captures(args.captures, args.n)
    out = Path(args.output_dir)

    jobs: List[Tuple[str, Path]] = []
    for cap in captures:
        folder = f"{cap['mcd']}--{cap['mct']}--{cap['sid']}"
        root = f"{args.base_url}/{args.size}TB/{folder}"
        for asset in DECODER_ASSETS:
            jobs.append((f"{root}/decoder/{asset}", out / folder / "decoder" / asset))
        for cam in discover_cameras(args.base_url, folder, args.size):
            jobs.append(
                (
                    f"{root}/decoder/image/cam{cam}.zip",
                    out / folder / "decoder" / "image" / f"cam{cam}.zip",
                )
            )
        if not args.skip_encoder:
            for asset in ENCODER_ASSETS:
                jobs.append((f"{root}/encoder/{asset}", out / folder / "encoder" / asset))

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
