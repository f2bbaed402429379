# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Camera calibration (KRT JSON) loading.

Capability parity with the reference loader (reference: utils.py:142-175).
The on-disk format is a JSON file with a top-level "KRT" list; each entry has
"cameraId", a 4x4-ish "T" (world-from-camera, stored transposed), a 3x3 "K"
(stored transposed) and radial-tangential "distortion" coefficients.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Union

import numpy as np


def load_camera_calibration(path: Union[str, Path]) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a KRT file containing per-camera calibration.

    Returns a dict keyed by camera id with:
        intrin: [3,3] intrinsics
        extrin: [3,4] world-to-camera extrinsics [R|t]
        dist:   distortion coefficients (radial-tangential, padded)
        model/height/width: metadata
    """
    with open(path, "r") as f:
        camera_list = json.load(f)["KRT"]

    cameras: Dict[str, Dict[str, np.ndarray]] = {}
    for item in camera_list:
        rt = np.array(item["T"])[:4, :3].T
        cameras[item["cameraId"]] = {
            "intrin": np.array(item["K"]).T,
            "extrin": rt,
            "dist": np.array(item["distortion"] + [0.0]),
            "model": "radial-tangential",
            "height": 4096,
            "width": 2668,
        }
    return cameras


def camera_params(
    krt: Dict[str, np.ndarray], downsample: int = 1
) -> Dict[str, np.ndarray]:
    """Convert a KRT entry to (campos, camrot, focal, princpt) arrays.

    Mirrors the per-camera preprocessing the reference dataset applies
    (reference: data/ava_dataset.py:236-242).
    """
    extrin = krt["extrin"]
    intrin = krt["intrin"]
    return {
        "campos": (-extrin[:3, :3].T @ extrin[:3, 3]).astype(np.float32),
        "camrot": extrin[:3, :3].astype(np.float32),
        "focal": (np.diag(intrin[:2, :2]) / downsample).astype(np.float32),
        "princpt": (intrin[:2, 2] / downsample).astype(np.float32),
    }
