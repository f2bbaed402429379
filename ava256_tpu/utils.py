# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Misc framework utilities: image strips, logging helpers.

Capability parity targets: render_img (reference: utils.py:387-406) and the
hostname-tagged logging (reference: ddp-train.py:44-59).
"""

from __future__ import annotations

import logging
import platform
import sys
from typing import Sequence

import numpy as np


def render_img(listsofimages: Sequence[Sequence[np.ndarray]], outpath: str) -> None:
    """Tile a list of rows of HWC images into one image and save it."""
    from PIL import Image

    rows = [np.hstack([np.asarray(i) for i in images]) for images in listsofimages]
    rgb = np.vstack(rows)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    Image.fromarray(rgb).save(outpath)


class HostnameFilter(logging.Filter):
    hostname = platform.node()

    def filter(self, record):
        record.hostname = HostnameFilter.hostname
        return True


def setup_logging(level=logging.INFO) -> logging.Logger:
    root = logging.getLogger()
    root.setLevel(level)
    if not any(isinstance(h, logging.StreamHandler) for h in root.handlers):
        handler = logging.StreamHandler(sys.stdout)
        handler.setLevel(level)
        handler.addFilter(HostnameFilter())
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(hostname)s - %(name)s - %(levelname)s - %(message)s"
            )
        )
        root.addHandler(handler)
    return root
