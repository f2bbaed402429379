# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Build the native data-IO library: python -m ava256_tpu.native.build"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build() -> Path:
    here = Path(__file__).parent
    src = here / "dataio.cpp"
    out = here / "libavadataio.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
