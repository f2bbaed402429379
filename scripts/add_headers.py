#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Add (or check) license headers on all Python sources.

Capability parity with the reference tool (reference: add_headers.py).

    python scripts/add_headers.py [--check]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

HEADER = """# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", action="store_true", help="only report files")
    parser.add_argument("--root", default=".")
    args = parser.parse_args()

    missing = []
    for path in sorted(Path(args.root).rglob("*.py")):
        if any(part.startswith(".") or part == "run" for part in path.parts):
            continue
        text = path.read_text()
        shebang = ""
        body = text
        if body.startswith("#!"):
            nl = body.index("\n") + 1
            shebang, body = body[:nl], body[nl:]
        if body.startswith(HEADER):
            continue
        missing.append(path)
        if not args.check:
            path.write_text(shebang + HEADER + body)

    if args.check and missing:
        print("\n".join(str(p) for p in missing))
        return 1
    print(f"{'missing' if args.check else 'updated'}: {len(missing)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
