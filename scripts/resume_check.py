#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Verify resume-under-fire loss equality from a single train.log.

A killed-and-resumed run logs some iteration numbers twice: once before
the kill and once after the Orbax restore re-executes them (the loader
position and per-step rng are reconstructed deterministically —
train.py's set_position + fold_in). This tool pairs every re-logged
iteration with its pre-kill original and reports the loss deltas; zero
(or float-noise) deltas prove the resumed trajectory equals the
uninterrupted one over the overlap window.

Usage: python scripts/resume_check.py run-.../train.log
"""

from __future__ import annotations

import argparse
import json
import re

IT = re.compile(r"Iteration (\d+) loss = ([\d.naninf-]+),")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    args = ap.parse_args()

    first, second = {}, {}
    for line in open(args.log):
        m = IT.search(line)
        if not m:
            continue
        i, loss = int(m.group(1)), float(m.group(2))
        (second if i in first else first)[i] = loss

    overlap = sorted(second)
    if not overlap:
        print(json.dumps({"overlap_iters": 0, "note": "no re-logged iterations"}))
        return
    deltas = [abs(first[i] - second[i]) for i in overlap]
    rels = [
        d / max(abs(first[i]), 1e-12) for d, i in zip(deltas, overlap)
    ]
    print(
        json.dumps(
            {
                "overlap_iters": len(overlap),
                "overlap_range": [overlap[0], overlap[-1]],
                "max_abs_delta": max(deltas),
                "max_rel_delta": max(rels),
                "exact_matches": sum(1 for d in deltas if d == 0.0),
                "pairs_head": {
                    str(i): [first[i], second[i]] for i in overlap[:5]
                },
            }
        )
    )


if __name__ == "__main__":
    main()
