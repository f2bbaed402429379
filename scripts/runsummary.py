#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Summarize a training log: loss / per-term / PSNR / step-time curves.

Reads the train.py log stream and prints a compact JSON with downsampled
curves, suitable for pasting into docs/convergence notes.

Usage: python scripts/runsummary.py /path/to/train.log [--every 100]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

IT = re.compile(
    r"Iteration (\d+) loss = ([\d.naninf-]+), (.*) time: ([\d.]+) s"
)
PR = re.compile(r"Progress iter (\d+): PSNR ([\d.naninf-]+) dB")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=100)
    args = ap.parse_args()

    loss, terms, times, psnr = {}, {}, [], {}
    for line in open(args.log, errors="replace"):
        m = IT.search(line)
        if m:
            it = int(m.group(1))
            times.append(float(m.group(4)))
            if it % args.every == 0:
                loss[it] = float(m.group(2))
                terms[it] = {
                    k: float(v)
                    for k, v in re.findall(r"(\w+) = ([\d.naninf-]+)", m.group(3))
                }
            continue
        m = PR.search(line)
        if m and int(m.group(1)) % args.every == 0:
            psnr[int(m.group(1))] = float(m.group(2))

    n = len(times)
    steady = sorted(times[n // 2:]) if n >= 20 else sorted(times)
    rep = {
        "iters": n,
        "loss": loss,
        "psnr_db": psnr,
        "terms_last": terms[max(terms)] if terms else None,
        "step_s_median_steady": round(steady[len(steady) // 2], 3) if steady else None,
        "step_s_p90_steady": round(steady[int(len(steady) * 0.9)], 3) if steady else None,
    }
    json.dump(rep, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
