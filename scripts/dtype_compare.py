#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Compare two flagship training logs (fp32 arm vs bf16 arm).

Extracts per-iteration loss and step time plus the every-100-iter PSNR
probes, and prints median loss / step time over a trailing window and the
loss trajectory at decade iterations — the VERDICT round-3 item 8 table
(fp32 vs bf16 at flagship scale) is generated from this.

Usage: python scripts/dtype_compare.py LOG_A LOG_B [--window 50]
"""

from __future__ import annotations

import argparse
import json
import re
import statistics

IT = re.compile(
    r"Iteration (\d+) loss = ([0-9.]+).*?time: ([0-9.]+) s"
)
PR = re.compile(r"Progress iter (\d+): PSNR ([0-9.]+) dB")


def parse(path):
    iters, psnr = {}, {}
    with open(path) as f:
        for line in f:
            m = IT.search(line)
            if m:
                iters[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
            m = PR.search(line)
            if m:
                psnr[int(m.group(1))] = float(m.group(2))
    return iters, psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_a")
    ap.add_argument("log_b")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--label-a", default="fp32")
    ap.add_argument("--label-b", default="bf16")
    args = ap.parse_args()

    out = {}
    arms = {}
    for label, path in ((args.label_a, args.log_a), (args.label_b, args.log_b)):
        iters, psnr = parse(path)
        arms[label] = (iters, psnr)
        n = max(iters) if iters else 0
        tail = [iters[i][0] for i in range(max(0, n - args.window), n + 1) if i in iters]
        # steady-state step time: drop the first 3 iters (compile) and any
        # top-2% outliers (progress-render iterations)
        times = sorted(iters[i][1] for i in iters if i >= 3)
        out[label] = {
            "iters": n + 1,
            "median_tail_loss": round(statistics.median(tail), 4) if tail else None,
            "median_step_s": round(statistics.median(times), 4) if times else None,
            "p90_step_s": round(times[int(0.9 * len(times))], 4) if times else None,
            "psnr_probes": {str(k): v for k, v in sorted(psnr.items())},
        }

    la, lb = args.label_a, args.label_b
    common = sorted(
        set(arms[la][0]) & set(arms[lb][0]) & {10, 50, 100, 200, 300, 400, 500, 599}
    )
    out["loss_trajectory"] = {
        str(i): {la: arms[la][0][i][0], lb: arms[lb][0][i][0]} for i in common
    }
    if out[la]["median_step_s"] and out[lb]["median_step_s"]:
        out["speedup"] = round(out[la]["median_step_s"] / out[lb]["median_step_s"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
