#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Per-op device-time profile of the flagship train step.

Runs one steady-state train step under ``jax.profiler.trace`` and aggregates
the XLA-op lane of the resulting trace by the ``source`` attribution XLA
records for each fusion, printing a table of device seconds per source line.
This is the tool that exposes where a step actually spends its time — op by
op, attributed to model code — where stage-level timing (scripts/stepprof.py)
can only bound whole modules.

Usage: python scripts/traceprof.py [--batch 4] [--hw 512x334] [--nprims 16384]
       [--trace-dir /tmp/jaxtrace] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir: str, top: int) -> None:
    files = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    events = tr["traceEvents"]

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n}
    tids = {}
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in dev_pids
        ):
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lanes = {k for k, n in tids.items() if n == "XLA Ops"}

    by_src = collections.Counter()
    cnt = collections.Counter()
    nosrc = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        d = e.get("dur", 0) / 1e6
        total += d
        src = e.get("args", {}).get("source")
        if src:
            by_src[src.replace("/root/repo/", "")] += d
            cnt[src.replace("/root/repo/", "")] += 1
        else:
            nosrc[e["name"]] += d

    print(f"total device time: {total:.4f}s")
    print("=== by source line ===")
    for s, d in by_src.most_common(top):
        print(f"{d:8.4f}s x{cnt[s]:<5} {s}")
    print(f"=== unattributed: {sum(nosrc.values()):.4f}s, top ops ===")
    for n, d in nosrc.most_common(10):
        print(f"{d:8.4f}s {n[:90]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="512x334")
    ap.add_argument("--nprims", type=int, default=16384)
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument(
        "--aggregate-only",
        action="store_true",
        help="skip running; re-aggregate the latest trace in --trace-dir",
    )
    args = ap.parse_args()

    if not args.aggregate_only:
        from ava256_tpu.platform import respect_env_platforms

        respect_env_platforms()
        import jax

        from __graft_entry__ import _build
        from ava256_tpu.train.init import init_model
        from ava256_tpu.train.state import create_train_state, make_optimizer
        from ava256_tpu.train.step import make_train_step

        h, w = map(int, args.hw.split("x"))
        model, mb, dataset = _build(
            texsize=1024, nprims=args.nprims, height=h, width=w, batch=args.batch
        )
        rng = jax.random.PRNGKey(0)
        variables = init_model(model, rng, mb)
        tx = make_optimizer()
        state = create_train_state(variables, tx)
        ts = make_train_step(
            model,
            tx,
            {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01},
            dataset.vertmean,
            dataset.vertstd,
        )
        state, loss, _ = ts(
            state, mb, rng, running_avg_scale=True, use_gt_geo=True,
            residuals_weight=0.0,
        )
        jax.block_until_ready(loss)
        state, loss, _ = ts(state, mb, rng)
        jax.block_until_ready(loss)
        with jax.profiler.trace(args.trace_dir):
            state, loss, _ = ts(state, mb, rng)
            jax.block_until_ready(loss)

    aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
