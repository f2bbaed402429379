# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Tracing and per-step timing (first-class, per SURVEY.md §5).

The reference only wall-clocks iterations and dumps ``timesinfo_r{rank}.npy``
at the end (reference: ddp-train.py:367,446,540-543). Here profiling is a
subsystem: a step timer with percentile summaries persisted in the same
timesinfo format, plus jax.profiler trace capture for the TPU timeline
(viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np


class StepTimer:
    """Accumulates per-step wall times and writes timesinfo summaries."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self.start_time = time.time()

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        t0 = time.time()
        yield
        self.times.append(time.time() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0, "totaltime": time.time() - self.start_time}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "totaltime": time.time() - self.start_time,
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_sec": float(1.0 / max(np.median(arr), 1e-9)),
        }

    def save(self, outpath: str, rank: int = 0) -> None:
        info = self.summary()
        info["maxiter"] = len(self.times)
        np.save(Path(outpath) / f"timesinfo_r{rank}", info, allow_pickle=True)


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir`` (no-op if None)."""
    if not logdir:
        yield
        return
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
