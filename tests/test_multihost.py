# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Two-process jax.distributed smoke test (CPU).

Validates the multi-host batch path: jax.distributed rendezvous, global-array
assembly from process-local shards (`shard_batch` via
jax.make_array_from_process_local_data), and a jitted global reduction.
This is the multi-host execution test the reference never had (its DDP logic
was only exercised by real sbatch jobs — SURVEY.md §4).
"""

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc, mode, timeout):
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "_multihost_worker.py"),
             str(pid), str(nproc), coord, mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out, out
    return outs


def test_two_process_distributed_shard_batch():
    _run_workers(2, "shard", timeout=240)


def test_two_process_full_train_step_matches_single_process():
    """The PRODUCTION train step (pallas backend) executed across 2
    jax.distributed processes must produce the same loss as the identical
    step on a single-process mesh — the multi-host analogue of the
    reference's DDP training step (reference: ddp-train.py:98-113,312)."""
    outs = _run_workers(2, "trainstep", timeout=900)
    losses = []
    for out in outs:
        for line in out.splitlines():
            if " loss " in line:
                losses.append(float(line.split(" loss ")[1]))
    assert len(losses) == 2, outs
    # both processes see the same globally-reduced loss
    assert losses[0] == losses[1], losses

    # single-process reference on a 4-device mesh, same global batch
    from ava256_tpu.parallel.mesh import make_mesh

    from tests._multihost_worker import trainstep_loss

    mesh = make_mesh(n_devices=4, axis_names=("data",))
    ref = trainstep_loss(mesh, 4)
    assert abs(ref - losses[0]) / max(abs(ref), 1e-9) < 1e-5, (ref, losses)
