# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Training infrastructure: losses, optimizer schedule, checkpoint round-trip,
metrics."""

import numpy as np
import pytest

import jax.numpy as jnp

from ava256_tpu.train.losses import compute_losses
from ava256_tpu.train.metrics import psnr, ssim
from ava256_tpu.train.state import (
    create_train_state,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    step_lr_schedule,
)


def test_losses():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    verts = jnp.asarray(rng.randn(2, 10, 3).astype(np.float32))
    vertmean = jnp.zeros((10, 3))
    out = {
        "irgbrec": img + 0.5,
        "verts": verts,
        "primscale": jnp.full((2, 4, 3), 2.0),
        "expr_mu": jnp.zeros((2, 4, 4, 16)),
        "expr_logstd": jnp.zeros((2, 4, 4, 16)),
    }
    batch = {"image": img, "verts": verts}
    weights = {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01}
    total, terms = compute_losses(out, batch, weights, vertmean, 1.0)
    np.testing.assert_allclose(float(terms["irgbl1"]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(terms["vertl1"]), 0.0, atol=1e-6)
    # primvolsum = sum over K of prod(1/2) = 4 * 1/8 = 0.5
    np.testing.assert_allclose(float(terms["primvolsum"]), 0.5, atol=1e-6)
    # KL at mu=0, logstd=0: -0.5 + 0 + 0 + 0.5 = 0
    np.testing.assert_allclose(float(terms["kldiv"]), 0.0, atol=1e-6)
    assert float(total) == pytest.approx(0.5 + 0.005, abs=1e-5)


def test_step_lr_schedule():
    sched = step_lr_schedule(2e-4, 1.4, 10_000)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(9_999)) == pytest.approx(2e-4)
    # StepLR bumps once at 10k and then holds (reference steps its scheduler
    # only while iternum <= lr_scheduler_iter; ddp-train.py:564-565)
    assert float(sched(10_000)) == pytest.approx(2.8e-4)
    assert float(sched(500_000)) == pytest.approx(2.8e-4)


def test_optimizer_scrubs_nonfinite():
    tx = make_optimizer()
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0, jnp.nan, jnp.inf, -1.0])}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_checkpoint_roundtrip(tmp_path):
    tx = make_optimizer()
    variables = {
        "params": {"layer": {"w": jnp.arange(6.0).reshape(2, 3)}},
        "stats": {"adaptwarps": jnp.full((5,), 2.0)},
    }
    state = create_train_state(variables, tx)
    state = state.replace(step=jnp.int32(42))
    save_checkpoint(str(tmp_path / "ckpt"), state)

    template = create_train_state(
        {
            "params": {"layer": {"w": jnp.zeros((2, 3))}},
            "stats": {"adaptwarps": jnp.zeros((5,))},
        },
        tx,
    )
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 42
    np.testing.assert_array_equal(
        np.asarray(restored.params["layer"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    np.testing.assert_array_equal(np.asarray(restored.stats["adaptwarps"]), 2.0)


def test_psnr_ssim():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 255)
    assert float(psnr(img, img)) > 100
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
    noisy = img + 10.0
    p = float(psnr(noisy, img))
    assert 25 < p < 31  # mse=100 -> 10*log10(255^2/100) ~= 28.1
    assert float(ssim(noisy, img)) < 1.0


def test_lpips():
    from ava256_tpu.train.metrics import lpips

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 255.0
    small = np.clip(x + rng.randn(*x.shape) * 5.0, 0, 255).astype(np.float32)
    big = np.clip(x + rng.randn(*x.shape) * 60.0, 0, 255).astype(np.float32)
    d0 = float(lpips(x, x))
    d1 = float(lpips(x, small))
    d2 = float(lpips(x, big))
    assert d0 < 1e-6
    assert d0 < d1 < d2, (d0, d1, d2)


def test_config_dotted_override_scalars():
    from ava256_tpu.config import Config

    c = Config.from_nested({"model": {"bgmodel": True, "lr": 1.0}})
    c.merge_dotted(["model.bgmodel=false", "model.lr=2e-4", "model.name=abc"])
    assert c.model.bgmodel is False
    assert c.model.lr == 2e-4
    assert c.model.name == "abc"


def test_config_override_warns_on_unknown_key(caplog):
    import logging

    from ava256_tpu.config import Config

    c = Config.from_nested({"train": {"maxiter": 10}})
    with caplog.at_level(logging.WARNING):
        c.merge_dotted(["train.maxiter=20"])
    assert not caplog.records
    with caplog.at_level(logging.WARNING):
        c.merge_dotted(["train.outdir=foo"])
    assert any("train.outdir" in r.getMessage() for r in caplog.records)
