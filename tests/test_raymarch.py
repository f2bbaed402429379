# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Raymarcher correctness: production XLA marcher vs the pure-JAX oracle.

Port of the reference's gradcheck harness (reference: extensions/mvpraymarch/
mvpraymarch.py:418-745): coherent camera rays, a grid of K primitives with
random SRT, softplus templates; compares forward output and all gradients
(template, primpos, primrot, primscale) by max-abs-diff and normalized dot
product.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ava256_tpu.ops.math3d import rodrigues
from ava256_tpu.ops.raymarch_ref import mvp_raymarch_reference
from ava256_tpu.ops.raymarch_xla import mvp_raymarch_xla


def make_scene(N=2, H=65, W=65, k3=4, M=8, seed=1112, warp=False):
    rng = np.random.RandomState(seed)
    K = k3**3

    focal = np.full((N, 2), W * 4.0, np.float32)
    princpt = np.array([[W * 0.5, H * 0.5]] * N, np.float32)
    px, py = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    pix = np.tile(np.stack([px, py], -1)[None], (N, 1, 1, 1))
    rd = np.concatenate(
        [(pix - princpt[:, None, None]) / focal[:, None, None], np.ones((N, H, W, 1), np.float32)],
        axis=-1,
    )
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.tile(np.array([0.0, 0.0, -4.0], np.float32), (N, H, W, 1))

    max_len = 6.0
    stepsize = max_len / 15.386928
    tminmax = (
        max_len * np.arange(2, dtype=np.float32)[None, None, None, :]
        + rng.rand(N, H, W, 2).astype(np.float32)
    )

    # Primitive grid with jitter
    gx, gy, gz = np.meshgrid(*([np.linspace(-1, 1, k3, dtype=np.float32)] * 3), indexing="ij")
    grid = np.stack([gz, gy, gx], -1).reshape(1, K, 3)
    primpos = (grid + 0.1 * rng.randn(1, K, 3)).astype(np.float32)
    primpos = np.tile(primpos, (N, 1, 1)) * 0.3
    primrot = np.asarray(rodrigues(jnp.asarray(rng.randn(N, K, 3).astype(np.float32))))
    primscale = np.exp(0.1 * np.zeros((N, K, 3), np.float32))

    template = rng.randn(N, K, M, M, M, 4).astype(np.float32)
    template[..., 3] -= 3.5
    template = np.log1p(np.exp(template * 1.5))  # softplus

    warpvol = None
    if warp:
        wg = np.stack(
            np.meshgrid(*([np.linspace(-1, 1, M, dtype=np.float32)] * 3), indexing="ij")[::-1],
            axis=-1,
        )
        warpvol = (0.01 * rng.randn(N, K, M, M, M, 3) + wg[None, None]).astype(np.float32)

    return dict(
        raypos=ro, raydir=rd.astype(np.float32), stepsize=stepsize, tminmax=tminmax,
        primpos=primpos, primrot=primrot, primscale=primscale,
        template=template, warp=warpvol,
    )


def _compare(name, a, b, dp_thresh=0.999, report=None):
    a = np.asarray(a)
    b = np.asarray(b)
    maxdiff = np.abs(a - b).max()
    dp = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-30))
    if report is not None:
        report.append((name, maxdiff, dp))
    assert dp > dp_thresh, f"{name}: dp={dp}, maxdiff={maxdiff}"
    return maxdiff, dp


@pytest.mark.parametrize("warp", [False, True])
def test_xla_matches_oracle_forward_and_grads(warp):
    s = make_scene(N=2, H=33, W=33, k3=3, M=8, warp=warp)
    fargs = dict(fadescale=6.5, fadeexp=7.5)
    max_steps = int(np.ceil((s["tminmax"][..., 1].max()) / s["stepsize"])) + 2

    def run_ref(template, primpos, primrot, primscale, warpvol):
        return mvp_raymarch_reference(
            jnp.asarray(s["raypos"]), jnp.asarray(s["raydir"]), s["stepsize"],
            jnp.asarray(s["tminmax"]), primpos, primrot, primscale, template,
            warpvol, max_steps=max_steps, **fargs,
        )

    def run_xla(template, primpos, primrot, primscale, warpvol):
        return mvp_raymarch_xla(
            jnp.asarray(s["raypos"]), jnp.asarray(s["raydir"]), s["stepsize"],
            jnp.asarray(s["tminmax"]), primpos, primrot, primscale, template,
            warpvol, tile=8, max_hit=32, max_samples=512, chunk_tiles=16, **fargs,
        )

    args = (
        jnp.asarray(s["template"]), jnp.asarray(s["primpos"]),
        jnp.asarray(s["primrot"]), jnp.asarray(s["primscale"]),
        jnp.asarray(s["warp"]) if warp else None,
    )

    out_ref = run_ref(*args)
    out_xla = run_xla(*args)
    report = []
    _compare("fwd", out_ref, out_xla, dp_thresh=0.9999, report=report)

    def loss_ref(t, p, r, sc):
        return jnp.sum(run_ref(t, p, r, sc, args[4]))

    def loss_xla(t, p, r, sc):
        return jnp.sum(run_xla(t, p, r, sc, args[4]))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args[:4])
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args[:4])
    for name, gr, gx in zip(
        ("template", "primpos", "primrot", "primscale"), g_ref, g_xla
    ):
        _compare(f"grad_{name}", gr, gx, dp_thresh=0.999, report=report)

    for name, md, dp in report:
        print(f"{name:14s} maxabsdiff={md:.3e} dp={dp:.6f}")


def test_xla_alpha_saturation_clamped():
    """Dense opaque templates must saturate alpha at exactly 1."""
    s = make_scene(N=1, H=17, W=17, k3=3, M=4)
    tpl = jnp.asarray(np.full_like(s["template"], 5.0))
    out = mvp_raymarch_xla(
        jnp.asarray(s["raypos"]), jnp.asarray(s["raydir"]), s["stepsize"],
        jnp.asarray(s["tminmax"]), jnp.asarray(s["primpos"]),
        jnp.asarray(s["primrot"]), jnp.asarray(s["primscale"]), tpl,
        None, tile=8, max_hit=32, max_samples=128,
    )
    a = np.asarray(out[..., 3])
    assert a.max() <= 1.0 + 1e-5
    assert a.max() > 0.99  # something was hit and saturated


def test_xla_empty_scene_renders_zero():
    s = make_scene(N=1, H=17, W=17, k3=2, M=4)
    # Move all primitives far outside the marched range
    primpos = jnp.asarray(s["primpos"] + 100.0)
    out = mvp_raymarch_xla(
        jnp.asarray(s["raypos"]), jnp.asarray(s["raydir"]), s["stepsize"],
        jnp.asarray(s["tminmax"]), primpos, jnp.asarray(s["primrot"]),
        jnp.asarray(s["primscale"]), jnp.asarray(s["template"]),
        None, tile=8, max_hit=16, max_samples=64,
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_oracle_known_analytic_value():
    """Single axis-aligned box with constant alpha: alpha ~= 1-step sum."""
    N, H, W = 1, 5, 5
    ro = np.tile(np.array([0, 0, -4.0], np.float32), (N, H, W, 1))
    rd = np.tile(np.array([0, 0, 1.0], np.float32), (N, H, W, 1))
    tmm = np.tile(np.array([0.0, 8.0], np.float32), (N, H, W, 1))
    primpos = np.zeros((1, 1, 3), np.float32)
    primrot = np.eye(3, dtype=np.float32)[None, None]
    primscale = np.ones((1, 1, 3), np.float32)
    const_a = 0.25
    tpl = np.zeros((1, 1, 8, 8, 8, 4), np.float32)
    tpl[..., 0] = 100.0
    tpl[..., 3] = const_a
    dt = 0.05
    out = np.asarray(
        mvp_raymarch_reference(
            jnp.asarray(ro), jnp.asarray(rd), dt, jnp.asarray(tmm),
            jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
            jnp.asarray(tpl), fadescale=0.0, fadeexp=2.0, max_steps=200,
        )
    )
    # Central ray passes through z in [-1, 1]: ~2/dt steps each adding a*dt
    expected_alpha = const_a * dt * round(2.0 / dt)
    assert abs(out[0, 2, 2, 3] - expected_alpha) < 0.02
    # rgb = contrib * 100 summed = alpha * 100
    assert abs(out[0, 2, 2, 0] - expected_alpha * 100.0) < 2.0
