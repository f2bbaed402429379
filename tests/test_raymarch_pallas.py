"""Pallas raymarch kernels vs the pure-JAX oracle (interpret mode on CPU).

The same gradcheck contract as tests/test_raymarch.py, exercised against the
Pallas forward kernel and the custom-VJP backward kernel. On TPU hardware the
compiled kernels are additionally compared against the XLA path by bench
tooling; here the Pallas interpreter provides platform-independent coverage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ava256_tpu.ops.raymarch_pallas import mvp_raymarch_pallas
from ava256_tpu.ops.raymarch_ref import mvp_raymarch_reference

from tests.test_raymarch import make_scene


def _run_pair(s, **kw):
    maxsteps = int(np.ceil(s["tminmax"][..., 1].max() / s["stepsize"])) + 2
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")]

    def loss_ref(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, max_steps=maxsteps,
            )
        )

    def loss_pal(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, interpret=True, **kw,
            )
        )

    return prims, loss_ref, loss_pal


def test_pallas_forward_matches_oracle():
    s = make_scene(N=1, H=17, W=17, k3=2, M=8)
    prims, loss_ref, loss_pal = _run_pair(s, tile=8, max_hit=8, nbuf=64)
    a = float(loss_ref(*prims))
    b = float(loss_pal(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-4, (a, b)


def test_pallas_gradients_match_oracle():
    s = make_scene(N=1, H=17, W=17, k3=2, M=8)
    prims, loss_ref, loss_pal = _run_pair(s, tile=8, max_hit=8, nbuf=64)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*prims)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*prims)
    for name, a, b in zip(("primpos", "primrot", "primscale", "template"), g_ref, g_pal):
        a, b = np.asarray(a), np.asarray(b)
        dp = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-30))
        assert dp > 0.9999, f"{name}: dp={dp}, maxdiff={np.abs(a - b).max()}"


def test_pallas_empty_scene_zero_grad():
    s = make_scene(N=1, H=9, W=9, k3=2, M=4)
    prims, _, loss_pal = _run_pair(s, tile=8, max_hit=4, nbuf=32)
    far = jnp.asarray(np.asarray(prims[0]) + 100.0)
    out = loss_pal(far, *prims[1:])
    assert float(out) == 0.0
    g = jax.grad(loss_pal, argnums=3)(far, *prims[1:])
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
