# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Auxiliary ops: step raymarcher, blur/dilate layers, WN fusing, profiling."""

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.ops.extras import (
    Conv2dWS,
    CoordConv2d,
    dilate2d,
    downsample2d,
    fuse_weightnorm,
)
from ava256_tpu.ops.layers import Conv2dWN
from ava256_tpu.ops.stepraymarch import step_raymarch


def _single_volume_scene():
    n, h, w = 1, 9, 9
    ro = np.tile(np.array([0, 0, -4.0], np.float32), (n, h, w, 1))
    rd = np.tile(np.array([0, 0, 1.0], np.float32), (n, h, w, 1))
    tmm = np.tile(np.array([0.0, 8.0], np.float32), (n, h, w, 1))
    tpl = np.zeros((n, 8, 8, 8, 4), np.float32)
    tpl[..., 0] = 50.0
    tpl[..., 3] = 0.5
    return jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmm), jnp.asarray(tpl)


def test_step_raymarch_additive():
    ro, rd, tmm, tpl = _single_volume_scene()
    out = np.asarray(step_raymarch(ro, rd, 0.1, tmm, tpl, accum="add", max_steps=100))
    # central ray crosses z in [-1, 1]: alpha ~= 0.5 * 0.1 * 20 = 1.0 (clamped)
    assert abs(out[0, 4, 4, 3] - 1.0) < 0.05
    assert out[..., 3].max() <= 1.0 + 1e-5


def test_step_raymarch_multiplicative():
    ro, rd, tmm, tpl = _single_volume_scene()
    out = np.asarray(step_raymarch(ro, rd, 0.1, tmm, tpl, accum="mult", max_steps=100))
    # transmittance product: alpha = 1 - (1 - 0.05)^nsteps < 1 strictly
    a = out[0, 4, 4, 3]
    assert 0.5 < a < 1.0
    expected = 1.0 - (1.0 - 0.05) ** 20
    assert abs(a - expected) < 0.05


def test_downsample2d_preserves_mean():
    x = jnp.ones((1, 16, 16, 3)) * 2.0
    y = downsample2d(x, stride=2, padding="reflect")
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y), 2.0, atol=1e-5)


def test_dilate2d_clamps():
    x = jnp.zeros((1, 8, 8, 1)).at[0, 4, 4, 0].set(9.0)
    y = dilate2d(x, kernel_size=3, padding=1)
    assert np.asarray(y).max() <= 1.0
    assert np.asarray(y)[0, 4, 4, 0] == 1.0


def test_coordconv_shapes():
    m = CoordConv2d(features=4, kernel_size=3, padding=1)
    x = jnp.ones((2, 8, 8, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 8, 4)
    # coordinate channels make output position-dependent even for constant input
    arr = np.asarray(y)
    assert np.abs(arr[0, 0, 0] - arr[0, 7, 7]).max() > 1e-6


def test_conv2dws():
    m = Conv2dWS(features=4, kernel_size=3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_fuse_weightnorm_preserves_output():
    layer = Conv2dWN(features=6, kernel_size=3, padding=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3))
    variables = layer.init(jax.random.PRNGKey(0), x)
    y0 = layer.apply(variables, x)
    # perturb g so fusing is non-trivial
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    params["g"] = params["g"] * 1.7
    y1 = layer.apply({"params": params}, x)
    fused = fuse_weightnorm(params)
    assert "g" not in fused
    # fused weights with g replaced by ones-equivalent: re-run with g = ||w'||
    w = fused["weight"]
    g_eq = jnp.sqrt(jnp.sum(w**2)) * jnp.ones((6,))
    y2 = layer.apply({"params": {**fused, "g": g_eq}}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_step_timer():
    from ava256_tpu.train.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3
    assert s["steps_per_sec"] > 0
