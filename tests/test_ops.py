# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Core ops: WN layers (vs torch oracle), grid sampling (vs torch oracle),
geometry maps, rodrigues, ray generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ava256_tpu.ops import (
    Conv2dWN,
    ConvTranspose2dWN,
    LinearWN,
    compute_raydirs,
    generate_geomap,
    grid_sample_2d,
    resize_bilinear,
    rodrigues,
)
from ava256_tpu.ops.raymarch_ref import grid_sample_3d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_linear_wn_identity_at_init():
    """WN is an identity reparameterization at init: g = ||w||."""
    layer = LinearWN(features=8)
    x = jnp.ones((2, 4))
    params = layer.init(jax.random.PRNGKey(0), x)
    w = params["params"]["weight"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt(np.sum(np.asarray(w) ** 2)), rtol=1e-6
    )
    y = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-5)


def test_conv2d_wn_matches_torch():
    """Transplant weights into torch's WN-conv math and compare outputs."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    layer = Conv2dWN(features=8, kernel_size=4, strides=2, padding=1)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y = np.asarray(layer.apply(params, jnp.asarray(x)))
    assert y.shape == (2, 8, 8, 8)

    w = np.asarray(params["params"]["weight"])  # HWIO
    g = np.asarray(params["params"]["g"])
    b = np.asarray(params["params"]["bias"])
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())  # OIHW
    weff = wt * torch.from_numpy(g)[:, None, None, None] / torch.sqrt((wt**2).sum())
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    yt = F.conv2d(xt, weff, torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(
        y, np.transpose(yt.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_conv_transpose2d_wn_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    layer = ConvTranspose2dWN(features=4, kernel_size=4, strides=2, padding=1)
    params = layer.init(jax.random.PRNGKey(2), jnp.asarray(x))
    y = np.asarray(layer.apply(params, jnp.asarray(x)))
    assert y.shape == (2, 16, 16, 4)

    w = np.asarray(params["params"]["weight"])  # HWIO, correlation on dilated input
    g = np.asarray(params["params"]["g"])
    b = np.asarray(params["params"]["bias"])
    # torch conv_transpose2d(weight[I,O,kh,kw]) == our conv with the kernel
    # flipped spatially: W_hwio[a,b,i,o] = Wt[i,o,k-1-a,k-1-b]
    wt = np.transpose(w[::-1, ::-1], (2, 3, 0, 1)).copy()  # [I,O,kh,kw]
    wt = torch.from_numpy(wt)
    weff = wt * torch.from_numpy(g)[None, :, None, None] / torch.sqrt((wt**2).sum())
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    yt = F.conv_transpose2d(xt, weff, torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(
        y, np.transpose(yt.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_conv_transpose_blockwise_init():
    """Deconv kernels are parity-constant at init (no checkerboard)."""
    layer = ConvTranspose2dWN(features=4, kernel_size=4, strides=2, padding=1)
    params = layer.init(jax.random.PRNGKey(3), jnp.ones((1, 8, 8, 6)))
    w = np.asarray(params["params"]["weight"])
    np.testing.assert_array_equal(w[0::2, 0::2], w[1::2, 0::2])
    np.testing.assert_array_equal(w[0::2, 0::2], w[0::2, 1::2])
    np.testing.assert_array_equal(w[0::2, 0::2], w[1::2, 1::2])


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_matches_torch(align_corners, packed):
    rng = np.random.RandomState(0)
    img = rng.randn(2, 9, 11, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    out = np.asarray(
        grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                       align_corners=align_corners, packed=packed)
    )
    t = F.grid_sample(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    np.testing.assert_allclose(
        out, np.transpose(t.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_3d_matches_torch(align_corners):
    rng = np.random.RandomState(0)
    vol = rng.randn(5, 6, 7, 4).astype(np.float32)  # DHWC
    coords = (rng.rand(30, 3).astype(np.float32) * 2.6) - 1.3
    out = np.asarray(
        grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords), align_corners=align_corners)
    )
    t = F.grid_sample(
        torch.from_numpy(np.transpose(vol, (3, 0, 1, 2)).copy())[None],  # [1,C,D,H,W]
        torch.from_numpy(coords)[None, :, None, None, :],  # [1,30,1,1,3]
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )
    tout = t[0, :, :, 0, 0].numpy().T  # [30, C]
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 8, 8, 3).astype(np.float32)
    out = np.asarray(resize_bilinear(jnp.asarray(img), (16, 16)))
    t = F.interpolate(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
        size=(16, 16),
        mode="bilinear",
        align_corners=False,
    )
    np.testing.assert_allclose(
        out, np.transpose(t.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_generate_geomap():
    rng = np.random.RandomState(0)
    geo = rng.randn(2, 10, 3).astype(np.float32)
    uv_tidx = rng.randint(0, 10, size=(3, 4, 4))
    uv_bary = rng.rand(3, 4, 4).astype(np.float32)
    uv_bary /= uv_bary.sum(axis=0, keepdims=True)
    out = np.asarray(
        generate_geomap(jnp.asarray(geo), jnp.asarray(uv_tidx), jnp.asarray(uv_bary))
    )
    assert out.shape == (2, 4, 4, 3)
    expected = sum(
        geo[:, uv_tidx[k]] * uv_bary[k][None, :, :, None] for k in range(3)
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_generate_geomap_blocked_matches_gather():
    """The blocked-matmul formulation (numpy maps, 16-divisible resolution)
    must match the gather formulation in outputs and vertex gradients."""
    import jax

    from ava256_tpu.ops.geomap import _geomap_gather

    rng = np.random.RandomState(3)
    res = 32
    ntri = 40
    nverts = 60
    uv_tidx = rng.randint(0, nverts, size=(3, res, res)).astype(np.int32)
    uv_bary = rng.rand(3, res, res).astype(np.float32)
    uv_bary /= uv_bary.sum(axis=0, keepdims=True)
    geo = jnp.asarray(rng.randn(2, nverts, 3).astype(np.float32))

    blocked = generate_geomap(geo, uv_tidx, uv_bary)
    gathered = _geomap_gather(geo, jnp.asarray(uv_tidx), jnp.asarray(uv_bary))
    np.testing.assert_allclose(blocked, gathered, rtol=1e-5, atol=1e-5)

    gb = jax.grad(lambda g: jnp.sum(jnp.sin(generate_geomap(g, uv_tidx, uv_bary))))(geo)
    gg = jax.grad(
        lambda g: jnp.sum(
            jnp.sin(_geomap_gather(g, jnp.asarray(uv_tidx), jnp.asarray(uv_bary)))
        )
    )(geo)
    np.testing.assert_allclose(gb, gg, rtol=1e-4, atol=1e-4)


def test_rodrigues_identity_and_rotation():
    # Near-zero vector -> identity
    r = np.asarray(rodrigues(jnp.zeros((1, 3))))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-2)
    # 90 deg about z
    r = np.asarray(rodrigues(jnp.asarray([[0.0, 0.0, np.pi / 2]])))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(r[0], expected, atol=1e-3)
    # Orthogonality for random vectors
    rng = np.random.RandomState(0)
    rv = rng.randn(10, 3).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rv)))
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (10, 1, 1)), atol=1e-4
    )


def test_compute_raydirs():
    n, h, w = 2, 8, 10
    campos = jnp.asarray(np.array([[0, 0, -500.0], [0, 0, -500.0]], np.float32))
    camrot = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
    focal = jnp.full((n, 2), 100.0)
    princpt = jnp.asarray(np.array([[w / 2, h / 2]] * n, np.float32))
    px, py = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    pix = jnp.asarray(np.tile(np.stack([px, py], -1)[None], (n, 1, 1, 1)))

    raypos, raydir, tminmax = compute_raydirs(campos, camrot, focal, princpt, pix, 256.0)
    assert raypos.shape == (n, h, w, 3)
    assert raydir.shape == (n, h, w, 3)
    assert tminmax.shape == (n, h, w, 2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(raydir), axis=-1), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(raypos)[0, 0, 0], [0, 0, -500 / 256], atol=1e-6)
    # Rays should hit the cube: tmin < tmax and tmin >= 0
    tm = np.asarray(tminmax)
    assert (tm[..., 0] >= 0).all()
    assert (tm[..., 0] < tm[..., 1]).all()
    # Central ray enters the cube at z=-1: t = (500/256 - 1)
    center = tm[0, h // 2, w // 2]
    np.testing.assert_allclose(center[0], 500 / 256 - 1, atol=1e-2)
    np.testing.assert_allclose(center[1], 500 / 256 + 1, atol=1e-2)


def test_conv_s2d_matches_lax_conv():
    """The space-to-depth im2col path must compute the same conv (same
    params) as the lax conv lowering, for every lane-starved UNet level
    shape, in fwd and grad."""
    import jax
    from ava256_tpu.ops.layers import Conv2dWN

    rng = jax.random.PRNGKey(7)
    for (h, w, cin, cout) in [(32, 32, 3, 16), (16, 16, 16, 32), (8, 8, 32, 64),
                              (10, 6, 5, 7)]:
        x = jax.random.normal(rng, (2, h, w, cin), jnp.float32)
        ref = Conv2dWN(features=cout, kernel_size=4, strides=2, padding=1)
        v = ref.init(rng, x)
        fast = Conv2dWN(features=cout, kernel_size=4, strides=2, padding=1, s2d=True)

        y_ref = ref.apply(v, x)
        y_fast = fast.apply(v, x)
        assert y_fast.shape == y_ref.shape == (2, h // 2, w // 2, cout)
        np.testing.assert_allclose(
            np.asarray(y_fast), np.asarray(y_ref), atol=2e-5, rtol=1e-5
        )

        g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(v)
        g_fast = jax.grad(lambda p: jnp.sum(jnp.sin(fast.apply(p, x))))(v)
        def check(path, a, b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4,
                err_msg=jax.tree_util.keystr(path),
            )
        jax.tree_util.tree_map_with_path(check, g_ref, g_fast)
