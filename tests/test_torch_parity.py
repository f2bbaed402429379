# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Numerical parity against the reference implementation itself.

We instantiate the reference's torch modules (from /root/reference, pure
torch — no CUDA extensions involved), transplant our initialized weights into
them, and compare forward outputs. This pins down layer semantics (weight
norm, striding, padding, bias pyramids, grid sampling, slab reshapes) far
tighter than shape tests.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from ava256_tpu.geometry import create_uv_baridx  # noqa: E402
from ava256_tpu.models import ExpressionEncoder, GeometryDecoder  # noqa: E402


@pytest.fixture(scope="module")
def uvdata(reference_assets):
    return create_uv_baridx(f"{reference_assets}/face_topology.obj", resolution=1024)


def _np(x):
    return np.asarray(x)


def _to_torch_conv(tmod, p):
    w = _np(p["weight"])  # HWIO
    tmod.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    tmod.g.data = torch.from_numpy(_np(p["g"]).copy())
    if tmod.bias is not None and "bias" in p:
        tmod.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def _to_torch_deconv(tmod, p):
    w = _np(p["weight"])  # HWIO (correlation on dilated input)
    wt = np.transpose(w[::-1, ::-1], (2, 3, 0, 1)).copy()  # [I, O, kh, kw]
    tmod.weight.data = torch.from_numpy(wt)
    tmod.g.data = torch.from_numpy(_np(p["g"]).copy())
    if tmod.bias is not None and "bias" in p:
        tmod.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def _to_torch_linear(tmod, p):
    w = _np(p["weight"])  # [in, out]
    tmod.weight.data = torch.from_numpy(w.T.copy())
    tmod.g.data = torch.from_numpy(_np(p["g"]).copy())
    if tmod.bias is not None and "bias" in p:
        tmod.bias.data = torch.from_numpy(_np(p["bias"]).copy())


def test_expression_encoder_matches_reference(uvdata, reference_assets):
    from models.encoders.expression import ExpressionEncoder as RefExpr

    rng = np.random.RandomState(3)
    verts = np.fromfile(
        f"{reference_assets}/021924.bin", dtype=np.float32
    ).reshape(1, -1, 3) / 100.0
    neut_verts = verts * 0.95
    avgtex = rng.randn(1, 1024, 1024, 3).astype(np.float32)
    neut_avgtex = rng.randn(1, 1024, 1024, 3).astype(np.float32)

    enc = ExpressionEncoder(uv_tidx=uvdata["uv_idx"], uv_bary=uvdata["uv_bary"])
    params = enc.init(
        jax.random.PRNGKey(0),
        jnp.asarray(verts), jnp.asarray(avgtex),
        jnp.asarray(neut_verts), jnp.asarray(neut_avgtex),
    )["params"]
    out = _np(
        enc.apply(
            {"params": params},
            jnp.asarray(verts), jnp.asarray(avgtex),
            jnp.asarray(neut_verts), jnp.asarray(neut_avgtex),
        )
    )

    ref = RefExpr(uvdata["uv_idx"], uvdata["uv_bary"]).eval()
    # tex/geo towers: convs at Sequential indices 0, 2, 4
    for tower in ("tex", "geo"):
        seq = getattr(ref, tower)
        for i, ti in enumerate((0, 2, 4)):
            _to_torch_conv(seq[ti], params[tower][f"Conv2dWN_{i}"])
    for i, ti in enumerate(range(0, 16, 2)):
        _to_torch_conv(ref.comb[ti], params["comb"][f"Conv2dWN_{i}"])

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(verts.copy()),
            torch.from_numpy(np.transpose(avgtex, (0, 3, 1, 2)).copy()),
            torch.from_numpy(neut_verts.copy()),
            torch.from_numpy(np.transpose(neut_avgtex, (0, 3, 1, 2)).copy()),
        )
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=2e-4)


def test_geometry_decoder_matches_reference(uvdata, reference_assets):
    from models.decoders.geometry import GeometryDecoder as RefGeo

    nprims, boxsize = 16384, 8
    nvtx = 7306
    rng = np.random.RandomState(4)
    ex = rng.randn(1, 4, 4, 16).astype(np.float32)
    idc = rng.randn(1, 4, 4, 16).astype(np.float32)
    bias_channels = [256, 128, 128, 64, 64, 32, 16, 3]
    bias_sizes = [8, 16, 32, 64, 128, 256, 512, 1024]
    biases = [
        rng.randn(1, s, s, c).astype(np.float32) * 0.1
        for s, c in zip(bias_sizes, bias_channels)
    ]

    dec = GeometryDecoder(
        uv=uvdata["uv_coord"], tri=uvdata["tri"], uvtri=uvdata["uv_tri"],
        nvtx=nvtx, motion_size=128, geo_size=256,
        imsize=1024, nboxes=nprims, boxsize=boxsize,
    )
    params = dec.init(
        jax.random.PRNGKey(0), jnp.asarray(ex), jnp.asarray(idc),
        [jnp.asarray(b) for b in biases],
    )["params"]
    opacity, geo, posr, rvecr, scaler = dec.apply(
        {"params": params}, jnp.asarray(ex), jnp.asarray(idc),
        [jnp.asarray(b) for b in biases],
    )

    ref = RefGeo(
        np.asarray(uvdata["uv_coord"], np.float32),
        np.asarray(uvdata["tri"], np.int64),
        np.asarray(uvdata["uv_tri"], np.int64),
        nvtx=nvtx, motion_size=128, geo_size=256,
        imsize=1024, nboxes=nprims, boxsize=boxsize,
    ).eval()

    _to_torch_conv(ref.encmod[0], params["encmod"])
    for i in range(8):
        _to_torch_deconv(ref.layers[f"t{i}"][0], params[f"t{i}"])
    _to_torch_conv(ref.motion[0], params["motion0"])
    _to_torch_conv(ref.motion[2], params["motion1"])
    _to_torch_conv(ref.geo[0], params["geo0"])
    _to_torch_conv(ref.geo[2], params["geo1"])
    ref.bias.data = torch.from_numpy(
        np.transpose(_np(params["slab_bias"]), (2, 0, 1)).copy()
    )

    with torch.no_grad():
        r_op, r_geo, r_pos, r_rvec, r_scale = ref(
            torch.from_numpy(np.transpose(ex, (0, 3, 1, 2)).copy()),
            torch.from_numpy(np.transpose(idc, (0, 3, 1, 2)).copy()),
            [torch.from_numpy(np.transpose(b, (0, 3, 1, 2)).copy()) for b in biases],
        )

    np.testing.assert_allclose(_np(geo), r_geo.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(_np(posr), r_pos.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(_np(rvecr), r_rvec.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(_np(scaler), r_scale.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        _np(opacity)[..., 0], r_op.numpy()[..., 0], rtol=1e-3, atol=2e-4
    )
