# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Model module shape contracts, ported one-for-one from the reference test
suite (reference: tests/test_*_encoder.py, test_vae.py, test_*_decoder.py,
test_decoder_assembler.py) — with NHWC layouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ava256_tpu.geometry import create_uv_baridx
from ava256_tpu.models import (
    BackgroundModelSimple,
    Colorcal,
    DecoderAssembler,
    ExpressionEncoder,
    GeometryDecoder,
    IdentityEncoder,
    RGBDecoder,
    VAEBottleneck,
)

BIAS_CHANNELS = [256, 128, 128, 64, 64, 32, 16, 3]
BIAS_SIZES = [8, 16, 32, 64, 128, 256, 512, 1024]


@pytest.fixture(scope="module")
def uvdata(reference_assets):
    # Persistent cache: the 1024^2 closest-point build costs minutes on CPU.
    return create_uv_baridx(f"{reference_assets}/face_topology.obj", resolution=1024)


@pytest.fixture(scope="module")
def ref_verts(reference_assets):
    return np.fromfile(f"{reference_assets}/021924.bin", dtype=np.float32).reshape(1, -1, 3)


def test_expression_encoder_sizes(uvdata, ref_verts):
    enc = ExpressionEncoder(uv_tidx=uvdata["uv_idx"], uv_bary=uvdata["uv_bary"])
    verts = jnp.asarray(ref_verts)
    tex = jnp.zeros((1, 1024, 1024, 3))
    params = enc.init(jax.random.PRNGKey(0), verts, tex, verts * 0.9, tex)
    out = enc.apply(params, verts, tex, verts * 0.9, tex)
    assert out.shape == (1, 4, 4, 64)


def test_identity_encoder_sizes(uvdata, ref_verts):
    enc = IdentityEncoder(uv_tidx=uvdata["uv_idx"], uv_bary=uvdata["uv_bary"], wsize=128)
    verts = jnp.asarray(ref_verts)
    tex = jnp.zeros((1, 1024, 1024, 3))
    params = enc.init(jax.random.PRNGKey(0), verts, tex)
    out = enc.apply(params, verts, tex)
    assert out["z_geo"].shape == (1, 4, 4, 16)
    assert out["z_tex"].shape == (1, 4, 4, 16)
    for blist in (out["b_geo"], out["b_tex"]):
        assert len(blist) == 8
        for b, ch, size in zip(blist, BIAS_CHANNELS, BIAS_SIZES):
            assert b.shape == (1, size, size, ch), (b.shape, ch, size)


def test_vae_bottleneck():
    vae = VAEBottleneck(out_dim=16)
    x = jnp.zeros((1, 4, 4, 64))
    params = vae.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    z, mu, logstd = vae.apply(params, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert z.shape == (1, 4, 4, 16)
    assert mu.shape == (1, 4, 4, 16)
    assert logstd.shape == (1, 4, 4, 16)
    # Deterministic mode returns mu
    z2, mu2, _ = vae.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(mu2))


def _dummy_biases(batch=1):
    return [jnp.zeros((batch, s, s, c)) for s, c in zip(BIAS_SIZES, BIAS_CHANNELS)]


def test_geometry_decoder_sizes(uvdata, ref_verts):
    nprims, boxsize = 16384, 8
    dec = GeometryDecoder(
        uv=uvdata["uv_coord"], tri=uvdata["tri"], uvtri=uvdata["uv_tri"],
        nvtx=ref_verts.shape[1], motion_size=128, geo_size=256,
        imsize=1024, nboxes=nprims, boxsize=boxsize,
    )
    ex = jnp.zeros((1, 4, 4, 16))
    idc = jnp.zeros((1, 4, 4, 16))
    biases = _dummy_biases()
    params = dec.init(jax.random.PRNGKey(0), ex, idc, biases)
    opacity, geo, posr, rvecr, scaler = dec.apply(params, ex, idc, biases)
    assert opacity.shape == (1, nprims, boxsize, boxsize, boxsize, 1)
    assert geo.shape == (1, ref_verts.shape[1], 3)
    assert posr.shape == (1, nprims, 3)
    assert rvecr.shape == (1, nprims, 3)
    assert scaler.shape == (1, nprims, 3)
    assert np.asarray(opacity).min() >= 0.0  # exp() output


def test_rgb_decoder_sizes():
    nprims, boxsize = 16384, 8
    dec = RGBDecoder(imsize=1024, nboxes=nprims, boxsize=boxsize, outch=3, viewcond=True)
    ex = jnp.zeros((1, 4, 4, 16))
    idc = jnp.zeros((1, 4, 4, 16))
    view = jnp.asarray([[0.0, 0.0, 1.0]])
    biases = _dummy_biases()
    params = dec.init(jax.random.PRNGKey(0), ex, idc, biases, view)
    out = dec.apply(params, ex, idc, biases, view)
    assert out.shape == (1, nprims, boxsize, boxsize, boxsize, 3)


def test_decoder_assembler_sizes(uvdata, ref_verts):
    nprims, primsize = 16384, (8, 8, 8)
    dec = DecoderAssembler(
        vt=np.asarray(uvdata["uv_coord"], np.float32),
        vi=np.asarray(uvdata["tri"], np.int32),
        vti=np.asarray(uvdata["uv_tri"], np.int32),
        idxim=uvdata["uv_idx"], barim=uvdata["uv_bary"],
        vertmean=ref_verts[0], vertstd=1.0,
        volradius=256.0, nprims=nprims, primsize=primsize,
    )
    id_cond = {
        "z_geo": jnp.zeros((1, 4, 4, 16)),
        "z_tex": jnp.zeros((1, 4, 4, 16)),
        "b_geo": _dummy_biases(),
        "b_tex": _dummy_biases(),
    }
    ex = jnp.zeros((1, 4, 4, 16))
    viewpos = jnp.asarray([[0.0, 0.0, 1000.0]])
    variables = dec.init(jax.random.PRNGKey(0), id_cond, ex, viewpos)
    out, mutated = dec.apply(
        variables, id_cond, ex, viewpos, running_avg_scale=True, mutable=["stats"]
    )
    assert out["template"].shape == (1, nprims, 8, 8, 8, 4)
    assert out["primpos"].shape == (1, nprims, 3)
    assert out["primrot"].shape == (1, nprims, 3, 3)
    assert out["primscale"].shape == (1, nprims, 3)
    assert out["verts"].shape == (1, ref_verts.shape[1], 3)
    # Adaptive scale stats were populated from mesh spacing
    aw = np.asarray(mutated["stats"]["adaptwarps"])
    assert (aw > 0).all()
    # Template is denormalized: rgb >= 0 (relu), alpha >= 0
    t = np.asarray(out["template"])
    assert t.min() >= 0.0
    # primrot columns orthonormal for the vast majority of primitives (texels
    # on UV seams have degenerate derivatives, as in the reference).
    r = np.asarray(out["primrot"]).reshape(-1, 3, 3)
    eye = np.eye(3)[None]
    err = np.abs(np.einsum("nij,nik->njk", r, r) - eye).max(axis=(1, 2))
    assert np.quantile(err, 0.95) < 1e-3, np.quantile(err, 0.95)


def test_colorcal():
    cc = Colorcal(ncams=4, nident=2)
    img = jnp.ones((2, 8, 8, 3))
    cam = jnp.asarray([0, 3])
    idi = jnp.asarray([1, 0])
    params = cc.init(jax.random.PRNGKey(0), img, cam, idi)
    out = cc.apply(params, img, cam, idi)
    assert out.shape == (2, 8, 8, 3)
    # At init: wcam=1, rest 0 -> identity transform
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_background_model():
    bg = BackgroundModelSimple(ncams=4, nident=2)
    coords = jnp.zeros((2, 16, 16, 2))
    cam = jnp.asarray([0, 1])
    idi = jnp.asarray([0, 1])
    params = bg.init(jax.random.PRNGKey(0), cam, idi, coords)
    out = bg.apply(params, cam, idi, coords)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_assembler_tbn_block_slices_match_gradient_image():
    """The assembler's block-slice TBN derivatives must equal the reference's
    gradient-image formulation (full-res forward diff, duplicated final
    difference, strided center sampling; reference models/decoders/assembler.py
    geodu/geodv). The block form exists so XLA never materializes full-res
    [N,1024,1024,3] cotangent temps (42x lane padding) or scatter-adds."""
    rng = np.random.RandomState(7)
    n, res, nh = 2, 64, 8
    s = res // nh
    c = s // 2
    postex = jnp.asarray(rng.randn(n, res, res, 3).astype(np.float32))

    geodu = postex[:, :, 1:, :] - postex[:, :, :-1, :]
    geodu = jnp.concatenate([geodu, geodu[:, :, -1:, :]], axis=2)
    geodv = postex[:, 1:, :, :] - postex[:, :-1, :, :]
    geodv = jnp.concatenate([geodv, geodv[:, -1:, :, :]], axis=1)
    du_ref = geodu[:, c::s, c::s, :]
    dv_ref = geodv[:, c::s, c::s, :]

    blocks = postex.reshape(n, nh, s, nh, s, 3)
    ctr = blocks[:, :, c, :, c, :]
    du = blocks[:, :, c, :, c + 1, :] - ctr
    dv = blocks[:, :, c + 1, :, c, :] - ctr

    np.testing.assert_array_equal(np.asarray(du), np.asarray(du_ref))
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(dv_ref))


def test_autoencoder_render_false_skips_march():
    """render=False returns the decoded template without running the
    raymarcher (profiling attribution path: stepprof's fwd_norender)."""
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.step import BATCH_MODEL_KEYS
    from __graft_entry__ import _build

    model, mb, _ = _build(
        texsize=64, nprims=1024, height=16, width=16, batch=2, nident=2,
        ncams=2, raymarch_backend="xla",
        raymarch_options={"tile": 8, "max_hit": 8, "max_samples": 16,
                          "chunk_tiles": 4},
    )
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)

    out = model.apply(
        variables,
        target_neut_avgtex=mb["neut_avgtex"],
        target_neut_verts=mb["neut_verts"],
        idindex=mb["idindex"],
        camindex=mb["camindex"],
        deterministic=True,
        render=False,
        **{k: mb[k] for k in BATCH_MODEL_KEYS},
    )
    assert out["irgbrec"] is None
    tmpl = np.asarray(out["template"])
    assert tmpl.shape[1] == 1024 and tmpl.shape[-1] == 4
    assert np.isfinite(tmpl).all()
    assert np.isfinite(np.asarray(out["verts"])).all()
