# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
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


@pytest.mark.parametrize("rows", [4, 8])
def test_pallas_gradients_match_oracle(rows):
    # rows=8 is the bench/production row-batch width (docs/roofline_r5.md)
    s = make_scene(N=1, H=17, W=17, k3=2, M=8)
    prims, loss_ref, loss_pal = _run_pair(s, tile=8, max_hit=8, nbuf=64, rows=rows)
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


def _adversarial_scene(H=17, W=17):
    """Saturating near wall + a huge far-centered primitive that overlaps rows
    in front of the wall. Exercises the exactness of the kernel's early
    termination: a center-distance heuristic would skip the huge primitive
    (its center is the farthest) even though it contributes before every
    ray's saturation row."""
    import numpy as np

    from tests.test_raymarch import make_scene

    s = make_scene(N=1, H=H, W=W, k3=3, M=8)
    K = s["primpos"].shape[1]
    # near wall at z=0: dense, opaque
    g = np.linspace(-0.6, 0.6, 3, dtype=np.float32)
    wall = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    k_wall = wall.shape[0]
    s["primpos"][0, :k_wall, 0:2] = wall
    s["primpos"][0, :k_wall, 2] = 0.0
    s["primscale"][0, :k_wall] = 1.0 / 0.45
    s["template"][0, :k_wall, ..., 3] = 40.0  # saturates within a few steps
    # huge primitive centered far behind, spanning from in front of the wall
    s["primpos"][0, k_wall] = (0.0, 0.0, 2.0)
    s["primscale"][0, k_wall] = 1.0 / 2.6  # reaches z = -0.6
    s["template"][0, k_wall, ..., 3] = 1.5
    s["template"][0, k_wall, ..., 0:3] = 300.0
    # the rest: moderate mid-scene prims from make_scene, left as-is
    del K
    return s


def test_pallas_early_out_exact_under_adversarial_overlap():
    """Compared in the oracle's "summed" within-step mode (the kernel's
    contract); the wall saturates every ray mid-row, where the sequential and
    summed members of the reference's unordered-atomics family diverge."""
    s = _adversarial_scene()
    maxsteps = int(np.ceil(s["tminmax"][..., 1].max() / s["stepsize"])) + 2
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")]

    def loss_ref(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, max_steps=maxsteps,
                within_step="summed",
            )
        )

    def loss_pal(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, interpret=True,
                tile=8, max_hit=32, nbuf=64,
            )
        )
    a = float(loss_ref(*prims))
    b = float(loss_pal(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-4, (a, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*prims)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*prims)
    for name, x, y in zip(("primpos", "primrot", "primscale", "template"), g_ref, g_pal):
        x, y = np.asarray(x), np.asarray(y)
        dp = float((x * y).sum() / np.sqrt((x * x).sum() * (y * y).sum() + 1e-30))
        assert dp > 0.9999, f"{name}: dp={dp}, maxdiff={np.abs(x - y).max()}"


def test_pallas_nbuf_truncation_matches_oracle_max_steps():
    """A too-small nbuf must mean a *shorter march* (oracle max_steps
    semantics), never a mis-composited image."""
    s = make_scene(N=1, H=9, W=9, k3=2, M=8)
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")]
    nbuf = 8
    out_pal = mvp_raymarch_pallas(
        rp, rd, s["stepsize"], tmm, *prims, None,
        fadescale=6.5, fadeexp=8.0, interpret=True, tile=8, max_hit=8, nbuf=nbuf,
    )
    out_ref = mvp_raymarch_reference(
        rp, rd, s["stepsize"], tmm, *prims, None,
        fadescale=6.5, fadeexp=8.0, max_steps=nbuf,
    )
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), rtol=1e-4, atol=1e-4
    )


def test_pallas_warp_field_matches_oracle():
    """Warp-field sampling chain (template sampled at warp(y)) fwd + all five
    gradient sets vs the oracle (reference: primsampler.h:53-91)."""
    s = make_scene(N=1, H=17, W=17, k3=2, M=8, warp=True)
    maxsteps = int(np.ceil(s["tminmax"][..., 1].max() / s["stepsize"])) + 2
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in
             ("primpos", "primrot", "primscale", "template", "warp")]

    def loss_ref(pp, pr, ps, tpl, wrp):
        return jnp.sum(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, wrp,
                fadescale=6.5, fadeexp=8.0, max_steps=maxsteps,
            )
        )

    def loss_pal(pp, pr, ps, tpl, wrp):
        return jnp.sum(
            mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, wrp,
                fadescale=6.5, fadeexp=8.0, interpret=True,
                tile=8, max_hit=8, nbuf=64,
            )
        )

    a = float(loss_ref(*prims))
    b = float(loss_pal(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-4, (a, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*prims)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*prims)
    names = ("primpos", "primrot", "primscale", "template", "warp")
    for name, x, y in zip(names, g_ref, g_pal):
        x, y = np.asarray(x), np.asarray(y)
        dp = float((x * y).sum() / np.sqrt((x * x).sum() * (y * y).sum() + 1e-30))
        assert dp > 0.9999, f"{name}: dp={dp}, maxdiff={np.abs(x - y).max()}"


def test_pallas_two_stage_cull_matches_dense():
    """The group pre-cull (the TPU answer to the reference's LBVH,
    bvh.cu:22-201) must reproduce the dense cull exactly when no group is
    truncated: group spheres contain every member sphere, so with all groups
    kept the surviving candidate set is identical and the (order-independent)
    composite matches bit-for-bit in forward and gradients."""
    s = make_scene(N=1, H=17, W=17, k3=4, M=4)  # K=64: perfect-square grid
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")]

    def loss(two_stage, max_groups=4):
        def f(pp, pr, ps, tpl):
            return jnp.sum(
                mvp_raymarch_pallas(
                    rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                    fadescale=6.5, fadeexp=8.0, interpret=True,
                    tile=8, max_hit=64, nbuf=64,
                    two_stage_cull=two_stage, cull_group_size=16,
                    cull_max_groups=max_groups,
                )
            )
        return f

    dense = loss(False)
    grouped = loss(True)  # 4 groups of 16, all kept
    a = float(dense(*prims))
    b = float(grouped(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-5, (a, b)
    g_a = jax.grad(dense, argnums=(0, 1, 2, 3))(*prims)
    g_b = jax.grad(grouped, argnums=(0, 1, 2, 3))(*prims)
    for name, x, y in zip(("primpos", "primrot", "primscale", "template"), g_a, g_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6, err_msg=name)

    # truncated groups still produce a finite, composited image (fewer
    # candidates marched — the same contract as a small max_hit)
    trunc = loss(True, max_groups=2)
    assert np.isfinite(float(trunc(*prims)))


def test_morton_order_spatial_and_dead_prims():
    """The cull's Morton ordering (the LBVH's spatial sort, bvh.cu:22-60)
    must (a) be a permutation, (b) sort dead primitives to the end, and
    (c) keep spatial clusters contiguous so groups of the sorted order are
    compact regardless of the decoder's index layout."""
    from ava256_tpu.ops.raymarch_pallas import _morton_order

    rng = np.random.RandomState(0)
    blob_a = rng.randn(32, 3) * 0.05 - 2.0
    blob_b = rng.randn(32, 3) * 0.05 + 2.0
    pos = np.empty((64, 3), np.float32)
    pos[0::2] = blob_a  # interleave so index order is NOT spatial
    pos[1::2] = blob_b
    live = np.ones((1, 64), bool)
    live[0, 10] = False
    order = np.asarray(_morton_order(jnp.asarray(pos[None]), jnp.asarray(live)))[0]
    assert sorted(order.tolist()) == list(range(64))
    assert order[-1] == 10  # dead prim sorted last
    # each half of the live order should be one blob (contiguous clusters)
    labels = (order % 2)[:-1]  # 0 = blob_a, 1 = blob_b, dead prim dropped
    first, second = labels[:31], labels[32:]
    assert len(set(first.tolist())) == 1
    assert len(set(second.tolist())) == 1
    assert first[0] != second[0]


@pytest.mark.parametrize("warp", [False, True])
def test_pallas_dma_candidates_match_gathered(warp):
    """candidates='dma' (in-kernel double-buffered box fetch) must compute
    exactly what candidates='gathered' (XLA per-tile gather) computes —
    same math, different data movement — in output and all gradients."""
    s = make_scene(N=2, H=17, W=17, k3=2, M=8, warp=warp)
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    names = ("primpos", "primrot", "primscale", "template") + (
        ("warp",) if warp else ()
    )
    prims = [jnp.asarray(s[k]) for k in names]

    def loss(mode):
        def f(*args):
            wp = args[4] if warp else None
            return jnp.sum(
                jnp.sin(
                    mvp_raymarch_pallas(
                        rp, rd, s["stepsize"], tmm, *args[:4], wp,
                        fadescale=6.5, fadeexp=8.0, interpret=True,
                        tile=8, max_hit=8, nbuf=64, candidates=mode,
                    )
                )
            )
        return f

    argnums = tuple(range(len(prims)))
    a = float(loss("gathered")(*prims))
    b = float(loss("dma")(*prims))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    g_a = jax.grad(loss("gathered"), argnums=argnums)(*prims)
    g_b = jax.grad(loss("dma"), argnums=argnums)(*prims)
    for name, ga, gb in zip(names, g_a, g_b):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=1e-6, rtol=1e-5, err_msg=name
        )


@pytest.mark.parametrize("warp", [False, True])
def test_pallas_packed_small_primsize_matches_oracle(warp):
    """bs=4 primitives pack P=128/bs^2=8 boxes per flat-table row (the kernel
    extracts/scatters with one-hot matmuls) — the layout that keeps the HBM
    tables dense for the reference's small-primsize branches
    (reference: models/decoders/assembler.py:131-216). Output and all
    gradients must match the oracle."""
    from ava256_tpu.ops.raymarch_pallas import _pack_factor

    assert _pack_factor(4, 8) == 8  # K=8 divides P -> packed path active
    s = make_scene(N=1, H=17, W=17, k3=2, M=4, warp=warp)
    maxsteps = int(np.ceil(s["tminmax"][..., 1].max() / s["stepsize"])) + 2
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    names = ("primpos", "primrot", "primscale", "template") + (
        ("warp",) if warp else ()
    )
    prims = [jnp.asarray(s[k]) for k in names]

    def loss_ref(*args):
        wp = args[4] if warp else None
        return jnp.sum(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, *args[:4], wp,
                fadescale=6.5, fadeexp=8.0, max_steps=maxsteps,
            )
        )

    def loss_pal(*args):
        wp = args[4] if warp else None
        return jnp.sum(
            mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, *args[:4], wp,
                fadescale=6.5, fadeexp=8.0, interpret=True,
                tile=8, max_hit=8, nbuf=64,
            )
        )

    a = float(loss_ref(*prims))
    b = float(loss_pal(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-4, (a, b)
    argnums = tuple(range(len(prims)))
    g_ref = jax.grad(loss_ref, argnums=argnums)(*prims)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*prims)
    for name, ga, gb in zip(names, g_ref, g_pal):
        ga, gb = np.asarray(ga), np.asarray(gb)
        dp = float((ga * gb).sum() / np.sqrt((ga * ga).sum() * (gb * gb).sum() + 1e-30))
        assert dp > 0.9999, f"{name}: dp={dp}, maxdiff={np.abs(ga - gb).max()}"


def test_pallas_prim_mask_culls_physically():
    """prim_mask semantics (reference: models/autoencoder.py:214-228 drops
    alpha-masked prims to shrink the march): masking a primitive must (a)
    render the same image as zeroing that primitive's alpha channel, and
    (b) physically remove its candidates from the march work list."""
    from ava256_tpu.ops.raymarch_pallas import _tile_and_cull

    s = make_scene(N=1, H=17, W=17, k3=3, M=8, seed=7)
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    pp, pr, ps, tpl = (
        jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")
    )
    K = pp.shape[1]
    rng = np.random.RandomState(0)
    mask = (rng.rand(1, K) > 0.5).astype(np.float32)

    def march(template, prim_mask):
        return mvp_raymarch_pallas(
            rp, rd, s["stepsize"], tmm, pp, pr, ps, template, None,
            prim_mask=prim_mask, fadescale=6.5, fadeexp=8.0,
            tile=8, max_hit=32, nbuf=64, interpret=True,
        )

    # (a) image equality: culled-by-mask == alpha-zeroed-but-marched
    tpl_zeroed = np.asarray(tpl).copy()
    tpl_zeroed[:, mask[0] < 0.5, ..., 3] = 0.0
    out_masked = np.asarray(march(tpl, jnp.asarray(mask)))
    out_zeroed = np.asarray(march(jnp.asarray(tpl_zeroed), None))
    np.testing.assert_allclose(out_masked, out_zeroed, atol=1e-5)

    # (b) the cull physically drops masked candidates
    def count_candidates(m):
        *_, cand_valid, _, _ = _tile_and_cull(
            rp, rd, tmm, pp, ps, jnp.asarray(m), 8, 32, s["stepsize"]
        )
        return int(jnp.sum(cand_valid))

    n_all = count_candidates(np.ones((1, K), np.float32))
    n_masked = count_candidates(mask)
    assert n_masked < n_all, (n_masked, n_all)
    # gradients must not leak through masked prims' templates
    def loss_masked(tpl):
        return jnp.sum(march(tpl, jnp.asarray(mask)))

    g = np.asarray(jax.grad(loss_masked)(tpl))
    assert np.abs(g[:, mask[0] < 0.5]).max() == 0.0
    assert np.abs(g[:, mask[0] > 0.5]).max() > 0.0


@pytest.mark.parametrize("packed", [False, True])
def test_pallas_bs2_matches_oracle(packed):
    """primsize 2 — the shape the reference's 262,144-prim branch decodes
    (nh=512 grid x primsize 2 = 1024^2 slab; reference:
    models/decoders/assembler.py:211-214). Packed (K % 32 == 0 -> P=32
    boxes/row) and unpacked flat tables, output + gradients vs the oracle."""
    from ava256_tpu.ops.raymarch_pallas import _pack_factor

    k3 = 4 if packed else 2  # 64 prims packs P=32; 8 prims stays unpacked
    assert _pack_factor(2, k3**3) == (32 if packed else 1)
    s = make_scene(N=1, H=17, W=17, k3=k3, M=2)
    maxsteps = int(np.ceil(s["tminmax"][..., 1].max() / s["stepsize"])) + 2
    rp, rd, tmm = (jnp.asarray(s[k]) for k in ("raypos", "raydir", "tminmax"))
    prims = [jnp.asarray(s[k]) for k in ("primpos", "primrot", "primscale", "template")]

    def loss_ref(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_reference(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, max_steps=maxsteps,
                # 64 overlapping prims cover every step row; the kernel's
                # within-step ordering is the summed family member
                within_step="summed",
            )
        )

    def loss_pal(pp, pr, ps, tpl):
        return jnp.sum(
            mvp_raymarch_pallas(
                rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
                fadescale=6.5, fadeexp=8.0, interpret=True,
                # max_hit must cover K: every scene prim is a huge
                # overlapping sphere here, so any tile can hit all of them
                tile=8, max_hit=max(16, k3**3), nbuf=64,
            )
        )

    a = float(loss_ref(*prims))
    b = float(loss_pal(*prims))
    assert abs(a - b) / max(abs(a), 1e-6) < 1e-4, (a, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*prims)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*prims)
    for name, ga, gb in zip(("primpos", "primrot", "primscale", "template"), g_ref, g_pal):
        ga, gb = np.asarray(ga), np.asarray(gb)
        dp = float((ga * gb).sum() / np.sqrt((ga * ga).sum() * (gb * gb).sum() + 1e-30))
        assert dp > 0.9999, f"{name}: dp={dp}, maxdiff={np.abs(ga - gb).max()}"
