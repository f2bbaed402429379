# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""SPMD: mesh construction, batch sharding, a full DP train step on a
multi-device CPU mesh, and ray-sharded rendering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ava256_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(axis_names=("data",))
    assert mesh.shape["data"] == len(jax.devices())
    batch = {"x": np.ones((8, 4), np.float32), "y": np.zeros((8,), np.int32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=2
    )
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_dp_train_step_multidevice():
    """Full training step over all virtual devices (tiny shapes)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(len(jax.devices()), 4))


def test_render_rays_sharded():
    """Pixel rows sharded across the mesh reproduce the single-device render."""
    from __graft_entry__ import _build
    from ava256_tpu.parallel.render import render_rays_sharded
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.step import BATCH_MODEL_KEYS

    model, mb, _ = _build(
        texsize=64, nprims=1024, height=24, width=16, batch=1,
        raymarch_options={"tile": 8, "max_hit": 8, "max_samples": 16, "chunk_tiles": 8},
        raymarch_backend="xla",
    )
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)

    def decode(params, stats, batch):
        out = model.apply(
            {"params": params, "stats": stats},
            target_neut_avgtex=batch["neut_avgtex"],
            target_neut_verts=batch["neut_verts"],
            idindex=batch["idindex"],
            camindex=batch["camindex"],
            deterministic=True,
            **{k: batch[k] for k in BATCH_MODEL_KEYS},
        )
        return out["irgbrec"]

    ref = np.asarray(decode(variables["params"], variables.get("stats", {}), mb))

    mesh = make_mesh(axis_names=("data",))
    out = render_rays_sharded(
        decode, variables["params"], variables.get("stats", {}), dict(mb), mesh
    )
    # 24 rows over 8 devices: sharded render must match the plain render
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_pallas_march_sharded_grads_match_single_device():
    """Gradients through the Pallas custom-VJP (incl. the aliased HBM
    accumulators) on a multi-device mesh equal the single-device result.
    The march runs per batch shard under shard_map (models/raymarcher.py)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ava256_tpu.ops.raymarch_pallas import mvp_raymarch_pallas
    from tests.test_raymarch import make_scene

    ndev = 4
    s = make_scene(N=ndev, H=17, W=17, k3=2, M=8)
    mesh = make_mesh(n_devices=ndev, axis_names=("data",))
    args = {k: jnp.asarray(s[k]) for k in
            ("raypos", "raydir", "tminmax", "primpos", "primrot", "primscale",
             "template")}

    def march(rp, rd, tmm, pp, pr, ps, tpl):
        return mvp_raymarch_pallas(
            rp, rd, s["stepsize"], tmm, pp, pr, ps, tpl, None,
            fadescale=6.5, fadeexp=8.0, interpret=True,
            tile=8, max_hit=8, nbuf=32,
        )

    def loss_single(pp, pr, ps, tpl):
        return jnp.sum(march(args["raypos"], args["raydir"], args["tminmax"],
                             pp, pr, ps, tpl))

    sharded = shard_map(march, mesh=mesh, in_specs=(P("data"),) * 7,
                        out_specs=P("data"), check_rep=False)

    def loss_sharded(pp, pr, ps, tpl):
        return jnp.sum(sharded(args["raypos"], args["raydir"], args["tminmax"],
                               pp, pr, ps, tpl))

    prims = [args[k] for k in ("primpos", "primrot", "primscale", "template")]
    g1 = jax.grad(loss_single, argnums=(0, 1, 2, 3))(*prims)
    sh = shard_batch({k: np.asarray(v) for k, v in args.items()}, mesh)
    g2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3)))(
        sh["primpos"], sh["primrot"], sh["primscale"], sh["template"]
    )
    for name, a, b in zip(("primpos", "primrot", "primscale", "template"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_pallas_warp_march_sharded_grads_match_single_device():
    """The warp-carrying march also shards: the Raymarcher front-end threads
    the warp volume as a batch-sharded shard_map operand (round-2 gap: a
    warp-carrying decode on a mesh silently replicated the march)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs multiple devices")
    from ava256_tpu.models.raymarcher import Raymarcher
    from tests.test_raymarch import make_scene

    ndev = 4
    s = make_scene(N=ndev, H=17, W=17, k3=2, M=8, warp=True)
    mesh = make_mesh(n_devices=ndev, axis_names=("data",))
    args = {k: jnp.asarray(s[k]) for k in
            ("raypos", "raydir", "tminmax", "primpos", "primrot", "primscale",
             "template", "warp")}
    volradius = 1.0 / s["stepsize"]  # front-end computes dt = 1/volradius

    def run(marcher, pp, pr, ps, tpl, wrp):
        decout = {"primpos": pp, "primrot": pr, "primscale": ps,
                  "template": tpl, "warp": wrp}
        rgb, alpha, _ = marcher(args["raypos"], args["raydir"],
                                args["tminmax"], decout)
        return jnp.sum(rgb) + jnp.sum(alpha)

    opts = dict(fadescale=6.5, fadeexp=8.0, interpret=True,
                tile=8, max_hit=8, nbuf=64)
    single = Raymarcher(volradius, backend="pallas", **opts)
    sharded = Raymarcher(volradius, backend="pallas", mesh=mesh, **opts)

    prims = [args[k] for k in ("primpos", "primrot", "primscale", "template",
                               "warp")]
    g1 = jax.grad(lambda *p: run(single, *p), argnums=(0, 1, 2, 3, 4))(*prims)
    sh = shard_batch({k: np.asarray(v) for k, v in args.items()}, mesh)
    g2 = jax.jit(jax.grad(lambda *p: run(sharded, *p), argnums=(0, 1, 2, 3, 4)))(
        sh["primpos"], sh["primrot"], sh["primscale"], sh["template"],
        sh["warp"]
    )
    for name, a, b in zip(("primpos", "primrot", "primscale", "template",
                           "warp"), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )
