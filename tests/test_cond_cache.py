# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Device-resident conditioning tables (data/cond_cache.py): a lean batch
expanded from tables must equal the full batch, on host and inside jit."""

import numpy as np

import jax
import jax.numpy as jnp

from ava256_tpu.data.cond_cache import (
    LeanView,
    cached_field_names,
    expand_batch,
    expand_batch_host,
    table_nbytes,
)
from ava256_tpu.data.dataset import none_collate
from ava256_tpu.data.synthetic import SyntheticDataset


def _dataset():
    return SyntheticDataset(
        nident=3, ncams=4, nframes=2, height=24, width=20, texsize=32
    )


def test_expand_matches_full_batch():
    ds = _dataset()
    tables = ds.conditioning_tables()
    names = cached_field_names(tables)
    assert {"avgtex", "neut_avgtex", "neut_verts", "camrot", "campos",
            "pixelcoords", "modelmatrix", "focal", "princpt"} <= names
    assert table_nbytes(tables) > 0

    lean_ds = LeanView(ds, names)
    idxs = [0, 5, 10, 17]
    full = none_collate([ds[i] for i in idxs])
    lean = none_collate([lean_ds[i] for i in idxs])
    assert not (names & set(lean))

    # Host expansion reproduces every field exactly.
    host = expand_batch_host(lean, tables)
    for k in full:
        if k == "validinput":
            continue
        np.testing.assert_array_equal(np.asarray(host[k]), np.asarray(full[k]), err_msg=k)

    # Jitted expansion too (as used inside the train step).
    jitted = jax.jit(lambda b: expand_batch(b, tables))(
        {k: jnp.asarray(v) for k, v in lean.items() if k != "validinput"}
    )
    for k in full:
        if k == "validinput":
            continue
        np.testing.assert_allclose(
            np.asarray(jitted[k]), np.asarray(full[k]), rtol=0, atol=0, err_msg=k
        )


def test_expand_passthrough_on_full_batch():
    ds = _dataset()
    tables = ds.conditioning_tables()
    full = none_collate([ds[i] for i in range(2)])
    full = {k: v for k, v in full.items() if k != "validinput"}
    out = expand_batch_host(full, tables)
    assert set(out) == set(full)
    for k in full:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(full[k]))
    assert expand_batch(full, None) is full


def test_train_step_cond_equivalence():
    """One train step on (full batch, no tables) and on (lean batch + tables)
    must produce identical losses and parameters."""
    from ava256_tpu.train.init import init_model
    from ava256_tpu.train.state import create_train_state, make_optimizer
    from ava256_tpu.train.step import BATCH_MODEL_KEYS, make_train_step
    from __graft_entry__ import _build

    model, mb, dataset = _build(
        texsize=64, nprims=1024, height=16, width=16, batch=2, nident=2, ncams=2,
        raymarch_backend="xla",
        raymarch_options={"tile": 8, "max_hit": 8, "max_samples": 16,
                          "chunk_tiles": 4},
    )
    rng = jax.random.PRNGKey(0)
    variables = init_model(model, rng, mb)
    tx = make_optimizer()
    loss_weights = {"irgbl1": 1.0, "vertl1": 0.1, "kldiv": 1e-3, "primvolsum": 0.01}
    train_step = make_train_step(model, tx, loss_weights, dataset.vertmean,
                                 dataset.vertstd)

    tables = dataset.conditioning_tables()
    lean = {k: v for k, v in mb.items() if k not in cached_field_names(tables)}
    assert set(lean) < set(mb)

    s0 = create_train_state(variables, tx)
    s_full, loss_full, terms_full = train_step(s0, mb, rng)

    variables2 = init_model(model, jax.random.PRNGKey(0), mb)
    s1 = create_train_state(variables2, tx)
    s_lean, loss_lean, terms_lean = train_step(s1, lean, rng, cond=tables)

    np.testing.assert_allclose(float(loss_full), float(loss_lean), rtol=1e-6)
    for k in terms_full:
        np.testing.assert_allclose(
            float(terms_full[k]), float(terms_lean[k]), rtol=1e-5, err_msg=k
        )
    leaves_a = jax.tree_util.tree_leaves(s_full.params)
    leaves_b = jax.tree_util.tree_leaves(s_lean.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_device_prefetch_order_and_none_skip():
    from ava256_tpu.data.loader import device_prefetch

    items = [{"x": np.full((2,), i)} for i in range(6)]
    items.insert(2, None)
    out = list(device_prefetch(iter(items), lambda b: b["x"] * 2, depth=2))
    assert [int(o[0]) for o in out] == [0, 2, 4, 6, 8, 10]

    def boom():
        yield {"x": np.zeros(1)}
        raise RuntimeError("loader failed")

    import pytest

    gen = device_prefetch(boom(), lambda b: b["x"])
    next(gen)
    with pytest.raises(RuntimeError, match="loader failed"):
        list(gen)


def test_lean_view_and_camera_split_pickle():
    """LeanView / CameraSplit must survive pickling (spawn process pools
    pickle the dataset via Pool initargs); unconditional __getattr__
    forwarding used to recurse on unpickle (ADVICE r3, medium)."""
    import pickle

    from ava256_tpu.data.dataset import CameraSplit

    ds = _dataset()
    names = cached_field_names(ds.conditioning_tables())
    lean = pickle.loads(pickle.dumps(LeanView(ds, names)))
    assert len(lean) == len(ds)
    assert not (names & set(lean[0]))

    split = pickle.loads(pickle.dumps(CameraSplit(ds, [0], heldout=False)))
    assert len(split) > 0 and split[0] is not None


def test_device_prefetch_abandoned_consumer_unblocks_feeder():
    """Breaking out of the generator (train.py at maxiter) must release the
    feeder thread instead of leaving it blocked in q.put() forever."""
    import threading
    import time

    from ava256_tpu.data.loader import device_prefetch

    n_alive_before = threading.active_count()
    items = [{"x": np.full((2,), i)} for i in range(64)]
    gen = device_prefetch(iter(items), lambda b: b["x"], depth=2)
    next(gen)
    gen.close()
    deadline = time.time() + 5.0
    while threading.active_count() > n_alive_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_alive_before
