# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Native data-IO library (C++/ctypes) vs numpy/torch references."""

import numpy as np
import pytest

from ava256_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        try:
            from ava256_tpu.native.build import build

            build()
        except Exception:  # noqa: BLE001
            pytest.skip("native toolchain unavailable")
    if not native.available():
        pytest.skip("native library not built")


def test_native_ply_binary():
    verts = np.random.RandomState(0).randn(500, 3).astype(np.float32)
    data = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 500\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    ) + verts.tobytes()
    out = native.parse_ply_vertices_native(data)
    np.testing.assert_array_equal(out, verts)


def test_native_ply_ascii():
    data = (
        b"ply\nformat ascii 1.0\nelement vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
        b"1 2 3\n4 5 6\n"
    )
    out = native.parse_ply_vertices_native(data)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_native_ply_rejects_garbage():
    assert native.parse_ply_vertices_native(b"not a ply file") is None


def test_native_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    img = (np.random.RandomState(1).rand(64, 48, 3) * 255).astype(np.uint8)
    ours = native.resize_bilinear_u8(img, (32, 24)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(img.astype(np.float32).transpose(2, 0, 1))[None],
        size=(32, 24), mode="bilinear", align_corners=False,
    )[0].numpy().transpose(1, 2, 0)
    assert np.abs(ours - ref).max() <= 0.5 + 1e-4  # uint8 rounding


def test_native_normalize():
    x = np.random.rand(8, 8, 3).astype(np.float32)
    m = np.random.rand(8, 8, 3).astype(np.float32)
    np.testing.assert_allclose(
        native.normalize_hwc(x, m, 2.0), (x - m) / 2.0, atol=1e-6
    )


def test_ply_module_uses_native():
    from ava256_tpu.geometry.ply import parse_ply_vertices

    verts = np.random.RandomState(2).randn(100, 3).astype(np.float32)
    data = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 100\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    ) + verts.tobytes()
    np.testing.assert_array_equal(parse_ply_vertices(data), verts)
