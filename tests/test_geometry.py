# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Host-side geometry utilities: OBJ/PLY/KRT loaders and UV barycentric maps."""

import json

import numpy as np

from ava256_tpu.geometry import (
    create_uv_baridx,
    load_camera_calibration,
    load_obj,
    make_closest_uv_barys,
    parse_ply_vertices,
)
from ava256_tpu.geometry.uv import closest_point_barycentrics_2d


def test_load_obj_simple(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
    )
    out = load_obj(str(obj))
    assert out["v"].shape == (4, 3)
    assert out["vt"].shape == (4, 2)
    assert out["vi"].shape == (2, 3)
    assert out["vti"].shape == (2, 3)
    np.testing.assert_array_equal(out["vi"][0], [0, 1, 2])


def test_load_obj_reference_topology(reference_assets):
    out = load_obj(f"{reference_assets}/face_topology.obj")
    # Shape card facts from SURVEY.md §2.4 (reference models/autoencoder.py:87)
    assert out["v"].shape == (7306, 3)
    assert out["vi"].shape[1] == 3
    assert out["vt"].shape[1] == 2


def test_parse_ply_binary_roundtrip():
    verts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 100\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"end_header\n"
    )
    data = header + verts.tobytes()
    out = parse_ply_vertices(data)
    np.testing.assert_allclose(out, verts, rtol=0, atol=0)


def test_parse_ply_ascii():
    header = (
        b"ply\nformat ascii 1.0\nelement vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
        b"1.0 2.0 3.0\n4.0 5.0 6.0\n"
    )
    out = parse_ply_vertices(header)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_load_camera_calibration(tmp_path):
    krt = {
        "KRT": [
            {
                "cameraId": "cam0",
                "K": np.eye(3).tolist(),
                "T": np.vstack([np.eye(3), np.zeros(3)]).tolist(),
                "distortion": [0.0, 0.0, 0.0, 0.0],
            }
        ]
    }
    p = tmp_path / "krt.json"
    p.write_text(json.dumps(krt))
    cams = load_camera_calibration(p)
    assert "cam0" in cams
    assert cams["cam0"]["intrin"].shape == (3, 3)
    assert cams["cam0"]["extrin"].shape == (3, 4)


def test_load_camera_calibration_reference(reference_assets):
    cams = load_camera_calibration(f"{reference_assets}/camera_calibration.json")
    assert len(cams) >= 1
    for cam in cams.values():
        assert cam["intrin"].shape == (3, 3)


def test_closest_point_barycentrics_inside_triangle():
    tri = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    pts = np.array([[0.25, 0.25], [0.1, 0.1]])
    q, bary, fidx = closest_point_barycentrics_2d(tri, pts)
    np.testing.assert_allclose(q, pts, atol=1e-12)
    np.testing.assert_allclose(bary.sum(axis=1), 1.0, atol=1e-12)
    assert (bary >= -1e-12).all()
    assert (fidx == 0).all()


def test_closest_point_barycentrics_outside_clamps():
    tri = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    pts = np.array([[2.0, -1.0], [-1.0, -1.0]])
    q, bary, _ = closest_point_barycentrics_2d(tri, pts)
    np.testing.assert_allclose(q[0], [1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(q[1], [0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(bary.sum(axis=1), 1.0, atol=1e-12)


def test_make_closest_uv_barys_reconstruction():
    """Texels inside triangles reconstruct their own UV coordinates exactly."""
    vt = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32)
    vti = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    res = 16
    index_img, bary_img = make_closest_uv_barys(vt, vti, res, flip_uv=False)
    assert index_img.shape == (res, res)
    assert bary_img.shape == (res, res, 3)
    # Reconstruct texel UVs from barycentrics
    tri_pts = vt[vti]  # [F,3,2]
    recon = np.einsum("hwk,hwkc->hwc", bary_img, tri_pts[index_img])
    us = (np.arange(res) + 0.5) / res
    uu, vv = np.meshgrid(us, us)
    expected = np.stack([uu, vv], axis=-1)
    np.testing.assert_allclose(recon, expected, atol=1e-5)


def test_create_uv_baridx_reference(reference_assets, tmp_path):
    uvdata = create_uv_baridx(
        f"{reference_assets}/face_topology.obj", resolution=64, cache_dir=str(tmp_path)
    )
    assert uvdata["uv_idx"].shape == (3, 64, 64)
    assert uvdata["uv_bary"].shape == (3, 64, 64)
    # Barycentrics sum to one and indices are valid vertex ids
    np.testing.assert_allclose(uvdata["uv_bary"].sum(axis=0), 1.0, atol=1e-4)
    assert uvdata["uv_idx"].max() < 7306
    assert uvdata["uv_idx"].min() >= 0
    # Cache round-trips
    uvdata2 = create_uv_baridx(
        f"{reference_assets}/face_topology.obj", resolution=64, cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(uvdata["uv_idx"], uvdata2["uv_idx"])
