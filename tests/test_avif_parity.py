# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Real-release format validation: an AVIF-encoded fixture capture in the
exact ava-256 zip layout, loaded by BOTH our SingleCaptureDataset and the
reference's own loader (/root/reference/data/ava_dataset.py:259-335), with
numeric equality asserted on every normalized batch field.

The reference loader's unavailable deps are stubbed: pillow-avif (Pillow 12
decodes AVIF natively), plyfile (minimal binary_little_endian x/y/z reader),
and igl/trimesh (imported by the reference's utils.py but unused on the data
path).
"""

import io
import json
import sys
import types
import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ava256_tpu.data import MugsyCapture, SingleCaptureDataset

NVERTS = 48
REF_ROOT = Path("/root/reference")


def _avif_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="AVIF", quality=85)
    return buf.getvalue()


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _ply_bytes(verts: np.ndarray) -> bytes:
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        + f"element vertex {len(verts)}\n".encode()
        + b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    return header + verts.astype("<f4").tobytes()


@pytest.fixture(scope="module")
def avif_capture_dir(tmp_path_factory):
    """A miniature capture in the release layout with real AVIF archives."""
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("avif_capture") / "decoder"
    (root / "image").mkdir(parents=True)
    (root / "uv_image").mkdir()
    (root / "kinematic_tracking").mkdir()
    (root / "head_pose").mkdir()

    cameras = ["401031", "401880"]
    frames = ["128", "129", "130"]

    krt = {
        "KRT": [
            {
                "cameraId": c,
                "K": [[7700 + 10 * i, 0, 0], [0, 7730, 0], [1334, 2048, 1]],
                "T": [[1, 0, 0], [0, 0, -1], [0, 1, 0], [11.0, -4.0, 1038.0]],
                "distortion": [0, 0, 0, 0],
            }
            for i, c in enumerate(cameras)
        ]
    }
    (root / "camera_calibration.json").write_text(json.dumps(krt))

    with open(root / "frame_list.csv", "w") as f:
        f.write("seg_id,frame_id\n")
        f.write(f"EXP_neutral_peak,{frames[0]}\n")
        for fr in frames[1:]:
            f.write(f"EXP_jaw_open,{fr}\n")

    # Smooth gradients compress well; content is irrelevant to parity since
    # both loaders decode the same bytes with the same Pillow decoder.
    def grad_img(h, w, k):
        x, y = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
        img = np.stack([x, y, (x * y + k / 10.0) % 1.0], axis=-1)
        return (img * 255).astype(np.uint8)

    for cam in cameras:
        with zipfile.ZipFile(root / "image" / f"cam{cam}.zip", "w") as z:
            for i, fr in enumerate(frames):
                z.writestr(
                    f"cam{cam}/{int(fr):06d}.avif", _avif_bytes(grad_img(256, 167, i))
                )

    with zipfile.ZipFile(root / "uv_image" / "color.zip", "w") as z:
        for i, fr in enumerate(frames):
            z.writestr(f"color/{int(fr):06d}.avif", _avif_bytes(grad_img(64, 64, i + 3)))
    (root / "uv_image" / "color_mean.png").write_bytes(_png_bytes(grad_img(64, 64, 5)))
    (root / "uv_image" / "color_variance.txt").write_text("625.0")

    verts = rng.randn(NVERTS, 3).astype(np.float32) * 10
    with zipfile.ZipFile(
        root / "kinematic_tracking" / "registration_vertices.zip", "w"
    ) as z:
        for fr in frames:
            z.writestr(f"{int(fr):06d}.ply", _ply_bytes(verts + rng.randn(NVERTS, 3)))
    np.save(root / "kinematic_tracking" / "registration_vertices_mean.npy", verts)
    (root / "kinematic_tracking" / "registration_vertices_variance.txt").write_text(
        "4.0"
    )

    with zipfile.ZipFile(root / "head_pose" / "head_pose.zip", "w") as z:
        rot = np.array(
            [[0.9, -0.1, 0.05], [0.1, 0.95, -0.02], [-0.05, 0.03, 0.92]],
            dtype=np.float32,
        )
        for i, fr in enumerate(frames):
            pose = np.concatenate(
                [rot, np.array([[2.0 + i], [-1.0], [15.0]], np.float32)], axis=1
            )
            z.writestr(
                f"{int(fr):06d}.txt",
                "\n".join(" ".join(repr(float(v)) for v in row) for row in pose),
            )
    return root


class _PlyElement:
    def __init__(self, data):
        self.data = data


class _PlyDataShim:
    """Minimal plyfile.PlyData: binary_little_endian float x/y/z vertices —
    exactly the release's registration_vertices format."""

    def __init__(self, elements):
        self._elements = elements

    def __getitem__(self, name):
        return self._elements[name]

    @staticmethod
    def read(fileobj):
        data = fileobj.read()
        head, _, body = data.partition(b"end_header\n")
        assert b"binary_little_endian" in head
        n = int(
            [ln for ln in head.split(b"\n") if ln.startswith(b"element vertex")][0]
            .split()[-1]
        )
        arr = np.frombuffer(body[: n * 12], dtype="<f4").reshape(n, 3)
        rec = np.rec.fromarrays([arr[:, 0], arr[:, 1], arr[:, 2]], names="x,y,z")
        return _PlyDataShim({"vertex": _PlyElement(rec)})


@pytest.fixture(scope="module")
def reference_dataset_module():
    """Import the reference's data.ava_dataset with unavailable deps stubbed."""
    if not REF_ROOT.exists():
        pytest.skip("reference checkout not available")
    import multiprocessing

    saved_modules = {
        k: sys.modules.get(k)
        for k in ("pillow_avif", "plyfile", "igl", "trimesh", "trimesh.triangles",
                  "data", "data.utils", "data.ava_dataset", "utils")
    }
    saved_start = multiprocessing.get_start_method(allow_none=True)

    sys.modules["pillow_avif"] = types.ModuleType("pillow_avif")
    plyfile = types.ModuleType("plyfile")
    plyfile.PlyData = _PlyDataShim
    sys.modules["plyfile"] = plyfile
    igl = types.ModuleType("igl")
    igl.point_mesh_squared_distance = None
    sys.modules["igl"] = igl
    trimesh = types.ModuleType("trimesh")
    trimesh.Trimesh = object
    tri_triangles = types.ModuleType("trimesh.triangles")
    tri_triangles.points_to_barycentric = None
    trimesh.triangles = tri_triangles
    sys.modules["trimesh"] = trimesh
    sys.modules["trimesh.triangles"] = tri_triangles
    for k in ("data", "data.utils", "data.ava_dataset", "utils"):
        sys.modules.pop(k, None)

    sys.path.insert(0, str(REF_ROOT))
    try:
        import data.ava_dataset as ref_ds  # noqa: PLC0415

        yield ref_ds
    finally:
        sys.path.remove(str(REF_ROOT))
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        # the reference module forces torch.multiprocessing to "spawn" at
        # import time; undo so later loader tests keep their start method
        if saved_start is not None:
            multiprocessing.set_start_method(saved_start, force=True)


def test_avif_batch_matches_reference_loader(
    avif_capture_dir, reference_dataset_module, monkeypatch
):
    # force the PIL resize fallback so both loaders share the resize kernel
    # (the native bilinear path is covered by test_native.py)
    import ava256_tpu.data.dataset as ds_mod

    monkeypatch.setattr(ds_mod, "_decode_image", _pil_only_decode(ds_mod))

    cap = MugsyCapture(mcd="20260101", mct="0000", sid="par001")
    ref_cap = reference_dataset_module.MugsyCapture(
        mcd="20260101", mct="0000", sid="par001"
    )
    ours = SingleCaptureDataset(cap, str(avif_capture_dir), downsample=32)
    ref = reference_dataset_module.SingleCaptureDataset(
        ref_cap, str(avif_capture_dir), downsample=32
    )

    assert len(ours) == len(ref)
    assert ours.cameras == ref.cameras
    np.testing.assert_array_equal(ours.texmean, np.moveaxis(ref.texmean, 0, -1))
    assert ours.texstd == ref.texstd
    np.testing.assert_array_equal(ours.vertmean, ref.vertmean)
    assert ours.vertstd == ref.vertstd

    for idx in (0, 1, 4):
        a = ours[idx]
        b = ref[idx]
        assert a is not None and b is not None, f"item {idx} failed to load"
        for k in ("camrot", "campos", "focal", "princpt", "headpose"):
            np.testing.assert_allclose(a[k], np.asarray(b[k]), rtol=1e-6, atol=1e-6,
                                       err_msg=k)
        # reference arrays are CHW; ours NHWC
        for k in ("image", "avgtex", "neut_avgtex"):
            np.testing.assert_allclose(
                a[k], np.moveaxis(np.asarray(b[k]), 0, -1), rtol=1e-5, atol=1e-4,
                err_msg=k,
            )
        for k in ("verts", "neut_verts", "pixelcoords"):
            np.testing.assert_allclose(a[k], np.asarray(b[k]), rtol=1e-6, atol=1e-6,
                                       err_msg=k)
        assert int(a["camindex"]) == int(b["camindex"])
        assert int(a["idindex"]) == int(b["idindex"])


def _pil_only_decode(ds_mod):
    """_decode_image without the native-resize fast path."""

    def decode(data, resize=None):
        img = Image.open(io.BytesIO(data))
        if resize is not None:
            img = img.resize(resize)
        arr = np.asarray(img, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[..., None].repeat(3, axis=-1)
        return arr[..., :3]

    return decode


def test_avif_native_resize_close_to_pil(avif_capture_dir):
    """The production decode path (native bilinear resize when built,
    otherwise PIL) loads the AVIF fixture and stays close to PIL's resize."""
    cap = MugsyCapture(mcd="20260101", mct="0000", sid="par001")
    ds = SingleCaptureDataset(cap, str(avif_capture_dir), downsample=32)
    item = ds[0]
    assert item is not None
    assert item["image"].shape == (4096 // 32, 2668 // 32, 3)
    assert np.isfinite(item["image"]).all()
    # raw pixel range (0..255 floats)
    assert 0.0 <= item["image"].min() and item["image"].max() <= 255.0
