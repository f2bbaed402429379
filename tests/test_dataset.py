# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Data pipeline: zip-archive capture datasets (on a generated fixture),
synthetic dataset, sharded loader, collation, and the config system."""

import io
import json
import zipfile

import numpy as np
import pytest
from PIL import Image

from ava256_tpu.config import load_config
from ava256_tpu.data import (
    MugsyCapture,
    MultiCaptureDataset,
    ShardedLoader,
    SingleCaptureDataset,
    SyntheticDataset,
    none_collate,
)
from ava256_tpu.data.dataset import train_csv_loader

NVERTS = 64


def _write_png(arr: np.ndarray) -> bytes:
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
def capture_dir(tmp_path_factory):
    """A miniature on-disk capture in the ava-256 release layout (PNG images
    instead of AVIF — the loader probes extensions)."""
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("capture") / "decoder"
    (root / "image").mkdir(parents=True)
    (root / "uv_image").mkdir()
    (root / "kinematic_tracking").mkdir()
    (root / "head_pose").mkdir()

    cameras = ["cam001", "cam002"]
    frames = ["000001", "000002", "000003"]

    krt = {
        "KRT": [
            {
                "cameraId": c,
                "K": [[2000, 0, 0], [0, 2000, 0], [1334, 2048, 1]],
                "T": [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1000.0]],
                "distortion": [0, 0, 0, 0],
            }
            for c in cameras
        ]
    }
    (root / "camera_calibration.json").write_text(json.dumps(krt))

    with open(root / "frame_list.csv", "w") as f:
        f.write("seg_id,frame_id\n")
        f.write("EXP_neutral_peak,1\n")
        for fr in frames[1:]:
            f.write(f"EXP_smile,{int(fr)}\n")

    for cam in cameras:
        with zipfile.ZipFile(root / "image" / f"cam{cam}.zip", "w") as z:
            for fr in frames:
                img = rng.randint(0, 255, (128, 84, 3), np.uint8)
                z.writestr(f"cam{cam}/{int(fr):06d}.png", _write_png(img))

    with zipfile.ZipFile(root / "uv_image" / "color.zip", "w") as z:
        for fr in frames:
            tex = rng.randint(0, 255, (64, 64, 3), np.uint8)
            z.writestr(f"color/{int(fr):06d}.png", _write_png(tex))
    (root / "uv_image" / "color_mean.png").write_bytes(
        _write_png(rng.randint(0, 255, (64, 64, 3), np.uint8))
    )
    (root / "uv_image" / "color_variance.txt").write_text("625.0")

    verts = rng.randn(NVERTS, 3).astype(np.float32) * 10
    with zipfile.ZipFile(
        root / "kinematic_tracking" / "registration_vertices.zip", "w"
    ) as z:
        for fr in frames:
            z.writestr(f"{int(fr):06d}.ply", _ply_bytes(verts + rng.randn(NVERTS, 3)))
    np.save(root / "kinematic_tracking" / "registration_vertices_mean.npy", verts)
    (root / "kinematic_tracking" / "registration_vertices_variance.txt").write_text("4.0")

    with zipfile.ZipFile(root / "head_pose" / "head_pose.zip", "w") as z:
        pose = np.eye(4, dtype=np.float32)[:3]
        for fr in frames:
            z.writestr(
                f"{int(fr):06d}.txt",
                "\n".join(" ".join(str(v) for v in row) for row in pose),
            )
    return root


def test_single_capture_dataset(capture_dir):
    cap = MugsyCapture(mcd="20260101", mct="0000", sid="tst001")
    ds = SingleCaptureDataset(cap, str(capture_dir), downsample=32)
    assert len(ds) == 2 * 3  # cameras * frames
    item = ds[0]
    assert item is not None
    assert item["image"].shape == (4096 // 32, 2668 // 32, 3)
    assert item["verts"].shape == (NVERTS, 3)
    assert item["avgtex"].shape == (64, 64, 3)
    assert item["neut_verts"].shape == (NVERTS, 3)
    assert item["camrot"].shape == (3, 3)
    assert np.isfinite(item["verts"]).all()
    # head pose is identity here: camrot equals raw calibration
    np.testing.assert_allclose(item["camrot"], ds.camrot[ds.cameras[0]], atol=1e-5)


def test_multi_capture_dataset_and_stats(capture_dir):
    caps = [
        MugsyCapture(mcd="20260101", mct="0000", sid="a"),
        MugsyCapture(mcd="20260101", mct="0001", sid="b"),
    ]
    ds = MultiCaptureDataset(caps, [str(capture_dir)] * 2, downsample=32)
    assert len(ds) == 12
    # both "captures" point at the same fixture: cross-capture variance is 0,
    # the per-capture variance term keeps vertstd positive
    assert ds.vertstd > 0 and np.isfinite(ds.texstd)
    item = ds[7]
    assert item["idindex"] == 1
    cond = ds.get_neutral_conditioning(0)
    assert cond["neut_verts"].shape == (NVERTS, 3)


def test_none_collate_drops_failures():
    good = {"a": np.ones(3), "idindex": np.int32(0)}
    batch = none_collate([good, None, good])
    assert batch["a"].shape == (2, 3)
    assert none_collate([None, None]) is None


def test_sharded_loader_covers_all_and_shards():
    ds = SyntheticDataset(nident=1, ncams=2, nframes=8, height=16, width=16,
                          texsize=64, nverts=32)
    seen = []
    for host in range(2):
        loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                               host_id=host, num_hosts=2)
        for batch in loader:
            assert batch["image"].shape[0] == 2
            seen.append(batch["camindex"])
    assert len(seen) == 8  # 16 items / 2 hosts / batch 2


def test_train_csv_loader(tmp_path):
    csv = tmp_path / "ids.csv"
    csv.write_text("mcd,mct,sid\n20260101,0000,abc123\n20260102,1111,def456\n")
    caps, dirs = train_csv_loader(tmp_path, csv, nids=1)
    assert len(caps) == 1
    assert caps[0].sid == "abc123"
    assert dirs[0].endswith("20260101--0000--abc123/decoder")


def test_config_dot_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("train:\n  lr: 0.1\n  steps: 5\nmodel:\n  nprims: 256\n")
    cfg = load_config(str(p), ["train.lr=0.2", "model.nprims", "1024", "new.key=hi"])
    assert cfg.train.lr == 0.2
    assert cfg.train.steps == 5
    assert cfg.model.nprims == 1024
    assert cfg.new.key == "hi"
    assert isinstance(cfg.to_dict(), dict)


def test_loader_set_position_resumes_exact_order(capture_dir):
    """Checkpoint-resume determinism: a loader fast-forwarded to batch k
    yields exactly the batches an uninterrupted loader yields from k on."""
    from ava256_tpu.data.loader import ShardedLoader

    cap = MugsyCapture(mcd="20260101", mct="0000", sid="tst001")
    ds = SingleCaptureDataset(cap, str(capture_dir), downsample=32)
    a = ShardedLoader(ds, batch_size=2, shuffle=True, num_workers=1)
    full = [b["camindex"].tolist() for _ in range(2) for b in a]  # 2 epochs
    b = ShardedLoader(ds, batch_size=2, shuffle=True, num_workers=1)
    k = 4
    b.set_position(k)
    resumed = [bb["camindex"].tolist() for bb in b]
    assert resumed == full[k : k + len(resumed)]


def test_camera_split_partitions_items(capture_dir):
    """Held-out camera split: train and heldout views partition the items,
    the heldout view only yields the reserved cameras, and global camera
    indexing (colorcal/bg tables) is unchanged."""
    from ava256_tpu.data import CameraSplit, last_n_camindices

    cap = MugsyCapture(mcd="20260101", mct="0000", sid="tst001")
    ds = SingleCaptureDataset(cap, str(capture_dir), downsample=32)
    held = last_n_camindices(ds, 1)
    train_view = CameraSplit(ds, held, heldout=False)
    eval_view = CameraSplit(ds, held, heldout=True)

    assert len(train_view) + len(eval_view) == len(ds)
    assert len(eval_view) == 3  # 1 camera x 3 frames
    for i in range(len(eval_view)):
        item = eval_view[i]
        assert int(item["camindex"]) in held
    for i in range(len(train_view)):
        item = train_view[i]
        assert int(item["camindex"]) not in held
    # attribute delegation: the view exposes the full camera set and stats
    assert train_view.get_allcameras() == ds.get_allcameras()
    assert train_view.vertstd == ds.vertstd

    # synthetic dataset supports the same split
    sds = SyntheticDataset(nident=2, ncams=4, nframes=2, height=8, width=8,
                           texsize=16, nverts=16)
    sheld = last_n_camindices(sds, 2)
    sv = CameraSplit(sds, sheld, heldout=True)
    assert len(sv) == len(sds) // 2
    assert all(int(sv[i]["camindex"]) in sheld for i in range(len(sv)))

    with pytest.raises(ValueError):
        last_n_camindices(ds, 99)


def test_loader_process_pool(capture_dir):
    from ava256_tpu.data.loader import ShardedLoader

    cap = MugsyCapture(mcd="20260101", mct="0000", sid="tst001")
    ds = SingleCaptureDataset(cap, str(capture_dir), downsample=32)
    thread_loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    proc_loader = ShardedLoader(
        ds, batch_size=2, shuffle=False, num_workers=2, use_processes=True
    )
    a = [b["image"] for b in thread_loader]
    b = [b["image"] for b in proc_loader]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
