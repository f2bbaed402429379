"""Synthetic capture data: deterministic random "subjects" with look-at
cameras around a head-sized blob mesh.

Used by tests, benchmarks, and training smoke runs when no real capture data
is present (the real ava-256 release is multi-TB). Shapes follow the model
card (SURVEY.md §2.4): V vertices, 1024^2 textures by default, dome-like
cameras ~1.1m from the origin, volradius 256.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def _lookat_camera(rng: np.ndarray, radius: float) -> Dict[str, np.ndarray]:
    # Random position in the front hemisphere, looking at the origin.
    theta = rng.uniform(-0.9, 0.9)  # azimuth
    phi = rng.uniform(-0.5, 0.5)  # elevation
    pos = radius * np.array(
        [np.sin(theta) * np.cos(phi), np.sin(phi), np.cos(theta) * np.cos(phi)],
        np.float32,
    )
    z = -pos / np.linalg.norm(pos)  # camera looks along +z toward origin
    up = np.array([0.0, 1.0, 0.0], np.float32)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    # World-to-camera rows
    rot = np.stack([x, y, z], axis=0).astype(np.float32)
    return {"campos": pos, "camrot": rot}


class SyntheticDataset:
    """Deterministic synthetic multi-identity dataset."""

    def __init__(
        self,
        nident: int = 2,
        ncams: int = 4,
        nframes: int = 8,
        height: int = 128,
        width: int = 128,
        texsize: int = 1024,
        nverts: int = 7306,
        base_verts: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        self.nident = nident
        self.ncams = ncams
        self.nframes = nframes
        self.height, self.width = height, width
        self.texsize = texsize
        self.seed = seed

        rng = np.random.RandomState(seed)
        if base_verts is None:
            # A head-sized ellipsoid point cloud (world units; volradius=256)
            pts = rng.randn(nverts, 3).astype(np.float32)
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            base_verts = pts * np.array([90.0, 120.0, 100.0], np.float32)
        self.base_verts = base_verts.astype(np.float32)
        self.nverts = self.base_verts.shape[0]

        self.cameras = [_lookat_camera(rng, radius=1100.0) for _ in range(ncams)]
        self.identities = list(range(nident))

        # Per-identity neutral offsets and textures
        self.id_offsets = [
            rng.randn(self.nverts, 3).astype(np.float32) * 2.0 for _ in range(nident)
        ]
        self.id_textures = [
            rng.rand(texsize, texsize, 3).astype(np.float32) for _ in range(nident)
        ]

        self.vertmean = self.base_verts
        self.vertstd = 10.0
        self.texmean = np.full((texsize, texsize, 3), 0.5, np.float32)
        self.texstd = 0.25

    def get_allcameras(self) -> List[int]:
        return list(range(self.ncams))

    def get_neutral_conditioning(self, ident: int) -> Dict[str, np.ndarray]:
        neut_verts = self.base_verts + self.id_offsets[ident]
        return {
            "neut_avgtex": (self.id_textures[ident] - self.texmean) / self.texstd,
            "neut_verts": (neut_verts - self.vertmean) / self.vertstd,
        }

    def get_img_size(self):
        return (self.height, self.width)

    def __len__(self) -> int:
        return self.nident * self.ncams * self.nframes

    def item_camindex(self, idx: int) -> int:
        """Camera index of item ``idx`` without fetching it (split support)."""
        return (idx // self.nident) % self.ncams

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        ident = idx % self.nident
        cam = (idx // self.nident) % self.ncams
        frame = idx // (self.nident * self.ncams)
        rng = np.random.RandomState(self.seed + 1 + idx)

        focal = np.full((2,), self.width * 2.0, np.float32)
        princpt = np.array([self.width / 2, self.height / 2], np.float32)

        neut_verts = self.base_verts + self.id_offsets[ident]
        verts = neut_verts + rng.randn(*neut_verts.shape).astype(np.float32) * 1.0
        neut_avgtex = self.id_textures[ident]
        avgtex = np.clip(
            neut_avgtex + rng.randn(*neut_avgtex.shape).astype(np.float32) * 0.01, 0, 1
        )

        px, py = np.meshgrid(
            np.arange(self.width, dtype=np.float32),
            np.arange(self.height, dtype=np.float32),
        )
        image = np.zeros((self.height, self.width, 3), np.float32)
        image[..., 0] = 100 + 50 * np.sin(px / 17 + ident)
        image[..., 1] = 100 + 50 * np.cos(py / 13 + cam)
        image[..., 2] = 100 + 40 * np.sin((px + py) / 23 + frame)

        return dict(
            camrot=self.cameras[cam]["camrot"],
            campos=self.cameras[cam]["campos"],
            focal=focal,
            princpt=princpt,
            modelmatrix=np.eye(4, dtype=np.float32),
            avgtex=(avgtex - self.texmean) / self.texstd,
            verts=(verts - self.vertmean) / self.vertstd,
            neut_avgtex=(neut_avgtex - self.texmean) / self.texstd,
            neut_verts=(neut_verts - self.vertmean) / self.vertstd,
            pixelcoords=np.stack([px, py], axis=-1),
            idindex=np.int32(ident),
            camindex=np.int32(cam),
            image=image,
            validinput=True,
        )
