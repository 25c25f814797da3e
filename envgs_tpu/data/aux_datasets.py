"""Auxiliary datasets: GeometryDataset (voxel-grid evaluation batches) and
NoopDataset (camera-metadata-only batches).

TPU-native equivalents of the reference's
dataloaders/datasets/geometry_dataset.py (a per-frame 3D evaluation grid —
optionally initialized by visual-hull carving — fed to a network to extract
geometry) and dataloaders/datasets/noop_dataset.py:14-95 (a dataset that
synthesizes camera/metadata batches with no image IO, used by inference
and GUI-driven rendering).

Both produce plain numpy dicts like the image datasets, so samplers,
loaders, and the runner consume them unchanged; the grids are static-shape
chunks (padded, with a `valid` mask) so downstream evaluation jits once.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from envgs_tpu.engine import DATASETS


def create_meshgrid_3d(bounds: np.ndarray, voxel_size: float) -> np.ndarray:
    """(W, H, D, 3) world-space grid covering `bounds` at `voxel_size`."""
    lo, hi = np.asarray(bounds[0], np.float64), np.asarray(bounds[1],
                                                           np.float64)
    axes = [np.arange(lo[i], hi[i] + 1e-9, voxel_size, dtype=np.float32)
            for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1)


@DATASETS.register
class GeometryDataset:
    """Per-frame voxel-grid batches for geometry extraction.

    Each item: dict(xyz (P,3), dir (P,3) pointing at the origin, dist (P,1),
    valid (P,), bounds (2,3), voxel_size, frame_index, t). With masks +
    cameras, `use_space_carving_initialization` restricts the grid to the
    visual hull (reference geometry_dataset.py:31-92, via the same vhull
    carving used for initialization)."""

    def __init__(
        self,
        bounds: Sequence[Sequence[float]] = ((-1, -1, -1), (1, 1, 1)),
        voxel_size: float = 0.05,
        n_frames: int = 1,
        duration: float = 1.0,
        use_space_carving_initialization: bool = False,
        cameras: list | None = None,  # [(H, W, K, R, T)] for carving
        masks: list | None = None,  # per-frame list of (H, W) fg masks
        pad_to: int | None = None,
    ):
        self.bounds = np.asarray(bounds, np.float32)
        self.voxel_size = float(voxel_size)
        self.n_frames = int(n_frames)
        self.duration = float(duration)

        grid = create_meshgrid_3d(self.bounds, self.voxel_size)
        flat = grid.reshape(-1, 3)
        self._items = []
        for f in range(self.n_frames):
            if use_space_carving_initialization and cameras:
                import jax.numpy as jnp

                from envgs_tpu.utils.fusion import visual_hull

                res = max(2, int(round(
                    float((self.bounds[1] - self.bounds[0]).max())
                    / self.voxel_size)))
                xyz = visual_hull(jnp.asarray(np.stack(masks[f])), cameras,
                                  (self.bounds[0], self.bounds[1]), res=res)
                if len(xyz) == 0:
                    xyz = flat
            else:
                xyz = flat
            self._items.append(np.asarray(xyz, np.float32))
        self.pad_to = pad_to

    def __len__(self):
        return self.n_frames

    def __getitem__(self, i: int) -> dict:
        xyz = self._items[i]
        P = xyz.shape[0]
        n = self.pad_to or P
        valid = np.zeros((n,), bool)
        valid[:min(P, n)] = True
        if P < n:
            xyz = np.pad(xyz, ((0, n - P), (0, 0)))
        else:
            xyz = xyz[:n]
        nrm = np.linalg.norm(xyz, axis=-1, keepdims=True)
        dirs = -xyz / np.maximum(nrm, 1e-8)  # point inward to the origin
        return dict(
            xyz=xyz,
            dir=dirs.astype(np.float32),
            dist=np.full((n, 1), self.voxel_size, np.float32),
            valid=valid,
            bounds=self.bounds,
            voxel_size=np.float32(self.voxel_size),
            frame_index=i,
            t=np.float32(i / max(self.n_frames - 1, 1) * self.duration),
        )


@DATASETS.register
class NoopDataset:
    """Camera/metadata-only batches (no image IO) — the inference/GUI feed.

    Mirrors noop_dataset.py: synthesized H/W/K/R/T per (view, frame) from a
    provided camera list or an orbit path, near/far/bounds metadata, and
    normalized timestamps."""

    def __init__(
        self,
        cameras: list | None = None,  # [(K, R, T)] explicit views
        H: int = 512,
        W: int = 512,
        n_frames: int = 1,
        near: float = 0.02,
        far: float = 100.0,
        bounds: Sequence[Sequence[float]] = ((-5, -5, -5), (5, 5, 5)),
        duration: float = 1.0,
        orbit_radius: float | None = None,  # synthesize an orbit if no cams
        orbit_n: int = 30,
        focal_ratio: float = 1.0,
    ):
        self.H, self.W = int(H), int(W)
        self.near, self.far = float(near), float(far)
        self.bounds = np.asarray(bounds, np.float32)
        self.duration = float(duration)
        self.n_frames = int(n_frames)
        if cameras is None:
            r = orbit_radius if orbit_radius is not None else float(
                np.linalg.norm(self.bounds[1] - self.bounds[0])) * 0.75
            f = focal_ratio * self.W
            K = np.array([[f, 0, self.W / 2], [0, f, self.H / 2],
                          [0, 0, 1]], np.float32)
            cameras = []
            for a in np.linspace(0, 2 * np.pi, orbit_n, endpoint=False):
                fwd = np.array([-np.sin(a), 0.0, -np.cos(a)], np.float32)
                up = np.array([0.0, -1.0, 0.0], np.float32)
                right = np.cross(up, fwd)
                up2 = np.cross(fwd, right)
                R = np.stack([right, up2, fwd]).astype(np.float32)
                C = -fwd * r
                T = (-R @ C).astype(np.float32)
                cameras.append((K, R, T))
        self.cameras = cameras

    @property
    def n_views(self):
        return len(self.cameras)

    def __len__(self):
        return self.n_views * self.n_frames

    def __getitem__(self, i: int) -> dict:
        view = i % self.n_views
        frame = i // self.n_views
        K, R, T = self.cameras[view]
        return dict(
            H=self.H, W=self.W,
            K=np.asarray(K, np.float32), R=np.asarray(R, np.float32),
            T=np.asarray(T, np.float32),
            near=np.float32(self.near), far=np.float32(self.far),
            bounds=self.bounds,
            view_index=view, frame_index=frame,
            t=np.float32(frame / max(self.n_frames - 1, 1) * self.duration),
        )
