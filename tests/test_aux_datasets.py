"""GeometryDataset (voxel-grid batches, optional vhull carving) and
NoopDataset (camera-only batches) — reference parity:
geometry_dataset.py / noop_dataset.py."""
import numpy as np

from envgs_tpu.data.aux_datasets import GeometryDataset, NoopDataset
from envgs_tpu.engine import DATASETS
from envgs_tpu.utils.camera import make_camera


def test_geometry_dataset_grid_batches():
    ds = GeometryDataset(bounds=((-1, -1, -1), (1, 1, 1)), voxel_size=0.5,
                         n_frames=3, duration=1.0, pad_to=200)
    assert len(ds) == 3
    it = ds[1]
    assert it["xyz"].shape == (200, 3) and it["valid"].sum() == 125
    v = it["valid"]
    assert np.all(np.abs(it["xyz"][v]) <= 1.0 + 1e-6)
    # dirs point at the origin, dist is the voxel size
    d = it["dir"][v]
    far = np.linalg.norm(it["xyz"][v], axis=-1) > 1e-6
    cos = np.sum(d[far] * (-it["xyz"][v][far]
                           / np.linalg.norm(it["xyz"][v][far], axis=-1,
                                            keepdims=True)), -1)
    assert np.allclose(cos, 1.0, atol=1e-5)
    assert np.allclose(it["dist"], 0.5)
    assert it["t"] == np.float32(0.5)


def test_geometry_dataset_vhull_carving():
    H = W = 48
    f = 60.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cams = []
    masks = []
    # two orthogonal views of a centered ball at the origin; cameras at
    # z=-3 looking +z and x=-3 looking +x
    for R, C in [
        (np.eye(3, dtype=np.float32), np.array([0, 0, -3], np.float32)),
        (np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32),
         np.array([-3, 0, 0], np.float32)),
    ]:
        T = -R @ C
        cams.append(make_camera(H, W, K, R, T))
        yy, xx = np.mgrid[0:H, 0:W]
        rad = np.hypot(xx - W / 2, yy - H / 2)
        masks.append((rad < 10).astype(np.float32))
    ds = GeometryDataset(bounds=((-1, -1, -1), (1, 1, 1)), voxel_size=0.1,
                         n_frames=1, use_space_carving_initialization=True,
                         cameras=cams, masks=[masks])
    it = ds[0]
    pts = it["xyz"][it["valid"]]
    assert len(pts) > 0
    # carved points concentrate near the view-axes intersection (origin)
    assert np.linalg.norm(pts, axis=-1).max() < 1.2


def test_noop_dataset_orbit():
    ds = NoopDataset(H=64, W=96, n_frames=4, orbit_n=8, duration=2.0)
    assert len(ds) == 32
    it = ds[9]  # view 1, frame 1
    assert it["H"] == 64 and it["W"] == 96
    assert it["view_index"] == 1 and it["frame_index"] == 1
    assert np.isclose(it["t"], 2.0 / 3.0, atol=1e-6)
    # extrinsics are valid rotations and all cameras look at the origin
    for i in range(8):
        K, R, T = ds.cameras[i]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        C = -R.T @ T
        fwd = R[2]  # camera z-axis in world coords
        cos = -np.dot(fwd, C) / np.linalg.norm(C)
        assert cos > 0.99


def test_registered_names():
    assert "GeometryDataset" in DATASETS
    assert "NoopDataset" in DATASETS
