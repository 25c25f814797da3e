"""COLMAP -> easyvolcap ingest round trip: a synthetic COLMAP capture is
converted by scripts/colmap_to_easyvolcap.py and must reach a training run
through the standard dataset layer (the reference's custom-dataset flow,
docs/misc/custom_dataset.md + compute_metadata.py semantics)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from colmap_to_easyvolcap import compute_metadata, convert_scene  # noqa: E402


def _png(path, arr):
    from PIL import Image

    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def _make_colmap_capture(root, n_views=10, H=40, W=48):
    """Text-format COLMAP model + images of a colored gradient scene."""
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    f = 50.0
    with open(os.path.join(root, "sparse", "0", "cameras.txt"), "w") as fh:
        fh.write(f"1 PINHOLE {W} {H} {f} {f} {W/2} {H/2}\n")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # camera on a circle looking inward (w2c R, T)
        c = np.array([2 * np.cos(ang), 0.3, 2 * np.sin(ang)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd])  # rows: cam axes in world
        T = -R @ c
        # rotmat -> quaternion (w, x, y, z)
        tr = np.trace(R)
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                          (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
        else:
            k = np.argmax(np.diag(R))
            i1, i2 = (k + 1) % 3, (k + 2) % 3
            s = np.sqrt(R[k, k] - R[i1, i1] - R[i2, i2] + 1.0) * 2
            q = np.zeros(4)
            q[0] = (R[i2, i1] - R[i1, i2]) / s
            q[1 + k] = 0.25 * s
            q[1 + i1] = (R[i1, k] + R[k, i1]) / s
            q[1 + i2] = (R[i2, k] + R[k, i2]) / s
        name = f"img_{i:03d}.png"
        lines.append(
            f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
            f"{T[0]} {T[1]} {T[2]} 1 {name}\n\n"
        )
        img = np.zeros((H, W, 3), np.float32)
        img[..., 0] = np.linspace(0, 1, W)[None, :]
        img[..., 1] = np.linspace(0, 1, H)[:, None]
        img[..., 2] = i / n_views
        _png(os.path.join(root, "images", name), img)
    with open(os.path.join(root, "sparse", "0", "images.txt"), "w") as fh:
        fh.writelines(lines)
    pts = rng.normal(scale=0.4, size=(200, 3))
    with open(os.path.join(root, "sparse", "0", "points3D.txt"), "w") as fh:
        for j, p in enumerate(pts):
            rgb = rng.integers(0, 255, 3)
            fh.write(f"{j} {p[0]} {p[1]} {p[2]} "
                     f"{rgb[0]} {rgb[1]} {rgb[2]} 0.5\n")


def test_colmap_roundtrip_to_training(tmp_path):
    cap = str(tmp_path / "capture")
    out = str(tmp_path / "scene")
    _make_colmap_capture(cap)
    cams = convert_scene(cap, out, link=False)
    assert len(cams) == 10
    meta = compute_metadata(out, eval_skip=8)
    assert meta["spatial_scale"] > 0
    assert os.path.exists(os.path.join(out, "intri.yml"))
    assert os.path.exists(os.path.join(out, "sparse", "0", "points3D.ply"))
    with open(os.path.join(out, "metadata.json")) as f:
        assert json.load(f)["n_views"] == 10

    # the converted scene loads through the standard dataset layer
    from envgs_tpu.data.dataset import MultiViewDataset

    ds = MultiViewDataset(out, split="train", eval_every=8)
    vs = MultiViewDataset(out, split="val", eval_every=8)
    assert len(ds) + len(vs) == 10 and len(vs) >= 1
    item = ds[0]
    assert item["rgb"].shape[-1] == 3
    xyz, rgb = ds.load_sfm(None)
    assert xyz.shape == (200, 3)

    # ...and reaches an actual training run (GaussianT CLI, few iters)
    from envgs_tpu import cli
    from envgs_tpu.engine import Config

    cfg = Config.wrap({
        "exp_name": "ingest_check",
        "out_root": str(tmp_path / "data"),
        "dataset_cfg": {"source": "multiview", "data_root": out,
                        "eval_every": 8},
        "model_cfg": {"sampler_cfg": {
            "type": "GaussianTSampler", "pool_cap": 1024,
            "pair_cap": 2 ** 14, "raster_backend": "ref",
        }},
        "runner_cfg": {"epochs": 1, "ep_iter": 10, "log_interval": 5},
    })
    state = cli.train_gaussiant(cfg)
    assert int(np.sum(np.asarray(state.pool.stats.active))) > 0
