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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Blender / dnerf-synthetic ingest (scripts/blender_to_easyvolcap.py — the
# reference's scripts/preprocess/blender_to_easyvolcap.py +
# dnerf_synthetic_to_easyvolcap.py semantics)
# ---------------------------------------------------------------------------

def _make_blender_scene(root, n_train=6, n_test=3, H=40, W=48, dnerf=False):
    """transforms_{train,test}.json + RGBA pngs of a gradient disc."""
    from PIL import Image

    import json as _json

    cax = 0.8
    for split, n in (("train", n_train), ("test", n_test)):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            ang = 2 * np.pi * (i + (0.5 if split == "test" else 0)) / n
            c = np.array([2.5 * np.cos(ang), 0.4, 2.5 * np.sin(ang)])
            fwd = -c / np.linalg.norm(c)  # looks at origin (OpenGL -z fwd)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(fwd, up)
            right /= np.linalg.norm(right)
            upv = np.cross(right, fwd)
            c2w = np.eye(4)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
                right, upv, -fwd, c)
            fr = {"file_path": f"./{split}/r_{i}",
                  "transform_matrix": c2w.tolist()}
            if dnerf:
                fr["time"] = i / max(n - 1, 1)
            frames.append(fr)
            yy, xx = np.mgrid[0:H, 0:W]
            r2 = (xx - W / 2) ** 2 + (yy - H / 2) ** 2
            a = (r2 < (H / 3) ** 2).astype(np.float32)
            img = np.zeros((H, W, 4), np.float32)
            img[..., 0] = xx / W
            img[..., 1] = yy / H
            img[..., 2] = i / n
            img[..., 3] = a
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, split, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            _json.dump({"camera_angle_x": cax, "frames": frames}, f)


@pytest.mark.slow
def test_blender_roundtrip_to_training(tmp_path):
    """transforms.json scene -> converter -> dataset layer -> a real
    training run (VERDICT r2 missing #5)."""
    from blender_to_easyvolcap import convert_scene

    cap = str(tmp_path / "blender")
    out = str(tmp_path / "scene")
    _make_blender_scene(cap)
    cams = convert_scene(cap, out)
    assert set(cams) == {"train", "test"} and len(cams["train"]) == 6

    # white-background compositing: the disc exterior must be white
    from PIL import Image

    im = np.asarray(Image.open(
        os.path.join(out, "train", "images", "0000", "000000.png")))
    assert np.all(im[0, 0] == 255), "bg not composited to white"
    msk = np.asarray(Image.open(
        os.path.join(out, "train", "masks", "0000", "000000.png")))
    assert msk[0, 0].max() == 0 and msk[20, 24].max() == 255

    # K from camera_angle_x
    from envgs_tpu.utils.easycam import read_cameras

    rc = read_cameras(os.path.join(out, "train"))
    f_expect = 0.5 * 48 / np.tan(0.4)
    assert abs(rc["0000"]["K"][0, 0] - f_expect) < 1e-6

    # camera geometry: rays from converted w2c look at the world origin
    R, T = rc["0000"]["R"], rc["0000"]["T"].reshape(3)
    c = -R.T @ T
    fwd_cv = R[2]  # OpenCV +z forward row
    cos = np.dot(fwd_cv, -c / np.linalg.norm(c))
    assert cos > 0.99, f"converted camera does not face origin ({cos})"

    # the converted scene trains through the standard CLI path
    from envgs_tpu import cli
    from envgs_tpu.engine import Config

    cfg = Config.wrap({
        "exp_name": "blender_check",
        "out_root": str(tmp_path / "data"),
        "dataset_cfg": {"source": "multiview",
                        "data_root": os.path.join(out, "train"),
                        "use_masks": True, "eval_every": 6},
        "model_cfg": {"sampler_cfg": {
            "type": "GaussianTSampler", "pool_cap": 4096,
            "pair_cap": 2 ** 14, "raster_backend": "ref",
        }},
        "runner_cfg": {"epochs": 1, "ep_iter": 10, "log_interval": 5},
    })
    state = cli.train_gaussiant(cfg)
    assert int(np.sum(np.asarray(state.pool.stats.active))) > 0


def test_dnerf_time_preserved(tmp_path):
    """dnerf per-frame `time` survives the YAML round trip as cam['t']."""
    from blender_to_easyvolcap import convert_scene

    cap = str(tmp_path / "dnerf")
    out = str(tmp_path / "scene")
    _make_blender_scene(cap, dnerf=True)
    convert_scene(cap, out, black_bkgd=True)

    from envgs_tpu.utils.easycam import read_cameras

    rc = read_cameras(os.path.join(out, "train"))
    ts = [rc[n]["t"] for n in sorted(rc)]
    assert ts == sorted(ts) and ts[0] == 0.0 and ts[-1] == 1.0

    # black background: exterior stays black
    from PIL import Image

    im = np.asarray(Image.open(
        os.path.join(out, "train", "images", "0000", "000000.png")))
    assert np.all(im[0, 0] == 0)


def test_run_colmap_fake_binary_end_to_end(tmp_path):
    """run_colmap orchestration (reference run_colmap.py:85-192 semantics)
    against a FAKE colmap binary: the driver must invoke the pipeline
    stages in order (feature_extractor -> matcher -> mapper -> BA ->
    converters), then chain into colmap_to_easyvolcap and produce a
    trainable scene + metadata. With no binary, it must print the exact
    commands instead of failing."""
    from run_colmap import colmap_commands, ingest, run_pipeline

    cap = str(tmp_path / "capture")
    stash = str(tmp_path / "stash")
    _make_colmap_capture(stash)  # donor model; the fake mapper "produces" it
    os.makedirs(os.path.join(cap, "images"), exist_ok=True)
    for n in os.listdir(os.path.join(stash, "images")):
        os.link(os.path.join(stash, "images", n),
                os.path.join(cap, "images", n))

    fake = str(tmp_path / "fake_colmap")
    log = str(tmp_path / "calls.log")
    with open(fake, "w") as fh:
        fh.write(
            "#!/bin/bash\n"
            f"echo \"$1\" >> {log}\n"
            "if [ \"$1\" = mapper ]; then\n"
            f"  mkdir -p \"$7/0\" && cp {stash}/sparse/0/*.txt \"$7/0/\"\n"
            "fi\n"
            "exit 0\n")
    os.chmod(fake, 0o755)

    # no binary on PATH -> prints commands, returns False, no exception
    assert run_pipeline(cap, binary="definitely_not_colmap") is False

    # command list is the documented pipeline, in order
    names = [c[1] for c in colmap_commands(cap)]
    assert names == ["feature_extractor", "exhaustive_matcher", "mapper",
                     "bundle_adjuster", "model_converter", "model_converter"]

    out = str(tmp_path / "scene")
    meta = ingest(cap, out, binary=fake)
    assert meta is not None and meta["spatial_scale"] > 0
    called = open(log).read().split()
    assert called[:3] == ["feature_extractor", "exhaustive_matcher", "mapper"]
    # trainable-scene layout (INGEST.md step 1 contract)
    for p in ("intri.yml", "extri.yml", "metadata.json",
              os.path.join("images", "0000", "000000.png")):
        assert os.path.exists(os.path.join(out, p)), p
    mj = json.load(open(os.path.join(out, "metadata.json")))
    assert mj["view_sample"] and mj["val_view_sample"]


def test_llff_converter_roundtrip(tmp_path):
    """LLFF ingest (nerf_llff_to_easyvolcap): COLMAP-at-sparse/0 monocular
    capture -> easymocap scene with the reference's (id-1):03d keys and
    00.<ext> frame naming; cameras round-trip exactly."""
    from scripts.nerf_llff_to_easyvolcap import convert_llff

    from envgs_tpu.utils.easycam import read_cameras

    cap = str(tmp_path / "fern")
    _make_colmap_capture(cap, n_views=6)
    out = str(tmp_path / "evc")
    cams = convert_llff(cap, out, metadata=True)
    assert sorted(cams) == [f"{i:03d}" for i in range(6)]
    back = read_cameras(out)
    for k, cam in cams.items():
        np.testing.assert_allclose(back[k]["K"], cam["K"], atol=1e-5)
        np.testing.assert_allclose(back[k]["R"], cam["R"], atol=1e-6)
        np.testing.assert_allclose(back[k]["T"], cam["T"], atol=1e-6)
        fr = os.path.join(out, "images", k, "00.png")
        assert os.path.exists(fr), fr
    assert os.path.exists(os.path.join(out, "metadata.json"))
    assert os.path.exists(os.path.join(out, "sparse/0/points3D.ply"))


def test_mipnerf360_converter_roundtrip(tmp_path):
    """Mip-NeRF 360 ingest: poses_bounds.npy (nerf_pl LLFF convention,
    'down right back' c2w) -> easymocap w2c cameras with near/far; the
    axis permutation and inversion round-trip against hand-built poses."""
    from scripts.mipnerf360_to_easyvolcap import convert_mipnerf360_scene

    from envgs_tpu.utils.easycam import read_cameras

    root = str(tmp_path / "garden")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    H, W, F = 40, 48, 50.0
    n = 5
    rng = np.random.default_rng(1)
    rows = []
    c2ws = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        c = np.array([2 * np.cos(ang), 0.3, 2 * np.sin(ang)])
        fwd = -c / np.linalg.norm(c)          # camera "front" (to origin)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        # c2w with columns (right, down, front) — the TARGET convention
        c2w = np.stack([right, down, fwd], axis=1)
        c2ws.append((c2w, c))
        # store in the LLFF "down right back" convention the converter
        # must undo: columns (down, right, -front)
        m = np.stack([down, right, -fwd], axis=1)
        pose = np.concatenate(
            [m, c[:, None], np.array([[H], [W], [F]])], axis=1)  # (3, 5)
        rows.append(np.concatenate([pose.reshape(-1), [0.5, 9.0]]))
        _png(os.path.join(root, "images", f"v{i:02d}.png"),
             np.full((H, W, 3), i / n, np.float32))
    np.save(os.path.join(root, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))

    out = str(tmp_path / "evc360")
    cams = convert_mipnerf360_scene(root, out)
    assert sorted(cams) == [f"{i:06d}" for i in range(n)]
    back = read_cameras(out)
    for i, (c2w, c) in enumerate(c2ws):
        k = f"{i:06d}"
        # w2c R = c2w^T; T = -R @ c
        np.testing.assert_allclose(back[k]["R"], c2w.T, atol=1e-6)
        np.testing.assert_allclose(back[k]["T"][:, 0], -c2w.T @ c,
                                   atol=1e-6)
        assert abs(back[k]["n"] - 0.5) < 1e-6
        assert abs(back[k]["f"] - 9.0) < 1e-6
        assert os.path.exists(os.path.join(out, "images", k, "000000.png"))


def test_nerfstudio_path_converter(tmp_path):
    """Nerfstudio camera-path JSON -> easymocap cameras: the OpenGL->OpenCV
    axis shuffle round-trips (a camera looking down -z in OpenGL at a known
    position maps to the OpenCV w2c with +z forward at the same center)."""
    import json as _json

    from scripts.nerfstudio_to_easyvolcap import convert_nerfstudio_path

    from envgs_tpu.utils.easycam import read_cameras

    H, W = 64, 96
    # identity OpenGL camera at origin + one translated/rotated one
    c2w0 = np.eye(4)
    ang = 0.7
    c2w1 = np.eye(4)
    c2w1[:3, :3] = np.array([
        [np.cos(ang), 0, np.sin(ang)],
        [0, 1, 0],
        [-np.sin(ang), 0, np.cos(ang)]])
    c2w1[:3, 3] = [0.5, -0.2, 2.0]
    jd = {"render_height": H, "render_width": W, "camera_path": [
        {"fov": 60.0, "camera_to_world": c2w0.ravel().tolist()},
        {"fov": 60.0, "camera_to_world": c2w1.ravel().tolist()},
    ]}
    jp = tmp_path / "path.json"
    jp.write_text(_json.dumps(jd))
    out = str(tmp_path / "evc")
    cams = convert_nerfstudio_path(str(jp), out)
    back = read_cameras(out)
    assert sorted(back) == ["000000", "000001"]
    f = 0.5 * H / np.tan(np.deg2rad(30.0))
    np.testing.assert_allclose(back["000000"]["K"][0, 0], f, rtol=1e-6)
    for k in cams:
        R = back[k]["R"]
        # valid rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        # camera center round-trips THROUGH THE REFERENCE'S WORLD REMAP:
        # its opengl2opencv permutes world axes to (y, x, -z)
        # (nerfstudio_to_easyvolcap.py:9-14), so c_cv = P c_gl
        c_gl = (c2w0 if k == "000000" else c2w1)[:3, 3]
        expect = np.array([c_gl[1], c_gl[0], -c_gl[2]])
        c = -R.T @ back[k]["T"][:, 0]
        np.testing.assert_allclose(c, expect, atol=1e-6)
    # OpenGL -z forward becomes OpenCV +z forward: in the remapped world
    # the identity camera looks along +z' (= -z_gl); row 2 of R is the
    # OpenCV viewing direction
    fwd = back["000000"]["R"][2]
    np.testing.assert_allclose(fwd, [0, 0, 1.0], atol=1e-6)


def test_dtu_converter_roundtrip(tmp_path):
    """DTU (MVSNet layout) ingest: cam.txt parsing with the reference's
    scale-200 translation + x4 intrinsics, PFM depth read (bottom-up
    order), half-resize + 44/80 crop, masks from depth>0."""
    from PIL import Image

    from scripts.dtu_to_easyvolcap import convert_dtu_scan, read_pfm

    from envgs_tpu.utils.easycam import read_cameras

    root = tmp_path / "dtu"
    (root / "Cameras" / "train").mkdir(parents=True)
    (root / "Rectified" / "scan1_train").mkdir(parents=True)
    (root / "Depths_raw" / "scan1").mkdir(parents=True)
    H, W = 512, 640  # full image; depth pfm at the same size
    # (the crop constants 44/80 need at least the DTU aspect; smaller
    # frames would crop to empty)
    n = 3
    rng = np.random.default_rng(0)
    for i in range(n):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, 3] = [i * 10.0, 0.0, 400.0]
        ixt = np.array([[100, 0, W / 8], [0, 100, H / 8], [0, 0, 1]],
                       np.float32)
        with open(root / "Cameras" / "train" / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in ext:
                f.write(" ".join(str(x) for x in r) + "\n")
            f.write("\nintrinsic\n")
            for r in ixt:
                f.write(" ".join(str(x) for x in r) + "\n")
            f.write("\n425.0 2.5\n")
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / "Rectified" / "scan1_train" / f"rect_{i+1:03d}_3_r5000.png")
        # PF depth: bottom half zero (background), top half 500
        dpt = np.zeros((H, W), np.float32)
        dpt[: H // 2] = 500.0
        with open(root / "Depths_raw" / "scan1" /
                  f"depth_map_{i:04d}.pfm", "wb") as f:
            f.write(b"Pf\n")
            f.write(f"{W} {H}\n".encode())
            f.write(b"-1.0\n")
            f.write(np.flipud(dpt).astype("<f4").tobytes())
        if i == 0:
            back = read_pfm(str(root / "Depths_raw" / "scan1" /
                                "depth_map_0000.pfm"))
            np.testing.assert_allclose(back, dpt)

    out = str(tmp_path / "evc")
    n_out = convert_dtu_scan(str(root), "scan1", out, scale=200.0)
    assert n_out == n
    cams = read_cameras(os.path.join(out, "scan1", "cameras", "00"))
    assert len(cams) == n
    np.testing.assert_allclose(cams["000001"]["T"][:, 0],
                               [10.0 / 200, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(cams["000000"]["K"][0, 0], 400.0, atol=1e-5)
    dpt = np.load(os.path.join(out, "scan1", "depths", "00", "000000.npy"))
    assert dpt.shape == (H // 2 - 88, W // 2 - 160)
    # top rows carry 500/200, bottom zero
    np.testing.assert_allclose(dpt[0, 0], 2.5, atol=1e-5)
    assert dpt[-1, -1] == 0.0
    msk = np.asarray(Image.open(
        os.path.join(out, "scan1", "masks", "00", "000000.jpg")))
    assert msk[0, 0] > 200 and msk[-1, -1] < 50
    assert os.path.exists(
        os.path.join(out, "scan1", "images", "00", "000000.jpg"))
