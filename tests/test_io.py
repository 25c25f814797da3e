import numpy as np

from envgs_tpu.utils.ply import (
    load_gaussian_ply,
    load_sfm_ply,
    read_ply,
    save_gaussian_ply,
    save_sfm_ply,
    write_ply,
)
from envgs_tpu.utils.easycam import read_cameras, rodrigues, rodrigues_inv, write_cameras


def test_sfm_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.random((100, 3)).astype(np.float32)
    p = str(tmp_path / "pts.ply")
    save_sfm_ply(p, xyz, rgb)
    x2, c2 = load_sfm_ply(p)
    np.testing.assert_allclose(x2, xyz, atol=1e-6)
    np.testing.assert_allclose(c2, rgb, atol=1 / 255.0)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    P, K = 50, 16
    xyz = rng.normal(size=(P, 3)).astype(np.float32)
    f_dc = rng.normal(size=(P, 1, 3)).astype(np.float32)
    f_rest = rng.normal(size=(P, K - 1, 3)).astype(np.float32)
    opac = rng.normal(size=(P, 1)).astype(np.float32)
    scal = rng.normal(size=(P, 2)).astype(np.float32)
    rot = rng.normal(size=(P, 4)).astype(np.float32)
    p = str(tmp_path / "gs.ply")
    save_gaussian_ply(p, xyz, f_dc, f_rest, opac, scal, rot)
    d = load_gaussian_ply(p)
    np.testing.assert_allclose(d["xyz"], xyz, atol=1e-6)
    np.testing.assert_allclose(d["f_dc"], f_dc, atol=1e-6)
    np.testing.assert_allclose(d["f_rest"], f_rest, atol=1e-6)
    np.testing.assert_allclose(d["opacity"], opac, atol=1e-6)
    np.testing.assert_allclose(d["scaling"], scal, atol=1e-6)
    np.testing.assert_allclose(d["rotation"], rot, atol=1e-6)


def test_ply_ascii_read(tmp_path):
    p = tmp_path / "a.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1 2\n3 4 5\n"
    )
    d = read_ply(str(p))
    np.testing.assert_allclose(d["x"], [0, 3])
    np.testing.assert_allclose(d["z"], [2, 5])


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        r = rng.normal(size=3) * 0.8
        R = rodrigues(r)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rodrigues_inv(R), r, atol=1e-8)


def test_easymocap_camera_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    cams = {}
    for name in ["00", "01", "02"]:
        R = rodrigues(rng.normal(size=3) * 0.5)
        cams[name] = dict(
            K=np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]),
            D=np.zeros((5, 1)),
            R=R,
            T=rng.normal(size=(3, 1)),
            H=480,
            W=640,
        )
    write_cameras(cams, str(tmp_path))
    out = read_cameras(str(tmp_path))
    assert list(out) == ["00", "01", "02"]
    for name in cams:
        np.testing.assert_allclose(out[name]["K"], cams[name]["K"], atol=1e-8)
        np.testing.assert_allclose(out[name]["R"], cams[name]["R"], atol=1e-8)
        np.testing.assert_allclose(out[name]["T"], cams[name]["T"], atol=1e-8)
