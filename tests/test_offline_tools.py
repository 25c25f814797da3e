"""Offline tooling: gaussian convert/merge/info, optimized-camera export,
camera-rig visualization (the reference's scripts/gaussian + scripts/tools
counterparts)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from envgs_tpu.models.gaussians import create_pool
from envgs_tpu.train.trainer import init_train_state


def _pool(P=32, seed=0):
    rng = np.random.default_rng(seed)
    return create_pool(rng.normal(size=(P, 3)).astype(np.float32),
                       rng.random((P, 3)).astype(np.float32),
                       cap=P, sh_degree=2, init_opacity=0.5, seed=seed)


def _ckpt(tmp_path, with_cam=False, n_views=3):
    from envgs_tpu.train import checkpoints as ckpt
    from envgs_tpu.train.trainer import init_cam_opt

    state = init_train_state(_pool(), _pool(seed=1), jax.random.PRNGKey(0))
    cam_state = None
    if with_cam:
        cam_state = init_cam_opt(n_views)
        res = cam_state.res._replace(
            se3=cam_state.res.se3.at[:, 4].set(0.1),  # +0.1 y-translation
            intr=cam_state.res.intr.at[:, 0].set(0.02),
        )
        cam_state = cam_state._replace(res=res)
    path = str(tmp_path / "latest.npz")
    ckpt.save_checkpoint(path, state, it=100, cam_state=cam_state)
    return path


def test_gaussian_tools_convert_merge_info(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import gaussian_tools as gt

    npz = _ckpt(tmp_path)
    ply1 = str(tmp_path / "a.ply")
    sys.argv = ["gt", "convert", npz, ply1]
    gt.main()
    assert os.path.exists(ply1)

    # ply -> npz round trip preserves xyz
    npz2 = str(tmp_path / "b.npz")
    sys.argv = ["gt", "convert", ply1, npz2]
    gt.main()
    z = np.load(npz2)
    zsrc = np.load(npz)
    np.testing.assert_allclose(z["xyz"], zsrc["base/p/xyz"], atol=1e-6)

    # merge doubles the splat count
    merged = str(tmp_path / "m.ply")
    sys.argv = ["gt", "merge", ply1, ply1, merged]
    gt.main()
    from envgs_tpu.utils.ply import load_gaussian_ply

    assert load_gaussian_ply(merged)["xyz"].shape[0] == 2 * z["xyz"].shape[0]

    sys.argv = ["gt", "info", merged]
    gt.main()
    assert "opacity" in capsys.readouterr().out


def _write_rig(tmp_path, n=3):
    from envgs_tpu.utils.easycam import write_cameras

    cams = {}
    for i in range(n):
        th = 0.2 * i
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float64)
        cams[f"{i:02d}"] = dict(
            K=np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]]),
            R=R, T=np.array([[0.0], [0.0], [float(i)]]),
            H=480, W=640, D=np.zeros((5, 1)),
        )
    write_cameras(cams, str(tmp_path))
    return cams


def test_visualize_cameras(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import visualize_cameras as vc

    _write_rig(tmp_path)
    out = str(tmp_path / "rig.ply")
    sys.argv = ["vc", str(tmp_path), out]
    vc.main()
    from envgs_tpu.utils.ply import load_sfm_ply

    pts, rgb = load_sfm_ply(out)
    assert pts.shape[0] > 100 and rgb.shape == pts.shape
    assert np.isfinite(pts).all()


def test_extract_optimized_cameras(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import extract_optimized_cameras as eoc

    cams = _write_rig(tmp_path)
    ck = _ckpt(tmp_path, with_cam=True, n_views=len(cams))
    out_dir = str(tmp_path / "opt")
    sys.argv = ["eoc", str(tmp_path), ck, "--out", out_dir]
    eoc.main()

    from envgs_tpu.models.camera_opt import CameraResiduals, apply_residual
    from envgs_tpu.utils.camera import make_camera
    from envgs_tpu.utils.easycam import read_cameras

    got = read_cameras(out_dir)
    res = CameraResiduals(
        se3=jnp.zeros((3, 6)).at[:, 4].set(0.1),
        intr=jnp.zeros((3, 4)).at[:, 0].set(0.02),
    )
    for i, name in enumerate(sorted(cams)):
        c0 = cams[name]
        cam = make_camera(480, 640, c0["K"].astype(np.float32),
                          c0["R"].astype(np.float32),
                          c0["T"].reshape(3).astype(np.float32))
        want = apply_residual(cam, res, i)
        np.testing.assert_allclose(got[name]["R"], np.asarray(want.R),
                                   atol=1e-5)
        np.testing.assert_allclose(got[name]["T"].reshape(3),
                                   np.asarray(want.T), atol=1e-5)
        np.testing.assert_allclose(got[name]["K"], np.asarray(want.K),
                                   rtol=1e-5)
