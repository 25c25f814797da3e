"""Export OPTIMIZED cameras from a trained checkpoint back to easyvolcap
intri.yml/extri.yml.

The analog of /root/reference/scripts/tools/extract_optimized_cameras.py:
training with camera optimization (runner_cfg.cam_opt.enabled) learns
per-view SE(3) + intrinsic residuals; this applies them to the dataset's
stored cameras and writes a corrected camera pair next to the originals,
so downstream tools (and re-training without cam-opt) see the refined
poses.

Usage:
  python scripts/extract_optimized_cameras.py <data_root> <checkpoint.npz> \
      [--out <dir=data_root/optimized>]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("data_root", help="scene root holding intri/extri.yml")
    p.add_argument("checkpoint", help="trained latest.npz with cam residuals")
    p.add_argument("--out", default=None)
    a = p.parse_args()

    import jax.numpy as jnp

    from envgs_tpu.models.camera_opt import CameraResiduals, apply_residual
    from envgs_tpu.utils.camera import make_camera
    from envgs_tpu.utils.easycam import read_cameras, write_cameras

    z = np.load(a.checkpoint)
    se3_key = next((k for k in z.files if k.endswith("res/se3")), None)
    if se3_key is None:
        raise SystemExit(f"{a.checkpoint} carries no camera residuals "
                         f"(train with runner_cfg.cam_opt.enabled=True)")
    prefix = se3_key[: -len("se3")]
    res = CameraResiduals(se3=jnp.asarray(z[se3_key]),
                          intr=jnp.asarray(z[prefix + "intr"]))

    cams = read_cameras(a.data_root)
    names = sorted(cams)
    if len(names) != res.se3.shape[0]:
        print(f"[warn] {len(names)} cameras vs {res.se3.shape[0]} residuals "
              f"— applying by sorted-name index up to the shorter")
    out = {}
    for i, name in enumerate(names):
        c = dict(cams[name])
        if i < res.se3.shape[0]:
            cam = make_camera(
                int(c.get("H", 1080)), int(c.get("W", 1920)),
                c["K"].astype(np.float32), c["R"].astype(np.float32),
                c["T"].reshape(3).astype(np.float32),
            )
            cam = apply_residual(cam, res, i)
            c["K"] = np.asarray(cam.K, np.float64)
            c["R"] = np.asarray(cam.R, np.float64)
            c["T"] = np.asarray(cam.T, np.float64).reshape(3, 1)
        out[name] = c
    out_dir = a.out or os.path.join(a.data_root, "optimized")
    os.makedirs(out_dir, exist_ok=True)
    write_cameras(out, out_dir)
    print(f"[extract] wrote optimized intri/extri for {len(out)} cameras "
          f"-> {out_dir}")


if __name__ == "__main__":
    main()
