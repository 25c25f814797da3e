"""COLMAP capture -> easyvolcap-layout scene (ingest tooling).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/colmap_to_easyvolcap.py and
scripts/preprocess/tools/compute_metadata.py:58-75): a COLMAP sparse model
becomes an easymocap-format scene the trainer consumes directly —

  <output>/intri.yml, extri.yml      per-view K/dist + w2c R/T
  <output>/images/<view>/000000.<ext>  one view dir per registered image
  <output>/sparse/0/points3D.ply     SfM initialization cloud
  <output>/metadata.json             view split + spatial_scale/bounds

Usage:
  python scripts/colmap_to_easyvolcap.py --data_root <capture> \
      [--colmap sparse/0] [--output <out>] [--scale 1.0] [--skip 1] \
      [--eval-skip 8] [--link]

Importable API: convert_scene(), compute_metadata() (used by the round-trip
test in tests/test_ingest.py).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from envgs_tpu.utils.colmap import (  # noqa: E402
    camera_K,
    camera_dist,
    load_colmap_model,
    qvec_to_rotmat,
)
from envgs_tpu.utils.easycam import write_cameras  # noqa: E402
from envgs_tpu.utils.ply import save_sfm_ply  # noqa: E402


def convert_scene(
    data_root: str,
    output: str,
    colmap: str = "sparse/0",
    src_images_dir: str = "images",
    scale: float = 1.0,
    skip: int = 1,
    digit: int = 4,
    link: bool = True,
) -> dict:
    """Convert one COLMAP scene; returns the written camera dict."""
    cams, ims, (xyz, rgb, _err) = load_colmap_model(
        os.path.join(data_root, colmap))

    evccams: dict[str, dict] = {}
    cnt = 0
    src_dir = os.path.join(data_root, src_images_dir)
    for _key, im in sorted(ims.items(), key=lambda kv: kv[1].name)[::skip]:
        cc = cams[im.camera_id]
        name = f"{cnt:0{digit}d}"
        R = qvec_to_rotmat(np.asarray(im.qvec))
        T = np.asarray(im.tvec, np.float64).reshape(3, 1) * scale
        evccams[name] = dict(
            K=camera_K(cc), D=camera_dist(cc).reshape(5, 1),
            R=R, T=T, H=int(cc.height), W=int(cc.width),
        )
        src = os.path.join(src_dir, im.name)
        if not os.path.exists(src):
            stem, ext0 = os.path.splitext(im.name)
            for alt in (".jpg", ".JPG", ".png", ".PNG"):
                if os.path.exists(os.path.join(src_dir, stem + alt)):
                    src = os.path.join(src_dir, stem + alt)
                    break
        ext = os.path.splitext(src)[1] or ".jpg"
        tdir = os.path.join(output, "images", name)
        os.makedirs(tdir, exist_ok=True)
        dst = os.path.join(tdir, f"{0:06d}{ext}")
        if os.path.exists(src) and not os.path.exists(dst):
            if link:
                os.symlink(os.path.abspath(src), dst)
            else:
                shutil.copy(src, dst)
        cnt += 1

    write_cameras(evccams, output)
    os.makedirs(os.path.join(output, "sparse", "0"), exist_ok=True)
    save_sfm_ply(
        os.path.join(output, "sparse", "0", "points3D.ply"),
        np.asarray(xyz, np.float32) * scale,
        np.clip(np.asarray(rgb, np.float32) / 255.0, 0, 1),
    )
    return evccams


def compute_metadata(output: str, eval_skip: int = 8) -> dict:
    """Every-`eval_skip`-th view split + scene scale (compute_metadata.py
    semantics: camera-center mean/max-radius * 1.1, 3DGS convention)."""
    from envgs_tpu.utils.easycam import read_cameras

    cams = read_cameras(output)
    names = sorted(cams.keys())
    view_sample = [i for i in range(len(names)) if i % eval_skip != 0]
    val_view_sample = [i for i in range(len(names)) if i % eval_skip == 0]
    Rs = np.stack([cams[names[i]]["R"] for i in view_sample])
    Ts = np.stack([cams[names[i]]["T"].reshape(3, 1) for i in view_sample])
    Cs = -np.swapaxes(Rs, 1, 2) @ Ts  # camera centers (N, 3, 1)
    center = Cs.mean(axis=0)
    radius = float(np.linalg.norm(Cs - center[None], axis=1).max() * 1.1)
    meta = dict(
        n_views=len(names),
        view_sample=view_sample,
        val_view_sample=val_view_sample,
        spatial_scale=radius,
        center=center.reshape(3).tolist(),
        bounds=[
            (center.reshape(3) - 2 * radius).tolist(),
            (center.reshape(3) + 2 * radius).tolist(),
        ],
    )
    with open(os.path.join(output, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--output", default=None,
                   help="default: <data_root>/easyvolcap")
    p.add_argument("--colmap", default="sparse/0")
    p.add_argument("--src_images_dir", default="images")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--skip", type=int, default=1,
                   help="take every skip-th registered image")
    p.add_argument("--eval-skip", type=int, default=8,
                   help="every-Nth-view eval split in metadata.json")
    p.add_argument("--digit", type=int, default=4)
    p.add_argument("--copy", action="store_true",
                   help="copy images instead of symlinking")
    a = p.parse_args(argv)
    out = a.output or os.path.join(a.data_root, "easyvolcap")
    cams = convert_scene(
        a.data_root, out, colmap=a.colmap, src_images_dir=a.src_images_dir,
        scale=a.scale, skip=a.skip, digit=a.digit, link=not a.copy,
    )
    meta = compute_metadata(out, a.eval_skip)
    print(f"[colmap_to_easyvolcap] {len(cams)} views -> {out} "
          f"(spatial_scale {meta['spatial_scale']:.3f})")


if __name__ == "__main__":
    main()
