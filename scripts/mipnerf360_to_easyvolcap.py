"""Mip-NeRF 360 capture -> easyvolcap-layout scene (ingest tooling).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/mipnerf360_to_easyvolcap.py): read
camera poses from poses_bounds.npy (the nerf_pl LLFF convention: (N, 17)
rows = 3x5 [pose | H W F] + near/far), convert the "down right back"
camera axes to "right down front" (github.com/bmild/nerf/issues/34),
invert c2w -> w2c, and lay out one view directory per image —

  <scene_out>/intri.yml, extri.yml       per-view K + w2c R/T + near/far
  <scene_out>/images/<key>/000000.<ext>  key = image index as %06d

Usage (multi-scene, like the reference):
  python scripts/mipnerf360_to_easyvolcap.py --mipnerf360_root data/m360 \
      [--scenes bonsai bicycle ...] [--output <root>] [--copy]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from envgs_tpu.utils.easycam import write_cameras  # noqa: E402

SCENES = ("bonsai", "bicycle", "counter", "flowers", "garden", "kitchen",
          "room", "stump", "treehill")


def convert_mipnerf360_scene(scene_root: str, output: str,
                             raw_images_dir: str = "images",
                             out_images_dir: str = "images",
                             link: bool = True) -> dict:
    """Convert one scene; returns the written camera dict."""
    raw = np.load(os.path.join(scene_root, "poses_bounds.npy"),
                  allow_pickle=True)  # (N, 17)
    poses = raw[:, :15].reshape(-1, 3, 5)
    bounds = raw[:, -2:]
    H, W, F = poses[0, :, -1]  # identical intrinsics across images
    # "down right back" -> "right down front" (bmild/nerf#34)
    poses = np.concatenate(
        [poses[..., 1:2], poses[..., :1], -poses[..., 2:3], poses[..., 3:4]],
        axis=-1)  # (N, 3, 4) c2w

    names = sorted(os.listdir(os.path.join(scene_root, raw_images_dir)))
    assert len(names) == len(poses), (len(names), len(poses))
    evccams: dict[str, dict] = {}
    for i, img in enumerate(names):
        key = f"{i:06d}"
        c2w = np.concatenate([poses[i], [[0, 0, 0, 1]]], axis=0)
        w2c = np.linalg.inv(c2w)
        K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float64)
        evccams[key] = dict(
            K=K, R=w2c[:3, :3], T=w2c[:3, 3:], H=int(H), W=int(W),
            n=float(bounds[i, 0]), f=float(bounds[i, 1]),
        )
        src = os.path.join(scene_root, raw_images_dir, img)
        ext = os.path.splitext(img)[1].lower()
        dst = os.path.join(output, out_images_dir, key, f"000000{ext}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.lexists(dst):
            os.remove(dst)
        if link:
            os.symlink(os.path.relpath(src, os.path.dirname(dst)), dst)
        else:
            shutil.copy(src, dst)
    write_cameras(evccams, output)
    return evccams


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mipnerf360_root", required=True)
    p.add_argument("--output", default=None,
                   help="default: <mipnerf360_root>/<scene>/easyvolcap")
    p.add_argument("--scenes", nargs="*", default=None,
                   help="default: the 9 published scenes present on disk")
    p.add_argument("--images", default="images")
    p.add_argument("--copy", action="store_true")
    a = p.parse_args(argv)
    scenes = a.scenes
    if scenes is None:
        scenes = [s for s in SCENES
                  if os.path.isdir(os.path.join(a.mipnerf360_root, s))]
    for scene in scenes:
        sroot = os.path.join(a.mipnerf360_root, scene)
        out = (os.path.join(a.output, scene) if a.output
               else os.path.join(sroot, "easyvolcap"))
        cams = convert_mipnerf360_scene(sroot, out, raw_images_dir=a.images,
                                        link=not a.copy)
        print(f"[mipnerf360] {scene}: wrote {len(cams)} views to {out}")


if __name__ == "__main__":
    main()
