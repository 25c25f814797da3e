"""Blender/dnerf-synthetic capture -> easyvolcap-layout scene (ingest).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/blender_to_easyvolcap.py and
scripts/preprocess/dnerf_synthetic_to_easyvolcap.py): a NeRF-synthetic-style
scene (transforms_{train,val,test}.json + RGBA pngs) becomes per-split
easymocap-format scenes the trainer consumes directly —

  <output>/<split>/intri.yml, extri.yml   per-view K (from camera_angle_x)
                                          + w2c OpenCV R/T (OpenGL flip)
  <output>/<split>/images/<view>/000000.png  alpha-composited onto the
                                          background color (white default)
  <output>/<split>/masks/<view>/000000.png   alpha > 0 object mask
  <output>/<split>/metadata.json          spatial_scale/bounds

dnerf scenes carry a per-frame `time`; it is preserved as `t_<view>` in
extri.yml (read back by easycam.read_cameras / the video dataset).

This is the ingest path for the Shiny-Blender / NeRF-Casting parity
datasets (BASELINE.md evaluation protocol).

Usage:
  python scripts/blender_to_easyvolcap.py --blender_root <scene-or-set> \
      [--output <out>] [--black_bkgd] [--ext png] [--has_normal]

Importable API: convert_scene(), convert_split() (used by the round-trip
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

from envgs_tpu.utils.easycam import write_cameras  # noqa: E402

# OpenGL (blender) camera -> OpenCV: flip y (down) and z (forward)
_GL2CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float64)


def _imread_rgba(path: str) -> np.ndarray:
    """-> (H, W, 4) float in [0, 1] (alpha = 1 when the file has none)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    return img


def _imwrite(path: str, img: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
    ).save(path)


def convert_split(
    blender_path: str,
    out_path: str,
    split: str,
    bg_color: np.ndarray,
    ext: str = "png",
    has_normal: bool = False,
    digit: int = 4,
) -> dict | None:
    """Convert one transforms_<split>.json; returns the camera dict (or
    None when the split file is absent)."""
    tf = os.path.join(blender_path, f"transforms_{split}.json")
    if not os.path.exists(tf):
        return None
    with open(tf) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if frames and "time" in frames[0]:  # dnerf: frames ordered by time
        frames = sorted(frames, key=lambda fr: fr["time"])
    camera_angle_x = float(meta["camera_angle_x"])

    cams: dict[str, dict] = {}
    H = W = None
    for cnt, frame in enumerate(frames):
        rel = frame["file_path"]
        rel = rel[2:] if rel.startswith("./") else rel
        src = os.path.join(blender_path, rel)
        if not os.path.splitext(src)[1]:
            src = src + f".{ext}"
        name = f"{cnt:0{digit}d}"

        img = _imread_rgba(src)
        if H is None:
            H, W = img.shape[:2]
        rgb = img[..., :3] * img[..., 3:] + bg_color * (1 - img[..., 3:])
        _imwrite(os.path.join(out_path, "images", name, f"000000.{ext}"),
                 rgb)
        _imwrite(os.path.join(out_path, "masks", name, f"000000.{ext}"),
                 (img[..., 3:] > 0).astype(np.float32).repeat(3, axis=-1))
        if has_normal:
            nsrc = os.path.splitext(src)[0] + f"_normal.{ext}"
            if os.path.exists(nsrc):
                ndst = os.path.join(out_path, "normals_gt", name,
                                    f"000000.{ext}")
                os.makedirs(os.path.dirname(ndst), exist_ok=True)
                shutil.copy(nsrc, ndst)

        c2w_gl = np.asarray(frame["transform_matrix"], np.float64)
        w2c = np.linalg.inv(c2w_gl @ _GL2CV)
        fpix = 0.5 * W / np.tan(0.5 * camera_angle_x)
        cam = dict(
            K=np.array([[fpix, 0, 0.5 * W], [0, fpix, 0.5 * H], [0, 0, 1]]),
            D=np.zeros((5, 1)),
            R=w2c[:3, :3], T=w2c[:3, 3:],
            H=int(H), W=int(W),
        )
        if "time" in frame:
            cam["t"] = float(frame["time"])
        cams[name] = cam

    write_cameras(cams, out_path)

    # metadata: camera-center bounding sphere, 3DGS spatial_scale convention
    Cs = np.stack([
        -cams[n]["R"].T @ cams[n]["T"] for n in sorted(cams)
    ])  # (N, 3, 1)
    center = Cs.mean(axis=0)
    radius = float(np.linalg.norm(Cs - center[None], axis=1).max() * 1.1)
    md = dict(
        n_views=len(cams),
        spatial_scale=radius,
        center=center.reshape(3).tolist(),
        # synthetic scenes: the object sits inside the camera orbit
        bounds=[(center.reshape(3) - radius).tolist(),
                (center.reshape(3) + radius).tolist()],
        camera_angle_x=camera_angle_x,
    )
    with open(os.path.join(out_path, "metadata.json"), "w") as f:
        json.dump(md, f, indent=2)
    return cams


def convert_scene(
    blender_path: str,
    out_path: str,
    black_bkgd: bool = False,
    ext: str = "png",
    has_normal: bool = False,
) -> dict:
    """Convert every split of one scene; returns {split: cameras}."""
    bg = (np.zeros(3, np.float32) if black_bkgd
          else np.ones(3, np.float32))
    out = {}
    for split in ("train", "val", "test"):
        cams = convert_split(blender_path, os.path.join(out_path, split),
                             split, bg, ext=ext, has_normal=has_normal)
        if cams is not None:
            out[split] = cams
    if not out:
        raise FileNotFoundError(
            f"no transforms_*.json under {blender_path}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--blender_root", required=True,
                   help="one scene dir, or a dir of scene dirs")
    p.add_argument("--output", default=None,
                   help="default: <blender_root>/easyvolcap")
    p.add_argument("--black_bkgd", action="store_true")
    p.add_argument("--has_normal", action="store_true")
    p.add_argument("--ext", default="png")
    a = p.parse_args(argv)
    root = a.blender_root
    out_root = a.output or os.path.join(root, "easyvolcap")

    # scene set (dir of scene dirs) vs single scene
    if os.path.exists(os.path.join(root, "transforms_train.json")):
        scenes = [("", root)]
    else:
        scenes = [(s, os.path.join(root, s)) for s in sorted(os.listdir(root))
                  if os.path.exists(os.path.join(root, s,
                                                 "transforms_train.json"))]
    for sname, spath in scenes:
        sout = os.path.join(out_root, sname) if sname else out_root
        cams = convert_scene(spath, sout, black_bkgd=a.black_bkgd,
                             ext=a.ext, has_normal=a.has_normal)
        n = sum(len(v) for v in cams.values())
        print(f"[blender_to_easyvolcap] {sname or spath}: {n} views "
              f"({', '.join(cams)}) -> {sout}")


if __name__ == "__main__":
    main()
