"""DTU (MVSNet layout) -> easyvolcap-layout scenes (ingest tooling).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/dtu_to_easyvolcap.py): the MVSNet DTU
release (Cameras/train/<i>_cam.txt, Rectified/<scan>_train/rect_*.png,
Depths_raw/<scan>/depth_map_*.pfm) becomes per-scan easymocap scenes with
the reference's exact processing — extrinsic translations divided by
--scale (200, the ENeRF convention), intrinsics x4 (the cam files store
quarter-resolution intrinsics), depth/mask half-resized then cropped
44px/80px to match the rectified images, masks = depth > 0. Cameras are
written under cameras/00 as a TEMPORAL camera set (the DTU scan is one
physical camera path), the reference's monocular layout.

Usage:
  python scripts/dtu_to_easyvolcap.py --dtu_root <root> --output <out> \
      [--scale 200] [--scans scan1 ...]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from envgs_tpu.utils.easycam import write_cameras  # noqa: E402


def read_cam_file(path: str):
    """MVSNet cam.txt: 4x4 w2c extrinsic + 3x3 intrinsic + depth range
    (data_utils.read_cam_file:48-59)."""
    lines = [ln.rstrip() for ln in open(path)]
    ext = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ")
    ixt = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ")
    depth_min = float(lines[11].split()[0])
    return ixt.reshape(3, 3), ext.reshape(4, 4), depth_min


def read_pfm(path: str) -> np.ndarray:
    """Minimal PFM reader (grayscale 'Pf' or color 'PF'); returns the
    image with the bottom-up PFM row order flipped to top-down."""
    with open(path, "rb") as f:
        header = f.readline().decode().rstrip()
        assert header in ("PF", "Pf"), header
        color = header == "PF"
        dims = f.readline().decode()
        while dims.startswith("#"):
            dims = f.readline().decode()
        m = re.match(r"^(\d+)\s+(\d+)\s*$", dims)
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(), dtype=endian + "f")
        data = data.reshape((h, w, 3) if color else (h, w))
    return np.flipud(data).copy()


def _resize_half(arr: np.ndarray, nearest: bool) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray(arr)
    out = img.resize((arr.shape[1] // 2, arr.shape[0] // 2),
                     Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(out)


def convert_dtu_scan(dtu_root: str, scan: str, output: str,
                     scale: float = 200.0) -> int:
    """Convert one scan; returns the number of views written."""
    from PIL import Image

    cam_dir = os.path.join(dtu_root, "Cameras", "train")
    n = len([f for f in os.listdir(cam_dir) if f.endswith("_cam.txt")])
    cams: dict[str, dict] = {}
    for i in range(n):
        ixt, ext, _dmin = read_cam_file(
            os.path.join(cam_dir, f"{i:08d}_cam.txt"))
        ext = ext.copy()
        ext[:3, 3] = ext[:3, 3] / scale
        ixt = ixt.copy()
        ixt[:2] = ixt[:2] * 4  # quarter-res intrinsics in the cam files
        cams[f"{i:06d}"] = dict(K=ixt, R=ext[:3, :3], T=ext[:3, 3:])

    img_out = os.path.join(output, scan, "images", "00")
    msk_out = os.path.join(output, scan, "masks", "00")
    dpt_out = os.path.join(output, scan, "depths", "00")
    for d in (img_out, msk_out, dpt_out):
        os.makedirs(d, exist_ok=True)
    write_cameras(cams, os.path.join(output, scan, "cameras", "00"))

    for i in range(n):
        img_path = os.path.join(dtu_root, "Rectified", f"{scan}_train",
                                f"rect_{i + 1:03d}_3_r5000.png")
        dpt_path = os.path.join(dtu_root, "Depths_raw", scan,
                                f"depth_map_{i:04d}.pfm")
        if os.path.exists(img_path):
            Image.open(img_path).save(
                os.path.join(img_out, f"{i:06d}.jpg"), quality=100)
        if os.path.exists(dpt_path):
            dpt = read_pfm(dpt_path).astype(np.float32) / scale
            msk = (dpt > 0.0).astype(np.uint8)
            msk = _resize_half(msk, nearest=True)[44:-44, 80:-80]
            dpt = _resize_half(dpt, nearest=False)[44:-44, 80:-80]
            Image.fromarray(msk * 255).save(
                os.path.join(msk_out, f"{i:06d}.jpg"), quality=100)
            np.save(os.path.join(dpt_out, f"{i:06d}.npy"), dpt)
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtu_root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--scale", type=float, default=200.0)
    p.add_argument("--scans", nargs="*", default=None)
    a = p.parse_args(argv)
    scans = a.scans
    if scans is None:
        scans = sorted({s.replace("_train", "") for s in
                        os.listdir(os.path.join(a.dtu_root, "Rectified"))})
    for scan in scans:
        n = convert_dtu_scan(a.dtu_root, scan, a.output, scale=a.scale)
        print(f"[dtu] {scan}: wrote {n} views to {a.output}/{scan}")


if __name__ == "__main__":
    main()
