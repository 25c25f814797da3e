"""Nerfstudio camera-path JSON -> easyvolcap camera path (ingest tooling).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/nerfstudio_to_easyvolcap.py): a
nerfstudio-exported camera path (render_height/render_width + per-frame
fov and OpenGL camera_to_world matrices) becomes an easymocap
intri.yml/extri.yml camera set — directly renderable by the CLI's render
mode via --path-dir.

Usage:
  python scripts/nerfstudio_to_easyvolcap.py --json <camera_path.json> \
      --output <out_dir>
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from envgs_tpu.utils.easycam import write_cameras  # noqa: E402


def opengl_to_opencv(c2w: np.ndarray) -> np.ndarray:
    """The reference's axis shuffle: flip z, swap x/y rows, negate the
    y/z basis columns (nerfstudio_to_easyvolcap.py:9-14)."""
    c2w = c2w.copy()
    c2w[2, :] *= -1
    c2w = c2w[np.array([1, 0, 2, 3]), :]
    c2w[0:3, 1:3] *= -1
    return c2w


def convert_nerfstudio_path(json_path: str, output: str) -> dict:
    jdata = json.load(open(json_path))
    H, W = int(jdata["render_height"]), int(jdata["render_width"])
    cams: dict[str, dict] = {}
    for i, pose in enumerate(jdata["camera_path"]):
        f = 0.5 * H / np.tan(0.5 * float(pose["fov"]) / 180.0 * np.pi)
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
        c2w = opengl_to_opencv(
            np.asarray(pose["camera_to_world"], np.float64).reshape(4, 4))
        R = c2w[:3, :3].T
        cams[f"{i:06d}"] = dict(K=K, R=R, T=-R @ c2w[:3, 3:], H=H, W=W)
    write_cameras(cams, output)
    return cams


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--json", required=True,
                   help="nerfstudio camera_paths/<ts>.json")
    p.add_argument("--output", required=True)
    a = p.parse_args(argv)
    cams = convert_nerfstudio_path(a.json, a.output)
    print(f"[nerfstudio] wrote {len(cams)} path cameras to {a.output}")


if __name__ == "__main__":
    main()
