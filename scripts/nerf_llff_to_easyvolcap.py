"""NeRF-LLFF capture -> easyvolcap-layout scene (ingest tooling).

Port of the reference preprocessing semantics
(/root/reference/scripts/preprocess/nerf_llff_to_easyvolcap.py): an LLFF
scene (fern/flower/... with a COLMAP model under sparse/0 and a flat
images/ directory) becomes an easymocap-format scene —

  <output>/intri.yml, extri.yml   per-view K/dist + w2c R/T
  <output>/images/<key>/00.<ext>  one view dir per registered image,
                                  key = (colmap image id - 1) as %03d
  <output>/metadata.json          view split + spatial scale (optional,
                                  --metadata; the reference computes it in
                                  a separate tools/compute_metadata.py run)

Usage:
  python scripts/nerf_llff_to_easyvolcap.py --llff_root <scene> \
      [--output <out>] [--link/--copy] [--metadata]
"""
from __future__ import annotations

import argparse
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


def convert_llff(llff_root: str, output: str, src_images_dir: str = "images",
                 link: bool = True, metadata: bool = False) -> dict:
    """Convert one LLFF scene; returns the written camera dict."""
    cams, ims, (xyz, rgb, _err) = load_colmap_model(
        os.path.join(llff_root, "sparse/0"))
    evccams: dict[str, dict] = {}
    src_dir = os.path.join(llff_root, src_images_dir)
    # reference keying: (colmap image id - 1) as %03d, frame file 00.<ext>
    for key, im in sorted(ims.items()):
        cam = cams[im.camera_id]
        name = f"{key - 1:03d}"
        evccams[name] = dict(
            K=camera_K(cam),
            D=camera_dist(cam).reshape(-1, 1),
            R=qvec_to_rotmat(im.qvec),
            T=im.tvec.reshape(3, 1),
            H=int(cam.height),
            W=int(cam.width),
        )
        src = os.path.join(src_dir, im.name)
        ext = os.path.splitext(im.name)[1]
        dst = os.path.join(output, "images", name, f"00{ext}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.lexists(dst):
            os.remove(dst)
        if link:
            os.symlink(os.path.relpath(src, os.path.dirname(dst)), dst)
        else:
            shutil.copy(src, dst)
    evccams = dict(sorted(evccams.items()))
    write_cameras(evccams, output)
    if xyz is not None and len(xyz):
        os.makedirs(os.path.join(output, "sparse/0"), exist_ok=True)
        save_sfm_ply(os.path.join(output, "sparse/0", "points3D.ply"),
                     xyz, rgb)
    if metadata:
        from scripts.colmap_to_easyvolcap import compute_metadata

        compute_metadata(output)
    return evccams


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--llff_root", required=True)
    p.add_argument("--output", default=None,
                   help="default: <llff_root>/easyvolcap")
    p.add_argument("--images", default="images")
    p.add_argument("--copy", action="store_true",
                   help="copy images instead of symlinking")
    p.add_argument("--metadata", action="store_true")
    a = p.parse_args(argv)
    out = a.output or os.path.join(a.llff_root, "easyvolcap")
    cams = convert_llff(a.llff_root, out, src_images_dir=a.images,
                        link=not a.copy, metadata=a.metadata)
    print(f"[llff] wrote {len(cams)} views to {out}")


if __name__ == "__main__":
    main()
