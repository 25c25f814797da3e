"""Raw capture -> COLMAP sparse model -> trainable scene, one command.

Port of the reference's COLMAP orchestration semantics
(/root/reference/scripts/colmap/run_colmap.py:85-192): compose the standard
reconstruction pipeline — feature_extractor -> <matcher>_matcher -> mapper
-> bundle_adjuster -> model_converter (TXT + PLY) — invoking the `colmap`
binary when it is on PATH, else printing the exact commands to run
elsewhere (TPU pods rarely ship COLMAP; the reconstruction is a
CPU-workstation step). With --convert the resulting sparse model is chained
straight into scripts/colmap_to_easyvolcap.py (easymocap cameras +
images/<view>/ + points3D.ply + metadata.json), so

  python scripts/run_colmap.py --data_root <capture> --convert <scene_out>

is the raw-capture -> trainable-scene recipe of INGEST.md step 1.

Importable API: colmap_commands() (pure), run_pipeline(), ingest() — used
by tests/test_ingest.py's fake-colmap end-to-end test.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MATCHERS = ("exhaustive", "sequential", "spatial", "transitive", "vocab_tree")


def colmap_commands(
    data_root: str,
    images: str = "images",
    db: str = "colmap/colmap.db",
    sparse: str = "sparse",
    matcher: str = "exhaustive",
    camera_model: str = "OPENCV",
    single_camera: bool = False,
    use_gpu: bool = False,
    ba_refine: bool = True,
    binary: str = "colmap",
) -> list[list[str]]:
    """The pipeline as argv lists (reference run_colmap.py:116-191).

    All paths are joined under `data_root`. GPU off by default: this image
    (and most TPU hosts) has no CUDA SiftGPU.
    """
    assert matcher in MATCHERS, f"matcher {matcher!r} not in {MATCHERS}"
    j = lambda p: os.path.join(data_root, p)  # noqa: E731
    gpu = "1" if use_gpu else "0"
    cmds = [
        [binary, "feature_extractor",
         "--database_path", j(db), "--image_path", j(images),
         "--ImageReader.camera_model", camera_model,
         "--ImageReader.single_camera", "1" if single_camera else "0",
         "--SiftExtraction.use_gpu", gpu],
        [binary, f"{matcher}_matcher",
         "--database_path", j(db), "--SiftMatching.use_gpu", gpu],
        [binary, "mapper",
         "--database_path", j(db), "--image_path", j(images),
         "--output_path", j(sparse)],
    ]
    if ba_refine:
        cmds.append(
            [binary, "bundle_adjuster",
             "--input_path", j(f"{sparse}/0"),
             "--output_path", j(f"{sparse}/0"),
             "--BundleAdjustment.refine_principal_point", "1"])
    cmds += [
        [binary, "model_converter",
         "--input_path", j(f"{sparse}/0"), "--output_path", j(f"{sparse}/0"),
         "--output_type", "TXT"],
        [binary, "model_converter",
         "--input_path", j(f"{sparse}/0"),
         "--output_path", j(f"{sparse}/0/points3D.ply"),
         "--output_type", "PLY"],
    ]
    return cmds


def run_pipeline(data_root: str, dry_run: bool = False,
                 binary: str = "colmap", **kw) -> bool:
    """Run (or print) the pipeline. Returns True iff commands executed."""
    cmds = colmap_commands(data_root, binary=binary, **kw)
    have = shutil.which(binary) is not None
    if dry_run or not have:
        if not have and not dry_run:
            print(f"[run_colmap] `{binary}` not on PATH — run these on a "
                  f"machine with COLMAP, then re-run with --convert:")
        for c in cmds:
            print("  " + " ".join(c))
        return False
    os.makedirs(os.path.join(data_root, os.path.dirname(kw.get(
        "db", "colmap/colmap.db"))), exist_ok=True)
    os.makedirs(os.path.join(data_root, kw.get("sparse", "sparse")),
                exist_ok=True)
    for c in cmds:
        print("[run_colmap] " + " ".join(c))
        subprocess.run(c, check=True)
    return True


def ingest(data_root: str, output: str, sparse: str = "sparse",
           eval_skip: int = 8, **kw) -> dict | None:
    """Pipeline + conversion: raw capture dir -> trainable scene at
    `output` (cameras/images/ply/metadata). Returns the metadata dict, or
    None when COLMAP was unavailable (commands printed instead)."""
    from scripts.colmap_to_easyvolcap import compute_metadata, convert_scene

    ran = run_pipeline(data_root, sparse=sparse, **kw)
    model_dir = os.path.join(data_root, sparse, "0")
    if not os.path.exists(model_dir):
        if ran:
            raise FileNotFoundError(f"COLMAP produced no model at {model_dir}")
        return None
    convert_scene(data_root, output, colmap=f"{sparse}/0")
    return compute_metadata(output, eval_skip=eval_skip)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_root", required=True,
                   help="capture dir containing images/")
    p.add_argument("--images", default="images")
    p.add_argument("--db", default="colmap/colmap.db")
    p.add_argument("--sparse", default="sparse")
    p.add_argument("--matcher", default="exhaustive", choices=MATCHERS,
                   help="sequential for video frames, exhaustive for adhoc")
    p.add_argument("--camera_model", default="OPENCV")
    p.add_argument("--single_camera", action="store_true")
    p.add_argument("--use_gpu", action="store_true")
    p.add_argument("--no_ba", action="store_true")
    p.add_argument("--dry_run", action="store_true",
                   help="print the commands without running")
    p.add_argument("--convert", metavar="SCENE_OUT", default=None,
                   help="chain into colmap_to_easyvolcap: write the "
                        "trainable scene here")
    p.add_argument("--eval_skip", type=int, default=8)
    a = p.parse_args()
    kw = dict(images=a.images, db=a.db, matcher=a.matcher,
              camera_model=a.camera_model, single_camera=a.single_camera,
              use_gpu=a.use_gpu, ba_refine=not a.no_ba, dry_run=a.dry_run)
    if a.convert:
        meta = ingest(a.data_root, a.convert, sparse=a.sparse,
                      eval_skip=a.eval_skip, **kw)
        if meta is not None:
            print(f"[run_colmap] scene ready at {a.convert} "
                  f"(spatial_scale {meta['spatial_scale']:.3f})")
    else:
        run_pipeline(a.data_root, sparse=a.sparse, **kw)


if __name__ == "__main__":
    main()
