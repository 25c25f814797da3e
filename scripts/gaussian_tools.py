"""Gaussian point-cloud tooling: convert / merge / inspect.

Covers the reference's gaussian script toolbox
(/root/reference/scripts/gaussian/convert_gaussian_splatting.py,
merge_pcd.py and tools/analyze_npz.py): move point clouds between the
standard 3DGS ply layout and this repo's checkpoint npz, merge multiple
plys into one, and summarize the arrays inside either container.

Usage:
  python scripts/gaussian_tools.py convert in.npz out.ply [--pool base|env]
  python scripts/gaussian_tools.py convert in.ply out.npz [--cap N]
  python scripts/gaussian_tools.py merge a.ply b.ply ... out.ply
  python scripts/gaussian_tools.py info any.{ply,npz}
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_pool_from_npz(path: str, pool: str):
    """Read the compacted per-splat arrays of one pool from a checkpoint."""
    z = np.load(path)
    pre = f"{pool}/p/"
    arrs = {k[len(pre):]: z[k] for k in z.files if k.startswith(pre)}
    if not arrs:
        raise SystemExit(f"no '{pool}' pool in {path} (keys: {z.files[:8]})")
    return arrs


def cmd_convert(a):
    src, dst = a.src, a.dst
    if src.endswith(".npz") and dst.endswith(".ply"):
        from envgs_tpu.utils.ply import save_gaussian_ply

        p = _load_pool_from_npz(src, a.pool)
        save_gaussian_ply(
            dst, p["xyz"], p["features_dc"], p["features_rest"],
            p["opacity"], p["scaling"], p["rotation"],
        )
        print(f"[convert] {p['xyz'].shape[0]} splats {src} -> {dst}")
    elif src.endswith(".ply") and dst.endswith(".npz"):
        from envgs_tpu.utils.ply import load_gaussian_ply

        g = load_gaussian_ply(src)
        np.savez_compressed(dst, xyz=g["xyz"], features_dc=g["f_dc"],
                            features_rest=g["f_rest"], opacity=g["opacity"],
                            scaling=g["scaling"], rotation=g["rotation"])
        print(f"[convert] {g['xyz'].shape[0]} splats {src} -> {dst}")
    else:
        raise SystemExit("convert expects npz->ply or ply->npz")


def cmd_merge(a):
    """Concatenate gaussian plys (reference merge_pcd.py semantics)."""
    from envgs_tpu.utils.ply import load_gaussian_ply, save_gaussian_ply

    parts = [load_gaussian_ply(p) for p in a.inputs]
    k = min(p["f_rest"].shape[1] for p in parts)  # common SH band count
    merged = [
        np.concatenate([p["xyz"] for p in parts]),
        np.concatenate([p["f_dc"] for p in parts]),
        np.concatenate([p["f_rest"][:, :k] for p in parts]),
        np.concatenate([p["opacity"] for p in parts]),
        np.concatenate([p["scaling"] for p in parts]),
        np.concatenate([p["rotation"] for p in parts]),
    ]
    save_gaussian_ply(a.out, *merged)
    print(f"[merge] {sum(p['xyz'].shape[0] for p in parts)} splats "
          f"from {len(parts)} files -> {a.out}")


def cmd_info(a):
    """Array summary (reference analyze_npz.py semantics)."""
    if a.path.endswith(".npz"):
        z = np.load(a.path)
        for k in z.files:
            v = z[k]
            stat = (f"min {v.min():.4g} max {v.max():.4g}"
                    if v.size and np.issubdtype(v.dtype, np.number) else "")
            print(f"{k:32s} {str(v.shape):18s} {str(v.dtype):10s} {stat}")
    elif a.path.endswith(".ply"):
        from envgs_tpu.utils.ply import read_ply

        for k, v in read_ply(a.path).items():
            print(f"{k:32s} {str(v.shape):18s} {str(v.dtype):10s} "
                  f"min {v.min():.4g} max {v.max():.4g}")
    else:
        raise SystemExit("info expects .npz or .ply")


def main():
    p = argparse.ArgumentParser(__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("src")
    c.add_argument("dst")
    c.add_argument("--pool", default="base", choices=["base", "env"])
    c.set_defaults(fn=cmd_convert)
    m = sub.add_parser("merge")
    m.add_argument("inputs", nargs="+")
    m.add_argument("out")
    m.set_defaults(fn=cmd_merge)
    i = sub.add_parser("info")
    i.add_argument("path")
    i.set_defaults(fn=cmd_info)
    a = p.parse_args()
    a.fn(a)


if __name__ == "__main__":
    main()
