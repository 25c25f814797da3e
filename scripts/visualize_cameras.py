"""Camera rig visualization: intri/extri.yml -> a frustum-wireframe ply.

Analog of /root/reference/scripts/tools/visualize_cameras.py (matplotlib
there; a mesh-viewer-friendly colored point/edge ply here — works headless
and drops into the same viewers as the exported splat plys).

Each camera becomes a pinhole frustum (apex + image-plane rectangle at
`--depth`), colored by camera index (viridis-ish ramp); edges are sampled
as dense point runs so any point-cloud viewer shows the wireframe.

Usage: python scripts/visualize_cameras.py <data_root> out.ply [--depth D]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frustum_points(K, R, T, H, W, depth, n_edge=24):
    """World-space frustum wireframe samples for one camera."""
    c2w_R = R.T
    center = -c2w_R @ T.reshape(3)
    corners_pix = np.array(
        [[0, 0], [W, 0], [W, H], [0, H]], np.float64)
    Kinv = np.linalg.inv(K)
    corners = []
    for x, y in corners_pix:
        d = Kinv @ np.array([x, y, 1.0])
        corners.append(center + c2w_R @ (d * depth / d[2]))
    pts = [center]
    t = np.linspace(0.0, 1.0, n_edge)[:, None]
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        pts.append(a[None] * (1 - t) + b[None] * t)  # image-plane rect
        pts.append(center[None] * (1 - t) + corners[i][None] * t)  # rays
    return np.concatenate([np.atleast_2d(p) for p in pts], axis=0)


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("data_root")
    p.add_argument("out")
    p.add_argument("--depth", type=float, default=0.3,
                   help="frustum depth in world units")
    a = p.parse_args()

    from envgs_tpu.utils.easycam import read_cameras
    from envgs_tpu.utils.ply import save_sfm_ply

    cams = read_cameras(a.data_root)
    names = sorted(cams)
    all_pts, all_rgb = [], []
    for i, name in enumerate(names):
        c = cams[name]
        H = int(c.get("H", 1080))
        W = int(c.get("W", 1920))
        pts = frustum_points(c["K"], c["R"], c["T"], H, W, a.depth)
        u = i / max(len(names) - 1, 1)
        rgb = np.tile([[0.2 + 0.8 * u, 0.9 - 0.7 * u, 0.4]],
                      (pts.shape[0], 1))
        all_pts.append(pts)
        all_rgb.append(rgb)
    save_sfm_ply(a.out, np.concatenate(all_pts).astype(np.float32),
                 np.concatenate(all_rgb).astype(np.float32))
    print(f"[viz] {len(names)} cameras -> {a.out}")


if __name__ == "__main__":
    main()
