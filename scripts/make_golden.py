"""Generate the committed synthetic golden asset: a deterministic 3DGS-format
ply + camera.json + a 400px golden render (reference-backend output).

This is the stand-in for the reference's released checkpoints (BASELINE.json
config 1, the toaster scene): the harness in tests/test_golden.py renders any
(ply, camera.json, golden.png) triple dropped into tests/golden/<name>/ and
asserts PSNR — so real reference checkpoints become golden tests the day the
assets exist, with no code change.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_golden.py
"""
import json
import os

import numpy as np

os.makedirs("tests/golden/synthetic", exist_ok=True)

rng = np.random.default_rng(42)
P = 600
# a color-banded shell of surfels in front of the camera
theta = rng.uniform(0, 2 * np.pi, P)
phi = rng.uniform(0.2, np.pi - 0.2, P)
r = 2.0 + 0.1 * rng.standard_normal(P)
xyz = np.stack([
    r * np.sin(phi) * np.cos(theta),
    r * np.cos(phi),
    4.0 + r * np.sin(phi) * np.sin(theta),
], -1).astype(np.float32)
colors = np.stack([
    0.5 + 0.5 * np.sin(3 * theta),
    0.5 + 0.5 * np.cos(2 * phi),
    rng.uniform(0.2, 1.0, P),
], -1).astype(np.float32)

C0 = 0.28209479177387814
f_dc = ((colors - 0.5) / C0).reshape(P, 1, 3)
f_rest = np.zeros((P, 15, 3), np.float32)
opacity = rng.uniform(0.5, 3.0, (P, 1)).astype(np.float32)  # pre-sigmoid
scaling = np.log(rng.uniform(0.03, 0.10, (P, 2))).astype(np.float32)
rotation = rng.standard_normal((P, 4)).astype(np.float32)

from envgs_tpu.utils.ply import save_gaussian_ply

save_gaussian_ply("tests/golden/synthetic/point_cloud.ply",
                  xyz, f_dc, f_rest, opacity, scaling, rotation)

H = W = 400
fo = 420.0
camera = dict(H=H, W=W,
              K=[[fo, 0.0, W / 2], [0.0, fo, H / 2], [0.0, 0.0, 1.0]],
              R=np.eye(3).tolist(), T=[0.0, 0.0, 0.0],
              znear=0.02, zfar=100.0, bg=[0.0, 0.0, 0.0],
              psnr_threshold=35.0)
with open("tests/golden/synthetic/camera.json", "w") as fh:
    json.dump(camera, fh, indent=1)

from tests.golden_harness import render_golden

img = render_golden("tests/golden/synthetic", backend="ref")
arr = (np.clip(np.asarray(img), 0, 1) * 255 + 0.5).astype(np.uint8)
import zlib, struct


def write_png(path, a):
    h, w, _ = a.shape
    raw = b"".join(b"\x00" + a[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    with open(path, "wb") as fh2:
        fh2.write(b"\x89PNG\r\n\x1a\n")
        fh2.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        fh2.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        fh2.write(chunk(b"IEND", b""))


write_png("tests/golden/synthetic/golden.png", arr)
print("golden written:", arr.shape, "mean", arr.mean())


# ---------------------------------------------------------------------------
# Dual-pool reflective golden: tests/golden/envgs_synthetic/ renders through
# the FULL forward_envgs pipeline (base raster -> reflect -> env trace ->
# composite), exercising both pair pipelines — the single-pool scene above
# only covers the base rasterizer. Reflectance (specular/roughness) rides an
# extras.npz because the 3DGS ply format does not carry it (the reference
# stores it in the model checkpoint, gaussian2d_utils.py:921-933).
# ---------------------------------------------------------------------------
from envgs_tpu.data.synthetic import make_cameras, make_gt_pools

os.makedirs("tests/golden/envgs_synthetic", exist_ok=True)

base, env = make_gt_pools(seed=7)
cam = make_cameras(1, 200, 200)[0]


def export_with_extras(pool, ply_path, extras_path=None):
    idx = np.where(np.asarray(pool.stats.active))[0]
    p = pool.params
    sh = int(pool.max_sh_degree)
    n_rest = (sh + 1) ** 2 - 1
    save_gaussian_ply(
        ply_path,
        np.asarray(p.xyz)[idx],
        np.asarray(p.features_dc)[idx].reshape(len(idx), 1, 3),
        np.asarray(p.features_rest)[idx].reshape(len(idx), n_rest, 3),
        np.asarray(p.opacity)[idx],
        np.asarray(p.scaling)[idx],
        np.asarray(p.rotation)[idx],
    )
    if extras_path is not None:
        np.savez(extras_path,
                 specular=np.asarray(p.specular)[idx],
                 roughness=np.asarray(p.roughness)[idx])


export_with_extras(base, "tests/golden/envgs_synthetic/point_cloud.ply",
                   "tests/golden/envgs_synthetic/extras.npz")
export_with_extras(env, "tests/golden/envgs_synthetic/env_point_cloud.ply")

camera = dict(H=200, W=200,
              K=np.asarray(cam.K).tolist(), R=np.asarray(cam.R).tolist(),
              T=np.asarray(cam.T).tolist(), znear=0.02, zfar=60.0,
              bg=[0.0, 0.0, 0.0], model="envgs",
              pair_cap=2 ** 16, env_pair_cap=2 ** 16,
              psnr_threshold=35.0)
with open("tests/golden/envgs_synthetic/camera.json", "w") as fh:
    json.dump(camera, fh, indent=1)

from tests.golden_harness import render_golden_envgs

# golden generated with the EXACT pure-JAX reference backends; the test then
# renders it back through the production kernels (interp mode) and asserts
# PSNR — a dual-pool parity check of the full reflective pipeline
img = render_golden_envgs("tests/golden/envgs_synthetic",
                          raster_backend="ref", tracer_backend="ref")
arr = (np.clip(np.asarray(img), 0, 1) * 255 + 0.5).astype(np.uint8)
write_png("tests/golden/envgs_synthetic/golden.png", arr)
print("envgs golden written:", arr.shape, "mean", arr.mean())
