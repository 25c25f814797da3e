"""Golden-render harness: render any (point_cloud.ply, camera.json) pair and
compare against a committed golden.png by PSNR.

Protocol mirrors the reference's released-checkpoint evaluation
(/root/reference/easyvolcap/utils/gaussian2d_utils.py:935-1000 — the 3DGS
ply layout — and BASELINE.json config 1, the 400px toaster render): drop a
directory under tests/golden/<name>/ containing

    point_cloud.ply   3DGS-format gaussian ply (2D scaling -> surfel model,
                      3D scaling -> gauss3d model)
    camera.json       {H, W, K, R, T, znear, zfar, bg, psnr_threshold}
    golden.png        the expected render

and `pytest tests/test_golden.py` picks it up — reference checkpoints become
golden tests the day the assets are available, with no code change.
"""
import json
import os
import struct
import zlib

import numpy as np


def _read_png(path):
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    w, h, depth, ctype = meta[0], meta[1], meta[2], meta[3]
    assert depth == 8 and ctype == 2, "golden PNGs are 8-bit RGB"
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    fil, px = rows[:, 0], rows[:, 1:].reshape(h, w, 3).astype(np.int32)
    out = np.zeros_like(px)
    for i in range(h):
        line = px[i].copy()
        f = fil[i]
        if f == 1:  # sub
            for j in range(1, w):
                line[j] = (line[j] + line[j - 1]) % 256
        elif f == 2:  # up
            line = (line + out[i - 1]) % 256
        elif f == 3:  # average
            for j in range(w):
                left = line[j - 1] if j else 0
                line[j] = (line[j] + (left + out[i - 1, j]) // 2) % 256
        elif f == 4:  # paeth
            for j in range(w):
                a = line[j - 1] if j else np.zeros(3, np.int32)
                b = out[i - 1, j] if i else np.zeros(3, np.int32)
                c = out[i - 1, j - 1] if (i and j) else np.zeros(3, np.int32)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = np.where((pa <= pb) & (pa <= pc), a,
                              np.where(pb <= pc, b, c))
                line[j] = (line[j] + pr) % 256
        out[i] = line
    return out.astype(np.uint8)


def golden_dirs():
    root = os.path.join(os.path.dirname(__file__), "golden")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isfile(os.path.join(root, d, "camera.json"))
    )


def _import_pool(ply_path: str, extras: dict | None = None):
    """ply -> padded pool; extras may carry raw specular/roughness logits
    (the EnvGS reflectance fields the 3DGS ply format does not store — the
    reference keeps them in the model checkpoint, not the ply)."""
    import jax.numpy as jnp
    from envgs_tpu.train.checkpoints import import_ply
    from envgs_tpu.utils.ply import load_gaussian_ply

    raw = load_gaussian_ply(ply_path)
    P = raw["xyz"].shape[0]
    cap = max(1024, 1 << (P - 1).bit_length())
    sh_degree = int(round((raw["f_rest"].shape[1] + 1) ** 0.5)) - 1
    pool = import_ply(ply_path, cap=cap, sh_degree=sh_degree)
    if extras:
        def pad(a):
            a = np.asarray(a, np.float32)
            return np.concatenate(
                [a, np.zeros((cap - a.shape[0],) + a.shape[1:], np.float32)])
        pool = pool._replace(params=pool.params._replace(
            specular=jnp.asarray(pad(extras["specular"])),
            roughness=jnp.asarray(pad(extras["roughness"])),
        ))
    return pool


def render_golden_envgs(scene_dir: str, raster_backend: str = "pallas_interp",
                        tracer_backend: str = "tiled_interp",
                        **cfg_overrides):
    """Dual-pool reflective render through the FULL forward_envgs pipeline
    (base raster -> reflect -> env trace -> composite) for scene dirs with
    point_cloud.ply + env_point_cloud.ply (+ extras.npz reflectance)."""
    import jax
    import jax.numpy as jnp
    from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
    from envgs_tpu.utils.camera import make_camera

    with open(os.path.join(scene_dir, "camera.json")) as fh:
        spec = json.load(fh)
    cam = make_camera(
        spec["H"], spec["W"], np.asarray(spec["K"], np.float32),
        np.asarray(spec["R"], np.float32), np.asarray(spec["T"], np.float32),
        spec.get("znear", 0.02), spec.get("zfar", 100.0),
    )
    extras_path = os.path.join(scene_dir, "extras.npz")
    extras = dict(np.load(extras_path)) if os.path.exists(extras_path) else {}
    base = _import_pool(os.path.join(scene_dir, "point_cloud.ply"), extras)
    env = _import_pool(os.path.join(scene_dir, "env_point_cloud.ply"))
    cfg = EnvGSConfig(
        raster_backend=raster_backend, tracer_backend=tracer_backend,
        reflection_start_iter=0, render_mode=True,
        pair_cap=int(spec.get("pair_cap", 2 ** 16)),
        env_pair_cap=int(spec.get("env_pair_cap", 2 ** 16)),
        bg_brightness=float(spec.get("bg", [0.0])[0]),
    )._replace(**cfg_overrides)
    out = jax.jit(
        lambda b, e: forward_envgs(b, e, cam, jnp.asarray(10 ** 6), cfg)
    )(base, env)
    return out.rgb_map


def render_golden(scene_dir: str, backend: str = "pallas_interp"):
    """Render scene_dir's ply through the production pipeline -> (H,W,3)."""
    import jax.numpy as jnp
    from envgs_tpu.models.gaussiant import _pool_colors
    from envgs_tpu.ops.common import prepare_splats
    from envgs_tpu.ops.raster import rasterize
    from envgs_tpu.train.checkpoints import import_ply
    from envgs_tpu.utils.camera import make_camera
    from envgs_tpu.utils.ply import load_gaussian_ply

    with open(os.path.join(scene_dir, "camera.json")) as fh:
        spec = json.load(fh)
    if spec.get("model") == "envgs":
        return render_golden_envgs(
            scene_dir,
            raster_backend=("ref" if backend == "ref" else "pallas_interp"),
            tracer_backend=("ref" if backend == "ref" else "tiled_interp"),
        )
    cam = make_camera(
        spec["H"], spec["W"], np.asarray(spec["K"], np.float32),
        np.asarray(spec["R"], np.float32), np.asarray(spec["T"], np.float32),
        spec.get("znear", 0.02), spec.get("zfar", 100.0),
    )
    bg = jnp.asarray(spec.get("bg", [0.0, 0.0, 0.0]), jnp.float32)

    raw = load_gaussian_ply(os.path.join(scene_dir, "point_cloud.ply"))
    assert raw["scaling"].shape[1] == 2, (
        "golden harness expects 2DGS (surfel) plys — the EnvGS checkpoint "
        "format; 3DGS scenes go through the gaussiant eval path")
    P = raw["xyz"].shape[0]
    cap = max(1024, 1 << (P - 1).bit_length())
    sh_degree = int(round((raw["f_rest"].shape[1] + 1) ** 0.5)) - 1
    pool = import_ply(os.path.join(scene_dir, "point_cloud.ply"), cap=cap,
                      sh_degree=sh_degree)
    colors = _pool_colors(pool, cam.center)
    prep = prepare_splats(
        pool.params.xyz, pool.params.rotation, pool.get_scaling,
        pool.get_opacity[:, 0], colors, cam, active=pool.stats.active,
    )
    out = rasterize(prep, cam, bg, backend=backend, pair_cap=2 ** 17,
                    needs=(False, False, False))
    return out.rgb


def psnr_vs_golden(scene_dir: str, backend: str = "pallas_interp"):
    img = np.clip(np.asarray(render_golden(scene_dir, backend)), 0, 1)
    gold = _read_png(os.path.join(scene_dir, "golden.png")).astype(
        np.float32) / 255.0
    mse = float(np.mean((img - gold) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))
