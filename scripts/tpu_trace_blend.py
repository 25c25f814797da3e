"""Trace-based A/B of the fwd blend kernels at bench scale.

Times the raster blend (render-stripped) and tracer blend inside one jit
via jax.profiler + hlo_stats — standalone host timing on axon is dispatch-
noisy; in-trace self time is the ground truth.

Usage: python scripts/tpu_trace_blend.py
"""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops import tracer as tr
from envgs_tpu.ops.binning import bin_splats, tile_dims
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import _pack_table
from envgs_tpu.ops.tracer_ref import prepare_trace_scene
from envgs_tpu.utils.camera import make_camera

H, W, P, CAP = 1040, 1584, 300_000, 2 ** 20
rng = np.random.default_rng(0)
means = np.concatenate(
    [rng.normal(size=(P, 2)) * 1.2, rng.random((P, 1)) * 6 + 2.0], -1
).astype(np.float32)
quats = rng.normal(size=(P, 4)).astype(np.float32)
scales = (rng.random((P, 2)) * 0.02 + 0.005).astype(np.float32)
opac = (rng.random(P) * 0.9 + 0.05).astype(np.float32)
colors = rng.random((P, 5)).astype(np.float32)
f = 0.8 * W
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
prep = jax.jit(lambda: prepare_splats(
    *map(jnp.asarray, (means, quats, scales, opac, colors)), cam))()
bins = jax.jit(lambda p: bin_splats(
    p, H, W, rp.TILE, CAP, align=rp.CHUNK, aligned=False))(prep)
TX, TY = tile_dims(H, W, rp.TILE)
packedp = jax.jit(lambda p: rp.pack_rows(_pack_table(p, None)))(prep)
pd16 = jax.jit(lambda t, i: t[i])(packedp, bins.gauss_idx)

# tracer pair data (env dome, camera-like rays for determinism)
PE = 32_768
dirs = rng.normal(size=(PE, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
scene = prepare_trace_scene(
    jnp.asarray(dirs * 20.0, jnp.float32),
    jnp.asarray(np.concatenate(
        [np.ones((PE, 1)), rng.normal(size=(PE, 3)) * 0.3], -1), jnp.float32),
    jnp.full((PE, 2), 0.5), jnp.asarray(rng.random(PE) * 0.9 + 0.05),
    jnp.asarray(rng.random((PE, 3)), jnp.float32))
yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                     indexing="ij")
o = np.stack([xx * 2, yy * 2, np.full_like(xx, 3.0)], -1).astype(np.float32)
d = np.stack([0.3 * np.sin(2 * xx) + rng.normal(size=xx.shape) * 0.15,
              0.3 * np.cos(2 * yy) + rng.normal(size=xx.shape) * 0.15,
              -np.ones_like(xx)], -1).astype(np.float32)
tiles = jax.jit(tr.build_ray_tiles)(jnp.asarray(o), jnp.asarray(d))
su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
NT = int(tiles.n_tiles)
gauss_idx, bounds, _ = jax.jit(
    lambda rays, ap, ax, th, sp, s, r: tr.cull_and_sort(
        tr.RayTiles(rays, ap, ax, th, sp, NT), s, r,
        per_tile_cap=2048, total_pair_cap=2 ** 21)
)(tiles.rays, tiles.apex, tiles.axis, tiles.tan_half, tiles.spread,
  scene, 3.0 * jnp.maximum(su, sv))
print("env pairs:", int(bounds[-1]), "/ cap", gauss_idx.shape[0], flush=True)
tpack = jax.jit(lambda s: rp.pack_rows(tr._pack_scene_table(s)))(scene)
tpd16 = jax.jit(lambda t, i: t[i])(tpack, gauss_idx)


import inspect
_TRN = 3 if 'need_geo' in inspect.getsource(tr._trace_fwd_call) else 2


@jax.jit
def run(pd, b, tp, trays, tb):
    o1 = rp._blend_fwd_call(pd, b, 5, TX, False,
                            needs=(False, False, False), aligned=False)[0]
    o2 = tr._trace_fwd_call(tp, trays, tb, 0, False,
                            needs=tuple([False] * _TRN))[0]
    return o1[..., :1].sum() + o2[..., :1].sum()


v = run(pd16, bins.tile_bounds, tpd16, tiles.rays, bounds)
_ = float(v)
logdir = "/tmp/xtrace_blend"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        v = run(pd16, bins.tile_bounds, tpd16, tiles.rays, bounds)
    _ = float(v)

from xprof.convert import raw_to_tool_data as r2t  # noqa: E402

p = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
data, _ = r2t.xspace_to_tool_data([p], "hlo_stats", {})
obj = json.loads(data.decode() if isinstance(data, bytes) else data)
cols = [c["label"] for c in obj["cols"]]
i_name = cols.index("HLO op name")
i_self = cols.index("Total self time (us)")
rows = [row["c"] for row in obj["rows"]]
rows.sort(key=lambda r: -float(r[i_self]["v"]))
for r in rows[:8]:
    print(f"{float(r[i_self]['v']) / 3000:8.3f} ms  {str(r[i_name]['v'])[:60]}")
