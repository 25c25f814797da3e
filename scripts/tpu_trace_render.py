"""Trace one bench-scale render frame with jax.profiler and print the HLO
op-time breakdown (top ops by self time) parsed from the xplane proto.

Usage: python scripts/tpu_trace_render.py [train]
"""
import glob
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.models.gaussians import create_pool, logit
from envgs_tpu.utils.camera import make_camera

H, W, P_BASE, P_ENV = 1040, 1584, 300_000, 32_768
rng = np.random.default_rng(0)
xyz = np.concatenate(
    [rng.normal(size=(P_BASE, 2)) * 1.5,
     (rng.random((P_BASE, 1)) * 5 + 2.0)], -1).astype(np.float32)
base = create_pool(xyz, rng.random((P_BASE, 3)).astype(np.float32),
                   cap=P_BASE, sh_degree=3, init_opacity=0.8)
qv = np.stack([
    np.ones(P_BASE, np.float32),
    0.18 * np.sin(2.0 * xyz[:, 0]),
    0.18 * np.cos(2.0 * xyz[:, 1]),
    0.10 * np.sin(xyz[:, 0] + xyz[:, 1]),
], -1).astype(np.float32)
base = base._replace(params=base.params._replace(
    rotation=jnp.asarray(qv),
    scaling=jnp.full((P_BASE, 2), np.log(0.012)),
    specular=jnp.full((P_BASE, 1), float(logit(jnp.asarray(0.3))))))
dirs = rng.normal(size=(P_ENV, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
env = create_pool((dirs * 20).astype(np.float32),
                  rng.random((P_ENV, 3)).astype(np.float32),
                  cap=P_ENV, sh_degree=3, init_opacity=0.8)
env = env._replace(params=env.params._replace(
    scaling=jnp.full((P_ENV, 2), np.log(0.5))))
f = 0.9 * W
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, K, np.eye(3, dtype=np.float32),
                  np.zeros(3, np.float32), 0.02, 100.0)
cfg = EnvGSConfig(raster_backend="pallas", tracer_backend="tiled",
                  pair_cap=1_310_720, env_pair_cap=1_310_720,
                  reflection_start_iter=0, render_mode=True)

fwd = jax.jit(lambda b, e, it: forward_envgs(b, e, cam, it, cfg).rgb_map)
it = jnp.asarray(10)
rgb = fwd(base, env, it)
_ = np.asarray(rgb).ravel()[0]

logdir = "/tmp/xtrace_render"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        rgb = fwd(base, env, it)
    _ = np.asarray(rgb).ravel()[0]

# ---- parse: per-op self time via the xprof hlo_stats converter ----
import json  # noqa: E402

from xprof.convert import raw_to_tool_data as r2t  # noqa: E402

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", paths)
data, _ = r2t.xspace_to_tool_data([paths[0]], "hlo_stats", {})
obj = json.loads(data.decode() if isinstance(data, bytes) else data)
cols = [c["label"] for c in obj["cols"]]
i_name = cols.index("HLO op name")
i_cat = cols.index("HLO op category")
i_self = cols.index("Total self time (us)")
i_fw = cols.index("Framework op name")
i_bound = cols.index("Bound by")
rows = [row["c"] for row in obj["rows"]]
rows.sort(key=lambda r: -float(r[i_self]["v"]))
tot = sum(float(r[i_self]["v"]) for r in rows)
print(f"total self time: {tot / 3000:.2f} ms/frame (3 frames traced)")
for r in rows[:40]:
    self_us = float(r[i_self]["v"])
    print(f"{self_us / 3000:8.3f} ms {str(r[i_cat]['v'])[:18]:18} "
          f"{str(r[i_bound]['v'])[:10]:10} {str(r[i_name]['v'])[:50]:50} "
          f"{str(r[i_fw]['v'])[:70]}")
