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

from bench import make_render_scene
from envgs_tpu.models.envgs import forward_envgs

base, env, cam, cfg = make_render_scene()

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
