"""Measure the bench frame at an env pair cap snugged to the tracer fill.

Probes the tracer fill at a loose cap, snugs the cap to the fill
(+headroom, 64k-aligned), then times the full bench frame at the snug
caps. Used to size bench.py caps after cull changes (e.g. the
direction-space footprint probe).

Usage: python scripts/tpu_sweep_subt.py
"""
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_render_scene  # noqa: E402
from envgs_tpu.models.envgs import forward_envgs  # noqa: E402


def snug(fill: int) -> int:
    return -(-int(fill * 1.05) // 65536) * 65536


def main():
    base, env, cam, cfg = make_render_scene()
    probe_cfg = cfg._replace(env_pair_cap=1_310_720)
    out = jax.jit(
        lambda b, e, it: forward_envgs(b, e, cam, it, probe_cfg)
    )(base, env, jnp.asarray(10))
    fill = int(out.env_num_pairs)
    assert int(out.env_dropped_pairs) == 0
    cap = snug(fill)
    cfg = cfg._replace(env_pair_cap=cap)

    # EXACT bench.py methodology (block_until_ready, no full-frame fetch:
    # a 20 MB tunnel fetch costs ~50 ms/frame amortized and would skew the
    # comparison)
    fwd = jax.jit(lambda b, e, it: forward_envgs(b, e, cam, it, cfg).rgb_map)
    it = jnp.asarray(10)
    rgb = jax.block_until_ready(fwd(base, env, it))
    assert np.all(np.isfinite(np.asarray(rgb)))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        rgb = fwd(base, env, it)
    jax.block_until_ready(rgb)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "fill": fill, "cap": cap,
        "frame_ms": round(dt * 1000, 2), "fps": round(1.0 / dt, 2),
    }))


if __name__ == "__main__":
    main()
