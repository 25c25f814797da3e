"""Per-tile fixed overhead of the blend kernels: run the forward kernels
with EMPTY tile bounds (zero chunks everywhere) so the measured time is
pure per-program-instance cost (acc init, bounds read, output write,
grid step) times the tile count. If this is a material fraction of the
render-mode blend time, batching G tiles per program instance amortizes it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_micro_tileoverhead.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops import raster_pallas as rp
from envgs_tpu.ops import tracer as tr

H, W = 1040, 1584
TX, TY = -(-W // 16), -(-H // 16)
T = TX * TY
CAP = 1_310_720


def timeit(fn, *a, n=20, name=""):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.3f} ms",
          flush=True)
    return out


rng = np.random.default_rng(0)
pair16 = jnp.zeros((CAP, rp.DPAD), jnp.bfloat16)
empty = jnp.zeros((T + 1,), jnp.int32)
full = jnp.arange(T + 1, dtype=jnp.int32) * (CAP // T // rp.CHUNK) * rp.CHUNK

raster_empty = jax.jit(lambda p, b: rp._blend_fwd_call(
    p, b, 5, TX, False, needs=(False, False, False), aligned=False)[0])
timeit(raster_empty, pair16, empty, name="raster fwd, 0 chunks/tile")
timeit(raster_empty, pair16, full,
       name=f"raster fwd, {int(full[1]) // rp.CHUNK} chunk/tile zeros")

rays = jnp.zeros((T, 8, 256), jnp.float32)
trace_empty = jax.jit(lambda p, r, b: tr._trace_fwd_call(
    p, r, b, 0, False, needs=(False, False), skip_dma=True)[0])
pair16t = jnp.zeros((CAP, tr.DPAD), jnp.bfloat16)
timeit(trace_empty, pair16t, rays, empty, name="trace fwd, 0 chunks/tile")
timeit(trace_empty, pair16t, rays, full,
       name=f"trace fwd, {int(full[1]) // tr.CHUNK} chunk/tile zeros")
print("tiles:", T)
