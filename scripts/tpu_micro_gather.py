"""Microbench: 4M-row gather variants (the raster pair gather)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

S = 500_001
CAP = 2 ** 22
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((S, 128)), jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, S, CAP), jnp.int32)
idx_sorted = jnp.sort(idx)


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jnp.asarray(out).ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


timeit(jax.jit(lambda t, i: t[i]), table, idx, name="row gather 128 lanes")
timeit(jax.jit(lambda t, i: t[:, :64][i]), table, idx,
       name="row gather 64 lanes")
timeit(jax.jit(lambda t, i: t[i]), table[:, :64], idx,
       name="row gather pre-sliced 64")
timeit(jax.jit(lambda t, i: t[i]), table, idx_sorted,
       name="row gather 128, sorted idx")
timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip")), table, idx,
       name="take clip 128")
f32t = table.astype(jnp.float32)
timeit(jax.jit(lambda t, i: t[i]), f32t, idx, name="row gather f32 128")
