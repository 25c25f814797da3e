"""Microbench: flat 2M-key sort vs batched per-row sorts vs cumsum costs.

Decides the binning-sort replacement strategy (VERDICT round-1 weak #1:
binning sort is the largest single render cost).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # axon backend: block_until_ready does not block; force a data fetch
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, name="", n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms")
    return out


rng = np.random.default_rng(0)
N = 2 ** 21
keys = jnp.asarray(rng.integers(0, 2 ** 31 - 1, size=N, dtype=np.int32))

timeit(jax.jit(lambda k: jax.lax.sort(k, is_stable=False)), keys,
       name=f"flat sort {N}")

for rows, per in [(64, N // 64), (128, N // 128), (256, N // 256)]:
    k2 = keys.reshape(rows, per)
    timeit(jax.jit(lambda k: jax.lax.sort(k, dimension=1, is_stable=False)),
           k2, name=f"batched sort ({rows}, {per})")

# 26-bit keys (tile-row bucketing: tx 7 bits + gid 19 bits)
keys26 = jnp.asarray(
    rng.integers(0, 2 ** 26, size=N, dtype=np.int32)).reshape(64, N // 64)
timeit(jax.jit(lambda k: jax.lax.sort(k, dimension=1, is_stable=False)),
       keys26, name="batched sort 26-bit keys (64 rows)")

# indicator-weighted cumsum (per-tile-row pair offsets)
P = 300_000
A = jnp.asarray(rng.integers(0, 4, size=(65, P), dtype=np.int32))
timeit(jax.jit(lambda a: jnp.cumsum(a, axis=1)), A,
       name="cumsum (65, 300K) axis=1")

# scatter of ~700K marker rows (set, unique positions)
M = 700_000
pos = jnp.asarray(rng.permutation(N)[:M].astype(np.int32))
vals = jnp.asarray(rng.integers(0, 2 ** 30, size=(M, 4), dtype=np.int32))


def scat(p, v):
    return jnp.zeros((N, 4), jnp.int32).at[p, :].set(v, mode="drop")


timeit(jax.jit(scat), pos, vals, name="row scatter 700K x 4")

# binning-shaped alternatives ------------------------------------------------
P = 300_000
posm = jnp.asarray(np.sort(rng.permutation(N)[:P]).astype(np.int32))
vals12 = jnp.asarray(rng.integers(0, 2 ** 30, size=(P, 12), dtype=np.int32))

timeit(jax.jit(lambda p, v: jnp.zeros((N, 12), jnp.int32)
               .at[p, :].set(v, mode="drop")),
       posm, vals12, name="row scatter 300K x 12 (monotone pos) into 2M")

timeit(jax.jit(lambda p: jnp.zeros((N,), jnp.int32)
               .at[p].set(1, mode="drop")),
       posm, name="width-1 scatter set 300K into 2M")

timeit(jax.jit(lambda p: jnp.zeros((N,), jnp.int32)
               .at[p].add(1, mode="drop")),
       posm, name="width-1 scatter ADD 300K into 2M")

timeit(jax.jit(lambda x: jnp.cumsum(x)),
       jnp.ones((N,), jnp.int32), name="cumsum 2M int32")

# monotone (sorted, repeated) row gather: (300K, 12) -> (2M, 12)
sidx = jnp.asarray(np.sort(rng.integers(0, P, size=N)).astype(np.int32))
timeit(jax.jit(lambda v, i: v[i]), vals12, sidx,
       name="monotone row gather (300K,12)->(2M,12)")

# random row gather same shape for comparison
ridx = jnp.asarray(rng.integers(0, P, size=N).astype(np.int32))
timeit(jax.jit(lambda v, i: v[i]), vals12, ridx,
       name="random row gather (300K,12)->(2M,12)")
