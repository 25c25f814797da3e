"""Micro-costs of the tracer cull tail: scatter+cummax sweeps vs the
Pallas fill_forward kernel, and the idmat compaction gather.

Usage: python scripts/tpu_micro_culltail.py [CAP_LOG2 T K]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CAPL = int(sys.argv[1]) if len(sys.argv) > 1 else 21
T = int(sys.argv[2]) if len(sys.argv) > 2 else 6656
K = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
CAP = 1 << CAPL

rng = np.random.default_rng(0)
counts = jnp.asarray(
    np.minimum(rng.poisson(CAP // T, T), K).astype(np.int32))
padded = -(-counts // 64) * 64
poffs = jnp.concatenate(
    [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])
poffs = jnp.minimum(poffs, CAP)
idmat = jnp.asarray(rng.integers(0, 32768, (T, K)).astype(np.int32))


def timeit(fn, *a, n=10, name=""):
    out = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)
    return out


@jax.jit
def tail_cummax(poffs, idmat):
    base = jnp.full((CAP,), 0, jnp.int32)
    tile_of = jax.lax.cummax(
        base.at[poffs[:-1]].max(jnp.arange(T, dtype=jnp.int32), mode="drop"))
    pstart = jax.lax.cummax(base.at[poffs[:-1]].max(poffs[:-1], mode="drop"))
    climit = jax.lax.cummax(base.at[poffs[:-1]].max(counts, mode="drop"))
    j = jnp.arange(CAP, dtype=jnp.int32)
    k = j - pstart
    valid = k < climit
    flat = jnp.clip(tile_of, 0, T - 1) * K + jnp.clip(k, 0, K - 1)
    return jnp.where(valid, idmat.reshape(-1)[flat], 32768)


@jax.jit
def tail_ff(poffs, idmat):
    from envgs_tpu.ops.fill_forward import fill_forward

    am = jnp.zeros((CAP, 3), jnp.int32).at[poffs[:-1], :].max(
        jnp.stack([jnp.arange(T, dtype=jnp.int32) * K, poffs[:-1], counts],
                  axis=1), mode="drop").T
    avalid = jnp.zeros((CAP,), jnp.int32).at[poffs[:-1]].set(1, mode="drop")
    rbase, pstart, climit = fill_forward(am, avalid)
    j = jnp.arange(CAP, dtype=jnp.int32)
    k = j - pstart
    valid = k < climit
    flat = rbase + jnp.clip(k, 0, K - 1)
    return jnp.where(valid, idmat.reshape(-1)[flat], 32768)


@jax.jit
def one_cummax(poffs):
    base = jnp.full((CAP,), 0, jnp.int32)
    return jax.lax.cummax(
        base.at[poffs[:-1]].max(jnp.arange(T, dtype=jnp.int32), mode="drop"))


flat_idx = jnp.asarray(rng.integers(0, T * K, CAP).astype(np.int32))


@jax.jit
def just_gather(idmat, flat):
    return idmat.reshape(-1)[flat]


timeit(one_cummax, poffs, name="one scatter+cummax sweep")
timeit(just_gather, idmat, flat_idx, name="element gather CAP from T*K")
timeit(tail_cummax, poffs, idmat, name="full tail (3x cummax)")
timeit(tail_ff, poffs, idmat, name="full tail (fill_forward)")


@jax.jit
def three_sweeps(poffs):
    base = jnp.full((CAP,), 0, jnp.int32)
    a = jax.lax.cummax(
        base.at[poffs[:-1]].max(jnp.arange(T, dtype=jnp.int32), mode="drop"))
    b = jax.lax.cummax(base.at[poffs[:-1]].max(poffs[:-1], mode="drop"))
    c = jax.lax.cummax(base.at[poffs[:-1]].max(counts, mode="drop"))
    return a, b, c


@jax.jit
def tail_nogather(poffs):
    a, b, c = three_sweeps(poffs)
    j = jnp.arange(CAP, dtype=jnp.int32)
    k = j - b
    valid = k < c
    flat = jnp.clip(a, 0, T - 1) * K + jnp.clip(k, 0, K - 1)
    return jnp.where(valid, flat, -1)


@jax.jit
def gather_from_flatcomp(idmat, flatv):
    flat = jnp.where(flatv >= 0, flatv, 0)
    return jnp.where(flatv >= 0, idmat.reshape(-1)[flat], 32768)


flatv = jax.block_until_ready(tail_nogather(poffs))
timeit(three_sweeps, poffs, name="three sweeps only")
timeit(tail_nogather, poffs, name="tail minus gather")
timeit(gather_from_flatcomp, idmat, flatv, name="gather from computed flat")


@jax.jit
def gather_with_barrier(idmat, flatv):
    flat = jnp.where(flatv >= 0, flatv, 0)
    flat = jax.lax.optimization_barrier(flat)
    g = idmat.reshape(-1)[flat]
    g = jax.lax.optimization_barrier(g)
    return jnp.where(flatv >= 0, g, 32768)


@jax.jit
def tail_barrier(poffs, idmat):
    a, b, c = three_sweeps(poffs)
    j = jnp.arange(CAP, dtype=jnp.int32)
    k = j - b
    valid = k < c
    flat = jnp.clip(a, 0, T - 1) * K + jnp.clip(k, 0, K - 1)
    flat = jax.lax.optimization_barrier(flat)
    g = idmat.reshape(-1)[flat]
    g = jax.lax.optimization_barrier(g)
    return jnp.where(valid, g, 32768)


timeit(gather_with_barrier, idmat, flatv, name="gather with barriers")
timeit(tail_barrier, poffs, idmat, name="full tail (barriers)")
