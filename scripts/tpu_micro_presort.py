"""Decompose presort_transpose cost at sedan scale."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.segsum import contiguous_run_sums, presort_transpose

PRE_CAP = 2 ** 22
N = PRE_CAP + 6528 * 64  # aligned layout length
P = 500_000
S = P + 1
W = 32
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
pre_idx = jnp.asarray(rng.permutation(max(N, PRE_CAP))[:N], jnp.int32)
starts = jnp.sort(jnp.asarray(rng.integers(0, PRE_CAP, P), jnp.int32))
counts = jnp.asarray(rng.integers(1, 9, P), jnp.int32)


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


def scat(gg, idx):
    return jnp.zeros((PRE_CAP, W), gg.dtype).at[idx].set(
        gg[:, :W], mode="drop", unique_indices=True)


timeit(jax.jit(scat), g, pre_idx, name="row scatter w32")
gpre = jax.jit(scat)(g, pre_idx)


def prefix(gg):
    B = 512
    blocks = gg.reshape(-1, B, W)
    tril = jnp.tril(jnp.ones((B, B), gg.dtype))
    return jnp.einsum("ij,njw->niw", tril, blocks,
                      precision=jax.lax.Precision.HIGHEST)


def prefix_med(gg):
    B = 512
    blocks = gg.reshape(-1, B, W)
    tril = jnp.tril(jnp.ones((B, B), gg.dtype))
    return jnp.einsum("ij,njw->niw", tril, blocks,
                      precision=jax.lax.Precision.HIGH)


timeit(jax.jit(prefix), gpre, name="tril einsum HIGHEST w32")
timeit(jax.jit(prefix_med), gpre, name="tril einsum HIGH w32")
timeit(jax.jit(lambda r, s, c: contiguous_run_sums(r, s, c, S, W)),
       gpre, starts, counts, name="contiguous_run_sums (prefix+gathers)")
timeit(jax.jit(lambda gg, i, s, c: presort_transpose(
    gg, i, s, c, PRE_CAP, S, W)), g, pre_idx, starts, counts,
    name="presort_transpose total")


def scat128(gg, idx):
    return jnp.zeros((PRE_CAP, 128), gg.dtype).at[idx].set(
        gg, mode="drop", unique_indices=True)


timeit(jax.jit(scat128), g, pre_idx, name="row scatter w128")
timeit(jax.jit(lambda gg, i, s, c: presort_transpose(
    gg, i, s, c, PRE_CAP, S, W)), g, pre_idx, starts, counts,
    name="presort_transpose total (w128 scatter)")

from envgs_tpu.ops.segsum import gather_transpose

gids = jnp.asarray(rng.integers(0, P, N), jnp.int32)
timeit(jax.jit(lambda gg, i: gather_transpose(gg, i, S, S, False, width=W)),
       g, gids, name="gather_transpose (new, tracer path)")
