"""Decompose gather_transpose (tracer bwd path) cost."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.segsum import contiguous_run_sums

N = 2 ** 22 + 6528 * 64
P = 500_000
S = P + 1
W = 32
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
gids = jnp.asarray(rng.integers(0, P, N), jnp.int32)


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


def sort_only(i):
    return jax.lax.sort((i, jnp.arange(N, dtype=jnp.int32)), num_keys=1,
                        is_stable=False)


timeit(jax.jit(sort_only), gids, name="pair sort (dup gid keys)")


def sort_gather(gg, i):
    ids_s, perm = sort_only(i)
    return gg[perm]


timeit(jax.jit(sort_gather), g, gids, name="sort + perm row gather")


def srch(i):
    ids_s, _ = sort_only(i)
    q = jnp.arange(S, dtype=jnp.int32)
    return (jnp.searchsorted(ids_s, q, side="left"),
            jnp.searchsorted(ids_s, q, side="right"))


timeit(jax.jit(srch), gids, name="sort + 2x searchsorted")
