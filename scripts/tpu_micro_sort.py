"""Microbench: sort/scatter primitives behind the pair-grad transpose."""
import time

import jax
import jax.numpy as jnp
import numpy as np

CAP = 2 ** 22
S = 500_001
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 2 ** 31 - 1, CAP), jnp.int32)
vals = jnp.arange(CAP, dtype=jnp.int32)
gids = jnp.asarray(rng.integers(0, S - 1, CAP), jnp.int32)
rows = jnp.asarray(rng.standard_normal((CAP, 128)), jnp.float32)
perm = jnp.asarray(rng.permutation(CAP), jnp.int32)


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


timeit(jax.jit(lambda k: jax.lax.sort(k, is_stable=False)), keys,
       name="single int32 sort 4M")
timeit(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                         is_stable=False)), keys, vals,
       name="pair int32 sort 4M unstable")
timeit(jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                         is_stable=True)), gids, vals,
       name="pair int32 sort 4M stable (gid keys)")
timeit(jax.jit(lambda r, p: jnp.zeros_like(r).at[p].set(
    r, unique_indices=True, indices_are_sorted=False)), rows, perm,
       name="unique row scatter 4M x 128")
timeit(jax.jit(lambda r, p: r[p]), rows, perm,
       name="row gather 4M x 128 (control)")
