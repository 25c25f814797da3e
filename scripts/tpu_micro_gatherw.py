"""Microbench: row-gather/scatter rate vs row width (f32 lanes).

Decides the pair-grad transpose layout: the (cap, 128) cotangent row gather
is the dominant cost of gather_transpose/presort_transpose (48 ms at 4M
rows — the sort itself is 13 ms). If gathers are byte-bound, narrowing the
gradient rows to the ~24 meaningful lanes cuts the transpose ~4x; if
row-rate-bound, width is free and the layout should stay 128.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 2 ** 22
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(N), jnp.int32)


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


for W in (32, 16):
    rows = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    timeit(jax.jit(lambda r, p: r[p]), rows, perm,
           name=f"row gather {N // 2**20}M x {W} f32")
    timeit(jax.jit(lambda r, p: jnp.zeros_like(r).at[p].set(
        r, unique_indices=True)), rows, perm,
        name=f"unique row scatter {N // 2**20}M x {W} f32")
rows16 = jnp.asarray(rng.standard_normal((N, 128)), jnp.bfloat16)
timeit(jax.jit(lambda r, p: r[p]), rows16, perm,
       name="row gather 4M x 128 bf16")
