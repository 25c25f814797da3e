"""Microbench backward-path components: gather_rows VJP (pair-grad scatter)
and the image losses at sedan resolution."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.segsum import gather_rows

S = 500_001
CAP = 2 ** 22
H, W = 1038, 1558
rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
# tile-sorted-ish indices: ascending within segments
idx = jnp.sort(jnp.asarray(rng.integers(0, S - 1, CAP), jnp.int32))


def timeit(fn, *a, n=5, name=""):
    out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


gf = jax.jit(lambda t, i: gather_rows(t, i, S, False))
timeit(gf, table, idx, name="gather_rows fwd (CAP from S)")

vjp = jax.jit(lambda t, i, g: jax.vjp(
    lambda tt: gather_rows(tt, i, S, False), t)[1](g)[0])
g = jnp.ones((CAP, 128), jnp.float32)
timeit(vjp, table, idx, g, name="gather_rows bwd (scatter to S)")

from envgs_tpu.ops.losses import ssim

a = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
b = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
timeit(jax.jit(lambda x, y: ssim(x, y)), a, b, name="ssim fwd")
timeit(jax.jit(jax.grad(lambda x, y: ssim(x, y))), a, b, name="ssim fwd+bwd")

from envgs_tpu.utils.sh import eval_sh_color

shc = jnp.asarray(rng.standard_normal((S - 1, 3, 16)), jnp.float32)
dirs = jnp.asarray(rng.standard_normal((S - 1, 3)), jnp.float32)
timeit(jax.jit(lambda s, d: eval_sh_color(3, s, d)), shc, dirs,
       name="sh color fwd 500K deg3")
timeit(jax.jit(jax.grad(lambda s, d: eval_sh_color(3, s, d).sum(),
                        argnums=0)), shc, dirs, name="sh color fwd+bwd")
