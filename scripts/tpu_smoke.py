"""Real-TPU smoke + microbenchmark of the Pallas kernels.

Usage: python scripts/tpu_smoke.py [H W P]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import rasterize
from envgs_tpu.utils.camera import make_camera

H = int(sys.argv[1]) if len(sys.argv) > 1 else 800
W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
P = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
PAIR_CAP = 2 ** 21

print("devices:", jax.devices())

rng = np.random.default_rng(0)
means = np.concatenate(
    [rng.normal(size=(P, 2)) * 1.2, rng.random((P, 1)) * 6 + 2.0], -1
).astype(np.float32)
quats = rng.normal(size=(P, 4)).astype(np.float32)
scales = (rng.random((P, 2)) * 0.02 + 0.005).astype(np.float32)
opac = (rng.random(P) * 0.9 + 0.05).astype(np.float32)
colors = rng.random((P, 3)).astype(np.float32)

f = 0.8 * W
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))

args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
bg = jnp.zeros(3)


@jax.jit
def fwd(means, quats, scales, opac, colors):
    prep = prepare_splats(means, quats, scales, opac, colors, cam)
    out = rasterize(prep, cam, bg, backend="pallas", pair_cap=PAIR_CAP)
    return out.rgb, out.alpha, out.wet


@jax.jit
def fwdbwd(means, quats, scales, opac, colors):
    def loss(*a):
        prep = prepare_splats(*a, cam)
        out = rasterize(prep, cam, bg, backend="pallas", pair_cap=PAIR_CAP)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.distortion)

    l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*a_args)
    return l, g[0]


def timeit(fn, *a, n=10, name=""):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.2f} ms  ({1/dt:.1f}/s)")
    return dt


t0 = time.perf_counter()
rgb, alpha, wet = fwd(*args)
jax.block_until_ready(rgb)
print(f"fwd compile+run: {time.perf_counter()-t0:.1f}s "
      f"rgb mean {float(rgb.mean()):.4f} alpha mean {float(alpha.mean()):.4f} "
      f"wet>0: {int((wet>0).sum())}")
timeit(fwd, *args, name=f"forward {H}x{W} P={P}")

a_args = args


@jax.jit
def loss_fn(means, quats, scales, opac, colors):
    prep = prepare_splats(means, quats, scales, opac, colors, cam)
    out = rasterize(prep, cam, bg, backend="pallas", pair_cap=PAIR_CAP)
    return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.distortion)


grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
t0 = time.perf_counter()
l, g = grad_fn(*args)
jax.block_until_ready(g)
print(f"fwd+bwd compile+run: {time.perf_counter()-t0:.1f}s loss={float(l):.3f} "
      f"gmean={float(jnp.abs(g[0]).mean()):.3e} finite={bool(jnp.all(jnp.isfinite(g[0])))}")
timeit(lambda *a: grad_fn(*a)[1][0], *args, name=f"fwd+bwd {H}x{W} P={P}")
