"""Steady-state full-train-step timing at sedan scale on one TPU chip.

Workload mirrors the Ref-Real sedan regime (BASELINE.md): 1558x1038 image,
500K active base surfels + 131K environment surfels, all EnvGS losses,
reflection pass on. Prints seconds/step and steps/sec after warmup.

Usage: python scripts/tpu_train_bench.py [H W P_BASE P_ENV STEPS]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig
from envgs_tpu.models.gaussians import create_pool, logit
from envgs_tpu.train.supervisor import LossConfig
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.trainer import Batch, init_train_state, make_train_step
from envgs_tpu.utils.camera import make_camera

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1038
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1558
P_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
P_ENV = int(sys.argv[4]) if len(sys.argv) > 4 else 131_072
STEPS = int(sys.argv[5]) if len(sys.argv) > 5 else 10
PAIR_CAP = int(sys.argv[6]) if len(sys.argv) > 6 else 2 ** 22
ENV_PAIR_CAP = int(sys.argv[7]) if len(sys.argv) > 7 else 2 ** 21

rng = np.random.default_rng(0)
xyz = np.concatenate(
    [rng.normal(size=(P_BASE, 2)) * 1.5, rng.random((P_BASE, 1)) * 5 + 2.0],
    -1,
).astype(np.float32)
base = create_pool(xyz, rng.random((P_BASE, 3)).astype(np.float32),
                   cap=P_BASE, sh_degree=3, init_opacity=0.8)
scal = np.full((P_BASE, 2), np.log(0.012), np.float32)
spec = np.full((P_BASE, 1), float(logit(jnp.asarray(0.3))), np.float32)
base = base._replace(params=base.params._replace(
    scaling=jnp.asarray(scal), specular=jnp.asarray(spec)))

dirs = rng.normal(size=(P_ENV, 3))
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
env = create_pool((dirs * 20).astype(np.float32),
                  rng.random((P_ENV, 3)).astype(np.float32),
                  cap=P_ENV, sh_degree=3, init_opacity=0.8)
env = env._replace(params=env.params._replace(
    scaling=jnp.full((P_ENV, 2), np.log(0.5))))

f = 0.9 * W
Kmat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(H, W, Kmat, np.eye(3, dtype=np.float32),
                  np.zeros(3, np.float32), 0.02, 100.0)
model_cfg = EnvGSConfig(
    raster_backend="pallas", tracer_backend="tiled",
    pair_cap=PAIR_CAP, env_pair_cap=ENV_PAIR_CAP, reflection_start_iter=0,
)

state = init_train_state(base, env, jax.random.PRNGKey(0))
step = make_train_step(cam, model_cfg, LossConfig(), LRConfig(), LRConfig(),
                       donate=False, has_norm=True)
batch = Batch(
    rgb=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
    msk=jnp.ones((H, W, 1), jnp.float32),
    norm=jnp.zeros((H, W, 3), jnp.float32),
)
K = jnp.asarray(Kmat)
R = jnp.eye(3)
T = jnp.zeros(3)

t0 = time.perf_counter()
state, aux = step(state, batch, K, R, T, jnp.asarray(10))
# axon: block_until_ready does not block; force a fetch
_ = float(np.asarray(aux["loss"]))
print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
for i in range(STEPS):
    state, aux = step(state, batch, K, R, T, jnp.asarray(11 + i))
_ = float(np.asarray(aux["loss"]))
dt = (time.perf_counter() - t0) / STEPS
print(f"steady-state train step: {dt * 1000:.0f} ms  ({1.0 / dt:.2f} steps/s)")
print(f"loss finite: {np.isfinite(float(np.asarray(aux['loss'])))}")
