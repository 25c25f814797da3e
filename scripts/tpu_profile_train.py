"""Decompose the sedan-scale train step: fwd loss, +grad, +adam/stats,
and the reflection pass's share (fwd with reflection off).

Usage: python scripts/tpu_profile_train.py [H W P_BASE P_ENV STEPS]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.models.gaussians import create_pool, logit
from envgs_tpu.train.supervisor import LossConfig, compute_losses
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.trainer import Batch, init_train_state, make_train_step
from envgs_tpu.utils.camera import Camera, make_camera

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1038
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1558
P_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
P_ENV = int(sys.argv[4]) if len(sys.argv) > 4 else 131_072
STEPS = int(sys.argv[5]) if len(sys.argv) > 5 else 8

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
cfg = EnvGSConfig(
    raster_backend="pallas", tracer_backend="tiled",
    pair_cap=2 ** 22, env_pair_cap=2 ** 21, reflection_start_iter=0,
)
cfg_norefl = cfg._replace(reflection_start_iter=10 ** 9)

state = init_train_state(base, env, jax.random.PRNGKey(0))
batch = Batch(
    rgb=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
    msk=jnp.ones((H, W, 1), jnp.float32),
    norm=jnp.zeros((H, W, 3), jnp.float32),
)
K = jnp.asarray(Kmat)
loss_cfg = LossConfig()


def timeit(fn, *args, name=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(STEPS):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name}: {dt:.1f} ms")
    return out


def make_loss(c):
    def loss_fn(bparams, eparams):
        camera = Camera(H, W, K, jnp.eye(3), jnp.zeros(3), 0.02, 100.0)
        b = state.base._replace(params=bparams)
        e = state.env._replace(params=eparams)
        m2z = jnp.zeros((b.cap, 2))
        e3z = jnp.zeros((e.cap, 3))
        out = forward_envgs(b, e, camera, jnp.asarray(10), c, m2z, e3z)
        loss, _ = compute_losses(out, batch.rgb, batch.msk, batch.norm,
                                 camera.R, jnp.asarray(10), loss_cfg,
                                 bg_brightness=c.bg_brightness)
        return loss
    return loss_fn

timeit(jax.jit(make_loss(cfg_norefl)), state.base.params, state.env.params,
       name="fwd loss, reflection OFF")
timeit(jax.jit(make_loss(cfg)), state.base.params, state.env.params,
       name="fwd loss, reflection ON")
timeit(jax.jit(jax.grad(make_loss(cfg_norefl), argnums=(0, 1))),
       state.base.params, state.env.params, name="grad, reflection OFF")
timeit(jax.jit(jax.grad(make_loss(cfg), argnums=(0, 1))),
       state.base.params, state.env.params, name="grad, reflection ON")

step = make_train_step(cam, cfg, LossConfig(), LRConfig(), LRConfig(),
                       donate=False, has_norm=True)
timeit(lambda: step(state, batch, K, jnp.eye(3), jnp.zeros(3),
                    jnp.asarray(10))[1]["loss"], name="full step")
