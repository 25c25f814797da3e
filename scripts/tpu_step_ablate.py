"""Finer train-step ablation at sedan scale: render-mode fwd, train-mode
fwd, losses, value_and_grad, optimizer — isolates where the step time goes
beyond the per-stage kernel profiles.

Usage: python scripts/tpu_step_ablate.py [refl: 0|1]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.models.gaussians import create_pool, logit
from envgs_tpu.train.optimizer import LRConfig, lr_tree_for, sparse_adam_update
from envgs_tpu.train.supervisor import LossConfig, compute_losses
from envgs_tpu.train.trainer import Batch, init_train_state, make_train_step
from envgs_tpu.utils.camera import Camera, make_camera

REFL = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
H, W, P_BASE, P_ENV = 1038, 1558, 500_000, 131_072
rng = np.random.default_rng(0)
xyz = np.concatenate(
    [rng.normal(size=(P_BASE, 2)) * 1.5, rng.random((P_BASE, 1)) * 5 + 2.0],
    -1).astype(np.float32)
base = create_pool(xyz, rng.random((P_BASE, 3)).astype(np.float32),
                   cap=P_BASE, sh_degree=3, init_opacity=0.8)
base = base._replace(params=base.params._replace(
    scaling=jnp.full((P_BASE, 2), np.log(0.012)),
    specular=jnp.full((P_BASE, 1), float(logit(jnp.asarray(0.3))))))
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
state = init_train_state(base, env, jax.random.PRNGKey(0))
batch = Batch(rgb=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
              msk=jnp.ones((H, W, 1)), norm=jnp.zeros((H, W, 3)))
it = jnp.asarray(25_000)
cfg = EnvGSConfig(raster_backend="pallas", tracer_backend="tiled",
                  pair_cap=2 ** 21, env_pair_cap=2 ** 21,
                  reflection_start_iter=0 if REFL else 10 ** 9,
                  render_reflection=REFL)
lc = LossConfig(perc_loss_weight=0.0, ssim_loss_weight=0.2)


def timeit(fn, *a, n=6, name=""):
    out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(np.asarray(leaf).ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms",
          flush=True)
    return out


m2z = jnp.zeros((base.cap, 2))
e3z = jnp.zeros((env.cap, 3))


def fwd_render(s, i):
    return forward_envgs(s.base, s.env, cam, i, cfg).rgb_map


def fwd_train(s, i):
    out = forward_envgs(s.base, s.env, cam, i, cfg, m2z, e3z)
    loss, _ = compute_losses(out, batch.rgb, batch.msk, batch.norm,
                             cam.R, i, lc, bg_brightness=cfg.bg_brightness)
    return loss


def vag(s, i):
    def loss_fn(bp, ep, m, e):
        out = forward_envgs(s.base._replace(params=bp),
                            s.env._replace(params=ep), cam, i, cfg, m, e)
        loss, _ = compute_losses(out, batch.rgb, batch.msk, batch.norm,
                                 cam.R, i, lc,
                                 bg_brightness=cfg.bg_brightness)
        return loss
    return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
        s.base.params, s.env.params, m2z, e3z)


def vag_opt(s, i):
    loss, grads = vag(s, i)
    nb, _ = sparse_adam_update(s.base.params, grads[0], s.opt_base,
                               lr_tree_for(i, LRConfig()))
    ne, _ = sparse_adam_update(s.env.params, grads[1], s.opt_env,
                               lr_tree_for(i, LRConfig()))
    return loss, nb, ne


timeit(jax.jit(fwd_render), state, it, name="fwd render-mode (rgb only)")
timeit(jax.jit(fwd_train), state, it, name="fwd train-mode + losses")
timeit(jax.jit(vag), state, it, name="value_and_grad")
timeit(jax.jit(vag_opt), state, it, name="value_and_grad + adam")
step = make_train_step(cam, cfg, lc, LRConfig(), LRConfig(), donate=False,
                       has_norm=True)
timeit(step, state, batch, cam.K, cam.R, cam.T, it, name="full step")
