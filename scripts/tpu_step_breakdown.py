"""Train-step cost decomposition at sedan scale: full vs no-reflection vs
forward-only, isolating raster-bwd / tracer / loss costs on one chip."""
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


def timeit(fn, args, n=6, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.1f} ms", flush=True)
    return out


def variant(reflection: bool, ssim: float):
    cfg = EnvGSConfig(raster_backend="pallas", tracer_backend="tiled",
                      pair_cap=2 ** 21, env_pair_cap=2 ** 21,
                      reflection_start_iter=0 if reflection else 10 ** 9,
                      render_reflection=reflection)
    lc = LossConfig(perc_loss_weight=0.0, ssim_loss_weight=ssim)
    return make_train_step(cam, cfg, lc, LRConfig(), LRConfig(
        use_opacity_pulse=False), donate=False)


def fwd_variant(reflection: bool):
    cfg = EnvGSConfig(raster_backend="pallas", tracer_backend="tiled",
                      pair_cap=2 ** 21, env_pair_cap=2 ** 21,
                      reflection_start_iter=0 if reflection else 10 ** 9,
                      render_reflection=reflection)

    def fwd(s, K, R, T, i):
        return forward_envgs(s.base, s.env, cam._replace(K=K, R=R, T=T),
                             i, cfg).rgb_map

    return jax.jit(fwd)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
args_step = (state, batch, cam.K, cam.R, cam.T, it)
args_fwd = (state, cam.K, cam.R, cam.T, it)
if which in ("all", "full"):
    timeit(variant(True, 0.2), args_step, name="step full")
if which in ("all", "norefl"):
    timeit(variant(False, 0.2), args_step, name="step no-reflection")
if which in ("all", "nossim"):
    timeit(variant(True, 0.0), args_step, name="step no-ssim")
if which in ("all", "fwd"):
    timeit(fwd_variant(True), args_fwd, name="fwd full")
if which in ("all", "fwdnorefl"):
    timeit(fwd_variant(False), args_fwd, name="fwd no-reflection")
