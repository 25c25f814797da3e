"""EnvGS trainer: jitted train step + host-dispatched maintenance events.

TPU-native redesign of the reference runner loop
(/root/reference/easyvolcap/runners/volumetric_video_runner.py:370-475 and
models/samplers/envgs_sampler.py:209-394):

- `train_step` is ONE jitted function (loss -> grads -> masked sparse-Adam
  update -> densification-stat accumulation) with static shapes, so it
  compiles once for the whole run;
- topology events (densify/prune, opacity/specular resets, color sabotage,
  normal propagation, SH bumps) are separate jitted functions dispatched by
  the host on their iteration schedule — the host knows the python step
  index, so no recompiles and no retained-gradient choreography;
- densification statistics come out of the train step itself via the
  injected zero tensors (cotangents of means2d_zero / env_means3d_zero),
  replacing the reference's `.grad` retention pattern.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models import gaussians as G
from envgs_tpu.models.camera_opt import (
    CameraResiduals,
    apply_residual,
    init_camera_residuals,
)
from envgs_tpu.models.envgs import EnvGSConfig, EnvGSOutput, forward_envgs
from envgs_tpu.train.optimizer import (
    AdamState,
    LRConfig,
    init_adam,
    lr_tree_for,
    sparse_adam_update,
)
from envgs_tpu.train.supervisor import LossConfig, compute_losses
from envgs_tpu.utils.camera import Camera


class ScheduleConfig(NamedTuple):
    """Event cadences (envgs.yaml + EnvGSSampler defaults)."""

    epochs: int = 80
    ep_iter: int = 500
    # base gaussians
    densify_from_iter: int = 500
    densify_until_iter: int = 21000
    init_densification_interval: int = 100
    norm_densification_interval: int = 500
    opacity_reset_interval: int = 3000
    sh_update_iter: int = 1000
    sh_start_iter: int = 0
    # env gaussians
    env_densify_from_iter: int = 500
    env_densify_until_iter: int = 21000
    env_densification_interval: int = 500
    env_opacity_reset_interval: int = 6000
    env_sh_update_iter: int = 1000
    env_sh_start_iter: int = 0
    # 3DGS-DR tricks
    reflection_start_iter: int = 3000
    normal_prop_until_iter: int = 18000
    normal_prop_interval: int = 1000
    color_sabotage_until_iter: int = 18000
    color_sabotage_interval: int = 1000
    reset_specular_all: bool = False
    init_specular: float = 1e-3
    reset_opacity_value: float = 0.01

    @property
    def total_iters(self):
        return self.epochs * self.ep_iter


class TrainState(NamedTuple):
    base: G.GaussianPool
    env: G.GaussianPool
    opt_base: AdamState
    opt_env: AdamState
    key: jax.Array


def _canonicalize(tree):
    """Strip weak dtypes. A weak-typed leaf (e.g. from jnp.full with a python
    float) flips to strong after one optimizer step, changing the jit
    signature and silently RECOMPILING the train step (~50s at scale)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.convert_element_type(
            jnp.asarray(x), jnp.asarray(x).dtype
        ),
        tree,
    )


def init_train_state(base, env, key) -> TrainState:
    base = _canonicalize(base)
    env = _canonicalize(env)
    return TrainState(base, env, init_adam(base.params),
                      init_adam(env.params), key)


class Batch(NamedTuple):
    """One training view (static H/W via the Camera)."""

    rgb: jnp.ndarray  # (H, W, 3)
    msk: jnp.ndarray  # (H, W, 1)
    norm: jnp.ndarray  # (H, W, 3) monocular prior (zeros if absent)
    dpt: jnp.ndarray | None = None  # (H, W, 1) metric depth prior


class CamOptState(NamedTuple):
    """Optimizable-camera training state (residuals + their Adam moments).

    Counterpart of the reference's OptimizableCamera parameters living in
    the main optimizer param_groups (optimizable_camera.py:153-230 +
    configs/specs/optcam.yaml: extri lr 1e-5, intri lr 1e-8)."""

    res: CameraResiduals
    opt: AdamState


def init_cam_opt(n_views: int) -> CamOptState:
    res = init_camera_residuals(max(n_views, 1))
    return CamOptState(res, init_adam(res))


class CamOptConfig(NamedTuple):
    enabled: bool = False
    extri_lr: float = 1e-5
    intri_lr: float = 1e-8
    freeze_extri: bool = False
    freeze_intri: bool = False


def make_train_step(
    cam: Camera,
    model_cfg: EnvGSConfig,
    loss_cfg: LossConfig,
    lr_base: LRConfig,
    lr_env: LRConfig,
    lpips_fn=None,
    donate: bool = True,
    has_norm: bool = False,
    cam_opt: CamOptConfig = CamOptConfig(),
    aux_cfg=None,  # AuxLossConfig | None — chained aux supervisors
):
    """Build the jitted train step for a fixed camera resolution.

    The returned step takes (state, batch, K, R, T, it) — or, with
    cam_opt.enabled, (state, cam_state, batch, K, R, T, view_idx, it) and
    additionally returns the updated cam_state: the per-view SE(3)+intrinsic
    residuals are applied inside the forward and optimized jointly
    (OptimizableCamera semantics). Intrinsics/extrinsics/view index are
    traced arrays (any view works without recompiling); H/W/near/far are
    static from the template camera `cam`.
    """
    H, W, znear, zfar = cam.H, cam.W, cam.znear, cam.zfar

    def _step_impl(state: TrainState, cam_state: CamOptState, batch: Batch,
                   K, R, T, view_idx, it):
        base, env = state.base, state.env
        # screen-space (raster) or world-space (traced) densification grads
        m2z = jnp.zeros((base.cap, 3 if model_cfg.use_base_tracing else 2))
        e3z = jnp.zeros((env.cap, 3))
        # per-splat wet hooks: the blend backward recomputes each pair's
        # blend weight anyway, so wet rides a spare gradient lane through
        # the pair-grad transpose instead of a forward segment reduction
        wz_b = jnp.zeros((base.cap,))
        wz_e = jnp.zeros((env.cap,))

        def loss_fn(bparams, eparams, m2z, e3z, wz_b, wz_e, cres):
            camera = Camera(H, W, K, R, T, znear, zfar)
            if cam_opt.enabled:
                camera = apply_residual(camera, cres, view_idx)
            b = base._replace(params=bparams)
            e = env._replace(params=eparams)
            out = forward_envgs(b, e, camera, it, model_cfg, m2z, e3z,
                                wz_b, wz_e)
            loss, stats = compute_losses(
                out, batch.rgb, batch.msk,
                batch.norm if has_norm else None,
                camera.R, it, loss_cfg,
                bg_brightness=model_cfg.bg_brightness,
                lpips_fn=lpips_fn,
                aux_cfg=aux_cfg, gt_dpt=batch.dpt,
            )
            return loss, (out, stats)

        argnums = (0, 1, 2, 3, 4, 5, 6) if cam_opt.enabled \
            else (0, 1, 2, 3, 4, 5)
        (loss, (out, stats)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True
        )(base.params, env.params, m2z, e3z, wz_b, wz_e, cam_state.res)
        g_base, g_env, g_m2z, g_e3z, g_wet_b, g_wet_e = grads[:6]
        # one of {forward wet, gradient-lane wet} is always exact zeros
        # (pallas backends use the lane; the ref backends keep forward wet)
        wet_b = jax.lax.stop_gradient(g_wet_b) + out.base_wet
        wet_e = jax.lax.stop_gradient(g_wet_e) + out.env_wet

        # optimizer updates (sparse semantics: zero grads skip)
        new_bp, opt_base = sparse_adam_update(
            base.params, g_base, state.opt_base, lr_tree_for(it, lr_base)
        )
        new_ep, opt_env = sparse_adam_update(
            env.params, g_env, state.opt_env, lr_tree_for(it, lr_env)
        )

        if cam_opt.enabled:
            g_cam: CameraResiduals = grads[6]
            if cam_opt.freeze_extri:
                g_cam = g_cam._replace(se3=jnp.zeros_like(g_cam.se3))
            if cam_opt.freeze_intri:
                g_cam = g_cam._replace(intr=jnp.zeros_like(g_cam.intr))
            cam_lrs = CameraResiduals(
                se3=jnp.asarray(cam_opt.extri_lr, jnp.float32),
                intr=jnp.asarray(cam_opt.intri_lr, jnp.float32),
            )
            new_res, new_copt = sparse_adam_update(
                cam_state.res, g_cam, cam_state.opt, cam_lrs, eps=1e-15
            )
            cam_state = CamOptState(new_res, new_copt)

        # densification statistics (add_densification_stats semantics);
        # visibility folds the gradient-lane wet in (out.base_visibility
        # alone covers radii + the ref backends' forward wet)
        b_stats = G.accumulate_stats(
            base.stats, g_m2z, out.base_visibility | (wet_b > 0),
            weight=wet_b, radii=out.base_radii,
        )
        e_stats = G.accumulate_stats(
            env.stats, g_e3z, out.env_visibility | (wet_e > 0),
            weight=wet_e,
        )

        new_state = TrainState(
            base._replace(params=new_bp, stats=b_stats),
            env._replace(params=new_ep, stats=e_stats),
            opt_base,
            opt_env,
            state.key,
        )
        stats = dict(stats)
        stats["num_pts"] = base.n_active
        stats["env_num_pts"] = env.n_active
        # capacity-truncation counters (VERDICT: no silent drops) — nonzero
        # pair_overflow means the raster pair budget clipped far splats;
        # trace_dropped counts tracer candidate slots lost to total_pair_cap
        if out.base_num_pairs is not None:
            stats["pair_overflow"] = jnp.maximum(
                out.base_num_pairs - model_cfg.pair_cap, 0)
        if out.env_dropped_pairs is not None:
            stats["trace_dropped"] = out.env_dropped_pairs
        return new_state, cam_state, stats

    if cam_opt.enabled:
        return jax.jit(_step_impl, donate_argnums=(0, 1) if donate else ())

    dummy_cam = init_cam_opt(1)

    def step(state: TrainState, batch: Batch, K, R, T, it):
        new_state, _, stats = _step_impl(
            state, dummy_cam, batch, K, R, T, jnp.asarray(0), it
        )
        return new_state, stats

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Maintenance events (host-dispatched, each jitted once)
# ---------------------------------------------------------------------------

def make_maintenance(sched: ScheduleConfig, dens_base: G.DensifyConfig,
                     dens_env: G.DensifyConfig):
    """Returns a host-side function applying all due events at iteration it."""

    @jax.jit
    def _densify_base(state: TrainState, key):
        pool, mu_nu = G.densify_and_prune(
            state.base, (state.opt_base.mu, state.opt_base.nu), dens_base, key
        )
        return state._replace(
            base=pool, opt_base=AdamState(mu_nu[0], mu_nu[1], state.opt_base.step)
        )

    @jax.jit
    def _densify_env(state: TrainState, key):
        pool, mu_nu = G.densify_and_prune(
            state.env, (state.opt_env.mu, state.opt_env.nu), dens_env, key
        )
        return state._replace(
            env=pool, opt_env=AdamState(mu_nu[0], mu_nu[1], state.opt_env.step)
        )

    @jax.jit
    def _reset_opacity_base(state: TrainState):
        pool, mu_nu = G.reset_opacity(
            state.base, (state.opt_base.mu, state.opt_base.nu),
            sched.reset_opacity_value,
        )
        return state._replace(
            base=pool, opt_base=AdamState(mu_nu[0], mu_nu[1], state.opt_base.step)
        )

    @jax.jit
    def _reset_opacity_env(state: TrainState):
        pool, mu_nu = G.reset_opacity(
            state.env, (state.opt_env.mu, state.opt_env.nu),
            sched.reset_opacity_value,
        )
        return state._replace(
            env=pool, opt_env=AdamState(mu_nu[0], mu_nu[1], state.opt_env.step)
        )

    @jax.jit
    def _reset_specular(state: TrainState):
        pool, mu_nu = G.reset_specular(
            state.base, (state.opt_base.mu, state.opt_base.nu),
            sched.init_specular, sched.reset_specular_all,
        )
        return state._replace(
            base=pool, opt_base=AdamState(mu_nu[0], mu_nu[1], state.opt_base.step)
        )

    @jax.jit
    def _normal_prop(state: TrainState):
        adam = (state.opt_base.mu, state.opt_base.nu)
        pool, adam = G.enlarge_opacity(state.base, adam)
        pool, adam = G.enlarge_scaling(pool, adam)
        return state._replace(
            base=pool, opt_base=AdamState(adam[0], adam[1], state.opt_base.step)
        )

    @jax.jit
    def _color_sabotage(state: TrainState, key):
        pool, adam = G.distort_color(
            state.base, (state.opt_base.mu, state.opt_base.nu), key
        )
        return state._replace(
            base=pool, opt_base=AdamState(adam[0], adam[1], state.opt_base.step)
        )

    @jax.jit
    def _oneup_base(state: TrainState):
        return state._replace(base=G.oneup_sh_degree(state.base))

    @jax.jit
    def _oneup_env(state: TrainState):
        return state._replace(env=G.oneup_sh_degree(state.env))

    def maintain(state: TrainState, it: int, key) -> TrainState:
        """Apply every event due at python-int iteration `it` (called BEFORE
        the forward of iteration it, mirroring update_dif_gaussians order)."""
        s = sched
        # densification interval switches by phase (envgs_sampler.py:213-216)
        if it < s.reflection_start_iter or it >= s.normal_prop_until_iter:
            dint = s.init_densification_interval
        else:
            dint = s.norm_densification_interval

        # SH degree bumps
        if (0 < it < s.densify_until_iter and it % s.sh_update_iter == 0
                and it > s.sh_start_iter):
            state = _oneup_base(state)
        if (s.reflection_start_iter < it < s.env_densify_until_iter
                and it % s.env_sh_update_iter == 0 and it > s.env_sh_start_iter):
            state = _oneup_env(state)

        # base densify/prune
        if (s.densify_from_iter < it < s.densify_until_iter
                and it % dint == 0):
            key, k1 = jax.random.split(key)
            state = _densify_base(state, k1)
        # env densify/prune
        if (s.env_densify_from_iter < it < s.env_densify_until_iter
                and it > s.reflection_start_iter
                and it % s.env_densification_interval == 0):
            key, k1 = jax.random.split(key)
            state = _densify_env(state, k1)

        opacity_reset = False
        if 0 < it < s.densify_until_iter and it % s.opacity_reset_interval == 0:
            state = _reset_opacity_base(state)
            opacity_reset = True
            if it > s.opacity_reset_interval and it > s.reflection_start_iter:
                state = _reset_specular(state)
        if (s.reflection_start_iter < it < s.env_densify_until_iter
                and it % s.env_opacity_reset_interval == 0):
            state = _reset_opacity_env(state)

        # 3DGS-DR tricks (envgs_sampler.py:311-325)
        if (s.reflection_start_iter < it <= s.color_sabotage_until_iter
                and it % s.color_sabotage_interval == 0 and not opacity_reset
                and it < s.densify_until_iter):
            key, k1 = jax.random.split(key)
            state = _color_sabotage(state, k1)
        if (s.reflection_start_iter < it <= s.normal_prop_until_iter
                and it % s.normal_prop_interval == 0 and not opacity_reset
                and it < s.densify_until_iter):
            state = _normal_prop(state)
        return state

    return maintain
