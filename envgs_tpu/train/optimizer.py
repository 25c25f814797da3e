"""Sparse-update Adam + per-parameter learning-rate schedules.

TPU-native replacement for the reference's MyFusedAdam CUDA kernel
(/root/reference/easyvolcap/utils/src/fused_adam.cu:1-71 via
runners/optimizers.py:17-115): a jitted elementwise update that SKIPS
elements whose gradient is exactly zero — the semantics adaptive density
control relies on (untouched Gaussians keep stale moments and don't decay).

Learning rates follow the reference's per-name table
(configs/models/envgs.yaml optimizer_cfg.lr_table) plus:
- the Plenoxels-style log-linear xyz decay (gaussian2d_utils.py:225-262),
- the 3DGS-DR opacity-LR pulse (envgs_sampler.py:303-325): within
  (reflection_start, normal_prop_until], opacity LR is opacity_lr except for
  the 200 iterations following each normal-propagation event, where it is 0.

All schedules are pure functions of the (traced) iteration, so the train
step never recompiles.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.gaussians import GaussianParams


class AdamState(NamedTuple):
    mu: Any  # pytree like params
    nu: Any
    step: jnp.ndarray  # () int32


def init_adam(params) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(z, jax.tree_util.tree_map(jnp.zeros_like, params),
                     jnp.asarray(0, jnp.int32))


def sparse_adam_update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One masked Adam step. lr_tree: pytree of scalar LRs like params."""
    step = state.step + 1
    c1 = 1.0 - b1 ** step.astype(jnp.float32)
    c2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        live = g != 0.0
        m_new = jnp.where(live, b1 * m + (1 - b1) * g, m)
        v_new = jnp.where(live, b2 * v + (1 - b2) * g * g, v)
        denom = jnp.sqrt(v_new / c2) + eps
        p_new = jnp.where(live, p - lr * (m_new / c1) / denom, p)
        return p_new, m_new, v_new

    flat_p, tdef = jax.tree_util.tree_flatten(params)
    flat_g = tdef.flatten_up_to(grads)
    flat_m = tdef.flatten_up_to(state.mu)
    flat_v = tdef.flatten_up_to(state.nu)
    flat_lr = tdef.flatten_up_to(lr_tree)
    out = [upd(p, g, m, v, lr)
           for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = tdef.unflatten([o[0] for o in out])
    new_m = tdef.unflatten([o[1] for o in out])
    new_v = tdef.unflatten([o[2] for o in out])
    return new_p, AdamState(new_m, new_v, step)


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=30000):
    """Log-linear LR interpolation with optional warmup delay (jnp).

    lr_init/lr_final are static python floats; a zero endpoint means the
    parameter is frozen (log-space interpolation is undefined at 0 — the
    reference's get_expon_lr_func:225-262 has the same early-out)."""
    if lr_init <= 0.0 or lr_final <= 0.0:
        return jnp.asarray(0.0, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
    )
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    return delay * log_lerp


class LRConfig(NamedTuple):
    """Per-field LRs (envgs.yaml optimizer_cfg defaults)."""

    xyz: float = 0.00016
    features_dc: float = 0.0025
    features_rest: float = 0.000125
    opacity: float = 0.05
    scaling: float = 0.005
    rotation: float = 0.001
    specular: float = 0.01
    roughness: float = 0.05  # falls back to the default lr
    # temporal (STGS) fields: None matches the static pools' empty params
    t: float | None = None
    scaling_t: float | None = None
    motion: float | None = None
    # xyz schedule
    xyz_lr_init: float = 0.00016
    xyz_lr_final: float = 0.0000016
    xyz_lr_delay_mult: float = 0.01
    xyz_lr_max_steps: int = 30000
    spatial_scale: float = 1.0
    # opacity pulse trick
    opacity_pulse_lr: float = 0.05
    opacity_pulse_interval: int = 200
    normal_prop_interval: int = 1000
    opacity_reset_interval: int = 3000
    reflection_start_iter: int = 3000
    normal_prop_until_iter: int = 18000
    use_opacity_pulse: bool = True


def lr_tree_for(it, cfg: LRConfig) -> GaussianParams:
    """Scalar LR per GaussianParams field at (traced) iteration `it`."""
    it = jnp.asarray(it, jnp.float32)
    xyz_lr = expon_lr(
        it,
        cfg.xyz_lr_init * cfg.spatial_scale,
        cfg.xyz_lr_final * cfg.spatial_scale,
        lr_delay_mult=cfg.xyz_lr_delay_mult,
        max_steps=cfg.xyz_lr_max_steps,
    )
    opac_lr = jnp.asarray(cfg.opacity, jnp.float32)
    if cfg.use_opacity_pulse:
        # last pulse event <= it; zero for the window after each
        # normal-propagation event (that is not an opacity reset)
        last200 = jnp.floor(it / cfg.opacity_pulse_interval) * cfg.opacity_pulse_interval
        is_prop_evt = (
            (jnp.mod(last200, cfg.normal_prop_interval) == 0)
            & (jnp.mod(last200, cfg.opacity_reset_interval) != 0)
            & (last200 != cfg.normal_prop_until_iter)
            & (last200 > cfg.reflection_start_iter)
        )
        in_window = (it > cfg.reflection_start_iter) & (
            it <= cfg.normal_prop_until_iter
        )
        pulsed = jnp.where(is_prop_evt, 0.0, cfg.opacity_pulse_lr)
        opac_lr = jnp.where(in_window, pulsed, opac_lr)
    def opt_lr(v):
        return None if v is None else jnp.asarray(v, jnp.float32)

    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.asarray(cfg.features_dc, jnp.float32),
        features_rest=jnp.asarray(cfg.features_rest, jnp.float32),
        scaling=jnp.asarray(cfg.scaling, jnp.float32),
        rotation=jnp.asarray(cfg.rotation, jnp.float32),
        opacity=opac_lr,
        specular=jnp.asarray(cfg.specular, jnp.float32),
        roughness=jnp.asarray(cfg.roughness, jnp.float32),
        t=opt_lr(cfg.t),
        scaling_t=opt_lr(cfg.scaling_t),
        motion=opt_lr(cfg.motion),
    )


# ---------------------------------------------------------------------------
# Named LR schedulers (reference runners/schedulers.py): pure functions of
# the iteration, registered for config-driven lookup. `MultiLR` is omitted —
# it raises NotImplementedError in the reference itself.
# ---------------------------------------------------------------------------

def noop_lr(step, lr, **_):
    """NoopLR: constant lr (the EnvGS default, configs/models/envgs.yaml:18)."""
    return lr


def exponential_lr(step, lr, gamma: float = 0.1, decay_iter: int = 30000,
                   min_lr: float = 0.0, **_):
    """ExponentialLR with a floor (schedulers.py semantics)."""
    return jnp.maximum(lr * gamma ** (step / decay_iter), min_lr)


def warmup_exponential_lr(step, lr, gamma: float = 0.1,
                          decay_iter: int = 30000, warmup_iter: int = 500,
                          min_lr: float = 0.0, **_):
    """Linear warmup into the exponential decay."""
    warm = jnp.clip(step / jnp.maximum(warmup_iter, 1), 0.0, 1.0)
    return warm * exponential_lr(step, lr, gamma, decay_iter, min_lr)


from envgs_tpu.engine import SCHEDULERS  # noqa: E402

SCHEDULERS.register(noop_lr, name="NoopLR")
SCHEDULERS.register(exponential_lr, name="ExponentialLR")
SCHEDULERS.register(warmup_exponential_lr, name="WarmupExponentialLR")
