"""Reference differentiable 2D-Gaussian-surfel ray tracer (pure JAX, exact).

Replaces the reference's diff-surfel-tracing OptiX backend for arbitrary ray
grids (API contract reconstructed at
/root/reference/easyvolcap/utils/optix_utils.py:87-267): exact ray/splat-plane
intersection in the surfel's local frame, per-ray depth ordering, front-to-back
alpha blending with the same constants as the rasterizer. Rays follow the
tracer's convention: ray_d need not be normalized (z-depth scaling for primary
rays), and the blend depth is the ray PARAMETER t (so o + t*d reproduces the
hit point — the property the reflection pass relies on,
envgs_sampler.py:427).

Outputs mirror the tracer wrapper: rgb, dpt (weight-normalized expected t),
acc, norm (world-space, flipped against the ray), dist, aux (specular+
roughness), wet (per-splat accumulated weight).

O(P log P) per ray — ground truth + small scenes; the production Pallas
tracer (ops/tracer.py) is parity-tested against this.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.ops.common import ALPHA_MAX, ALPHA_MIN, T_CUTOFF
from envgs_tpu.utils.transforms import quat_to_rotmat


class TraceOutput(NamedTuple):
    rgb: jnp.ndarray  # (..., 3) includes bg
    dpt: jnp.ndarray  # (...,) normalized expected ray parameter
    acc: jnp.ndarray  # (...,)
    norm: jnp.ndarray  # (..., 3) world space, unnormalized
    dist: jnp.ndarray  # (...,)
    aux: jnp.ndarray  # (..., A) extra blended channels (spec+rough)
    wet: jnp.ndarray  # (P,)
    trans: jnp.ndarray  # (...,) final transmittance
    dropped_pairs: jnp.ndarray | None = None  # () candidate slots dropped by
    #   the tiled tracer's total_pair_cap tile clamp (0 = no truncation;
    #   None on the exact reference path). Surfaced in train stats so a
    #   quality-vs-cap regression is visible, not silent.
    # distortion moments Σw·m / Σw·m² — filled only by trace_rays
    # compose_raw=True (splat-slab composition needs the cross-slab
    # distortion term, parallel/splat_sharding.compose_trace_slabs)
    d1: jnp.ndarray | None = None  # (...,)
    d2: jnp.ndarray | None = None  # (...,)
    num_pairs: jnp.ndarray | None = None  # () CHUNK-aligned candidate slots
    #   actually used by the tiled tracer (bounds[-1]; None on the exact
    #   reference path) — observability for snugging total_pair_cap


class TraceScene(NamedTuple):
    """Per-splat world-space data prepared once per (frame, gaussian set)."""

    mean: jnp.ndarray  # (P, 3)
    t_u: jnp.ndarray  # (P, 3) tangent / scale_u
    t_v: jnp.ndarray  # (P, 3)
    normal: jnp.ndarray  # (P, 3) unit
    opacity: jnp.ndarray  # (P,)
    color: jnp.ndarray  # (P, 3)
    aux: jnp.ndarray  # (P, A)
    valid: jnp.ndarray  # (P,)


def prepare_trace_scene(
    means3d, quats, scales, opacities, colors, aux=None, active=None,
    scale_modifier: float = 1.0,
) -> TraceScene:
    P = means3d.shape[0]
    R = quat_to_rotmat(quats)
    su = scales[:, 0] * scale_modifier
    sv = scales[:, 1] * scale_modifier
    valid = jnp.ones((P,), bool) if active is None else active
    if aux is None:
        aux = jnp.zeros((P, 0), jnp.float32)
    return TraceScene(
        mean=means3d,
        t_u=R[..., :, 0] / jnp.maximum(su[:, None], 1e-12),
        t_v=R[..., :, 1] / jnp.maximum(sv[:, None], 1e-12),
        normal=R[..., :, 2],
        opacity=opacities * valid,
        color=colors,
        aux=aux,
        valid=valid,
    )


def _ray_hits(scene: TraceScene, o, d, t_min):
    """Per-splat intersection of one ray: (t, alpha_raw, n_flip)."""
    dn = jnp.sum(d[None, :] * scene.normal, axis=-1)  # (P,)
    dn_safe = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
    t = jnp.sum((scene.mean - o[None, :]) * scene.normal, axis=-1) / dn_safe
    p = o[None, :] + t[:, None] * d[None, :]
    delta = p - scene.mean
    u = jnp.sum(delta * scene.t_u, axis=-1)
    v = jnp.sum(delta * scene.t_v, axis=-1)
    rho = u * u + v * v
    G = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(ALPHA_MAX, scene.opacity * G)
    ok = (alpha >= ALPHA_MIN) & (t > t_min) & (jnp.abs(dn) >= 1e-9)
    alpha = jnp.where(ok, alpha, 0.0)
    # flip normals against the ray direction
    flip = jnp.where(dn > 0, -1.0, 1.0)
    return t, alpha, flip


def trace_rays_reference(
    scene: TraceScene,
    ray_o: jnp.ndarray,  # (..., 3)
    ray_d: jnp.ndarray,  # (..., 3) NOT normalized (z-depth convention ok)
    bg_color: jnp.ndarray,  # (3,)
    t_min: float = 1e-4,
) -> TraceOutput:
    P = scene.mean.shape[0]
    shape = ray_o.shape[:-1]
    o_flat = ray_o.reshape(-1, 3)
    d_flat = ray_d.reshape(-1, 3)

    def one_ray(o, d):
        t, alpha, flip = _ray_hits(scene, o, d, t_min)
        order = jnp.argsort(jnp.where(alpha > 0, t, jnp.inf))
        a_s = alpha[order]
        t_s = t[order]
        # bounded distortion mapping for arbitrary-scale ray parameters
        m_s = t_s / (1.0 + jnp.abs(t_s))
        log_om = jnp.log1p(-a_s)
        cum_ex = jnp.concatenate([jnp.zeros(1), jnp.cumsum(log_om)[:-1]])
        Ttil = jnp.exp(cum_ex)
        contrib = (a_s > 0) & (Ttil * (1.0 - a_s) >= T_CUTOFF)
        w = jnp.where(contrib, a_s * Ttil, 0.0)
        col_s = scene.color[order]
        n_s = (scene.normal * flip[:, None])[order]
        aux_s = scene.aux[order]
        acc = jnp.sum(w)
        rgb = jnp.sum(w[:, None] * col_s, axis=0)
        dptw = jnp.sum(w * t_s)
        nrm = jnp.sum(w[:, None] * n_s, axis=0)
        aux = jnp.sum(w[:, None] * aux_s, axis=0)
        A_pre = jnp.concatenate([jnp.zeros(1), jnp.cumsum(w)[:-1]])
        D1_pre = jnp.concatenate([jnp.zeros(1), jnp.cumsum(w * m_s)[:-1]])
        D2_pre = jnp.concatenate([jnp.zeros(1), jnp.cumsum(w * m_s * m_s)[:-1]])
        dist = jnp.sum(w * (m_s * m_s * A_pre + D2_pre - 2 * m_s * D1_pre))
        T_fin = jnp.exp(jnp.sum(jnp.where(contrib, log_om, 0.0)))
        # per-splat wet back in pool order
        wet = jnp.zeros((P,)).at[order].set(w)
        return rgb, dptw, acc, nrm, dist, aux, T_fin, wet

    rgb, dptw, acc, nrm, dist, aux, T_fin, wet = jax.vmap(one_ray)(
        o_flat, d_flat
    )
    rgb = rgb + T_fin[:, None] * bg_color[None, :]
    dpt = jnp.where(acc > 1e-8, dptw / jnp.maximum(acc, 1e-8), 0.0)
    A = scene.aux.shape[-1]
    return TraceOutput(
        rgb=rgb.reshape(*shape, 3),
        dpt=dpt.reshape(shape),
        acc=acc.reshape(shape),
        norm=nrm.reshape(*shape, 3),
        dist=dist.reshape(shape),
        aux=aux.reshape(*shape, A),
        wet=jnp.sum(wet, axis=0),
        trans=T_fin.reshape(shape),
    )
