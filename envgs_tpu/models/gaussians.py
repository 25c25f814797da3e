"""Fixed-capacity padded Gaussian-surfel pool (functional, jit-stable shapes).

TPU-native redesign of the reference's GaussianModel + adaptive density
control (/root/reference/easyvolcap/utils/gaussian2d_utils.py:265-933). The
reference mutates parameter SHAPES every densify step and performs Adam-state
surgery inside the torch optimizer; under XLA that would recompile every
step. Here the pool has a static capacity `cap` with an `active` mask:

- parameters: raw (pre-activation) arrays of shape (cap, ...);
- clone/split/prune become masked scatters into free slots;
- Adam moments live in a parallel pytree and are zeroed at slots that
  receive new children (matching cat_tensors_to_optimizer's zero-init,
  gaussian2d_utils.py:567-592) or whose parameter is wholly replaced
  (replace_tensor_to_optimizer, :517-534);
- densification statistics (grad/weight accumulators, denom, max radii)
  are accumulated inside the train step from the rasterizer's screen-space
  gradients rather than read off retained .grad tensors.

Everything in this module is shape-static and jit-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.utils.sh import num_sh_coeffs, rgb2sh0
from envgs_tpu.utils.transforms import quat_to_rotmat


# ---------------------------------------------------------------------------
# Activations (contracts at gaussian2d_utils.py:115-142)
# ---------------------------------------------------------------------------

def scaling_activation(x):
    return jnp.exp(x)


def scaling_inverse(x):
    return jnp.log(jnp.clip(x, 1e-6, 1e6))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def logit(x):
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    return jnp.log(x) - jnp.log1p(-x)


class GaussianParams(NamedTuple):
    """Learnable raw parameters (leading dim = pool capacity)."""

    xyz: jnp.ndarray  # (N, 3)
    features_dc: jnp.ndarray  # (N, 1, 3) SH degree-0
    features_rest: jnp.ndarray  # (N, K-1, 3) higher SH
    scaling: jnp.ndarray  # (N, 2) log-scale
    rotation: jnp.ndarray  # (N, 4) wxyz, unnormalized
    opacity: jnp.ndarray  # (N, 1) logit
    specular: jnp.ndarray  # (N, S) logit (S=1 or 3)
    roughness: jnp.ndarray  # (N, 1) logit
    # temporal extension (Spacetime Gaussians / STGS family; None for the
    # static families — None pytree nodes are empty, so every tree_map /
    # optimizer / maintenance path stays schema-compatible).
    # Reference: stgs_utils.py:228-275 (create_from_pcd temporal params).
    t: jnp.ndarray | None = None  # (N, 1) temporal center
    scaling_t: jnp.ndarray | None = None  # (N, 1) log temporal scale
    motion: jnp.ndarray | None = None  # (N, 3) linear velocity


class GaussianStats(NamedTuple):
    """Non-learnable pool state."""

    active: jnp.ndarray  # (N,) bool
    max_radii2d: jnp.ndarray  # (N,)
    grad_accum: jnp.ndarray  # (N,) accumulated screen-grad norms
    weight_accum: jnp.ndarray  # (N,) accumulated blend weights
    denom: jnp.ndarray  # (N,) visible-frame counts
    sh_degree: jnp.ndarray  # () int32 active SH degree


class GaussianPool(NamedTuple):
    params: GaussianParams
    stats: GaussianStats
    max_sh_degree: int  # static

    @property
    def cap(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def n_active(self) -> jnp.ndarray:
        return jnp.sum(self.stats.active.astype(jnp.int32))

    # post-activation views -------------------------------------------------
    @property
    def get_scaling(self):
        return scaling_activation(self.params.scaling)

    @property
    def get_opacity(self):
        return sigmoid(self.params.opacity)

    @property
    def get_specular(self):
        return sigmoid(self.params.specular)

    @property
    def get_roughness(self):
        return sigmoid(self.params.roughness)

    @property
    def get_features(self):
        return jnp.concatenate([self.params.features_dc, self.params.features_rest], axis=1)


jax.tree_util.register_pytree_node(
    GaussianPool,
    lambda p: ((p.params, p.stats), (p.max_sh_degree,)),
    lambda aux, ch: GaussianPool(ch[0], ch[1], aux[0]),
)


def create_pool(
    xyz: np.ndarray,
    colors: np.ndarray | None,
    cap: int,
    sh_degree: int = 3,
    init_sh_degree: int = 0,
    init_opacity: float = 0.1,
    init_scales: np.ndarray | None = None,
    specular_channels: int = 1,
    init_specular: float = 1e-3,
    init_roughness: float = 0.5,
    seed: int = 0,
    scale_axes: int = 2,
    times: np.ndarray | None = None,
    init_scale_t: float = 0.1414,
    sh_degree_t: int = 0,
) -> GaussianPool:
    """Build a pool from an initial point cloud (host-side numpy).

    Semantics of create_from_pcd (gaussian2d_utils.py:410-467): scales from
    3-NN mean distance, random rotations, constant opacity/specular/roughness.
    """
    from envgs_tpu.utils.knn import init_scales_from_dist

    P = int(xyz.shape[0])
    assert P <= cap, f"init points {P} exceed pool capacity {cap}"
    # sh_degree_t > 0: 4D SH (spatial blocks x cosine temporal harmonics,
    # sh_utils.py:731-1097) — extra temporal blocks ride features_rest
    K = num_sh_coeffs(sh_degree) * (sh_degree_t + 1)
    rng = np.random.default_rng(seed)

    f_dc = np.zeros((cap, 1, 3), np.float32)
    if colors is not None:
        f_dc[:P, 0] = np.asarray(rgb2sh0(jnp.asarray(colors, jnp.float32)))
    f_rest = np.zeros((cap, K - 1, 3), np.float32)

    # scale_axes: 2 = surfels (2DGS), 3 = full 3D Gaussians (3DGS family)
    scales = np.zeros((cap, scale_axes), np.float32)
    if init_scales is not None:
        scales[:P] = init_scales
    elif P > 1:
        scales[:P] = np.repeat(
            init_scales_from_dist(xyz)[:, :1], scale_axes, axis=-1
        )

    xyz_full = np.zeros((cap, 3), np.float32)
    xyz_full[:P] = xyz
    rots = rng.random((cap, 4)).astype(np.float32)  # matches torch.rand init
    opac = np.full((cap, 1), float(logit(jnp.asarray(init_opacity))), np.float32)
    spec = np.full(
        (cap, specular_channels), float(logit(jnp.asarray(init_specular))), np.float32
    )
    rough = np.full((cap, 1), float(logit(jnp.asarray(init_roughness))), np.float32)

    temporal = {}
    if times is not None:
        # STGS temporal params (stgs_utils.py:259-275): t from the input
        # times, sqrt-scale inverse activation for scaling_t, zero motion
        t_full = np.zeros((cap, 1), np.float32)
        t_full[:P] = np.asarray(times, np.float32).reshape(P, 1)
        temporal = dict(
            t=jnp.asarray(t_full),
            scaling_t=jnp.full((cap, 1), np.log(max(init_scale_t, 1e-6)),
                               jnp.float32),
            motion=jnp.zeros((cap, 3), jnp.float32),
        )
    params = GaussianParams(
        xyz=jnp.asarray(xyz_full),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        scaling=jnp.asarray(scales),
        rotation=jnp.asarray(rots),
        opacity=jnp.asarray(opac),
        specular=jnp.asarray(spec),
        roughness=jnp.asarray(rough),
        **temporal,
    )
    active = np.zeros((cap,), bool)
    active[:P] = True
    stats = GaussianStats(
        active=jnp.asarray(active),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        grad_accum=jnp.zeros((cap,), jnp.float32),
        weight_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        sh_degree=jnp.asarray(init_sh_degree, jnp.int32),
    )
    return GaussianPool(params, stats, sh_degree)


def sh_degree_mask(active_deg: jnp.ndarray, max_deg: int) -> jnp.ndarray:
    """(K,) 0/1 mask enabling SH coefficients of degree <= active_deg.

    Lets a traced active degree gate SH evaluation without recompiling
    (replaces the reference's python-level active_sh_degree switch).
    """
    K = num_sh_coeffs(max_deg)
    idx = jnp.arange(K)
    deg_of = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (deg_of <= active_deg).astype(jnp.float32)


def oneup_sh_degree(pool: GaussianPool) -> GaussianPool:
    new = jnp.minimum(pool.stats.sh_degree + 1, pool.max_sh_degree)
    return pool._replace(stats=pool.stats._replace(sh_degree=new))


# ---------------------------------------------------------------------------
# Stats accumulation (add_densification_stats, gaussian2d_utils.py:901-909)
# ---------------------------------------------------------------------------

def accumulate_stats(
    stats: GaussianStats,
    screen_grad: jnp.ndarray,  # (N, 2 or 3) d(loss)/d(means2d) from the vjp
    visibility: jnp.ndarray,  # (N,) bool
    weight: jnp.ndarray | None = None,  # (N,) per-splat blend weight sums
    radii: jnp.ndarray | None = None,  # (N,) screen radii
) -> GaussianStats:
    vis = visibility & stats.active
    gnorm = jnp.linalg.norm(screen_grad, axis=-1)
    stats = stats._replace(
        denom=stats.denom + vis.astype(jnp.float32),
        grad_accum=stats.grad_accum + jnp.where(vis, gnorm, 0.0),
    )
    if weight is not None:
        stats = stats._replace(
            weight_accum=stats.weight_accum + jnp.where(vis, weight, 0.0)
        )
    if radii is not None:
        stats = stats._replace(
            max_radii2d=jnp.where(
                vis, jnp.maximum(stats.max_radii2d, radii), stats.max_radii2d
            )
        )
    return stats


def _avg(accum, denom):
    return jnp.where(denom > 0, accum / jnp.maximum(denom, 1.0), 0.0)


def _masked_quantile(x, mask, q):
    """Quantile of x over mask=True entries (linear interpolation)."""
    big = jnp.inf
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask.astype(jnp.int32))
    pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    v = xs[lo] * (1 - frac) + xs[hi] * frac
    return jnp.where(n > 0, v, 0.0)


# ---------------------------------------------------------------------------
# Densify / prune (densify_and_prune, gaussian2d_utils.py:679-899)
# ---------------------------------------------------------------------------

class DensifyConfig(NamedTuple):
    densify_grad_threshold: float = 0.0002
    densify_size_threshold: float = 0.01
    min_opacity: float = 0.05
    min_gradient: float | None = None
    split_screen_threshold: float | None = None
    max_scene_threshold: float | None = 0.1
    max_screen_threshold: float | None = None
    min_weight_threshold: float | None = None
    prune_large_gs: bool = True
    prune_visibility: bool = False
    spatial_scale: float = 1.0
    max_gs: int = 2_000_000
    max_gs_threshold: float = 0.9
    split_ratio: float = 0.8  # children scale divisor = ratio * N
    split_n: int = 2
    # weight-quantile split (too-big & not-low-weight) recipe — the
    # reference hardcodes split(mask, N=5, ratio=0.5)
    # (gaussian2d_utils.py:836-847)
    weight_split_n: int = 5
    weight_split_ratio: float = 0.5


def _write_children(params: GaussianParams, adam_tree, child: GaussianParams,
                    want: jnp.ndarray, slots: jnp.ndarray):
    """Scatter child params into `slots` (drop out-of-range), zero adam there."""
    safe = jnp.where(want, slots, params.xyz.shape[0])  # cap = OOB -> dropped

    def scatter(dst, src):
        return dst.at[safe].set(src, mode="drop")

    new_params = GaussianParams(*[
        scatter(d, s) if d is not None else None
        for d, s in zip(params, child)
    ])
    if adam_tree is not None:
        adam_tree = jax.tree_util.tree_map(
            lambda m: m.at[safe].set(jnp.zeros_like(m[safe]), mode="drop")
            if m.ndim >= 1 and m.shape[0] == params.xyz.shape[0]
            else m,
            adam_tree,
        )
    return new_params, adam_tree


def densify_and_prune(
    pool: GaussianPool,
    adam_tree,
    cfg: DensifyConfig,
    key: jax.Array,
):
    """One adaptive-density-control step (jit-compatible, static shapes).

    Decision masks are computed from the pre-step statistics; children are
    allocated into inactive slots (dropped if the pool is full); all stats
    reset afterwards (reset_stats semantics, gaussian2d_utils.py:633-638).
    `adam_tree` is the optimizer-moment pytree aligned with GaussianParams
    (or None); moments at slots receiving children are zeroed.
    """
    p, s = pool.params, pool.stats
    cap = pool.cap
    active = s.active
    grads = _avg(s.grad_accum, s.denom)
    weights = _avg(s.weight_accum, s.denom)
    scal = scaling_activation(p.scaling)
    max_scale = jnp.max(scal, axis=-1)
    high_grad = grads >= cfg.densify_grad_threshold

    small = max_scale <= cfg.densify_size_threshold * cfg.spatial_scale
    clone_mask = active & high_grad & small
    split_big = max_scale > cfg.densify_size_threshold * cfg.spatial_scale
    if cfg.split_screen_threshold is not None:
        split_big = split_big | (s.max_radii2d > cfg.split_screen_threshold)
    split_mask = active & high_grad & split_big

    # prune by min opacity / min gradient (gaussian2d_utils.py:759-792)
    opac = sigmoid(p.opacity[:, 0])
    prune = active & (opac < cfg.min_opacity)
    if cfg.min_gradient is not None:
        prune = prune | (active & (grads <= cfg.min_gradient) & (s.denom > 0))

    # prune/split by max scene/screen size + weight quantile (:794-847)
    weight_split_mask = jnp.zeros_like(active)
    if cfg.prune_large_gs:
        too_big = jnp.zeros_like(active)
        if cfg.max_screen_threshold is not None:
            too_big = too_big | (s.max_radii2d > cfg.max_screen_threshold)
        if cfg.max_scene_threshold is not None:
            too_big = too_big | (
                max_scale > cfg.spatial_scale * cfg.max_scene_threshold
            )
        too_big = too_big & active
        if cfg.min_weight_threshold is not None:
            wq = _masked_quantile(weights, active, cfg.min_weight_threshold)
            low_w = weights < wq
            prune = prune | (too_big & low_w)
            weight_split_mask = too_big & (~low_w)
        else:
            prune = prune | too_big

    # a gradient-split parent is pruned by split() before the reference's
    # prune_large_gs pass could ever see it (:711-715) — keep the masks
    # exclusive so one parent never splits under both recipes in one call
    weight_split_mask = weight_split_mask & ~split_mask

    # split parents are pruned as well (:711-715)
    parents_gone = prune | split_mask | weight_split_mask

    # --- build children ----------------------------------------------------
    # Children ordering in free slots: clones first, then split children.
    free_rank = jnp.cumsum((~active).astype(jnp.int32)) - 1  # rank of each free slot
    # slot index for the k-th free slot: invert via scatter
    free_slots = jnp.full((cap,), cap, jnp.int32)
    free_slots = free_slots.at[jnp.where(~active, free_rank, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )

    def alloc(want, base):
        """Assign the i-th wanted child the (base + rank)-th free slot."""
        rank = jnp.cumsum(want.astype(jnp.int32)) - 1
        return free_slots[jnp.clip(base + rank, 0, cap - 1)], base + jnp.sum(
            want.astype(jnp.int32)
        )

    # clone: exact copy (gaussian2d_utils.py:679-690)
    base = jnp.asarray(0, jnp.int32)
    clone_slots, base = alloc(clone_mask, base)
    params, adam_tree = _write_children(p, adam_tree, p, clone_mask, clone_slots)

    # split: N children sampled along the surfel plane, scale/(ratio*N),
    # parents pruned (:692-716). Gradient-split uses (split_n, split_ratio)
    # = (2, 0.8); weight-split uses the reference's exact (5, 0.5) (:840) —
    # separate static loops, so both recipes run at their own N per call.
    R = quat_to_rotmat(p.rotation)
    if scal.shape[-1] == 2:  # surfel: sample offsets in the tangent plane
        stds3 = jnp.concatenate([scal, jnp.zeros_like(scal[:, :1])], axis=-1)
    else:  # full 3D Gaussian
        stds3 = scal

    split_groups = [(split_mask, cfg.split_n, cfg.split_ratio),
                    (weight_split_mask, cfg.weight_split_n,
                     cfg.weight_split_ratio)]

    for mask_g, n_g, ratio_g in split_groups:
        child_scaling = scaling_inverse(scal / (ratio_g * n_g))
        for i in range(n_g):
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, stds3.shape) * stds3
            offs = jnp.einsum("nij,nj->ni", R, eps)
            child = p._replace(
                xyz=p.xyz + offs,
                scaling=child_scaling,
            )
            slots_i, base = alloc(mask_g, base)
            params, adam_tree = _write_children(params, adam_tree, child,
                                                mask_g, slots_i)

    # track which children actually landed (slots within capacity)
    n_free = jnp.sum((~active).astype(jnp.int32))
    # child k landed iff its assigned rank < n_free; recompute activation map:
    new_active = active & (~parents_gone)
    for want, slots in [(clone_mask, clone_slots)]:
        new_active = new_active.at[jnp.where(want, slots, cap)].set(True, mode="drop")
    # re-derive split slots for activation (same ranks as in the loops)
    base2 = jnp.sum(clone_mask.astype(jnp.int32))
    for mask_g, n_g, _ratio_g in split_groups:
        for i in range(n_g):
            rank = jnp.cumsum(mask_g.astype(jnp.int32)) - 1
            slots_i = free_slots[jnp.clip(base2 + rank, 0, cap - 1)]
            new_active = new_active.at[jnp.where(mask_g, slots_i, cap)].set(
                True, mode="drop"
            )
            base2 = base2 + jnp.sum(mask_g.astype(jnp.int32))

    # --- budget enforcement (prune_visibility, :849-865) --------------------
    if cfg.prune_visibility:
        target = int(cfg.max_gs * cfg.max_gs_threshold)
        n_act = jnp.sum(new_active.astype(jnp.int32))
        # children have no weight stats yet -> exempt (weight = +inf)
        w_eff = jnp.where(active, weights, jnp.inf)
        w_eff = jnp.where(new_active, w_eff, jnp.inf)
        order = jnp.argsort(w_eff)  # ascending: lowest-weight first
        n_prune = jnp.maximum(n_act - target, 0)
        kill_rank = jnp.zeros((cap,), jnp.int32).at[order].set(
            jnp.arange(cap, dtype=jnp.int32)
        )
        new_active = new_active & ~(kill_rank < n_prune)

    stats = GaussianStats(
        active=new_active,
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        grad_accum=jnp.zeros((cap,), jnp.float32),
        weight_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        sh_degree=s.sh_degree,
    )
    return GaussianPool(params, stats, pool.max_sh_degree), adam_tree


# ---------------------------------------------------------------------------
# Parameter resets (3DGS-DR training tricks; gaussian2d_utils.py:482-515)
# ---------------------------------------------------------------------------

def _zero_adam_for(adam_tree, field: str):
    """Zero the optimizer moments of one GaussianParams field."""
    if adam_tree is None:
        return None
    return jax.tree_util.tree_map_with_path(
        lambda path, m: jnp.zeros_like(m)
        if any(getattr(k, "name", None) == field for k in path)
        else m,
        adam_tree,
    )


def reset_opacity(pool: GaussianPool, adam_tree, value: float = 0.01):
    new = jnp.minimum(pool.params.opacity, logit(jnp.asarray(value)))
    return (
        pool._replace(params=pool.params._replace(opacity=new)),
        _zero_adam_for(adam_tree, "opacity"),
    )


def reset_specular(pool: GaussianPool, adam_tree, value: float = 1e-3,
                   reset_all: bool = False):
    tgt = logit(jnp.asarray(value))
    new = jnp.full_like(pool.params.specular, tgt) if reset_all else jnp.minimum(
        pool.params.specular, tgt
    )
    return (
        pool._replace(params=pool.params._replace(specular=new)),
        _zero_adam_for(adam_tree, "specular"),
    )


def enlarge_opacity(pool: GaussianPool, adam_tree, value: float = 0.9):
    new = jnp.maximum(pool.params.opacity, logit(jnp.asarray(value)))
    return (
        pool._replace(params=pool.params._replace(opacity=new)),
        _zero_adam_for(adam_tree, "opacity"),
    )


def enlarge_scaling(pool: GaussianPool, adam_tree, ratio: float = 1.5,
                    threshold: float = 0.02):
    """Enlarge scaling of low-specular splats (normal propagation trick)."""
    low_spec = jnp.max(sigmoid(pool.params.specular), -1) < threshold  # (N,)
    new = jnp.where(
        low_spec[:, None],
        pool.params.scaling,  # low-specular keep (reference keeps masked)
        scaling_inverse(scaling_activation(pool.params.scaling) * ratio),
    )
    return (
        pool._replace(params=pool.params._replace(scaling=new)),
        _zero_adam_for(adam_tree, "scaling"),
    )


def distort_color(pool: GaussianPool, adam_tree, key: jax.Array,
                  rng_range: float = 0.4, threshold: float = 0.05):
    """Color sabotage: randomize dc color of low-specular splats."""
    low_spec = jnp.max(sigmoid(pool.params.specular), -1) <= threshold
    noise = (jax.random.uniform(key, pool.params.features_dc.shape) * 2 - 1) * rng_range
    new = jnp.where(
        low_spec[:, None, None], pool.params.features_dc + noise, pool.params.features_dc
    )
    return (
        pool._replace(params=pool.params._replace(features_dc=new)),
        _zero_adam_for(adam_tree, "features_dc"),
    )
