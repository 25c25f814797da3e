"""EnvGS model: base surfels (rasterized) + environment surfels (ray-traced
along reflected rays), composited by the blended specular map.

Functional, fully jittable forward replicating the reference EnvGSSampler
pipeline (/root/reference/easyvolcap/models/samplers/envgs_sampler.py:482-566):

  base pass (tile rasterizer, 5/7-channel: rgb+specular+roughness)
    -> reflect rays off the rendered depth + normal
    -> environment pass (surfel tracer, start_from_first=False)
    -> rgb = (1 - specular) * rgb_base + specular * rgb_env

Differences by design: the reflection gate (iter >= reflection_start_iter)
is a lax.cond so the step never recompiles; screen/world-space densification
gradients come from the injected zero tensors (means2d_zero / env_means3d_zero)
instead of retained .grad buffers.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from envgs_tpu.models.gaussians import GaussianPool, sh_degree_mask
from envgs_tpu.ops import tracer
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import RenderOutput, rasterize, render_decode
from envgs_tpu.ops.tracer_ref import prepare_trace_scene, trace_rays_reference
from envgs_tpu.utils.camera import Camera, get_rays
from envgs_tpu.utils.sh import eval_sh_color
from envgs_tpu.utils.transforms import normalize, reflect


class EnvGSConfig(NamedTuple):
    """Static forward hyperparameters (part of the jit cache key)."""

    specular_channels: int = 1
    render_reflection: bool = True
    reflection_start_iter: int = 3000
    depth_ratio: float = 0.0
    bg_brightness: float = 0.0
    env_bg_brightness: float = 0.0
    detach_reflection: bool = False
    scale_modifier: float = 1.0
    raster_backend: str = "pallas"
    tracer_backend: str = "tiled"
    pair_cap: int = 2 ** 21
    env_pair_cap: int = 2 ** 20
    # base pass via the surfel tracer on camera rays instead of the
    # rasterizer (use_base_tracing + start_from_first=True contract,
    # envgs_sampler.py:501-527 / optix_utils.py:203-235)
    use_base_tracing: bool = False
    # recursive specular bounces in the env pass (max_trace_depth,
    # optix_utils.py:104-119); all shipped EnvGS configs use 0
    max_trace_depth: int = 0
    specular_threshold: float = 0.0
    # reflection ray filtering (envgs_sampler.py:434-447): <=0 disables
    specular_filtering_start_iter: int = -1
    specular_filtering_percent: float = 0.9
    acc_filtering_start_iter: int = -1
    # Pure-render mode: strips training-only kernel work (distortion prefix
    # sums, per-pair wet accumulation + segment reduction, median depth when
    # depth_ratio == 0) from the Pallas blend kernels. Forward outputs that
    # feed losses/densification (dist_map, wet, visibility-from-wet) become
    # zeros; rgb/depth/normal/acc are bit-identical. Autodiff ignores the
    # flag (the VJP forward always computes everything).
    render_mode: bool = False
    # Eval-time EXACT per-ray blend order in the tiled tracer (re-blends
    # each tile's candidate window with the oracle's per-ray depth sort,
    # ops/tracer.py::_trace_tiles_exact) — bounds the production radial-
    # order approximation on trained scenes. Slow; eval/parity runs only.
    tracer_exact_order: bool = False


def _bisect_quantile01(x: jnp.ndarray, q: float, iters: int = 10) -> jnp.ndarray:
    """Approximate q-quantile of values in [0, 1] by threshold bisection.

    Each step is one elementwise compare + mean (bandwidth-bound) instead of
    jnp.quantile's full sort; after `iters` steps the threshold is within
    2^-iters of the exact quantile. Replaces torch.quantile in the reference
    reflection filter (envgs_sampler.py:441) at far lower TPU cost.
    """
    n = x.size

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        frac_below = jnp.sum(x <= mid) / n
        lo = jnp.where(frac_below < q, mid, lo)
        hi = jnp.where(frac_below < q, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(
        0, iters, body, (jnp.asarray(0.0, x.dtype), jnp.asarray(1.0, x.dtype))
    )
    return 0.5 * (lo + hi)


def _pool_colors(pool: GaussianPool, viewdir_origin: jnp.ndarray) -> jnp.ndarray:
    """Per-splat SH colors toward `viewdir_origin` with active-degree mask.

    Matches convert_SHs_python (gaussian2d_utils.py:1071-1076) — per-splat
    (not per-pixel) view directions, the standard 3DGS approximation.
    """
    feats = pool.get_features  # (P, K, 3)
    mask = sh_degree_mask(pool.stats.sh_degree, pool.max_sh_degree)
    feats = feats * mask[None, :, None]
    dirs = normalize(pool.params.xyz - viewdir_origin[None, :])
    sh = jnp.swapaxes(feats, 1, 2)  # (P, 3, K)
    return eval_sh_color(pool.max_sh_degree, sh, dirs)


def render_base(
    pool: GaussianPool,
    cam: Camera,
    cfg: EnvGSConfig,
    means2d_zero: jnp.ndarray | None = None,
    wet_zero: jnp.ndarray | None = None,
    band: tuple | None = None,
) -> RenderOutput:
    """Rasterize the base (diffuse+specular-mask) Gaussian set.

    wet_zero (P,) zeros: per-splat wet arrives as d(loss)/d(wet_zero)
    (means2d_zero trick); RenderOutput.wet is then exact zeros.

    band = (row0 traced, H_full static): render rows [row0, row0+cam.H) of
    the FULL H_full-row image whose intrinsics cam.K holds (row-crop
    contract: bit-identical to the matching rows of a full render — see
    rasterize(row_window))."""
    colors = _pool_colors(pool, cam.center)
    if cfg.render_reflection:
        colors = jnp.concatenate(
            [colors, pool.get_specular, pool.get_roughness], axis=-1
        )
    row_window = None
    cam_proj = cam
    if band is not None:
        row0, H_full = band[0], band[1]
        row_window = (row0, cam.H)
        cam_proj = Camera(H_full, cam.W, cam.K, cam.R, cam.T,
                         cam.znear, cam.zfar)
    prep = prepare_splats(
        pool.params.xyz,
        pool.params.rotation,
        pool.get_scaling,
        pool.get_opacity[:, 0],
        colors,
        cam_proj,
        scale_modifier=cfg.scale_modifier,
        active=pool.stats.active,
    )
    bg = jnp.full((3,), cfg.bg_brightness, jnp.float32)
    train = not cfg.render_mode
    out = rasterize(
        prep, cam_proj, bg, backend=cfg.raster_backend,
        pair_cap=cfg.pair_cap, means2d_zero=means2d_zero,
        needs=(train, train or cfg.depth_ratio > 0, train),
        wet_zero=wet_zero if cfg.raster_backend != "ref" else None,
        row_window=row_window,
    )
    return render_decode(
        out, cam,
        specular_channels=cfg.specular_channels if cfg.render_reflection else 0,
        depth_ratio=cfg.depth_ratio,
        i0=None if band is None else band[0],
    )


def render_base_traced(
    pool: GaussianPool,
    cam: Camera,
    cfg: EnvGSConfig,
    means3d_zero: jnp.ndarray | None = None,
    wet_zero: jnp.ndarray | None = None,
    band: tuple | None = None,
) -> RenderOutput:
    """Base pass via the surfel tracer on camera rays (use_base_tracing).

    Follows the HardwareRendering start_from_first=True contract
    (optix_utils.py:203-235): visibility = traced weight > 0 OR in-frustum
    projection, surface normal derived from the traced depth map. The
    specular/roughness channels ride the tracer's aux channels."""
    from envgs_tpu.ops.raster import depth_to_normal

    xyz = pool.params.xyz
    if means3d_zero is not None:
        xyz = xyz + means3d_zero
    colors = _pool_colors(pool, cam.center)
    aux = None
    if cfg.render_reflection:
        aux = jnp.concatenate([pool.get_specular, pool.get_roughness], -1)
    scene = prepare_trace_scene(
        xyz,
        pool.params.rotation,
        pool.get_scaling,
        pool.get_opacity[:, 0],
        colors,
        aux=aux,
        active=pool.stats.active,
        scale_modifier=cfg.scale_modifier,
    )
    i0 = None if band is None else band[0]
    o, d = get_rays(cam, z_depth=True, i0=i0)
    ray_o = jnp.broadcast_to(o[None, None, :], d.shape)
    bg = jnp.full((3,), cfg.bg_brightness, jnp.float32)
    if cfg.tracer_backend == "ref":
        t = trace_rays_reference(scene, ray_o, d, bg)
    else:
        train = not cfg.render_mode
        t = tracer.trace_rays(scene, ray_o, d, bg,
                              backend=cfg.tracer_backend,
                              total_pair_cap=cfg.pair_cap,
                              needs=(train, train), wet_zero=wet_zero,
                              exact_order=cfg.tracer_exact_order)
    # in-frustum projection visibility (optix_utils.py:203-213)
    cam_proj = cam
    if band is not None:
        cam_proj = Camera(band[1], cam.W, cam.K, cam.R, cam.T,
                          cam.znear, cam.zfar)
    prep = prepare_splats(
        xyz, pool.params.rotation, pool.get_scaling, pool.get_opacity[:, 0],
        colors, cam_proj, scale_modifier=cfg.scale_modifier,
        active=pool.stats.active,
    )
    S = cfg.specular_channels if cfg.render_reflection else 0
    spec = t.aux[..., :S] if S else None
    rough = t.aux[..., S:S + 1] if S else None
    alpha = t.acc[..., None]
    depth = t.dpt[..., None]
    surf_normal = depth_to_normal(cam, depth[..., 0], i0=i0)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)
    return RenderOutput(
        rgb=t.rgb,
        specular=spec,
        roughness=rough,
        alpha=alpha,
        normal_world=t.norm,
        depth_expected=depth,
        depth_median=jax.lax.stop_gradient(depth),
        surf_depth=depth,
        surf_normal=surf_normal,
        distortion=t.dist[..., None],
        wet=t.wet,
        radii=prep.radius,
        visibility=(t.wet > 0) | (prep.radius > 0),
    )


def reflect_rays(cam: Camera, base: RenderOutput, i0=None):
    """Reflected ray grid from the base pass (envgs_sampler.py:420-455)."""
    o, d = get_rays(cam, z_depth=True, i0=i0)  # d NOT normalized (z-depth)
    n = normalize(base.normal_world)
    ref_d = reflect(d, n)
    ref_o = o[None, None, :] + d * base.surf_depth
    return ref_o, ref_d


def render_env(
    env: GaussianPool,
    ref_o: jnp.ndarray,
    ref_d: jnp.ndarray,
    cfg: EnvGSConfig,
    env_means3d_zero: jnp.ndarray | None = None,
    ray_mask: jnp.ndarray | None = None,
    wet_zero: jnp.ndarray | None = None,
    band_axis: str | None = None,
):
    """Trace the environment Gaussian set along reflected rays."""
    xyz = env.params.xyz
    if env_means3d_zero is not None:
        xyz = xyz + env_means3d_zero
    colors = _pool_colors_at(env, ref_o, band_axis=band_axis)
    aux = None
    if cfg.max_trace_depth > 0:
        # recursive bounces need the env set's own specular/roughness
        aux = jnp.concatenate([env.get_specular, env.get_roughness], -1)
    scene = prepare_trace_scene(
        xyz,
        env.params.rotation,
        env.get_scaling,
        env.get_opacity[:, 0],
        colors,
        aux=aux,
        active=env.stats.active,
        scale_modifier=cfg.scale_modifier,
    )
    bg = jnp.full((3,), cfg.env_bg_brightness, jnp.float32)
    if cfg.max_trace_depth > 0:
        out, _mid = tracer.trace_rays_multibounce(
            scene, ref_o, ref_d, bg, max_trace_depth=cfg.max_trace_depth,
            specular_threshold=cfg.specular_threshold,
            backend=cfg.tracer_backend, total_pair_cap=cfg.env_pair_cap,
            ray_mask=ray_mask,
        )
        return out
    if cfg.tracer_backend == "ref":
        return trace_rays_reference(scene, ref_o, ref_d, bg)
    train = not cfg.render_mode
    # need_geo=False additionally strips normal/aux/depth accumulation from
    # the env blend (the composite consumes only rgb in pure render)
    return tracer.trace_rays(scene, ref_o, ref_d, bg,
                             backend=cfg.tracer_backend,
                             total_pair_cap=cfg.env_pair_cap,
                             ray_mask=ray_mask, needs=(train, train, train),
                             wet_zero=wet_zero,
                             exact_order=cfg.tracer_exact_order)


def _pool_colors_at(pool: GaussianPool, ref_o: jnp.ndarray,
                    band_axis: str | None = None) -> jnp.ndarray:
    """Env SH colors; view direction approximated from the mean ray origin
    (the tracer evaluates SH per-splat like the rasterizer; the reference
    tracer evaluates per-splat SH along the hit direction in-kernel — for
    far-field environment Gaussians the mean-origin direction is the
    standard approximation).

    The mean is computed hierarchically over 16-row blocks so a band-
    parallel run (band_axis set: all_gather the block means over the mesh
    axis) produces the bit-identical IMAGE-global origin — the per-block
    reductions and the final (H/16, 3) reduction run on the same values
    and shapes on every path."""
    Hb, W = ref_o.shape[0], ref_o.shape[1]
    if Hb % 16 != 0:
        # non-tile-aligned H: flat mean (band decomposition requires
        # 16-row-aligned bands, so this is always a single-image call)
        assert band_axis is None, (Hb, band_axis)
        return _pool_colors(pool, jnp.mean(ref_o.reshape(-1, 3), axis=0))
    bm = jnp.mean(ref_o.reshape(Hb // 16, 16 * W, 3), axis=1)  # (nb, 3)
    if band_axis is not None:
        bm = jax.lax.all_gather(bm, band_axis, tiled=True)
    origin = jnp.mean(bm, axis=0)
    return _pool_colors(pool, origin)


class EnvGSOutput(NamedTuple):
    rgb_map: jnp.ndarray  # (H, W, 3) final composite
    dif_rgb_map: jnp.ndarray  # (H, W, 3) diffuse part
    ref_rgb_map: jnp.ndarray  # (H, W, 3) reflection (vis-scaled)
    env_rgb_map: jnp.ndarray  # (H, W, 3) raw environment render
    spec_map: jnp.ndarray  # (H, W, S)
    rough_map: jnp.ndarray  # (H, W, 1)
    acc_map: jnp.ndarray  # (H, W, 1)
    dpt_map: jnp.ndarray  # (H, W, 1)
    norm_map: jnp.ndarray  # (H, W, 3) world, unnormalized
    dist_map: jnp.ndarray  # (H, W, 1)
    surf_norm_map: jnp.ndarray  # (H, W, 3)
    env_dpt_map: jnp.ndarray  # (H, W, 1)
    env_acc_map: jnp.ndarray  # (H, W, 1)
    ref_o: jnp.ndarray  # (H, W, 3)
    ref_d: jnp.ndarray  # (H, W, 3)
    # densification signals
    base_wet: jnp.ndarray  # (P,)
    base_radii: jnp.ndarray  # (P,)
    base_visibility: jnp.ndarray  # (P,) bool
    env_wet: jnp.ndarray  # (Pe,)
    env_visibility: jnp.ndarray  # (Pe,) bool
    env_opacity: jnp.ndarray  # (Pe, 1) post-activation (sparsity loss)
    # capacity truncation counters (0 = nothing silently dropped)
    base_num_pairs: jnp.ndarray | None = None  # () raster pre-clamp pairs
    env_dropped_pairs: jnp.ndarray | None = None  # () tracer dropped slots
    env_num_pairs: jnp.ndarray | None = None  # () tracer CHUNK-aligned fill


def forward_envgs(
    base: GaussianPool,
    env: GaussianPool,
    cam: Camera,
    it: jnp.ndarray,
    cfg: EnvGSConfig,
    means2d_zero: jnp.ndarray | None = None,
    env_means3d_zero: jnp.ndarray | None = None,
    wet_zero: jnp.ndarray | None = None,
    env_wet_zero: jnp.ndarray | None = None,
    base_pass=None,
    env_pass=None,
    band: tuple | None = None,
) -> EnvGSOutput:
    """wet_zero / env_wet_zero: (P,)/(Pe,) zeros hooks — when given, the
    per-splat accumulated blend weights arrive as their COTANGENTS (the
    means2d_zero trick) and base_wet/env_wet outputs are exact zeros;
    the trainer then derives visibility from the gradients.

    base_pass / env_pass: injectable replacements for the two render passes
    (same signatures as render_base / render_env) — the splat-slab
    model-parallel path (parallel/splat_sharding.py) supplies slab-sharded
    versions while every composite/filter/gate stage here stays shared.

    band = (row0 traced, H_full static): this call renders rows
    [row0, row0+cam.H) of an H_full-row image; cam carries the FULL-image
    intrinsics (band-parallel row-crop contract — the band output is
    bit-identical to the matching rows of the full render)."""
    i0 = None if band is None else band[0]
    if base_pass is not None:
        b = base_pass(base, cam, cfg, means2d_zero, wet_zero=wet_zero)
    elif cfg.use_base_tracing:
        b = render_base_traced(base, cam, cfg, means2d_zero,
                               wet_zero=wet_zero, band=band)
    else:
        b = render_base(base, cam, cfg, means2d_zero, wet_zero=wet_zero,
                        band=band)
    H, W = cam.H, cam.W
    spec = b.specular if b.specular is not None else jnp.zeros((H, W, 1))
    rough = b.roughness if b.roughness is not None else jnp.zeros((H, W, 1))

    ref_o, ref_d = reflect_rays(cam, b, i0=i0)
    if cfg.detach_reflection:
        ref_o = jax.lax.stop_gradient(ref_o)
        ref_d = jax.lax.stop_gradient(ref_d)

    # reflection ray filtering (envgs_sampler.py:434-447): trace only pixels
    # above the specular quantile / solid-accumulation threshold. On TPU the
    # mask culls whole ray tiles instead of compacting the ray list (static
    # shapes); untraced pixels keep the base color in the composite below.
    ref_msk = None
    use_spec_filter = cfg.specular_filtering_start_iter > 0
    use_acc_filter = cfg.acc_filtering_start_iter > 0
    if use_spec_filter or use_acc_filter:
        if use_spec_filter:
            gate = it >= cfg.specular_filtering_start_iter

            def _spec_mask(_):
                # bisection quantile (10 mean-reductions) instead of
                # jnp.quantile's full H*W sort in the hot path; spec is a
                # sigmoid output so the bracket [0, 1] is exact. Runs only
                # when the gate is live (lax.cond, not select).
                thresh = _bisect_quantile01(
                    spec[..., 0], cfg.specular_filtering_percent
                )
                return spec[..., 0] > thresh

            ref_msk = jax.lax.cond(
                gate, _spec_mask,
                lambda _: jnp.ones((H, W), bool), None,
            )
        else:
            msk = b.alpha[..., 0] > 0.75
            gate = it >= cfg.acc_filtering_start_iter
            ref_msk = jnp.where(gate, msk, jnp.ones_like(msk))

    def with_env(_):
        if env_pass is not None:
            e = env_pass(env, ref_o, ref_d, cfg, env_means3d_zero,
                         ray_mask=ref_msk, wet_zero=env_wet_zero)
        else:
            e = render_env(env, ref_o, ref_d, cfg, env_means3d_zero,
                           ray_mask=ref_msk, wet_zero=env_wet_zero,
                           band_axis=band[2] if band is not None
                           and len(band) > 2 else None)
        dp = (e.dropped_pairs if e.dropped_pairs is not None
              else jnp.asarray(0, jnp.int32))
        npair = (e.num_pairs if e.num_pairs is not None
                 else jnp.asarray(0, jnp.int32))
        return (e.rgb, e.dpt[..., None], e.acc[..., None], e.wet, e.trans,
                dp, npair)

    def without_env(_):
        Pe = env.cap
        return (
            jnp.zeros((H, W, 3)),
            jnp.zeros((H, W, 1)),
            jnp.zeros((H, W, 1)),
            jnp.zeros((Pe,)),
            jnp.ones((H, W)),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
        )

    use_env = cfg.render_reflection and True
    if use_env:
        (env_rgb, env_dpt, env_acc, env_wet, _, env_dropped,
         env_num_pairs) = jax.lax.cond(
            it >= cfg.reflection_start_iter, with_env, without_env, None
        )
    else:
        (env_rgb, env_dpt, env_acc, env_wet, _, env_dropped,
         env_num_pairs) = without_env(None)

    active = (it >= cfg.reflection_start_iter) & jnp.asarray(use_env)
    spec_eff = jnp.where(active, spec, jnp.zeros_like(spec))
    if ref_msk is not None:
        spec_eff = jnp.where(ref_msk[..., None], spec_eff,
                             jnp.zeros_like(spec_eff))
    rgb = (1.0 - spec_eff) * b.rgb + spec_eff * env_rgb
    dif_rgb = b.rgb * (1.0 - spec)
    ref_rgb = env_rgb * spec * 2.0  # brightness-doubled visualization

    return EnvGSOutput(
        rgb_map=rgb,
        dif_rgb_map=dif_rgb,
        ref_rgb_map=ref_rgb,
        env_rgb_map=env_rgb,
        spec_map=spec,
        rough_map=rough,
        acc_map=b.alpha,
        dpt_map=b.surf_depth,
        norm_map=b.normal_world,
        dist_map=b.distortion,
        surf_norm_map=b.surf_normal,
        env_dpt_map=env_dpt,
        env_acc_map=env_acc,
        ref_o=ref_o,
        ref_d=ref_d,
        base_wet=b.wet,
        base_radii=b.radii,
        base_visibility=b.visibility,
        env_wet=env_wet,
        env_visibility=env_wet > 0,
        env_opacity=env.get_opacity,
        base_num_pairs=b.num_pairs,
        env_dropped_pairs=env_dropped,
        env_num_pairs=env_num_pairs,
    )
