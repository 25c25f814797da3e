"""Splat-slab model parallelism: shard the PAIR PIPELINE over a mesh axis.

Band parallelism (parallel/sharding.py) splits pixels; this splits the
SPLATS. Each frame, the pool is partitioned into depth-rank SLABS by the
exact key the rasterizer's binning sorts by (front-to-back splat depth,
ties by index), each device rasterizes only its slab over the FULL image,
and the per-slab accumulators are composed across the axis in slab order.

Why this is exact: front-to-back alpha blending is associative in the
premultiplied form — for any contiguous split of the blend order into
(lo, hi):

    rgb  = rgb_lo + T_lo * rgb_hi          (likewise depth_e, normal, α)
    T    = T_lo * T_hi
    dist = dist_lo + T_lo² * dist_hi
         + T_lo * (α_lo * D2_hi + D2_lo * α_hi − 2 * D1_lo * D1_hi)

where D1/D2 are the blend kernels' running Σw·m / Σw·m² distortion
moments (RasterOutput.d1/d2) — the cross-slab distortion term is closed
form, so even the 2DGS distortion loss composes exactly. Two outputs are
approximate under slabs:

- median depth (a threshold crossing, non-associative): approximated by
  the expected depth — the same stand-in the traced base path uses;
  exact for every shipped EnvGS config (depth_ratio == 0).
- per-splat wet (densification stat): slab k's kernel runs with local
  transmittance starting at 1, so its splats' wet ignores occlusion by
  nearer slabs — an UPPER BOUND on the true wet, exact for slab 0 and
  for any pixel nearer slabs leave transparent. Image outputs and all
  parameter gradients are unaffected (the composition chain rule scales
  each slab's cotangents by the per-pixel T_prefix automatically). An
  exact-wet variant exists if ever needed: blend wet_zero as a fictitious
  emission channel and read Σ(probe map)'s gradient — the probe composes
  like rgb, so its cotangent carries T_prefix per pixel.

What this buys at scale (SURVEY §5.7 big-axis scaling): the pair pipeline
— binning sort, 256-byte pair rows, blend kernels, pair-grad transpose,
the actual HBM hog at ~2 GB for a 2M-pair cap — shrinks by the axis size
per device (each slab runs at pair_cap / D), while parameter gradients
come back through shard_map's transpose psum exactly like band
parallelism. Composing with a ('band', 'splat') 2-D mesh splits pixels AND
splats. Pool parameters stay replicated (they are ~100 MB; the pair
buffers are what outgrows a chip).

Reference contract being scaled: the single-GPU CUDA rasterizer feeding
DDP (easyvolcap/utils/gaussian2d_utils.py:1090-1144) — the reference has
no model-parallel axis at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from envgs_tpu.models import gaussians as G
from envgs_tpu.models.envgs import (
    EnvGSConfig,
    EnvGSOutput,
    _pool_colors,
    _pool_colors_at,
    forward_envgs,
    reflect_rays,
)
from envgs_tpu.ops import tracer
from envgs_tpu.ops.common import prepare_splats
from envgs_tpu.ops.raster import RasterOutput, rasterize, render_decode
from envgs_tpu.ops.tracer_ref import TraceOutput, prepare_trace_scene
from envgs_tpu.train.optimizer import (
    LRConfig,
    lr_tree_for,
    sparse_adam_update,
)
from envgs_tpu.train.supervisor import LossConfig, compute_losses
from envgs_tpu.train.trainer import Batch, TrainState
from envgs_tpu.utils.camera import Camera


def slab_assignment(depth: jnp.ndarray, valid: jnp.ndarray,
                    n_slabs: int) -> jnp.ndarray:
    """(P,) slab index per splat by GLOBAL depth rank.

    Uses the binning sort's exact key (depth, invalid→inf; argsort ties by
    index), so the union of slab-local blend orders IS the single-chip
    blend order — composition is order-exact, not approximate."""
    P_ = depth.shape[0]
    key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(key)  # rank -> splat
    quota = -(-P_ // n_slabs)
    slab_of_rank = jnp.arange(P_, dtype=jnp.int32) // quota
    return (
        jnp.zeros((P_,), jnp.int32).at[order].set(
            slab_of_rank, unique_indices=True)
    )


def compose_slabs(parts: RasterOutput, bg_color: jnp.ndarray,
                  C: int) -> RasterOutput:
    """Fold (D, ...) stacked per-slab raster outputs in slab order.

    parts must come from rasterize() calls with bg=0 (premultiplied rgb).
    Per-splat fields (wet/radii) are disjoint across slabs -> summed."""
    D = parts.trans.shape[0]
    rgb, dpt, alpha = parts.rgb[0], parts.depth_expected[0], parts.alpha[0]
    nrm, dist, T = parts.normal[0], parts.distortion[0], parts.trans[0]
    d1, d2 = parts.d1[0], parts.d2[0]
    for k in range(1, D):
        rgb = rgb + T[..., None] * parts.rgb[k]
        dpt = dpt + T * parts.depth_expected[k]
        nrm = nrm + T[..., None] * parts.normal[k]
        dist = (dist + T * T * parts.distortion[k]
                + T * (alpha * parts.d2[k] + d2 * parts.alpha[k]
                       - 2.0 * d1 * parts.d1[k]))
        d1 = d1 + T * parts.d1[k]
        d2 = d2 + T * parts.d2[k]
        alpha = alpha + T * parts.alpha[k]
        T = T * parts.trans[k]
    rgb = rgb + T[..., None] * jnp.zeros((C,)).at[: bg_color.shape[0]].set(
        bg_color)[None, None, :]
    return RasterOutput(
        rgb=rgb,
        depth_expected=dpt,
        alpha=alpha,
        normal=nrm,
        # median depth is a threshold crossing (non-associative); use the
        # expected-depth stand-in like the traced base path — exact for
        # depth_ratio == 0 (every shipped EnvGS config)
        depth_median=jax.lax.stop_gradient(
            jnp.where(alpha > 1e-8, dpt / jnp.maximum(alpha, 1e-8), 0.0)),
        distortion=dist,
        wet=jnp.sum(parts.wet, axis=0),
        radii=jnp.max(parts.radii, axis=0),
        trans=T,
        num_pairs=(jnp.sum(parts.num_pairs, axis=0)
                   if parts.num_pairs is not None else None),
        d1=d1,
        d2=d2,
    )


def compose_trace_slabs(parts: TraceOutput, bg_color: jnp.ndarray
                        ) -> TraceOutput:
    """Fold (D, ...) stacked RAW per-slab trace outputs in slab order.

    parts must come from trace_rays(compose_raw=True) calls (premultiplied
    rgb/dpt, d1/d2 moments filled). Per-splat fields (wet) are disjoint
    across slabs -> summed; dropped_pairs counters sum."""
    D = parts.trans.shape[0]
    rgb, dpt, acc = parts.rgb[0], parts.dpt[0], parts.acc[0]
    nrm, dist, T = parts.norm[0], parts.dist[0], parts.trans[0]
    aux = parts.aux[0]
    d1, d2 = parts.d1[0], parts.d2[0]
    for k in range(1, D):
        rgb = rgb + T[..., None] * parts.rgb[k]
        dpt = dpt + T * parts.dpt[k]
        nrm = nrm + T[..., None] * parts.norm[k]
        aux = aux + T[..., None] * parts.aux[k]
        dist = (dist + T * T * parts.dist[k]
                + T * (acc * parts.d2[k] + d2 * parts.acc[k]
                       - 2.0 * d1 * parts.d1[k]))
        d1 = d1 + T * parts.d1[k]
        d2 = d2 + T * parts.d2[k]
        acc = acc + T * parts.acc[k]
        T = T * parts.trans[k]
    rgb = rgb + T[..., None] * bg_color[None, None, :]
    dpt = jnp.where(acc > 1e-8, dpt / jnp.maximum(acc, 1e-8), 0.0)
    return TraceOutput(
        rgb=rgb, dpt=dpt, acc=acc, norm=nrm, dist=dist, aux=aux,
        wet=jnp.sum(parts.wet, axis=0), trans=T,
        dropped_pairs=(jnp.sum(parts.dropped_pairs, axis=0)
                       if parts.dropped_pairs is not None else None),
        d1=d1, d2=d2,
    )


def _slab_base_pass(axis: str, n_slabs: int, slab_pair_cap: int | None,
                    sink: dict | None = None):
    """render_base with the rasterizer's pair pipeline sharded over `axis`.

    Must run INSIDE shard_map. Signature matches models.envgs.render_base so
    it drops into forward_envgs(base_pass=...). Slab assignment is computed
    from the replicated pool (identical across the axis); each device
    rasterizes only its depth-rank slab at pair_cap / D and the premultiplied
    accumulators compose across the axis via the closed-form blend monoid.

    `sink`, when given, receives sink['pair_overflow'] = the WORST slab's
    overshoot of its LOCAL cap (pmax over `axis`) — the composed num_pairs
    is the cross-slab SUM, which can mask one hot slab exceeding cap/D
    while the others sit under budget."""
    from envgs_tpu.ops.raster import render_decode as _decode

    def base_pass(pool, cam, cfg, means2d_zero=None, wet_zero=None):
        D = n_slabs
        cap = slab_pair_cap or max(cfg.pair_cap // D, 1 << 12)
        train = not cfg.render_mode
        idx = jax.lax.axis_index(axis)
        colors = _pool_colors(pool, cam.center)
        if cfg.render_reflection:
            colors = jnp.concatenate(
                [colors, pool.get_specular, pool.get_roughness], axis=-1)
        pre = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0], jnp.zeros((pool.cap, 3)), cam,
            scale_modifier=cfg.scale_modifier, active=pool.stats.active,
        )
        slab = jax.lax.stop_gradient(
            slab_assignment(pre.depth, pre.valid, D))
        prep = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0], colors, cam,
            scale_modifier=cfg.scale_modifier,
            active=pool.stats.active & (slab == idx),
        )
        out = rasterize(prep, cam, jnp.zeros(3), backend=cfg.raster_backend,
                        pair_cap=cap, means2d_zero=means2d_zero,
                        needs=(train, train or cfg.depth_ratio > 0, train),
                        wet_zero=(wet_zero
                                  if cfg.raster_backend != "ref" else None))
        if sink is not None and out.num_pairs is not None:
            sink["pair_overflow"] = jax.lax.pmax(
                jnp.maximum(out.num_pairs - cap, 0), axis)
        parts = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis), out)
        bg = jnp.full((3,), cfg.bg_brightness, jnp.float32)
        C = 3 + (cfg.specular_channels + 1 if cfg.render_reflection else 0)
        composed = compose_slabs(parts, bg, C)
        return _decode(
            composed, cam,
            specular_channels=(cfg.specular_channels
                               if cfg.render_reflection else 0),
            depth_ratio=cfg.depth_ratio,
        )

    return base_pass


def _slab_env_pass(axis: str, n_slabs: int, slab_env_cap: int | None):
    """render_env with the TRACER's pair pipeline sharded over `axis`
    (the env pair pipeline at env_pair_cap is the same HBM hog as the
    raster's). Must run INSIDE shard_map; drops into
    forward_envgs(env_pass=...).

    Slabs partition env splats by RADIAL DISTANCE from the mean reflected-
    ray origin — the global analog of the tiled tracer's per-tile radial
    blend order. For tiles whose cone apex differs from the global mean,
    per-tile order near slab boundaries can disagree with the global rank:
    the same approximation class as the tracer's documented per-tile-radial
    ordering deviation (exact for radially separated env shells, e.g. the
    far-field domes EnvGS environment sets converge to)."""

    def env_pass(env, ref_o, ref_d, cfg, env_means3d_zero=None,
                 ray_mask=None, wet_zero=None):
        assert cfg.max_trace_depth == 0, (
            "slab-sharded env pass supports the shipped max_trace_depth=0")
        D = n_slabs
        cap = slab_env_cap or max(cfg.env_pair_cap // D, 1 << 12)
        train = not cfg.render_mode
        idx = jax.lax.axis_index(axis)
        xyz = env.params.xyz
        if env_means3d_zero is not None:
            xyz = xyz + env_means3d_zero
        colors = _pool_colors_at(env, ref_o)
        apex = jax.lax.stop_gradient(jnp.mean(ref_o.reshape(-1, 3), axis=0))
        radial = jnp.linalg.norm(
            jax.lax.stop_gradient(xyz) - apex[None, :], axis=-1)
        eslab = slab_assignment(radial, env.stats.active, D)
        scene = prepare_trace_scene(
            xyz, env.params.rotation, env.get_scaling,
            env.get_opacity[:, 0], colors,
            active=env.stats.active & (eslab == idx),
            scale_modifier=cfg.scale_modifier,
        )
        out = tracer.trace_rays(
            scene, ref_o, ref_d, jnp.zeros(3), backend=cfg.tracer_backend,
            total_pair_cap=cap, ray_mask=ray_mask,
            needs=(train, train, train), wet_zero=wet_zero,
            compose_raw=True,
        )
        parts = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis), out)
        bg = jnp.full((3,), cfg.env_bg_brightness, jnp.float32)
        return compose_trace_slabs(parts, bg)

    return env_pass


def make_splat_sharded_render_base(
    mesh: Mesh,
    cam: Camera,
    cfg: EnvGSConfig,
    axis: str = "splat",
    slab_pair_cap: int | None = None,
):
    """Jitted base-pass render with the pair pipeline sharded over `axis`.

    Returns fn(pool) -> decoded RenderOutput identical (to blend-order
    float tolerance) to models.envgs.render_base on one device. Each
    device's rasterize runs at slab_pair_cap (default pair_cap / D)."""
    D = mesh.shape[axis]
    cap = slab_pair_cap or max(cfg.pair_cap // D, 1 << 12)
    train = not cfg.render_mode
    needs = (train, False, train)

    def device_fn(params, stats, slab, max_sh):
        idx = jax.lax.axis_index(axis)
        pool = G.GaussianPool(params, stats, max_sh)
        colors = _pool_colors(pool, cam.center)
        if cfg.render_reflection:
            colors = jnp.concatenate(
                [colors, pool.get_specular, pool.get_roughness], axis=-1)
        prep = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0], colors, cam,
            scale_modifier=cfg.scale_modifier,
            active=pool.stats.active & (slab == idx),
        )
        out = rasterize(prep, cam, jnp.zeros(3),
                        backend=cfg.raster_backend, pair_cap=cap,
                        needs=needs)
        # radii: slab-masked prep zeroes foreign splats' radii, and slabs
        # partition the active set, so the max-compose over slabs
        # reconstructs the full pool's radii exactly
        return jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis), out)

    def render(pool: G.GaussianPool):
        # slab partition uses the binning sort's key: view depth of valid
        # in-frustum splats (computed once, replicated)
        pre = prepare_splats(
            pool.params.xyz, pool.params.rotation, pool.get_scaling,
            pool.get_opacity[:, 0],
            jnp.zeros((pool.cap, 3)), cam,
            scale_modifier=cfg.scale_modifier, active=pool.stats.active,
        )
        slab = slab_assignment(pre.depth, pre.valid, D)

        def dev(params, stats, slab_):
            return device_fn(params, stats, slab_, pool.max_sh_degree)

        parts = jax.shard_map(
            dev, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False,
        )(pool.params, pool.stats, slab)
        bg = jnp.full((3,), cfg.bg_brightness, jnp.float32)
        C = 3 + (cfg.specular_channels + 1 if cfg.render_reflection else 0)
        composed = compose_slabs(parts, bg, C)
        return render_decode(
            composed, cam,
            specular_channels=(cfg.specular_channels
                               if cfg.render_reflection else 0),
            depth_ratio=cfg.depth_ratio,
        )

    return jax.jit(render)


def make_splat_sharded_train_step(
    mesh: Mesh,
    cam: Camera,
    model_cfg: EnvGSConfig,
    loss_cfg: LossConfig,
    lr_base: LRConfig,
    lr_env: LRConfig,
    has_norm: bool = False,
    splat_axis: str = "splat",
    band_axis: str | None = None,
    slab_pair_cap: int | None = None,
    slab_env_cap: int | None = None,
    lpips_fn=None,
):
    """Full train step with the PAIR PIPELINES sharded over `splat_axis`:
    compose -> losses -> gradients through the alpha-blend monoid.

    step(state, batch, K, R, T, it) -> (state, stats). Both render passes
    run slab-sharded (the rasterizer at pair_cap / D and the env tracer at
    env_pair_cap / D per device); every composite/filter/gate stage is the
    shared forward_envgs via the injectable pass hooks, so single-chip and
    slab-parallel training cannot drift. With `band_axis` set the mesh is
    2-D ('band', 'splat'): pixels split over bands AND splats over slabs —
    batch image H must divide into n_bands bands of whole 16px tile rows.

    Parameter gradients come back through shard_map's transpose: psum over
    the splat axis (slabs partition the splats, so each contribution is
    disjoint) and over the band axis (the DDP all-reduce). Per-splat wet
    arrives on the gradient lane the same way. Known deviation: per-splat
    wet is the slab-LOCAL upper bound (see module docstring); image outputs
    and parameter gradients are exact to blend-order float tolerance.
    """
    n_slabs = mesh.shape[splat_axis]
    n_bands = mesh.shape[band_axis] if band_axis else 1
    H, W = cam.H, cam.W
    assert H % (n_bands * 16) == 0, (
        f"H={H} must split into {n_bands} bands of whole 16px tile rows")
    band_h = H // n_bands
    m2z_w = 2  # slab path rasterizes the base pass (no base tracing)
    assert not model_cfg.use_base_tracing, (
        "slab-sharded base pass uses the rasterizer")

    sink: dict = {}  # per-trace capacity counters from the slab passes
    base_pass = _slab_base_pass(splat_axis, n_slabs, slab_pair_cap,
                                sink=sink)
    env_pass = _slab_env_pass(splat_axis, n_slabs, slab_env_cap)

    def device_loss(msb, mse, bparams, bstats, eparams, estats, m2z, e3z,
                    wz_b, wz_e, rgb, msk, norm, K, R, T, it):
        camera = Camera(H, W, K, R, T, cam.znear, cam.zfar)
        K_full = camera.K
        row0 = jnp.asarray(0.0, jnp.float32)
        if band_axis:
            row0 = (jax.lax.axis_index(band_axis) * band_h).astype(
                jnp.float32)
            Kb = camera.K.at[1, 2].add(-row0)
            camera = Camera(band_h, W, Kb, camera.R, camera.T,
                            cam.znear, cam.zfar)
        base = G.GaussianPool(bparams, bstats, msb)
        env = G.GaussianPool(eparams, estats, mse)
        out = forward_envgs(base, env, camera, it, model_cfg, m2z, e3z,
                            wz_b, wz_e, base_pass=base_pass,
                            env_pass=env_pass)
        if band_axis:
            # band-exact surface normal + windowed/global loss terms
            # (parallel/sharding.py band_loss semantics)
            from envgs_tpu.ops.raster import depth_to_normal

            idx = jax.lax.axis_index(band_axis)
            fwd_perm = [(i, i + 1) for i in range(n_bands - 1)]
            bwd_perm = [(i + 1, i) for i in range(n_bands - 1)]
            dpt = out.dpt_map
            top_row = jax.lax.ppermute(dpt[-1:], band_axis, fwd_perm)
            bot_row = jax.lax.ppermute(dpt[:1], band_axis, bwd_perm)
            dpt_ext = jnp.concatenate([top_row, dpt, bot_row], axis=0)
            cam_ext = Camera(band_h + 2, W, K_full,
                             camera.R, camera.T, cam.znear, cam.zfar)
            sn = depth_to_normal(cam_ext, dpt_ext[..., 0],
                                 i0=row0 - 1.0)[1:-1]
            grow = idx * band_h + jnp.arange(band_h)
            border = (grow == 0) | (grow == H - 1)
            sn = jnp.where(border[:, None, None], 0.0, sn)
            sn = sn * jax.lax.stop_gradient(out.acc_map)
            out = out._replace(surf_norm_map=sn)
        loss, stats = compute_losses(
            out, rgb[0], msk[0], norm[0] if has_norm else None,
            camera.R, it, loss_cfg, bg_brightness=model_cfg.bg_brightness,
            lpips_fn=lpips_fn,
            band=(band_axis, n_bands, H) if band_axis else None,
        )
        axes = (band_axis, splat_axis) if band_axis else (splat_axis,)
        loss = jax.lax.pmean(loss, axes)
        stats = {k: jax.lax.pmean(v, axes) for k, v in stats.items()}
        # capacity-truncation counters (ADVICE r3): surfaced so the
        # runner's adaptive pair-cap escalation fires for the slab-sharded
        # step exactly like the single-chip one (trainer.py:250-256).
        # pair_overflow = worst slab's overshoot of its LOCAL cap (a
        # cross-slab sum could mask one hot slab); trace_dropped = total
        # dropped tracer slots across slabs (any drop must trip it). Both
        # are pmax'd over bands: views differ per band, escalation keys
        # off "any band overflowed".
        def band_max_i(x):
            return jax.lax.pmax(x, band_axis) if band_axis else x

        if "pair_overflow" in sink:
            stats["pair_overflow"] = band_max_i(sink.pop("pair_overflow"))
        if out.env_dropped_pairs is not None:
            stats["trace_dropped"] = band_max_i(out.env_dropped_pairs)
        # per-pool aux: already slab-composed (identical across splat_axis);
        # reduce over bands only
        def band_sum(x):
            return jax.lax.psum(x, band_axis) if band_axis else x

        def band_max(x):
            return jax.lax.pmax(x, band_axis) if band_axis else x

        aux = (
            band_sum(out.base_wet),
            band_max(out.base_radii),
            band_sum(out.base_visibility.astype(jnp.float32)),
            band_sum(out.env_wet),
        )
        return loss, (stats, aux)

    def _step_impl(state: TrainState, batch: Batch, K, R, T, it):
        base, env = state.base, state.env
        m2z = jnp.zeros((base.cap, m2z_w))
        e3z = jnp.zeros((env.cap, 3))
        wz_b = jnp.zeros((base.cap,))
        wz_e = jnp.zeros((env.cap,))

        def bandify(x):
            return x.reshape(n_bands, band_h, W, x.shape[-1])

        rgb_b = bandify(batch.rgb)
        msk_b = bandify(batch.msk)
        norm_b = bandify(batch.norm)

        Pb = (lambda: P(band_axis)) if band_axis else (lambda: P())
        smapped = jax.shard_map(
            functools.partial(device_loss, base.max_sh_degree,
                              env.max_sh_degree),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(),
                      Pb(), Pb(), Pb(), P(), P(), P(), P()),
            out_specs=(P(), (P(), P())),
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )

        def loss_fn(bparams, eparams, m2z, e3z, wz_b, wz_e):
            return smapped(bparams, base.stats, eparams, env.stats, m2z,
                           e3z, wz_b, wz_e, rgb_b, msk_b, norm_b, K, R, T,
                           it)

        (loss, (stats, aux)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4, 5), has_aux=True
        )(base.params, env.params, m2z, e3z, wz_b, wz_e)
        g_base, g_env, g_m2z, g_e3z, g_wet_b, g_wet_e = grads
        base_wet, base_radii, base_vis, env_wet = aux
        base_wet = base_wet + jax.lax.stop_gradient(g_wet_b)
        env_wet = env_wet + jax.lax.stop_gradient(g_wet_e)

        new_bp, opt_base = sparse_adam_update(
            base.params, g_base, state.opt_base, lr_tree_for(it, lr_base))
        new_ep, opt_env = sparse_adam_update(
            env.params, g_env, state.opt_env, lr_tree_for(it, lr_env))

        b_stats = G.accumulate_stats(
            base.stats, g_m2z, (base_vis > 0) | (base_wet > 0),
            weight=base_wet, radii=base_radii)
        e_stats = G.accumulate_stats(env.stats, g_e3z, env_wet > 0,
                                     weight=env_wet)

        new_state = TrainState(
            base._replace(params=new_bp, stats=b_stats),
            env._replace(params=new_ep, stats=e_stats),
            opt_base, opt_env, state.key,
        )
        return new_state, stats

    return jax.jit(_step_impl)
