"""Measure tracer candidate utilisation on the bench render scene.

Questions this answers (round-4 render-perf plan):
  1. How many candidate pair slots does the env trace consume
     (CHUNK-aligned fill vs the env_pair_cap budget)?
  2. What fraction of candidates actually CONTRIBUTE (alpha >= ALPHA_MIN
     for at least one ray of their tile)? 1 - fraction = the headroom a
     perfectly snug per-tile cull could reclaim.
  3. Would finer ray tiles (16x8 / 8x8) cut pair count? Reports the
     expected pair count if each half/quarter subtile culled independently
     (a pair is charged once per subtile where it contributes).

Usage: python scripts/tpu_measure_tracefill.py
"""
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_render_scene  # noqa: E402
from envgs_tpu.models.envgs import render_base, reflect_rays  # noqa: E402
from envgs_tpu.ops.common import ALPHA_MIN  # noqa: E402
from envgs_tpu.ops.tracer import (  # noqa: E402
    NRAY,
    RTH,
    RTW,
    build_ray_tiles,
    cull_and_sort,
)
from envgs_tpu.ops.tracer_ref import prepare_trace_scene  # noqa: E402


def main():
    base, env, cam, cfg = make_render_scene()
    print("scene built", flush=True)
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb); print("base pass done", flush=True)
    ref_o, ref_d = reflect_rays(cam, b)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    tiles = build_ray_tiles(ref_o, ref_d)
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    gauss_idx, bounds, dropped = jax.jit(
        lambda s, r: cull_and_sort(tiles, s, r, per_tile_cap=K,
                                   total_pair_cap=cfg.env_pair_cap)
    )(scene, radius3)

    T = tiles.n_tiles
    counts = np.diff(np.asarray(bounds))
    used = int(bounds[-1])
    nvalid = int(jnp.sum(gauss_idx[:used] < Pe))
    print(f"tiles: {T}  cap: {cfg.env_pair_cap}")
    print(f"aligned slots (num_pairs): {used}")
    print(f"valid candidates:          {nvalid}  "
          f"(align waste {used - nvalid})")
    print(f"dropped: {int(dropped)}")
    print("per-tile aligned counts: "
          f"mean {counts.mean():.0f}  p50 {np.percentile(counts, 50):.0f}  "
          f"p90 {np.percentile(counts, 90):.0f}  max {counts.max()}")

    # ---- contribution: per pair, max alpha over its tile's rays ----
    # tile id per slot (same cummax construction as cull_and_sort)
    cap = gauss_idx.shape[0]
    basev = jnp.zeros((cap,), jnp.int32)
    tile_of = jax.lax.cummax(
        basev.at[bounds[:-1]].max(jnp.arange(T, dtype=jnp.int32),
                                  mode="drop"))
    rays = tiles.rays  # (T, 8, NRAY)

    S = 16384  # slots per slice

    @jax.jit
    def slice_stats(idx_s, tile_s):
        g = jnp.clip(idx_s, 0, Pe - 1)
        validp = idx_s < Pe
        m = scene.mean[g]                      # (S, 3)
        tu = scene.t_u[g]
        tv = scene.t_v[g]
        nrm = scene.normal[g]
        op = scene.opacity[g]
        r = rays[tile_s]                       # (S, 8, NRAY)
        o = r[:, 0:3, :]                       # (S, 3, NRAY)
        d = r[:, 3:6, :]
        dn = jnp.einsum("sc,scr->sr", nrm, d)
        dn_safe = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
        num = jnp.einsum("sc,sc->s", m, nrm)[:, None] - jnp.einsum(
            "sc,scr->sr", nrm, o)
        t = num / dn_safe                      # (S, NRAY)
        p = o + t[:, None, :] * d              # (S, 3, NRAY)
        delta = p - m[:, :, None]
        u = jnp.einsum("sc,scr->sr", tu, delta)
        v = jnp.einsum("sc,scr->sr", tv, delta)
        rho = u * u + v * v
        alpha = op[:, None] * jnp.exp(-0.5 * rho)
        hit = (alpha >= ALPHA_MIN) & (t > 1e-4) & (jnp.abs(dn) >= 1e-9)
        hit = hit & validp[:, None]
        contrib_any = jnp.any(hit, axis=-1)
        # subtile splits: ray index = yy*RTW+xx
        ridx = jnp.arange(NRAY)
        xx = ridx % RTW
        yy = ridx // RTW
        halves_x = jnp.stack([xx < RTW // 2, xx >= RTW // 2])  # (2, NRAY)
        quads = jnp.stack([
            (xx < RTW // 2) & (yy < RTH // 2),
            (xx >= RTW // 2) & (yy < RTH // 2),
            (xx < RTW // 2) & (yy >= RTH // 2),
            (xx >= RTW // 2) & (yy >= RTH // 2),
        ])
        n_half = jnp.sum(
            jnp.any(hit[:, None, :] & halves_x[None], axis=-1), axis=-1)
        n_quad = jnp.sum(
            jnp.any(hit[:, None, :] & quads[None], axis=-1), axis=-1)
        # min in-plane distance (sigma units) over rays with a forward hit
        ok_t = (t > 1e-4) & (jnp.abs(dn) >= 1e-9)
        sig = jnp.sqrt(jnp.min(jnp.where(ok_t, rho, jnp.inf), axis=-1))
        return (jnp.sum(contrib_any), jnp.sum(n_half), jnp.sum(n_quad),
                jnp.sum(validp), contrib_any, sig)

    padded = -(-cap // S) * S
    idx_p = jnp.pad(gauss_idx, (0, padded - cap), constant_values=Pe)
    tile_p = jnp.pad(tile_of, (0, padded - cap))
    tot_c = tot_h = tot_q = tot_v = 0
    cachef = pathlib.Path("/tmp/tracefill_flags.npz")
    if cachef.exists():
        z = np.load(cachef)
        flags, sigs = [z["flags"]], [z["sigs"]]
        tot_c = int(flags[0][:cap].sum())
        tot_v = int(np.asarray(gauss_idx < Pe).sum())
        tot_h = tot_q = 0
    else:
        flags = []
        sigs = []
        for i in range(padded // S):
            c, h, q, v, f, sg = slice_stats(idx_p[i * S:(i + 1) * S],
                                            tile_p[i * S:(i + 1) * S])
            tot_c += int(c); tot_h += int(h); tot_q += int(q)
            tot_v += int(v)
            flags.append(np.asarray(f)); sigs.append(np.asarray(sg))
        np.savez(cachef, flags=np.concatenate(flags),
                 sigs=np.concatenate(sigs))
        flags = [np.concatenate(flags)]; sigs = [np.concatenate(sigs)]
    print(f"contributing pairs (alpha>=1/255 on >=1 ray): {tot_c} "
          f"({100.0 * tot_c / max(tot_v, 1):.1f}% of valid)")
    print(f"expected pairs at 16x8 subtiles: {tot_h} "
          f"({100.0 * tot_h / max(tot_v, 1):.1f}%)")
    print(f"expected pairs at 8x8 subtiles:  {tot_q} "
          f"({100.0 * tot_q / max(tot_v, 1):.1f}%)")

    flags = np.concatenate(flags)[:cap]
    sigs = np.concatenate(sigs)[:cap]
    validm = np.asarray(gauss_idx < Pe)
    non = validm & ~flags
    s_non = sigs[non]
    s_non = s_non[np.isfinite(s_non)]
    print("non-contributor min-sigma percentiles "
          "(how far the nearest ray's plane hit lands, in sigma):")
    for p in (10, 25, 50, 75, 90):
        print(f"  p{p}: {np.percentile(s_non, p):.2f}")
    print(f"  (no forward plane hit at all: {int(np.sum(non) - len(s_non))})")

    # ---- upper bound: time gather+blend with perfectly culled pairs ----
    import time

    from envgs_tpu.ops.tracer import CHUNK, _gather_blend_trace, \
        _pack_scene_table

    def compact(keep_flags):
        bnp = np.asarray(bounds)
        gnp = np.asarray(gauss_idx)
        idx2 = []
        b2 = [0]
        for ti in range(T):
            s, e = bnp[ti], bnp[ti + 1]
            k = gnp[s:e][keep_flags[s:e]]
            pad = (-len(k)) % CHUNK
            idx2.append(k)
            idx2.append(np.full(pad, Pe, np.int32))
            b2.append(b2[-1] + len(k) + pad)
        idx2 = np.concatenate(idx2)
        cap2 = -(-len(idx2) // 1024) * 1024
        idx2 = np.pad(idx2, (0, cap2 - len(idx2)), constant_values=Pe)
        return (jnp.asarray(idx2, jnp.int32),
                jnp.asarray(np.asarray(b2, np.int32)))

    idx2, b2 = compact(flags)
    print(f"tight candidate slots: {int(b2[-1])} (vs {used})")

    packed = _pack_scene_table(scene)
    wz = jnp.zeros((Pe + 1,), jnp.float32)
    A = 0

    def timeit(name, gi, bb):
        # reduce to a scalar ON DEVICE: a large-array fetch through the
        # axon tunnel costs ~100 ms and would swamp the kernel time
        f = jax.jit(lambda g, b: jnp.sum(_gather_blend_trace(
            packed, g, rays, b, wz, A, False, (False, False))[0][:, :3]))
        o = f(gi, bb)
        _ = float(np.asarray(o))
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            o = f(gi, bb)
        _ = float(np.asarray(o))
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1000:.2f} ms")

    timeit("gather+blend ORIGINAL pairs", gauss_idx, bounds)
    timeit("gather+blend TIGHT pairs   ", idx2, b2)


if __name__ == "__main__":
    main()
