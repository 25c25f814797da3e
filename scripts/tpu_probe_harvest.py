"""Break gather+blend into components at the probed fill and measure how
much a smaller env_pair_cap harvests. Times on the bench scene:
  - full gather+blend at cap 1179648 (status quo)
  - same at cap 786432 (snug for the probed ~709k fill)
  - blend only (pre-gathered pairs) at both bounds
  - gather only at both caps
"""
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import make_render_scene  # noqa: E402
from envgs_tpu.models.envgs import render_base, reflect_rays  # noqa: E402
from envgs_tpu.ops import tracer as tr  # noqa: E402
from envgs_tpu.ops.raster_pallas import pack_rows  # noqa: E402
from envgs_tpu.ops.tracer_ref import prepare_trace_scene  # noqa: E402


def timeit(name, f, *a, n=20):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)
    return o


def main():
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    tiles = tr.build_ray_tiles(ref_o, ref_d)
    timeit("build_ray_tiles", jax.jit(tr.build_ray_tiles), ref_o, ref_d)
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    NT = int(tiles.n_tiles)

    for cap in (1179648, 786432):
        cull = jax.jit(lambda s, r, cap=cap: tr.cull_and_sort(
            tiles, s, r, per_tile_cap=K, total_pair_cap=cap))
        gi, bb, _ = timeit(f"cull+probe (cap {cap})", cull, scene, radius3)
        print(f"  fill: {int(bb[-1])} / {gi.shape[0]}")
        packed = tr._pack_scene_table(scene)
        tbl = jax.jit(lambda s: pack_rows(tr._pack_scene_table(s)))(scene)
        gather = jax.jit(lambda t, i: t[i])
        pd = timeit(f"gather (cap {cap})", gather, tbl, gi)
        blend = jax.jit(lambda p, r, b: tr._trace_fwd_call(
            p, r, b, 0, False, needs=(False, False, False)))
        timeit(f"blend only (cap {cap})", blend, pd, tiles.rays, bb)
        gb = jax.jit(lambda g, b: jnp.sum(tr._gather_blend_trace(
            packed, g, tiles.rays, b, jnp.zeros((Pe + 1,)), 0, False,
            (False, False))[0][:, :3]))
        timeit(f"gather+blend fused (cap {cap})", gb, gi, bb)

    # smaller per-tile cap: cull cost scales with C = Kc*CHUNK
    for ptc in (1024, 512):
        cull = jax.jit(lambda s, r, ptc=ptc: tr.cull_and_sort(
            tiles, s, r, per_tile_cap=ptc, total_pair_cap=786432))
        gi, bb, _ = timeit(f"cull+probe (ptc {ptc})", cull, scene, radius3)
        print(f"  fill: {int(bb[-1])} / {gi.shape[0]}")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def fused_variants():
    """Isolate the fused-jit penalty: gather-from-param vs pack_rows-inline
    vs the production _gather_blend_trace."""
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    tiles = tr.build_ray_tiles(ref_o, ref_d)
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    cap = 786432
    cull = jax.jit(lambda s, r: tr.cull_and_sort(
        tiles, s, r, per_tile_cap=K, total_pair_cap=cap))
    gi, bb, _ = cull(scene, radius3)
    packed = tr._pack_scene_table(scene)
    tbl = jax.jit(lambda s: pack_rows(tr._pack_scene_table(s)))(scene)
    rays = tiles.rays
    NEEDS = (False, False, False)

    f_a = jax.jit(lambda t, g, b: jnp.sum(tr._trace_fwd_call(
        jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(t)[g]),
        rays, b, 0, False, needs=NEEDS)[0][:, :3]))
    timeit("A param-table gather+blend ", f_a, tbl, gi, bb)

    f_b = jax.jit(lambda p, g, b: jnp.sum(tr._trace_fwd_call(
        jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(pack_rows(p))[g]),
        rays, b, 0, False, needs=NEEDS)[0][:, :3]))
    timeit("B pack_rows-inline        ", f_b, packed, gi, bb)

    f_c = jax.jit(lambda g, b: jnp.sum(tr._gather_blend_trace(
        packed, g, rays, b, jnp.zeros((Pe + 1,)), 0, False,
        NEEDS)[0][:, :3]))
    timeit("C production gather_blend ", f_c, gi, bb)

    # D: does the CULL in the same jit slow the blend (the bench frame
    # fuses everything)?
    f_d = jax.jit(lambda s, r: jnp.sum(tr.trace_rays(
        s, ref_o, ref_d, jnp.zeros(3), total_pair_cap=cap).rgb))
    timeit("D full trace_rays         ", f_d, scene, radius3)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "fused":
    fused_variants()


def fused_variants2():
    """Which of C's two deltas vs B costs 8 ms: custom_vjp or the
    closed-over-constant table?"""
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    tiles = tr.build_ray_tiles(ref_o, ref_d)
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    cap = 786432
    cull = jax.jit(lambda s, r: tr.cull_and_sort(
        tiles, s, r, per_tile_cap=K, total_pair_cap=cap))
    gi, bb, _ = cull(scene, radius3)
    packed = tr._pack_scene_table(scene)
    rays = tiles.rays
    NEEDS = (False, False, False)
    wz = jnp.zeros((Pe + 1,))

    f_b2 = jax.jit(lambda p, g, b: jnp.sum(tr._gather_blend_trace(
        p, g, rays, b, wz, 0, False, NEEDS)[0][:, :3]))
    timeit("B2 vjp-wrapped, param table ", f_b2, packed, gi, bb)

    f_c2 = jax.jit(lambda g, b: jnp.sum(tr._trace_fwd_call(
        jax.lax.optimization_barrier(
            jax.lax.optimization_barrier(pack_rows(packed))[g]),
        rays, b, 0, False, needs=NEEDS)[0][:, :3]))
    timeit("C2 no-vjp, const table      ", f_c2, gi, bb)

    # C3: table computed from traced scene params inside the jit (the real
    # bench frame shape)
    f_c3 = jax.jit(lambda s, g, b: jnp.sum(tr._trace_fwd_call(
        jax.lax.optimization_barrier(jax.lax.optimization_barrier(
            pack_rows(tr._pack_scene_table(s)))[g]),
        rays, b, 0, False, needs=NEEDS)[0][:, :3]))
    timeit("C3 no-vjp, traced table     ", f_c3, scene, gi, bb)

    f_c4 = jax.jit(lambda s, g, b: jnp.sum(tr._gather_blend_trace(
        tr._pack_scene_table(s), g, rays, b, wz, 0, False,
        NEEDS)[0][:, :3]))
    timeit("C4 vjp, traced table        ", f_c4, scene, gi, bb)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "fused2":
    fused_variants2()
