"""Diagnose the direction-space footprint probe on the bench scene.

For a sample of kept candidate slots, recompute the probe's quantities in
numpy (float64) and report gate pass rates, rejection rate, and — against
the exact per-ray contribution test — how many true contributors the probe
would wrongly drop. Guides the probe constants in ops/tracer.py block_cull.
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
    NQUAD,
    build_ray_tiles,
    cull_and_sort,
)
from envgs_tpu.ops.tracer_ref import prepare_trace_scene  # noqa: E402


def main():
    base, env, cam, cfg = make_render_scene()
    b = jax.jit(lambda p: render_base(p, cam, cfg))(base)
    jax.block_until_ready(b.rgb)
    ref_o, ref_d = reflect_rays(cam, b)
    tiles = build_ray_tiles(ref_o, ref_d)
    Pe = env.cap
    scene = prepare_trace_scene(
        env.params.xyz, env.params.rotation, env.get_scaling,
        env.get_opacity[:, 0], jnp.zeros((Pe, 3)),
        active=env.stats.active, scale_modifier=cfg.scale_modifier,
    )
    su = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_u, axis=-1), 1e-12, None)
    sv = 1.0 / jnp.clip(jnp.linalg.norm(scene.t_v, axis=-1), 1e-12, None)
    radius3 = 3.0 * jnp.maximum(su, sv)
    K = min(-(-Pe // 64) * 64, 2048)
    # probe OFF: diagnose over the unprobed candidate set
    gauss_idx, bounds, _ = jax.jit(
        lambda s, r: cull_and_sort(tiles, s, r, per_tile_cap=K,
                                   total_pair_cap=cfg.env_pair_cap,
                                   probe=False)
    )(scene, radius3)

    T = tiles.n_tiles
    bnp = np.asarray(bounds)
    gnp = np.asarray(gauss_idx)
    cap = gnp.shape[0]
    tile_of = np.zeros(cap, np.int64)
    tile_of[bnp[:-1]] = np.arange(T)
    tile_of = np.maximum.accumulate(tile_of)
    used = int(bnp[-1])
    sel = np.arange(used)[gnp[:used] < Pe]
    rng = np.random.default_rng(0)
    sel = rng.choice(sel, size=min(200_000, len(sel)), replace=False)
    g = gnp[sel]
    t_of = tile_of[sel]

    mean = np.asarray(scene.mean, np.float64)[g]
    op = np.asarray(scene.opacity, np.float64)[g]
    rc = (np.asarray(radius3, np.float64)[g] / 3.0) * np.sqrt(
        2.0 * np.clip(np.log(np.clip(op, 1e-12, None) / ALPHA_MIN), 0, None))
    cr3 = np.asarray(radius3, np.float64)[g]
    apex = np.asarray(tiles.apex, np.float64)[t_of]
    axis = np.asarray(tiles.axis, np.float64)[t_of]
    spread = np.asarray(tiles.spread, np.float64)[t_of]
    frame = np.asarray(tiles.probe_frame, np.float64)[t_of]  # (S, 2, 3)
    box = np.asarray(tiles.probe_box, np.float64)[t_of]  # (S, NQUAD, 5)
    pok = np.asarray(tiles.probe_ok)[t_of]
    rays = np.asarray(tiles.rays, np.float64)[t_of]  # (S, 8, NRAY)

    rel = mean - apex
    w = np.einsum("sc,sc->s", rel, axis)
    invw = 1.0 / np.maximum(w, 1e-6)
    u0 = np.einsum("sc,sc->s", rel, frame[:, 0]) * invw
    v0 = np.einsum("sc,sc->s", rel, frame[:, 1]) * invw
    gfac = (1.0 + u0 * u0 + v0 * v0 + 0.1) * invw * 1.05
    inside = np.zeros(len(sel), bool)
    for qd in range(NQUAD):
        sl = (rc + box[:, qd, 4]) * gfac
        inside |= ((np.abs(u0 - box[:, qd, 0]) <= box[:, qd, 1] + sl)
                   & (np.abs(v0 - box[:, qd, 2]) <= box[:, qd, 3] + sl))
    far = w > 4.0 * (rc + spread)
    applies = far & pok
    reject = applies & ~inside

    def frac(x):
        return f"{100.0 * np.mean(x):.1f}%"

    print(f"sampled candidates: {len(sel)}")
    print(f"far: {frac(far)}  probe_ok: {frac(pok)}  applies: {frac(applies)}"
          f"  inside: {frac(inside)}  reject: {frac(reject)}")
    print("box au p50/p90:",
          [round(float(np.percentile(box[:, :, 1], p)), 4) for p in (50, 90)],
          " av p50/p90:",
          [round(float(np.percentile(box[:, :, 3], p)), 4) for p in (50, 90)])
    print("slack (q0, gnomonic) p50/p90:",
          [round(float(np.percentile((rc + box[:, 0, 4]) * gfac, p)), 4)
           for p in (50, 90)])

    # ground truth contribution per sampled candidate (exact per-ray test)
    o = rays[:, 0:3, :]
    d = rays[:, 3:6, :]
    nrm = np.asarray(scene.normal, np.float64)[g]
    tu = np.asarray(scene.t_u, np.float64)[g]
    tv = np.asarray(scene.t_v, np.float64)[g]
    dnr = np.einsum("sc,scr->sr", nrm, d)
    dnr_s = np.where(np.abs(dnr) < 1e-9, 1e-9, dnr)
    numr = np.einsum("sc,scr->sr", nrm, mean[:, :, None] - o)
    tt = numr / dnr_s
    pp_ = o + tt[:, None, :] * d
    delta = pp_ - mean[:, :, None]
    u = np.einsum("sc,scr->sr", tu, delta)
    v = np.einsum("sc,scr->sr", tv, delta)
    alpha = op[:, None] * np.exp(-0.5 * (u * u + v * v))
    hit = (alpha >= ALPHA_MIN) & (tt > 1e-4) & (np.abs(dnr) >= 1e-9)
    contrib = hit.any(-1)
    print(f"contributors: {frac(contrib)}")
    bad = reject & contrib
    print(f"rejected & contributor (BAD): {int(np.sum(bad))} "
          f"of {int(np.sum(contrib))}")
    if np.any(bad):
        # how strong are the wrongly-dropped contributions?
        amax = alpha.max(-1)
        print("  max alpha of BAD rejects p50/p99/max:",
              [round(float(np.percentile(amax[bad], p)), 4)
               for p in (50, 99)], round(float(amax[bad].max()), 4))
    nc = ~contrib
    print(f"non-contributors rejected: {int(np.sum(reject & nc))} / "
          f"{int(np.sum(nc))} "
          f"({100.0 * np.sum(reject & nc) / max(np.sum(nc), 1):.1f}%)")
    print("non-contributors failing gates: "
          f"far {frac(~far[nc])}  pok {frac(~pok[nc])}  "
          f"inside {frac(inside[nc])}")


if __name__ == "__main__":
    main()
