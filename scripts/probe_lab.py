"""Offline lab for tracer probe-test variants over /tmp/probe_data.npz
(dumped by scripts/tpu_dump_probe_data.py). Pure numpy — iterate freely.

Each variant reports: rejection rate among exact non-contributors, wrongly
rejected true contributors (must be ~0), and the projected candidate fill.
"""
import sys

import numpy as np

z = np.load("/tmp/probe_data.npz")
Pe = int(z["Pe"])
gnp = z["gauss_idx"]
bnp = z["bounds"]
T = len(bnp) - 1
cap = len(gnp)
tile_of = np.zeros(cap, np.int64)
tile_of[bnp[:-1]] = np.arange(T)
tile_of = np.maximum.accumulate(tile_of)
used = int(bnp[-1])
sel = np.arange(used)[gnp[:used] < Pe]
rng = np.random.default_rng(0)
NS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
sub = rng.choice(sel, size=min(NS, len(sel)), replace=False)
g = gnp[sub]
t_of = tile_of[sub]

mean = z["mean"].astype(np.float64)[g]
nrm = z["normal"].astype(np.float64)[g]
tu = z["t_u"].astype(np.float64)[g]
tv = z["t_v"].astype(np.float64)[g]
op = z["opacity"].astype(np.float64)[g]
r3 = z["radius3"].astype(np.float64)[g]
ALPHA_MIN = 1.0 / 255.0
rc = (r3 / 3.0) * np.sqrt(
    2.0 * np.clip(np.log(np.clip(op, 1e-12, None) / ALPHA_MIN), 0, None))
apex = z["apex"].astype(np.float64)[t_of]
axis = z["axis"].astype(np.float64)[t_of]
tanh = z["tan_half"].astype(np.float64)[t_of]
spread = z["spread"].astype(np.float64)[t_of]
rays_all = z["rays"].astype(np.float64)  # (T, 8, NRAY)
NRAY = rays_all.shape[-1]
RT = int(np.sqrt(NRAY))

# ---- exact ground truth (chunked) ----
S = len(sub)
contrib = np.zeros(S, bool)
minplane = np.full(S, np.inf)
CH = 20000
for i0 in range(0, S, CH):
    s = slice(i0, i0 + CH)
    r = rays_all[t_of[s]]
    o, d = r[:, 0:3, :], r[:, 3:6, :]
    dnr = np.einsum("sc,scr->sr", nrm[s], d)
    dnr_s = np.where(np.abs(dnr) < 1e-9, 1e-9, dnr)
    numr = np.einsum("sc,scr->sr", nrm[s], mean[s][:, :, None] - o)
    tt = numr / dnr_s
    delta = o + tt[:, None, :] * d - mean[s][:, :, None]
    u = np.einsum("sc,scr->sr", tu[s], delta)
    v = np.einsum("sc,scr->sr", tv[s], delta)
    rho = u * u + v * v
    alpha = op[s][:, None] * np.exp(-0.5 * rho)
    ok_t = (tt > 1e-4) & (np.abs(dnr) >= 1e-9)
    hit = (alpha >= ALPHA_MIN) & ok_t
    contrib[s] = hit.any(-1)
    minplane[s] = np.sqrt(np.min(np.where(ok_t, rho, np.inf), -1))

print(f"candidates {S}  contributors {contrib.mean() * 100:.1f}%")

# ---- tile frames / ray projections (shared by variants) ----
up = np.where(np.abs(axis[:, 2:3]) < 0.9, [[0.0, 0, 1]], [[1.0, 0, 0]])
ex = np.cross(up, axis)
ex /= np.linalg.norm(ex, axis=-1, keepdims=True)
ey = np.cross(axis, ex)
# per-unique-tile ray projections
ut, inv_ut = np.unique(t_of, return_inverse=True)
r_u = rays_all[ut]
o_u = r_u[:, 0:3, :].transpose(0, 2, 1)  # (t, NRAY, 3)
d_u = r_u[:, 3:6, :].transpose(0, 2, 1)
d_u = d_u / np.linalg.norm(d_u, axis=-1, keepdims=True)
ax_u = z["axis"].astype(np.float64)[ut]
ex_u = ex[np.searchsorted(ut, ut)]  # placeholder; recompute per-unique
up_u = np.where(np.abs(ax_u[:, 2:3]) < 0.9, [[0.0, 0, 1]], [[1.0, 0, 0]])
ex_u = np.cross(up_u, ax_u)
ex_u /= np.linalg.norm(ex_u, axis=-1, keepdims=True)
ey_u = np.cross(ax_u, ex_u)
wr = np.einsum("tric,tc->tri", d_u[:, :, None], ax_u)[:, :, 0]
wr = np.einsum("trc,tc->tr", d_u, ax_u)
pok_u = wr.min(-1) > 0.2
iw = 1.0 / np.maximum(wr, 0.2)
uu = np.einsum("trc,tc->tr", d_u, ex_u) * iw
vv = np.einsum("trc,tc->tr", d_u, ey_u) * iw
ap_u = z["apex"].astype(np.float64)[ut]
od = o_u - ap_u[:, None, :]
odx = np.einsum("trc,tc->tr", od, ex_u)
ody = np.einsum("trc,tc->tr", od, ey_u)
odz = np.einsum("trc,tc->tr", od, ax_u)


def boxes(nq):
    """(t, nq*nq, ...) per-patch boxes of dir coords and origin offsets."""
    def quad(x, red):
        return red(x.reshape(-1, nq, RT // nq, nq, RT // nq),
                   axis=(2, 4)).reshape(-1, nq * nq)

    return {
        "u_hi": quad(uu, np.max), "u_lo": quad(uu, np.min),
        "v_hi": quad(vv, np.max), "v_lo": quad(vv, np.min),
        "ox_hi": quad(odx, np.max), "ox_lo": quad(odx, np.min),
        "oy_hi": quad(ody, np.max), "oy_lo": quad(ody, np.min),
        "oz_hi": quad(odz, np.max), "oz_lo": quad(odz, np.min),
        "oz": quad(np.abs(odz), np.max),
        "spr": quad(np.linalg.norm(od, axis=-1), np.max),
    }


rel = mean - apex
w = np.einsum("sc,sc->s", rel, axis)
invw = 1.0 / np.maximum(w, 1e-6)
u0 = np.einsum("sc,sc->s", rel, ex) * invw
v0 = np.einsum("sc,sc->s", rel, ey) * invw
ndax = np.abs(np.einsum("sc,sc->s", nrm, axis))


def evaluate(name, nq, use_nd, use_origin_proj, far_k=4.0, margin=1.05,
             ellipse=False):
    B = boxes(nq)
    gfac = (1.0 + u0 * u0 + v0 * v0 + 0.1) * invw * margin
    if use_nd:
        rce = rc * np.minimum(1.0, ndax + tanh) + 1e-3
    else:
        rce = rc
    if ellipse:
        # exact first-order gnomonic extents of the projected rc-disk:
        # u-extent = rc * max_theta e(theta).(ex - u0*axis) / w over unit e
        # in the disk plane (e perp n) = rc*|P_{perp n}(ex - u0 axis)|/w,
        # and |ex - u0 axis|^2 = 1 + u0^2 since ex perp axis.
        npx = np.einsum("sc,sc->s", nrm, ex)
        npy = np.einsum("sc,sc->s", nrm, ey)
        npz = np.einsum("sc,sc->s", nrm, axis)
        bnu = npx - u0 * npz
        bnv = npy - v0 * npz
        fr_u = rc * np.sqrt(np.clip(1.0 + u0 * u0 - bnu * bnu, 0.0, None))
        fr_v = rc * np.sqrt(np.clip(1.0 + v0 * v0 - bnv * bnv, 0.0, None))
    inside = np.zeros(S, bool)
    for qd in range(nq * nq):
        cu = 0.5 * (B["u_hi"][inv_ut, qd] + B["u_lo"][inv_ut, qd])
        au = 0.5 * (B["u_hi"][inv_ut, qd] - B["u_lo"][inv_ut, qd])
        cv = 0.5 * (B["v_hi"][inv_ut, qd] + B["v_lo"][inv_ut, qd])
        av = 0.5 * (B["v_hi"][inv_ut, qd] - B["v_lo"][inv_ut, qd])
        if use_origin_proj:
            # origin perpendicular extents shift/widen the dir box by
            # -(o_perp)/w; along-axis extent folds into a 1/(1-oz/w)
            # inflation (far gate bounds oz/w)
            ocu = 0.5 * (B["ox_hi"][inv_ut, qd] + B["ox_lo"][inv_ut, qd])
            oau = 0.5 * (B["ox_hi"][inv_ut, qd] - B["ox_lo"][inv_ut, qd])
            ocv = 0.5 * (B["oy_hi"][inv_ut, qd] + B["oy_lo"][inv_ut, qd])
            oav = 0.5 * (B["oy_hi"][inv_ut, qd] - B["oy_lo"][inv_ut, qd])
            # first-order origin shift of the candidate direction seen
            # from o_r: delta_u = (-odx + u0*odz)/w; box both terms.
            # Second-order bounded by (oz/w)^2 <= 6% at the far gate ->
            # margin2
            ocz = 0.5 * (B["oz_hi"][inv_ut, qd] + B["oz_lo"][inv_ut, qd])
            oaz = 0.5 * (B["oz_hi"][inv_ut, qd] - B["oz_lo"][inv_ut, qd])
            margin2 = 1.10
            if ellipse:
                # exact first-order extents: only invw + a second-order
                # margin (O(rc/w) + O((u,v) spread) ~ few %)
                slu = fr_u * invw * margin * 1.05
                slv = fr_v * invw * margin * 1.05
            else:
                slu = slv = rce * gfac
            du = (np.abs(u0 - cu - (ocu - u0 * ocz) * invw)
                  - (au + (oau + np.abs(u0) * oaz) * invw * margin2))
            dv = (np.abs(v0 - cv - (ocv - v0 * ocz) * invw)
                  - (av + (oav + np.abs(v0) * oaz) * invw * margin2))
        else:
            if ellipse:
                spr_ = B["spr"][inv_ut, qd]
                slu = fr_u * invw * margin * 1.05 + spr_ * gfac
                slv = fr_v * invw * margin * 1.05 + spr_ * gfac
            else:
                slu = slv = (rce + B["spr"][inv_ut, qd]) * gfac
            du = np.abs(u0 - cu) - au
            dv = np.abs(v0 - cv) - av
        inside |= (du <= slu) & (dv <= slv)
    far = w > far_k * (rc + spread)
    applies = far & pok_u[inv_ut]
    reject = applies & ~inside
    bad = reject & contrib
    nc = ~contrib
    fill = contrib.sum() + (nc & ~reject).sum()
    print(f"{name}: reject(nc) "
          f"{100.0 * (reject & nc).sum() / max(nc.sum(), 1):.1f}%  "
          f"BAD {bad.sum()}  kept-frac {fill / S * 100:.1f}%  "
          f"(applies {applies.mean() * 100:.0f}%)")
    if bad.sum():
        mp = minplane[bad]
        print(f"    BAD minplane sigma p50/max: "
              f"{np.percentile(mp, 50):.2f}/{mp.max():.2f}")


evaluate("A nq=2 ball-spr          ", 2, False, False)
evaluate("D nq=2 origin-proj       ", 2, False, True)
evaluate("H nq=2 ellipse +oproj    ", 2, False, True, ellipse=True)
evaluate("I nq=4 ellipse +oproj    ", 4, False, True, ellipse=True)
evaluate("J nq=8 ellipse +oproj    ", 8, False, True, ellipse=True)
evaluate("K nq=4 ellipse ball-spr  ", 4, False, False, ellipse=True)
evaluate("L nq=4 ellipse m=1.15    ", 4, False, True, margin=1.15,
         ellipse=True)
