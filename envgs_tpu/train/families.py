"""Config-driven training entry points for the non-Gaussian model families.

The reference trains every family through `REGISTRY.build(cfg)` + one
generic runner (easyvolcap/scripts/main.py:198-308). Here each family has a
functional train loop registered in `TRAINERS` under the reference's
sampler/network registry names, so

    python -m envgs_tpu train -c <cfg with model_cfg.sampler_cfg.type=...>

dispatches by `type:` exactly like the reference CLI. Families covered:
NeRF (hierarchical ray sampling), NeuS (SDF network), ENeRF (cost-volume
IBR), PointPlanes (R4DV dynamic points). EnvGS / Gaussian2D use the full
Runner (train/runner.py); GaussianT has its dedicated loop in cli.py.

Shared conventions (reference parity): checkpoints under
data/trained_model/<exp>/, metrics.json under data/result/<exp>/,
every-8th-style eval split from the dataset layer.
"""
from __future__ import annotations

import json
import os

import numpy as np

from envgs_tpu.engine import TRAINERS, Config
from envgs_tpu.engine.registry import call_filtered


def _named(cls, cfg: dict):
    cfg = {k: v for k, v in (cfg or {}).items() if k in cls._fields}
    return cls(**cfg)


def _runner_cfg(cfg: Config):
    rcfg = cfg.get("runner_cfg", {})
    total = int(rcfg.get("epochs", 1)) * int(rcfg.get("ep_iter", 500))
    return rcfg, total, int(rcfg.get("log_interval", 50))


def _dirs(cfg: Config):
    exp = cfg.get("exp_name", "exp")
    root = cfg.get("out_root", "data")
    model_dir = os.path.join(root, "trained_model", exp)
    result_dir = os.path.join(root, "result", exp)
    os.makedirs(model_dir, exist_ok=True)
    return model_dir, result_dir


def _save_params(model_dir: str, params, it: int):
    """Weights-only npz (net_utils.save_npz semantics)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez_compressed(
        os.path.join(model_dir, "latest.npz"),
        iter=it, treedef=str(treedef),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


class FamilyLoop:
    """Shared runner services for the family train loops — every family
    gets what the reference's single VolumetricVideoRunner gives all models
    (volumetric_video_runner.py:307-366): resume from latest.npz, periodic
    latest checkpointing (a crash loses at most save_latest_every iters),
    tensorboard recorder scalars, console ETA lines, and eval cadence.

    Usage:
        loop = FamilyLoop(cfg, "nerf")
        params, opt_state, start = loop.restore(params, opt_state)
        for it in range(start, loop.total):
            ... step ...
            loop.step_done(it, aux, params, opt_state)
        loop.finish(params, opt_state)
    """

    def __init__(self, cfg: Config, default_exp: str):
        import time as _time

        rcfg = cfg.get("runner_cfg", {})
        self.total = int(rcfg.get("epochs", 1)) * int(rcfg.get("ep_iter",
                                                               500))
        self.log_every = int(rcfg.get("log_interval", 50))
        self.save_latest_every = int(rcfg.get("save_latest_every", 1000))
        self.eval_every_iters = int(rcfg.get("eval_every_iters", 0))
        self.resume = bool(rcfg.get("resume", True))
        exp = cfg.get("exp_name", default_exp)
        root = cfg.get("out_root", "data")
        self.model_dir = os.path.join(root, "trained_model", exp)
        self.result_dir = os.path.join(root, "result", exp)
        os.makedirs(self.model_dir, exist_ok=True)
        from envgs_tpu.parallel.multihost import is_main_process
        from envgs_tpu.train.recorder import Recorder

        self.recorder = Recorder(
            os.path.join(root, "record", exp),
            enabled=bool(rcfg.get("record", True)) and is_main_process(),
            resolved_config=cfg.to_dict() if hasattr(cfg, "to_dict")
            else dict(cfg),
        )
        self._t0 = _time.time()
        self._start = 0

    # -- checkpoint IO: params + optimizer state + iteration ----------------
    def save(self, it: int, params, opt_state):
        import jax

        from envgs_tpu.parallel.multihost import is_main_process

        if not is_main_process():
            return
        pf, _ = jax.tree_util.tree_flatten(params)
        of, _ = jax.tree_util.tree_flatten(opt_state)
        np.savez_compressed(
            os.path.join(self.model_dir, "latest.npz"), iter=it,
            **{f"p{i}": np.asarray(x) for i, x in enumerate(pf)},
            **{f"o{i}": np.asarray(x) for i, x in enumerate(of)},
        )

    def restore(self, params, opt_state):
        """latest.npz -> (params, opt_state, start_iter); passthrough when
        absent/mismatched. Leaf count + shapes must match the current tree
        (families have static parameter shapes)."""
        import jax

        path = os.path.join(self.model_dir, "latest.npz")
        if not self.resume or not os.path.exists(path):
            return params, opt_state, 0
        z = np.load(path)
        pf, ptd = jax.tree_util.tree_flatten(params)
        of, otd = jax.tree_util.tree_flatten(opt_state)
        try:
            new_p = [jnp_like(pf[i], z[f"p{i}"]) for i in range(len(pf))]
            new_o = [jnp_like(of[i], z[f"o{i}"]) for i in range(len(of))]
        except KeyError:
            print(f"[resume] {path} layout mismatch; starting fresh")
            return params, opt_state, 0
        self._start = int(z["iter"])
        print(f"[resume] {path} @ iter {self._start}")
        return (jax.tree_util.tree_unflatten(ptd, new_p),
                jax.tree_util.tree_unflatten(otd, new_o), self._start)

    # -- per-iteration services ---------------------------------------------
    def step_done(self, it: int, aux: dict, params, opt_state,
                  eval_fn=None):
        import time as _time

        nxt = it + 1
        if it % self.log_every == 0 or nxt == self.total:
            stats = {k: float(v) for k, v in aux.items() if np.ndim(v) == 0}
            self.recorder.record("TRAIN", stats, it=it)
            done = it - self._start + 1
            eta = (_time.time() - self._t0) / max(done, 1) * (
                self.total - nxt)
            line = " ".join(f"{k} {v:.4f}" for k, v in stats.items()
                            if k in ("loss", "psnr"))
            print(f"iter {it}/{self.total} {line} eta {eta / 60:.1f}m",
                  flush=True)
        if self.save_latest_every and nxt % self.save_latest_every == 0:
            self.save(nxt, params, opt_state)
        if (self.eval_every_iters and eval_fn is not None
                and nxt % self.eval_every_iters == 0):
            try:
                eval_fn(nxt)
            except Exception as e:  # eval must not kill training
                print(f"[eval error ignored] {e}")

    def finish(self, params, opt_state):
        self.save(self.total, params, opt_state)
        self.recorder.close()


def jnp_like(ref, arr):
    """Restore a checkpoint leaf with the reference leaf's dtype; shape
    mismatches raise (families use static shapes)."""
    import jax.numpy as jnp

    a = np.asarray(arr)
    if a.shape != tuple(np.shape(ref)):
        raise KeyError(f"shape {a.shape} != {np.shape(ref)}")
    return jnp.asarray(a, jnp.asarray(ref).dtype)


def _load_views_generic(cfg: Config):
    """dataset_cfg -> (train views, eval views); synthetic or on-disk."""
    dcfg = cfg.get("dataset_cfg", {})
    if dcfg.get("source", "synthetic") == "synthetic":
        from envgs_tpu.data.synthetic import make_scene

        scene = make_scene(
            n_views=dcfg.get("n_views", 12), H=dcfg.get("H", 64),
            W=dcfg.get("W", 64), seed=dcfg.get("seed", 0),
        )
        split = dcfg.get("eval_every", 4)
        views, eval_views = [], []
        for i, cam in enumerate(scene.cams):
            v = dict(rgb=scene.images[i], camera=cam, name=f"{i:02d}",
                     t=i / max(len(scene.cams) - 1, 1))
            (eval_views if (split and i % split == 0) else views).append(v)
        return views, eval_views
    from envgs_tpu.data.dataset import MultiViewDataset

    ds = call_filtered(MultiViewDataset, dict(dcfg, split="train"))
    vs = call_filtered(MultiViewDataset, dict(dcfg, split="val"))
    return [ds[i] for i in range(len(ds))], [vs[i] for i in range(len(vs))]


def _ray_pool(views):
    """Stack all training rays/colors for random ray-batch sampling."""
    import jax.numpy as jnp

    from envgs_tpu.utils.camera import get_rays

    ro, rd, rgb = [], [], []
    for v in views:
        cam = v["camera"]
        o, d = get_rays(cam, z_depth=False)  # o (3,) shared pinhole origin
        d = np.asarray(d).reshape(-1, 3)
        ro.append(np.broadcast_to(np.asarray(o), d.shape).copy())
        rd.append(d)
        rgb.append(np.asarray(v["rgb"]).reshape(-1, 3))
    return (jnp.asarray(np.concatenate(ro)), jnp.asarray(np.concatenate(rd)),
            jnp.asarray(np.concatenate(rgb)))


def _eval_rays_loop(render_chunk, eval_views, result_dir, chunk=4096):
    """Chunked full-image eval -> metrics.json (evaluator conventions)."""
    import jax.numpy as jnp

    from envgs_tpu.train.evaluator import Evaluator
    from envgs_tpu.utils.camera import get_rays

    ev = Evaluator(result_dir)
    for i, v in enumerate(eval_views):
        cam = v["camera"]
        o, d = get_rays(cam, z_depth=False)  # o (3,) shared pinhole origin
        d = np.asarray(d).reshape(-1, 3)
        o = np.broadcast_to(np.asarray(o), d.shape)
        outs = []
        for s in range(0, len(o), chunk):
            sl = slice(s, min(s + chunk, len(o)))
            n = sl.stop - sl.start
            pad = chunk - n
            oc = jnp.asarray(np.pad(o[sl], ((0, pad), (0, 0))))
            dc = jnp.asarray(np.pad(d[sl], ((0, pad), (0, 0))))
            outs.append(np.asarray(render_chunk(oc, dc))[:n])
        rgb = np.concatenate(outs).reshape(cam.H, cam.W, 3)
        ev.evaluate(np.clip(rgb, 0, 1), np.asarray(v["rgb"]),
                    name=v.get("name", str(i)))
    summary = ev.summarize()
    print(json.dumps(summary["summary"], indent=2))
    return summary


def _near_far(cfg: Config, views):
    dcfg = cfg.get("dataset_cfg", {})
    cam = views[0]["camera"]
    return (float(dcfg.get("near", cam.znear)),
            float(dcfg.get("far", min(cam.zfar, 20.0))))


@TRAINERS.register(name="VolumetricVideoNetwork")
@TRAINERS.register(name="MultilevelNetwork")
@TRAINERS.register(name="UniformSampler")
@TRAINERS.register(name="ImportanceSampler")
def train_nerf(cfg: Config):
    """NeRF family: hierarchical ray-batch training + held-out eval."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.nerf import (
        NerfConfig,
        make_nerf_train_step,
        render_rays_nerf,
    )

    views, eval_views = _load_views_generic(cfg)
    mcfg = cfg.get("model_cfg", {})
    ncfg = _named(NerfConfig, {**mcfg.get("network_cfg", {}),
                               **mcfg.get("sampler_cfg", {})})
    rcfg, total, log_every = _runner_cfg(cfg)
    n_rays = int(rcfg.get("n_rays", 1024))
    lr = float(rcfg.get("lr", 5e-4))
    near, far = _near_far(cfg, views)
    model_dir, result_dir = _dirs(cfg)
    loop = FamilyLoop(cfg, "nerf")

    init, step = make_nerf_train_step(ncfg, lr)
    key = jax.random.PRNGKey(int(rcfg.get("seed", 0)))
    key, ik = jax.random.split(key)
    params, opt_state = init(ik)
    params, opt_state, start = loop.restore(params, opt_state)
    ro, rd, rgb = _ray_pool(views)
    nf = jnp.full((n_rays,), near), jnp.full((n_rays,), far)
    rng = np.random.default_rng(0)
    for it in range(start, loop.total):
        idx = jnp.asarray(rng.integers(0, ro.shape[0], n_rays))
        key, sk = jax.random.split(key)
        params, opt_state, aux = step(
            params, opt_state, ro[idx], rd[idx], nf[0], nf[1], rgb[idx], sk)
        loop.step_done(it, aux, params, opt_state)
    loop.finish(params, opt_state)

    if eval_views:
        def render_chunk(o, d):
            n = o.shape[0]
            out = render_rays_nerf(
                ncfg, params, o, d, jnp.full((n,), near), jnp.full((n,), far))
            return out["rgb_map"]

        return _eval_rays_loop(jax.jit(render_chunk), eval_views, result_dir)
    return None


@TRAINERS.register(name="NeusNetwork")
def train_neus(cfg: Config):
    """NeuS family: SDF ray-batch training + held-out eval."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.neus import (
        NeusConfig,
        make_neus_train_step,
        render_rays_neus,
    )

    views, eval_views = _load_views_generic(cfg)
    mcfg = cfg.get("model_cfg", {})
    ncfg = _named(NeusConfig, {**mcfg.get("network_cfg", {}),
                               **mcfg.get("sampler_cfg", {})})
    rcfg, total, log_every = _runner_cfg(cfg)
    n_rays = int(rcfg.get("n_rays", 512))
    lr = float(rcfg.get("lr", 5e-4))
    near, far = _near_far(cfg, views)
    model_dir, result_dir = _dirs(cfg)
    loop = FamilyLoop(cfg, "neus")

    init, step = make_neus_train_step(ncfg, lr)
    key = jax.random.PRNGKey(int(rcfg.get("seed", 0)))
    key, ik = jax.random.split(key)
    params, opt_state = init(ik)
    params, opt_state, start = loop.restore(params, opt_state)
    ro, rd, rgb = _ray_pool(views)
    rng = np.random.default_rng(0)
    for it in range(start, loop.total):
        idx = jnp.asarray(rng.integers(0, ro.shape[0], n_rays))
        key, sk = jax.random.split(key)
        params, opt_state, aux = step(
            params, opt_state, ro[idx], rd[idx],
            jnp.full((n_rays,), near), jnp.full((n_rays,), far),
            rgb[idx], sk)
        loop.step_done(it, aux, params, opt_state)
    loop.finish(params, opt_state)

    if eval_views:
        def render_chunk(o, d):
            n = o.shape[0]
            out = render_rays_neus(
                ncfg, params, o, d, jnp.full((n,), near), jnp.full((n,), far))
            return out["rgb_map"]

        return _eval_rays_loop(jax.jit(render_chunk), eval_views, result_dir)
    return None


@TRAINERS.register(name="CostVolumeSampler")
def train_enerf(cfg: Config):
    """ENeRF family: generalizable cost-volume IBR training."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.enerf import (
        ENeRFConfig,
        make_enerf_train_step,
        render_enerf,
    )
    from envgs_tpu.train.evaluator import Evaluator
    from envgs_tpu.utils.camera import Camera

    dcfg = cfg.get("dataset_cfg", {})
    mcfg = cfg.get("model_cfg", {})
    ecfg = _named(ENeRFConfig, mcfg.get("sampler_cfg", {}))
    n_srcs = int(mcfg.get("sampler_cfg", {}).get("n_srcs", 2))
    rcfg, total, log_every = _runner_cfg(cfg)
    lr = float(rcfg.get("lr", 5e-4))
    model_dir, result_dir = _dirs(cfg)

    if dcfg.get("source", "synthetic") == "synthetic":
        views, eval_views = _load_views_generic(cfg)
        centers_train = np.stack(
            [np.asarray(v["camera"].center) for v in views])

        def item(i, pool):
            # nearest-train-camera source stacks (ImageBasedDataset
            # src_indices_for semantics; self excluded by the zero-distance
            # guard when pool is the train set)
            v = pool[i]
            dist = np.linalg.norm(
                centers_train - np.asarray(v["camera"].center), axis=-1)
            dist[dist < 1e-9] = np.inf
            src = list(np.argsort(dist)[:n_srcs])
            return v, [views[j] for j in src]
    else:
        from envgs_tpu.data.video_dataset import ImageBasedDataset

        ds = call_filtered(
            ImageBasedDataset, dict(dcfg, split="train", n_srcs=n_srcs))
        vs = call_filtered(
            ImageBasedDataset, dict(dcfg, split="val", n_srcs=n_srcs))
        views = [ds[i] for i in range(len(ds))]
        eval_views = [vs[i] for i in range(len(vs))]

        def item(i, pool):
            v = pool[i]
            return v, [dict(rgb=v["src_inps"][k], camera=v["src_cams"][k])
                       for k in range(n_srcs)]

    near, far = _near_far(cfg, views)
    cam0 = views[0]["camera"]
    init, step = make_enerf_train_step(ecfg, cam0, n_srcs, near, far, lr)
    key = jax.random.PRNGKey(int(rcfg.get("seed", 0)))
    params, opt_state = init(key)
    loop = FamilyLoop(cfg, "enerf")
    params, opt_state, start = loop.restore(params, opt_state)
    rng = np.random.default_rng(0)
    for it in range(start, loop.total):
        v, srcs = item(int(rng.integers(0, len(views))), views)
        cam = v["camera"]
        src_imgs = jnp.asarray(np.stack([np.asarray(s["rgb"]) for s in srcs]))
        Ks = jnp.asarray(np.stack([np.asarray(s["camera"].K) for s in srcs]))
        Rs = jnp.asarray(np.stack([np.asarray(s["camera"].R) for s in srcs]))
        Ts = jnp.asarray(np.stack([np.asarray(s["camera"].T) for s in srcs]))
        params, opt_state, aux = step(
            params, opt_state, jnp.asarray(cam.K), cam.R, cam.T,
            src_imgs, Ks, Rs, Ts, jnp.asarray(v["rgb"]))
        loop.step_done(it, aux, params, opt_state)
    loop.finish(params, opt_state)

    if eval_views:
        ev = Evaluator(result_dir)
        for i in range(len(eval_views)):
            v, srcs = item(i, eval_views)
            cam = v["camera"]
            src_imgs = jnp.asarray(
                np.stack([np.asarray(s["rgb"]) for s in srcs]))
            out = render_enerf(
                ecfg, params, Camera(cam.H, cam.W, cam.K, cam.R, cam.T),
                src_imgs, [s["camera"] for s in srcs], near, far)
            ev.evaluate(np.clip(np.asarray(out.rgb_map), 0, 1),
                        np.asarray(v["rgb"]), name=v.get("name", str(i)))
        summary = ev.summarize()
        print(json.dumps(summary["summary"], indent=2))
        return summary
    return None


@TRAINERS.register(name="STGSModel")
@TRAINERS.register(name="STGSSampler")
def train_stgs(cfg: Config):
    """Spacetime-Gaussian (STGS/FDGS) family: dynamic 3DGS with temporal
    RBF opacity + linear motion, trained over a (view, time) stream —
    the reference trains STGSModel through the same generic runner
    (easyvolcap/utils/stgs_utils.py:63-661)."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models import gaussians as G
    from envgs_tpu.models.stgs import (
        STGSConfig,
        init_stgs_pool,
        init_stgs_state,
        make_stgs_train_step,
        render_stgs,
        reset_t,
        save_stgs_ply,
        stgs_lr_config,
        stgs_maintenance,
    )
    from envgs_tpu.train.evaluator import Evaluator

    views, eval_views = _load_views_generic(cfg)
    mcfg = cfg.get("model_cfg", {})
    scfg = {**mcfg.get("network_cfg", {}), **mcfg.get("sampler_cfg", {})}
    gcfg = _named(STGSConfig, scfg)
    if jax.default_backend() == "cpu" and gcfg.raster_backend == "pallas":
        gcfg = gcfg._replace(raster_backend="ref")
    rcfg, total, log_every = _runner_cfg(cfg)
    model_dir, result_dir = _dirs(cfg)
    loop = FamilyLoop(cfg, "stgs")

    # init: SfM points (on-disk) or random cloud (synthetic), spread over t
    dcfg = cfg.get("dataset_cfg", {})
    rng = np.random.default_rng(int(rcfg.get("seed", 0)))
    if dcfg.get("source", "synthetic") == "synthetic":
        P0 = int(scfg.get("n_points", 2048))
        pts = rng.uniform(-1, 1, (P0, 3)).astype(np.float32)
        pts[:, 2] += 3.0
        cols = rng.random((P0, 3)).astype(np.float32)
    else:
        from envgs_tpu.data.dataset import MultiViewDataset

        ds = call_filtered(MultiViewDataset, dict(dcfg, split="train"))
        pts, cols = ds.load_sfm(dcfg.get("preload_gs"))
    times = rng.random(len(pts)).astype(np.float32)
    cap = int(scfg.get("pool_cap", max(len(pts) * 4, 1024)))
    pool = init_stgs_pool(pts, times, cols, cap, gcfg)
    state = init_stgs_state(pool)
    lr_cfg = stgs_lr_config(duration=gcfg.duration)
    dens = _named(G.DensifyConfig, dict(scfg, max_gs=cap))
    densify_every = int(scfg.get("densification_interval", 200))
    densify_until = int(scfg.get("densify_until_iter", total // 2))
    reset_t_every = int(scfg.get("reset_t_interval", 0))

    step_cache: dict = {}

    def step_for(cam):
        k = (cam.H, cam.W)
        if k not in step_cache:
            step_cache[k] = make_stgs_train_step(gcfg, cam, lr_cfg,
                                                 donate=False)
        return step_cache[k]

    state, _, start = loop.restore(state, ())
    key = jax.random.PRNGKey(int(rcfg.get("seed", 0)))
    for it in range(start, loop.total):
        if 0 < it < densify_until and it % densify_every == 0:
            key, mk = jax.random.split(key)
            state = stgs_maintenance(state, dens, mk)
        if reset_t_every and it > 0 and it % reset_t_every == 0:
            pool2, opt2 = reset_t(state.pool, state.opt, 0.0, gcfg.duration)
            state = state._replace(pool=pool2, opt=opt2)
        v = views[int(rng.integers(0, len(views)))]
        cam = v["camera"]
        tt = jnp.asarray(float(v.get("t", 0.0)))
        state, aux = step_for(cam)(state, jnp.asarray(cam.K), cam.R, cam.T,
                                   tt, jnp.asarray(v["rgb"]),
                                   jnp.asarray(it))
        loop.step_done(it, aux, state, ())
    loop.finish(state, ())
    save_stgs_ply(state.pool, os.path.join(model_dir, "point_cloud.ply"))

    if eval_views:
        ev = Evaluator(result_dir)
        for i, v in enumerate(eval_views):
            out = render_stgs(state.pool, v["camera"],
                              jnp.asarray(float(v.get("t", 0.0))), gcfg)
            ev.evaluate(np.clip(np.asarray(out.rgb), 0, 1),
                        np.asarray(v["rgb"]), name=v.get("name", str(i)))
        summary = ev.summarize()
        print(json.dumps(summary["summary"], indent=2))
        return summary
    return state


@TRAINERS.register(name="PointPlanesSampler")
def train_point_planes(cfg: Config):
    """PointPlanes (R4DV) family: dynamic point clouds over a frame axis."""
    import jax
    import jax.numpy as jnp

    from envgs_tpu.models.point_planes import (
        PointPlanesConfig,
        make_point_planes_train_step,
        point_planes_forward,
    )
    from envgs_tpu.train.evaluator import Evaluator

    dcfg = cfg.get("dataset_cfg", {})
    mcfg = cfg.get("model_cfg", {})
    rcfg, total, log_every = _runner_cfg(cfg)
    lr = float(rcfg.get("lr", 5e-3))
    model_dir, result_dir = _dirs(cfg)

    if dcfg.get("source", "synthetic") == "synthetic":
        views, eval_views = _load_views_generic(cfg)
        rng0 = np.random.default_rng(0)
        pts = rng0.uniform(-1, 1, (int(
            mcfg.get("sampler_cfg", {}).get("n_points", 2048)), 3)
        ).astype(np.float32)
        n_frames = int(mcfg.get("sampler_cfg", {}).get(
            "n_frames", max(len(views), 2)))
    else:
        from envgs_tpu.data.video_dataset import MultiViewVideoDataset

        ds = call_filtered(
            MultiViewVideoDataset, dict(dcfg, split="train"))
        vs = call_filtered(MultiViewVideoDataset, dict(dcfg, split="val"))
        views = [ds[i] for i in range(len(ds))]
        eval_views = [vs[i] for i in range(len(vs))]
        pts, _ = ds.load_sfm(dcfg.get("preload_gs"))
        n_frames = ds.n_frames
    pcfg = _named(PointPlanesConfig, dict(
        mcfg.get("sampler_cfg", {}), n_frames=n_frames))
    if jax.default_backend() == "cpu" and pcfg.raster_backend == "pallas":
        pcfg = pcfg._replace(raster_backend="ref")

    cam0 = views[0]["camera"]
    init, step = make_point_planes_train_step(pcfg, cam0, lr)
    key = jax.random.PRNGKey(int(rcfg.get("seed", 0)))
    params, opt_state = init(key, jnp.asarray(pts))
    loop = FamilyLoop(cfg, "point_planes")
    params, opt_state, start = loop.restore(params, opt_state)
    rng = np.random.default_rng(0)
    for it in range(start, loop.total):
        v = views[int(rng.integers(0, len(views)))]
        cam = v["camera"]
        t = jnp.asarray(float(v.get("t", 0.0)))
        params, opt_state, aux = step(
            params, opt_state, t, jnp.asarray(cam.K), cam.R, cam.T,
            jnp.asarray(v["rgb"]))
        loop.step_done(it, aux, params, opt_state)
    loop.finish(params, opt_state)

    if eval_views:
        ev = Evaluator(result_dir)
        for i, v in enumerate(eval_views):
            out = point_planes_forward(
                pcfg, params, jnp.asarray(float(v.get("t", 0.0))),
                v["camera"])
            ev.evaluate(np.clip(np.asarray(out.rgb), 0, 1),
                        np.asarray(v["rgb"]), name=v.get("name", str(i)))
        summary = ev.summarize()
        print(json.dumps(summary["summary"], indent=2))
        return summary
    return None
