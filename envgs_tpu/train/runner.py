"""Training / evaluation runner (host loop).

The counterpart of the reference's VolumetricVideoRunner
(/root/reference/easyvolcap/runners/volumetric_video_runner.py:307-571):
epoch-driven train loop with periodic save/eval, checkpoint resume with the
latest/N selection, console stat lines with ETA and smoothed losses, and
the test loop producing metrics.json + typed image dumps. Device work stays
inside the jitted train/render steps; everything here is host orchestration.
"""
from __future__ import annotations

import collections
import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models import gaussians as G
from envgs_tpu.models.envgs import EnvGSConfig, forward_envgs
from envgs_tpu.train import checkpoints as ckpt
from envgs_tpu.train.evaluator import Evaluator, Visualizer
from envgs_tpu.train.optimizer import LRConfig
from envgs_tpu.train.supervisor import LossConfig
from envgs_tpu.train.moderators import (CenterCropSchedule, RatioSchedule,
                                        center_crop_view, resize_view)
from envgs_tpu.train.trainer import (
    Batch,
    CamOptConfig,
    CamOptState,
    ScheduleConfig,
    TrainState,
    init_cam_opt,
    init_train_state,
    make_maintenance,
    make_train_step,
)
from envgs_tpu.utils.camera import Camera


class SmoothedValue:
    def __init__(self, window: int = 20):
        self.vals = collections.deque(maxlen=window)

    def update(self, v):
        self.vals.append(float(v))

    @property
    def median(self):
        return float(np.median(self.vals)) if self.vals else 0.0


class Runner:
    def __init__(
        self,
        views: list[dict],  # [{rgb, msk, norm?, camera}]
        base: G.GaussianPool,
        env: G.GaussianPool,
        model_cfg: EnvGSConfig,
        loss_cfg: LossConfig,
        sched: ScheduleConfig,
        dens_base: G.DensifyConfig,
        dens_env: G.DensifyConfig,
        lr_base: LRConfig,
        lr_env: LRConfig,
        exp_name: str = "exp",
        out_root: str = "data",
        save_latest_every: int = 5000,
        save_every: int = 0,
        log_every: int = 50,
        eval_views: list[dict] | None = None,
        eval_every_iters: int = 0,
        seed: int = 0,
        resume: bool = True,
        cam_opt: CamOptConfig = CamOptConfig(),
        ratio_sched: RatioSchedule | None = None,
        crop_sched: CenterCropSchedule | None = None,
        patch_size: tuple[int, int] | None = None,
        alternating=None,  # AlternatingSchedule: it -> "patch" | "full"
        aux_cfg=None,  # AuxLossConfig | None — chained aux supervisors
        collect_timing: bool = False,
        timer_sync: bool = False,
        timer_record_to_file: str | None = None,
        profiler_trace_dir: str | None = None,
        profiler_start: int = 10,
        profiler_steps: int = 5,
        record_dir: str | None = None,
        record: bool = True,
        resolved_config: dict | None = None,
    ):
        self.views = views
        self.eval_views = eval_views or []
        self.model_cfg = model_cfg
        self.loss_cfg = loss_cfg
        self.sched = sched
        self.lr_base, self.lr_env = lr_base, lr_env
        self.exp_name = exp_name
        self.model_dir = os.path.join(out_root, "trained_model", exp_name)
        self.result_dir = os.path.join(out_root, "result", exp_name)
        self.save_latest_every = save_latest_every
        self.save_every = save_every
        self.log_every = log_every
        self.eval_every_iters = eval_every_iters
        self.resume = resume
        self.cam_opt_cfg = cam_opt
        self.aux_cfg = aux_cfg
        self.ratio_sched = ratio_sched
        self.crop_sched = crop_sched
        self._crop_views: dict[float, dict[int, dict]] = {}
        self.patch_size = patch_size
        self.alternating = alternating

        self.has_norm = "norm" in views[0]
        # train steps are compiled per static resolution (ratio buckets /
        # patch size); the cache makes each bucket a one-time compile
        self._step_cache: dict[tuple[int, int], Any] = {}
        self._ratio_views: dict[float, dict[int, dict]] = {}
        self.maintain = make_maintenance(sched, dens_base, dens_env)
        self.state = init_train_state(base, env, jax.random.PRNGKey(seed))
        self.cam_state = init_cam_opt(len(views))
        self.start_iter = 0
        if resume:
            latest = ckpt.find_latest(self.model_dir)
            if latest:
                self.state, self.start_iter, cam_state = ckpt.load_checkpoint(
                    latest, base.cap, env.cap, n_views=len(views)
                )
                if cam_state is not None:
                    self.cam_state = cam_state
                print(f"[resume] {latest} @ iter {self.start_iter}")

        self._render_fns = {}

        # section timers + trace bracketing (runner:183-211 / prof_utils.py)
        from envgs_tpu.utils.timer import ProfilerSession, Timer
        self.timer = Timer(enabled=collect_timing, sync=timer_sync)
        self.timer_record_to_file = timer_record_to_file
        self.profiler = ProfilerSession(profiler_trace_dir, profiler_start,
                                        profiler_steps)

        # tensorboard recorder (recorders.py:170-191 semantics): TRAIN
        # scalars every log step, VAL summary + one render image per eval.
        # Rank-0 only, like every other output service.
        from envgs_tpu.parallel.multihost import is_main_process
        from envgs_tpu.train.recorder import Recorder
        self.recorder = Recorder(
            record_dir or os.path.join(out_root, "record", exp_name),
            enabled=record and is_main_process(),
            resolved_config=resolved_config,
        )

    def _step_fn(self, cam: Camera):
        key = (cam.H, cam.W)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                cam, self.model_cfg, self.loss_cfg, self.lr_base, self.lr_env,
                lpips_fn=self._lpips_fn(), has_norm=self.has_norm,
                cam_opt=self.cam_opt_cfg, aux_cfg=self.aux_cfg,
            )
        return self._step_cache[key]

    def _lpips_fn(self):
        """Differentiable JAX LPIPS for the perceptual loss, when VGG16
        weights exist on disk (envgs.yaml:80-81 trains it from iter 21k)."""
        if self.loss_cfg.perc_loss_weight <= 0:
            return None
        import functools

        from envgs_tpu.ops.lpips_jax import load_weights, lpips_pair

        params = load_weights()
        return (functools.partial(lpips_pair, params)
                if params is not None else None)

    def _batch(self, view) -> Batch:
        H, W = view["camera"].H, view["camera"].W
        dpt = view.get("dpt")
        return Batch(
            rgb=jnp.asarray(view["rgb"]),
            msk=jnp.asarray(view.get("msk", np.ones((H, W, 1), np.float32))),
            norm=jnp.asarray(view.get("norm", np.zeros((H, W, 3), np.float32))),
            dpt=jnp.asarray(dpt) if dpt is not None else None,
        )

    def _train_view(self, view_i: int, it: int, rng) -> tuple[dict, Camera, int]:
        """Pick the (possibly ratio-resized / patch-cropped) training view."""
        view = self.views[view_i]
        if self.ratio_sched is not None:
            ratio = self.ratio_sched(it)
            if abs(ratio - 1.0) > 1e-6:
                bucket = self._ratio_views.setdefault(ratio, {})
                if view_i not in bucket:
                    bucket[view_i] = resize_view(view, ratio)
                view = bucket[view_i]
        if self.crop_sched is not None:
            crop = self.crop_sched(it)
            if abs(crop - 1.0) > 1e-6:
                # key includes the source resolution: a ratio change must not
                # serve crops cached from another ratio bucket
                ck = (crop, view["camera"].H, view["camera"].W)
                bucket = self._crop_views.setdefault(ck, {})
                if view_i not in bucket:
                    bucket[view_i] = center_crop_view(view, crop)
                view = bucket[view_i]
        cam: Camera = view["camera"]
        use_patch = self.patch_size is not None
        if use_patch and self.alternating is not None:
            # AlternatingModerator semantics: only the "patch" pattern
            # iterations sample a crop; "full" iterations train full-image
            use_patch = self.alternating(it) == "patch"
        if use_patch:
            ph, pw = self.patch_size
            ph, pw = min(ph, cam.H), min(pw, cam.W)
            y0 = int(rng.integers(0, cam.H - ph + 1))
            x0 = int(rng.integers(0, cam.W - pw + 1))
            K = np.asarray(cam.K).copy()
            K[0, 2] -= x0
            K[1, 2] -= y0
            crop = {
                k: view[k][y0:y0 + ph, x0:x0 + pw]
                for k in ("rgb", "msk", "norm", "dpt") if k in view
            }
            view = dict(view, **crop)
            cam = cam._replace(H=ph, W=pw, K=K)
        return view, cam, view_i

    def train(self):
        total = self.sched.total_iters
        smoothed = collections.defaultdict(SmoothedValue)
        rng = np.random.default_rng(0)
        order = rng.permutation(len(self.views))
        oi = 0
        t_start = time.time()
        key = jax.random.PRNGKey(1234)

        # evc-sig analog (reference scripts/sigusr1.py + pyproject evc-sig):
        # SIGUSR1 -> status dump + checkpoint at the next loop boundary;
        # SIGUSR2 -> checkpoint only. Handlers just set flags (signal-safe);
        # `python -m envgs_tpu sig <exp>` sends them by experiment name.
        import signal as _signal

        sig_flags = {"dump": False, "save": False}

        def _on_usr1(*_a):
            sig_flags["dump"] = sig_flags["save"] = True

        def _on_usr2(*_a):
            sig_flags["save"] = True

        try:
            _signal.signal(_signal.SIGUSR1, _on_usr1)
            _signal.signal(_signal.SIGUSR2, _on_usr2)
        except ValueError:
            pass  # not the main thread (e.g. under a test harness)

        def prepare(i: int):
            """Select view i's training crop and start its host->device
            transfer (jnp.asarray dispatches an async copy)."""
            nonlocal oi, order
            vi = int(order[oi])
            oi += 1
            if oi >= len(order):
                order = rng.permutation(len(self.views))
                oi = 0
            v, c, vi = self._train_view(vi, i, rng)
            return v, c, vi, self._batch(v)

        pending = None
        for it in range(self.start_iter, total):
            self.profiler.step(it)
            self.timer.tick()
            key, mkey = jax.random.split(key)
            self.state = self.maintain(self.state, it, mkey)
            self.timer.record("maintain")

            if pending is None:
                pending = prepare(it)
            view, cam, view_i, batch = pending
            self.timer.record("data")
            if self.cam_opt_cfg.enabled:
                self.state, self.cam_state, stats = self._step_fn(cam)(
                    self.state, self.cam_state, batch,
                    cam.K, cam.R, cam.T, jnp.asarray(view_i), jnp.asarray(it),
                )
            else:
                self.state, stats = self._step_fn(cam)(
                    self.state, batch,
                    cam.K, cam.R, cam.T, jnp.asarray(it),
                )
            # host->device prefetch of the NEXT batch while the device is
            # busy with the just-dispatched step, BEFORE anything blocks on
            # this step's outputs (the reference's CUDA-stream prefetcher,
            # volumetric_video_runner.py:378-394)
            pending = prepare(it + 1) if it + 1 < total else None
            self.timer.record("step", stats.get("loss"))

            # adaptive pair-cap escalation — checked EVERY step, one step
            # DELAYED (a snug cap must not silently drop pairs for up to
            # log_every-1 steps, but fetching THIS step's scalars would
            # host-sync every iteration and kill the one-step async
            # run-ahead the prefetch above preserves; the previous step's
            # outputs are already materialized by the time this step was
            # dispatched, so float() on them is (nearly) free). One extra
            # step runs at the snug cap after an overflow — the counters
            # stay >0 so escalation still fires. On overflow, double the
            # offending cap and recompile — configs can start SNUG
            # (sort/gather/transpose cost scales with the cap) and only
            # pay for capacity actually needed.
            check = prev_stats if it > self.start_iter else {}
            if it == total - 1:
                check = stats  # last step: nothing after; fetch directly
            prev_stats = stats
            grew = {}
            if float(check.get("pair_overflow", 0)) > 0:
                grew["pair_cap"] = self.model_cfg.pair_cap * 2
            if float(check.get("trace_dropped", 0)) > 0:
                grew["env_pair_cap"] = self.model_cfg.env_pair_cap * 2
            if grew:
                self.model_cfg = self.model_cfg._replace(**grew)
                self._step_cache.clear()
                self._render_fns = {}
                print("[capacity] growing " + ", ".join(
                    f"{k} -> {v}" for k, v in grew.items())
                    + " (recompile)", flush=True)

            if it % self.log_every == 0 or it == total - 1:
                stats = {k: float(v) for k, v in stats.items()}
                for k, v in stats.items():
                    smoothed[k].update(v)
                self.recorder.record("TRAIN", stats, it=it)
                done = it - self.start_iter + 1
                eta = (time.time() - t_start) / max(done, 1) * (total - it - 1)
                line = " ".join(
                    f"{k}: {smoothed[k].median:.4f}"
                    for k in ("loss", "img_loss", "psnr")
                    if k in smoothed
                )
                tline = ""
                if self.timer.enabled:
                    tline = (f" data {self.timer.mean('data')*1e3:.0f}ms"
                             f" step {self.timer.mean('step')*1e3:.0f}ms")
                print(
                    f"iter {it}/{total} {line} "
                    f"pts {int(stats.get('num_pts', 0))} "
                    f"env {int(stats.get('env_num_pts', 0))} "
                    f"eta {eta/60:.1f}m{tline}",
                    flush=True,
                )
                self.timer.tick()  # logging cost is not charged to spans

            if sig_flags["dump"]:
                sig_flags["dump"] = False
                spans = ""
                if self.timer.enabled:
                    spans = (f" data {self.timer.mean('data') * 1e3:.0f}ms"
                             f" step {self.timer.mean('step') * 1e3:.0f}ms")
                print(f"[SIGUSR1] iter {it}/{total} "
                      + " ".join(f"{k}: {float(v):.4f}"
                                 for k, v in stats.items()
                                 if np.ndim(v) == 0) + spans, flush=True)
            if sig_flags["save"]:
                sig_flags["save"] = False
                self.save(it + 1, latest_only=True)
                print(f"[signal] checkpoint saved at iter {it + 1}",
                      flush=True)

            nxt = it + 1
            if self.save_latest_every and nxt % self.save_latest_every == 0:
                self.save(nxt, latest_only=True)
            if self.save_every and nxt % self.save_every == 0:
                self.save(nxt)
            if self.eval_every_iters and nxt % self.eval_every_iters == 0 \
                    and self.eval_views:
                try:
                    self.test(save_images=False, tag=f"it{nxt}")
                except Exception as e:  # eval must not kill training
                    print(f"[eval error ignored] {e}")

        self.save(total)
        self.profiler.close()
        self.recorder.close()
        if self.timer_record_to_file:
            self.timer.dump(self.timer_record_to_file)
        return self.state

    def save(self, it: int, latest_only: bool = False):
        # rank-0-only services (scripts/main.py:237 policy): replicated
        # training state is identical on every host, save once
        from envgs_tpu.parallel.multihost import is_main_process
        if not is_main_process():
            return
        os.makedirs(self.model_dir, exist_ok=True)
        ckpt.save_checkpoint(
            os.path.join(self.model_dir, "latest.npz"), self.state, it,
            cam_state=self.cam_state if self.cam_opt_cfg.enabled else None,
        )
        if not latest_only:
            ckpt.save_checkpoint(
                os.path.join(self.model_dir, f"{it}.npz"), self.state, it,
                cam_state=self.cam_state if self.cam_opt_cfg.enabled else None,
            )
        ckpt.export_ply(
            self.state.base, os.path.join(self.model_dir, "base.ply"))
        ckpt.export_ply(
            self.state.env, os.path.join(self.model_dir, "env.ply"))

    def render_view(self, cam: Camera, it: int | None = None,
                    exact_order: bool | None = None):
        """Render one view. exact_order=None follows the model config;
        True/False overrides the tracer blend-order mode for this call
        (eval defaults to exact per-ray ordering — see test())."""
        eo = (self.model_cfg.tracer_exact_order if exact_order is None
              else bool(exact_order))
        # exact_order only applies to the tiled tracer (the oracle backend
        # is always exact) and has no training outputs — eval-only
        eo = eo and self.model_cfg.tracer_backend.startswith("tiled")
        fn = self._render_fns.get(eo)
        if fn is None:
            H, W = cam.H, cam.W
            cfg = self.model_cfg._replace(tracer_exact_order=eo)

            def _render(base, env, K, R, T, it_):
                camera = Camera(H, W, K, R, T, cam.znear, cam.zfar)
                return forward_envgs(base, env, camera, it_, cfg)

            fn = self._render_fns[eo] = jax.jit(_render)
        it_ = jnp.asarray(self.sched.total_iters if it is None else it)
        return fn(
            self.state.base, self.state.env, cam.K, cam.R, cam.T, it_
        )

    def render_path(self, n_frames: int = 60, kind: str = "orbit",
                    tag: str = "path", types=("RENDER",), fps: int = 30,
                    path_dir: str | None = None):
        """Novel-view path rendering (the reference's ORBIT/SPIRAL/CUBIC
        inference datasets + spec configs, volumetric_video_inference_dataset
        .py:155-163): interpolate a camera path through the training views,
        render each frame, save PNGs and (if ffmpeg is present) an mp4.

        path_dir: an explicit saved camera path (easymocap intri/extri —
        e.g. the browser viewer's O-key export under result_dir/
        camera_paths/) used as the keyframes instead of the training
        views: cubic-interpolated to n_frames (the reference's
        camera_path_intri/extri loading)."""
        from envgs_tpu.utils.camera import camera_path_interpolate

        if path_dir is not None:
            from envgs_tpu.utils.easycam import read_cameras
            from envgs_tpu.utils.camera import make_camera

            tmpl = self.views[0]["camera"]
            loaded = read_cameras(path_dir)
            cams = [
                make_camera(
                    int(c.get("H", tmpl.H)), int(c.get("W", tmpl.W)),
                    np.asarray(c["K"], np.float32),
                    np.asarray(c["R"], np.float32),
                    np.asarray(c["T"], np.float32).reshape(3),
                    tmpl.znear, tmpl.zfar)
                for _k, c in sorted(loaded.items())
            ]
            kind = "cubic"
        else:
            cams = [v["camera"] for v in self.views]
        path_cams = camera_path_interpolate(cams, n_frames, kind=kind)
        result_dir = os.path.join(self.result_dir, tag)
        vis = Visualizer(result_dir, types=types, save_gt=False,
                         save_error=False)
        for i, cam in enumerate(path_cams):
            out = self.render_view(cam)
            jax.block_until_ready(out.rgb_map)
            vis.visualize(out, None, 0, i)
        vis.summarize()
        # optional video assembly (visualizer:374-387 semantics)
        import shutil
        import subprocess

        if shutil.which("ffmpeg"):
            for t in types:
                subprocess.run(
                    ["ffmpeg", "-y", "-loglevel", "error", "-framerate",
                     str(fps), "-pattern_type", "glob", "-i",
                     os.path.join(result_dir, t, "*.png"),
                     "-pix_fmt", "yuv420p",
                     os.path.join(result_dir, f"{t}.mp4")],
                    check=False,
                )
        return result_dir

    def extract_mesh(self, res: int = 256, acc_thresh: float = 0.5,
                     stride: int = 1, bounds=None, tag: str = "mesh.ply",
                     depth_max: float | None = None):
        """TSDF depth-fusion mesh export — the reference's 2DGS/EnvGS mesh
        protocol (render expected-depth maps over the training views, fuse
        into a truncated SDF volume, extract the isosurface; reference:
        scripts/fusion/volume_fusion.py + gaussian2d_utils depth fusion).

        Renders every `stride`-th training view, discards pixels whose
        accumulated alpha < `acc_thresh` (unobserved space) or depth >
        `depth_max`, fuses into a `res`**3 TSDF over `bounds` (default: the
        1-99 percentile AABB of the active base splats, 5%-padded), runs
        marching tetrahedra restricted to observed voxels, and writes an
        ascii ply under the experiment result dir. Returns the mesh path."""
        from envgs_tpu.utils.fusion import (
            marching_tetrahedra,
            save_mesh_ply,
            tsdf_fuse,
        )

        views = self.views[:: max(1, stride)]
        cams = [v["camera"] for v in views]
        depths = []
        for v in views:
            out = self.render_view(v["camera"])
            dpt = np.asarray(out.dpt_map[..., 0])
            acc = np.asarray(out.acc_map[..., 0])
            keep = acc >= acc_thresh
            if depth_max is not None:
                keep &= dpt <= depth_max
            depths.append(np.where(keep, dpt, 0.0).astype(np.float32))
        if bounds is None:
            act = np.asarray(self.state.base.stats.active) > 0
            xyz = np.asarray(self.state.base.params.xyz)[act]
            lo = np.percentile(xyz, 1.0, axis=0)
            hi = np.percentile(xyz, 99.0, axis=0)
            pad = 0.05 * float((hi - lo).max())
            bounds = (lo - pad, hi + pad)
        tsdf, w = tsdf_fuse(jnp.asarray(np.stack(depths)), cams, bounds,
                            res=res)
        verts, faces = marching_tetrahedra(
            np.asarray(tsdf), 0.0, bounds=bounds,
            observed=np.asarray(w) > 0,
        )
        os.makedirs(self.result_dir, exist_ok=True)
        path = os.path.join(self.result_dir, tag)
        save_mesh_ply(path, verts, faces)
        print(f"[mesh] {len(verts)} verts / {len(faces)} faces -> {path}")
        return path

    def test(self, save_images: bool = True, tag: str | None = None,
             types=("RENDER", "DEPTH", "NORMAL", "SPECULAR", "DIFFUSE",
                    "REFLECTION"), exact_order: bool = True):
        """Evaluate the held-out views.

        exact_order (default True): evaluate with the tracer's exact
        per-ray blend order (the reference OptiX hit ordering,
        optix_utils.py:29-37) instead of the training path's per-tile
        radial approximation — reported metrics are exact-order unless
        explicitly disabled."""
        from envgs_tpu.parallel.multihost import (
            allsum_hosts,
            is_main_process,
            process_count,
            process_index,
        )
        result_dir = (
            os.path.join(self.result_dir, tag) if tag else self.result_dir
        )
        world = process_count()
        if world > 1 and result_dir:
            # per-rank shard metrics live next to the merged rank-0 file
            result_dir = os.path.join(result_dir, f"rank{process_index()}") \
                if not is_main_process() else result_dir
        ev = Evaluator(result_dir)
        vis = Visualizer(result_dir, types=types) if save_images else None
        rgb = None
        views = list(enumerate(self.eval_views or self.views))
        if world > 1:
            # multi-host eval split: each host renders its stride of the
            # eval views (the frame-sharding policy applied to evaluation);
            # the summary is psum-merged below so rank 0 reports the mean
            # over ALL views, not just its shard
            views = views[process_index()::world]
        for i, view in views:
            cam = view["camera"]
            t0 = time.time()
            out = self.render_view(cam, exact_order=exact_order)
            jax.block_until_ready(out.rgb_map)
            dt = time.time() - t0
            rgb = np.clip(np.asarray(out.rgb_map), 0, 1)
            ev.evaluate(rgb, np.asarray(view["rgb"]),
                        name=view.get("name", str(i)), render_time=dt)
            if vis:
                vis.visualize(out, np.asarray(view["rgb"]), 0, i)
        if vis:
            vis.summarize()
        mc = getattr(self, "model_cfg", None)  # fakes in tests may omit it
        eo_used = (exact_order and mc is not None
                   and mc.tracer_backend.startswith("tiled"))
        extra = None
        if mc is not None:
            extra = {"tracer_order": (
                "exact" if eo_used or mc.tracer_backend == "ref"
                else "radial")}
        summary = ev.summarize(extra=extra)
        if world > 1:
            # merge means across hosts, weighted by per-host view counts.
            # FIXED key list + per-key finite counts: every rank must psum
            # an identical-shape vector even with an empty shard or NaN
            # metrics (lpips without weights)
            keys = ("psnr_mean", "ssim_mean", "lpips_mean", "time_mean")
            n = len(views)
            vals, cnts = [], []
            for k in keys:
                v = summary["summary"].get(k, float("nan"))
                ok = n > 0 and np.isfinite(v)
                vals.append(float(v) * n if ok else 0.0)
                cnts.append(float(n) if ok else 0.0)
            tot = allsum_hosts(np.asarray([float(n)] + vals + cnts))
            m = len(keys)
            for j, k in enumerate(keys):
                if tot[1 + m + j] > 0:
                    summary["summary"][k] = float(
                        tot[1 + j] / tot[1 + m + j])
            summary["summary"]["n_views_total"] = int(tot[0])
        if not is_main_process():
            return summary
        # VAL scalars + the last rendered eval view into tensorboard
        self.recorder.record(
            "VAL", {k: v for k, v in summary["summary"].items()
                    if isinstance(v, (int, float)) and np.isfinite(v)},
            image_stats={"RENDER": rgb} if rgb is not None else None,
        )
        print(json.dumps(summary["summary"], indent=2))
        return summary
