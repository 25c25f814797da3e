"""Evaluator + visualizer.

Mirrors the reference evaluation/visualization contracts:
- per-frame PSNR / SSIM(win 11) / LPIPS(VGG) + render time, mean/std summary
  written to data/result/<exp>/metrics.json
  (/root/reference/easyvolcap/runners/evaluators/volumetric_video_evaluator.py:29-93);
- typed image dumps {RENDER, DEPTH, ALPHA, NORMAL, SURFACE_NORMAL, SPECULAR,
  DIFFUSE, REFLECTION} + _gt/_error panels as
  data/result/<exp>/<TYPE>/frame####_camera####.png
  (runners/visualizers/volumetric_video_visualizer.py:84-359), written by a
  bounded thread pool.
"""
from __future__ import annotations

import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from envgs_tpu.ops.losses import lpips as lpips_host


def _to_u8(im: np.ndarray) -> np.ndarray:
    return np.clip(np.nan_to_num(im) * 255.0, 0, 255).astype(np.uint8)


def save_image(path: str, im: np.ndarray):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    from PIL import Image

    if im.ndim == 3 and im.shape[-1] == 1:
        im = im[..., 0]
    Image.fromarray(_to_u8(im)).save(path)


def colorize_depth(d: np.ndarray, p: float = 0.01) -> np.ndarray:
    lo, hi = np.quantile(d, p), np.quantile(d, 1 - p)
    nd = 1.0 - np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    return np.repeat(nd[..., None] if nd.ndim == 2 else nd, 3, axis=-1)


def colorize_normal(n: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.clip(norm, 1e-8, None) + 1.0) / 2.0


class Evaluator:
    """Accumulates per-frame metrics; summarize() -> metrics.json dict."""

    def __init__(self, result_dir: str, compute_lpips: bool = True):
        self.result_dir = result_dir
        self.rows = []
        self.compute_lpips = compute_lpips

    def evaluate(self, rgb: np.ndarray, gt: np.ndarray, name: str = "",
                 render_time: float = 0.0):
        import jax.numpy as jnp

        from envgs_tpu.ops.losses import psnr as _psnr, ssim as _ssim

        row = {
            "name": name,
            "psnr": float(_psnr(jnp.asarray(rgb), jnp.asarray(gt))),
            "ssim": float(_ssim(jnp.asarray(rgb), jnp.asarray(gt))),
            "time": render_time,
        }
        if self.compute_lpips:
            # pure-JAX VGG16 LPIPS when weights are on disk (ops/lpips_jax),
            # torch-host fallback otherwise, NaN when neither is available
            from envgs_tpu.ops.lpips_jax import jitted_lpips

            jfn = jitted_lpips()
            if jfn is not None:
                row["lpips"] = float(jfn(jnp.asarray(rgb), jnp.asarray(gt)))
            else:
                lp = lpips_host(rgb, gt)
                row["lpips"] = lp if lp is not None else float("nan")
        self.rows.append(row)
        return row

    def summarize(self, extra: dict | None = None) -> dict:
        keys = [k for k in ("psnr", "ssim", "lpips", "time") if self.rows and k in self.rows[0]]
        summary = {}
        for k in keys:
            vals = np.asarray([r[k] for r in self.rows], np.float64)
            summary[f"{k}_mean"] = float(np.nanmean(vals))
            summary[f"{k}_std"] = float(np.nanstd(vals))
        if extra:  # e.g. tracer blend-order mode (runner.test metadata)
            summary.update(extra)
        out = {"summary": summary, "frames": self.rows}
        os.makedirs(self.result_dir, exist_ok=True)
        with open(os.path.join(self.result_dir, "metrics.json"), "w") as f:
            json.dump(out, f, indent=2)
        return out


class Visualizer:
    """Async typed-image writer (bounded pool, PNG outputs)."""

    TYPES = ("RENDER", "DEPTH", "ALPHA", "NORMAL", "SURFACE_NORMAL",
             "SPECULAR", "DIFFUSE", "REFLECTION")

    def __init__(self, result_dir: str, types=("RENDER",), save_gt: bool = True,
                 save_error: bool = True, workers: int = 2):
        self.result_dir = result_dir
        self.types = types
        self.save_gt = save_gt
        self.save_error = save_error
        self.pool = ThreadPoolExecutor(max_workers=workers)
        self.futures = []

    def _submit(self, path, im):
        self.futures.append(self.pool.submit(save_image, path, im))

    def visualize(self, out, gt: np.ndarray | None, frame: int, camera: int):
        """`out` is an EnvGSOutput (host numpy views are taken here)."""
        tag = f"frame{frame:04d}_camera{camera:04d}.png"
        maps = {
            "RENDER": np.asarray(out.rgb_map),
            "DEPTH": colorize_depth(np.asarray(out.dpt_map)[..., 0]),
            "ALPHA": np.repeat(np.asarray(out.acc_map), 3, -1),
            "NORMAL": colorize_normal(np.asarray(out.norm_map)),
            "SURFACE_NORMAL": colorize_normal(np.asarray(out.surf_norm_map)),
            "SPECULAR": np.repeat(np.asarray(out.spec_map)[..., :1], 3, -1),
            "DIFFUSE": np.asarray(out.dif_rgb_map),
            "REFLECTION": np.asarray(out.ref_rgb_map),
        }
        for t in self.types:
            self._submit(os.path.join(self.result_dir, t, tag), maps[t])
        if gt is not None and "RENDER" in self.types:
            if self.save_gt:
                self._submit(
                    os.path.join(self.result_dir, "RENDER", tag.replace(".png", "_gt.png")),
                    gt,
                )
            if self.save_error:
                err = ((maps["RENDER"] - gt) ** 2).sum(-1, keepdims=True)
                self._submit(
                    os.path.join(self.result_dir, "RENDER", tag.replace(".png", "_error.png")),
                    np.repeat(np.clip(err * 10, 0, 1), 3, -1),
                )

    def summarize(self):
        for f in self.futures:
            f.result()
        self.futures.clear()
