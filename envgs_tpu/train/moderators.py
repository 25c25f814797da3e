"""Runtime dataset moderators.

Mirrors the reference's moderators (/root/reference/easyvolcap/runners/
moderators.py): progressive render-ratio growth and center-crop-ratio
schedules, expressed as pure functions of the iteration that the host loop
uses to pick the (static-shape) resolution bucket for each step. Because XLA
needs static shapes, ratios snap to a small set of buckets; each bucket's
train step compiles once.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from envgs_tpu.engine import MODERATORS


class RatioSchedule(NamedTuple):
    """Linear ramp from ratio_start to ratio_end over [iter_start, iter_end],
    snapped to `buckets` (DatasetRatioModerator semantics)."""

    ratio_start: float = 0.25
    ratio_end: float = 1.0
    iter_start: int = 0
    iter_end: int = 10000
    buckets: tuple = (0.25, 0.5, 0.75, 1.0)

    def __call__(self, it: int) -> float:
        if it <= self.iter_start:
            r = self.ratio_start
        elif it >= self.iter_end:
            r = self.ratio_end
        else:
            t = (it - self.iter_start) / max(self.iter_end - self.iter_start, 1)
            r = self.ratio_start + t * (self.ratio_end - self.ratio_start)
        # snap to nearest bucket not exceeding r (stable shapes per phase)
        b = [x for x in self.buckets if x <= r + 1e-6]
        return b[-1] if b else self.buckets[0]


class CenterCropSchedule(NamedTuple):
    """Progressive center-crop ratio (DatasetCenterCropRatioModerator)."""

    crop_start: float = 0.5
    crop_end: float = 1.0
    iter_start: int = 0
    iter_end: int = 5000
    buckets: tuple = (0.5, 0.75, 1.0)

    def __call__(self, it: int) -> float:
        sched = RatioSchedule(self.crop_start, self.crop_end,
                              self.iter_start, self.iter_end, self.buckets)
        return sched(it)


def center_crop_view(view: dict, ratio: float) -> dict:
    """Host-side center crop to a ratio bucket (K principal point shifted).

    DatasetCenterCropRatioModerator semantics (moderators.py:66-87 +
    volumetric_video_dataset.py:1285-1310 in the reference): crop the
    central `ratio` fraction of the image; the camera intrinsics follow the
    crop window. Dims snap to multiples of 16 for stable tile grids."""
    if abs(ratio - 1.0) < 1e-6:
        return view
    cam = view["camera"]
    H = max(int(cam.H * ratio) // 16 * 16, 16)
    W = max(int(cam.W * ratio) // 16 * 16, 16)
    y0 = (cam.H - H) // 2
    x0 = (cam.W - W) // 2
    K = np.asarray(cam.K).copy()
    K[0, 2] -= x0
    K[1, 2] -= y0
    out = dict(view)
    out["camera"] = cam._replace(H=H, W=W, K=K)
    for k in ("rgb", "msk", "norm", "dpt"):
        if k in view:
            out[k] = view[k][y0:y0 + H, x0:x0 + W]
    return out


def resize_view(view: dict, ratio: float) -> dict:
    """Host-side view resize to a ratio bucket (camera K rescaled)."""
    if abs(ratio - 1.0) < 1e-6:
        return view
    cam = view["camera"]
    H, W = int(cam.H * ratio) // 16 * 16, int(cam.W * ratio) // 16 * 16
    ry, rx = H / cam.H, W / cam.W
    import numpy as np

    K = np.asarray(cam.K).copy()
    K[0] *= rx
    K[1] *= ry
    out = dict(view)
    out["camera"] = cam._replace(H=H, W=W, K=np.asarray(K))
    for k in ("rgb", "msk", "norm", "dpt"):
        if k in view:
            im = view[k]
            yy = (np.linspace(0, im.shape[0] - 1, H)).astype(int)
            xx = (np.linspace(0, im.shape[1] - 1, W)).astype(int)
            out[k] = im[yy][:, xx]
    return out


class AlternatingSchedule(NamedTuple):
    """Cycle sampling patterns across iterations (AlternatingModerator,
    reference runners/moderators.py:90-136: each iteration activates the
    next key of pattern_cfg — e.g. patch-sampled vs full-image steps).
    Static shapes per pattern: each pattern's step compiles once."""

    patterns: tuple = ("patch", "full")

    def __call__(self, it: int) -> str:
        return self.patterns[it % len(self.patterns)]


class NoopSchedule(NamedTuple):
    """NoopModerator: no runtime dataset mutation."""

    def __call__(self, it: int):
        return None


# registry parity with the reference moderator names
MODERATORS.register(RatioSchedule, name="DatasetRatioModerator")
MODERATORS.register(CenterCropSchedule, name="DatasetCenterCropRatioModerator")
MODERATORS.register(AlternatingSchedule, name="AlternatingModerator")
MODERATORS.register(NoopSchedule, name="NoopModerator")
