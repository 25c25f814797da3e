"""Section timers + jax.profiler bracketing (SURVEY §5.1 parity).

Counterparts of the reference's global `Timer`
(/root/reference/easyvolcap/utils/console_utils.py:615-705 — named spans
recorded between `record()` calls, optional device sync, JSON dump) and its
torch.profiler integration (`utils/prof_utils.py:35-74` — schedule with
skip/warmup/active window, trace written for tensorboard/perfetto).

JAX notes: device work is async — `sync=True` forces a tiny fetch so a span
includes queued device time (on the axon backend `block_until_ready` does
not block; only data fetches do). `ProfilerSession` wraps
`jax.profiler.start_trace/stop_trace` over an iteration window.
"""
from __future__ import annotations

import collections
import json
import os
import time

import numpy as np


class Timer:
    """Named host-side spans: `timer.record('data')` closes the span opened
    by the previous record/tick. Records rolling means per name."""

    def __init__(self, enabled: bool = True, sync: bool = False,
                 window: int = 100):
        self.enabled = enabled
        self.sync = sync
        self.window = window
        self.spans: dict[str, collections.deque] = collections.defaultdict(
            lambda: collections.deque(maxlen=window)
        )
        self._last = time.perf_counter()

    def tick(self):
        """Open a new span without recording (start of an iteration)."""
        self._last = time.perf_counter()

    def record(self, name: str, value=None):
        """Close the current span under `name`. If `value` is a jax array
        and sync is on, fetch one element first so queued device work is
        charged to this span."""
        if not self.enabled:
            return 0.0
        if self.sync and value is not None:
            try:
                np.asarray(value).ravel()[:1]
            except Exception:
                pass
        now = time.perf_counter()
        dt = now - self._last
        self.spans[name].append(dt)
        self._last = now
        return dt

    def mean(self, name: str) -> float:
        s = self.spans.get(name)
        return float(np.mean(s)) if s else 0.0

    def summary(self) -> dict:
        return {k: self.mean(k) for k in self.spans}

    def dump(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {k: list(map(float, v)) for k, v in self.spans.items()}, f
            )


class ProfilerSession:
    """jax.profiler trace over iterations [start, start+steps): call
    `step(it)` once per iteration (prof_utils.py schedule semantics)."""

    def __init__(self, trace_dir: str | None = None, start: int = 10,
                 steps: int = 5):
        self.trace_dir = trace_dir
        self.start, self.steps = start, steps
        self._active = False

    def step(self, it: int):
        if not self.trace_dir:
            return
        import jax

        if it == self.start and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and it >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
