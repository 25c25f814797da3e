"""ctypes bindings for the native C++ threaded image loader.

TPU-native counterpart of the reference's multi-process DataLoader image
pipeline (/root/reference/easyvolcap/dataloaders/volumetric_video_dataset.py:
372-555 — undistort + resize + shared-memory bytes): here a C++ thread pool
(native/loader.cpp) decodes JPEG/PNG, undistorts (OpenCV 5-term model) and
resizes off the GIL, returning float32 HWC arrays in [0, 1].

The shared library is built by `make -C native` (libenvgs_loader.so); if it
is missing we attempt one silent build and otherwise report unavailable so
callers fall back to the pure-python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libenvgs_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_SO_PATH)
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return False
    return os.path.exists(_SO_PATH)


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_submit.restype = ctypes.c_int64
        lib.loader_submit.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.loader_fetch.restype = ctypes.c_int
        lib.loader_fetch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is present (or can be built) and loads."""
    return _load_lib() is not None


def _kd_ptrs(K, D):
    """Pack optional intrinsics/distortion into C double arrays."""
    if K is None or D is None:
        return None, None, None
    Ka = np.ascontiguousarray(np.asarray(K, np.float64).reshape(9))
    Da = np.zeros(5, np.float64)
    Dv = np.asarray(D, np.float64).reshape(-1)[:5]
    Da[: Dv.size] = Dv
    # keep the numpy arrays alive alongside the pointers
    return (
        Ka.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        Da.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        (Ka, Da),
    )


class NativeLoader:
    """Thread-pooled decode + undistort + resize.

    load(path, H, W, K=None, D=None)   -> (H, W, 3) float32, blocking
    submit(path, H, W, K=None, D=None) -> ticket
    fetch(ticket)                      -> (H, W, 3) float32, blocking
    """

    def __init__(self, n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader library unavailable")
        self._lib = lib
        self._pool = lib.loader_create(int(n_threads))
        self._shapes: dict[int, tuple[int, int]] = {}
        self._mu = threading.Lock()

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool:
            self._lib.loader_destroy(pool)
            self._pool = None

    def submit(self, path: str, H: int, W: int, K=None, D=None) -> int:
        kp, dp, _keep = _kd_ptrs(K, D)
        ticket = self._lib.loader_submit(
            self._pool, os.fsencode(path), int(H), int(W), kp, dp
        )
        with self._mu:
            self._shapes[ticket] = (int(H), int(W))
        return ticket

    def fetch(self, ticket: int) -> np.ndarray:
        with self._mu:
            H, W = self._shapes.pop(ticket)
        out = np.empty((H, W, 3), np.float32)
        rc = self._lib.loader_fetch(
            self._pool, ticket, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IOError(f"native loader failed (rc={rc}) for ticket {ticket}")
        return out

    def load(self, path: str, H: int, W: int, K=None, D=None) -> np.ndarray:
        return self.fetch(self.submit(path, H, W, K, D))
