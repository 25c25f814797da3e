"""Storage-backend abstraction for file IO (engine layer).

TPU-native counterpart of the reference's mmcv-derived FileClient
(/root/reference/easyvolcap/engine/file_client.py:18-909 — pluggable
disk/ceph/petrel/memcached/lmdb/http storage backends behind one `get` /
`get_text` interface). The reference's EnvGS path only ever uses the disk
backend; here the same registry pattern ships with the backends that have
no external service dependency:

- `DiskBackend` — local filesystem (the default).
- `HTTPBackend` — urllib-based GET (dataset-over-http; works on loopback
  in zero-egress environments).
- `MemoryBackend` — in-process dict (tests, caching layers).

Extra backends register via `FILE_BACKENDS.register` (the ceph/lmdb roles
— external services, stubbed by design here).
"""
from __future__ import annotations

from envgs_tpu.engine.registry import Registry

FILE_BACKENDS = Registry("file_backends")


@FILE_BACKENDS.register
class DiskBackend:
    """Local filesystem backend."""

    prefixes = ("", "file://")

    def get(self, path: str) -> bytes:
        if path.startswith("file://"):
            path = path[len("file://"):]
        with open(path, "rb") as f:
            return f.read()

    def get_text(self, path: str, encoding: str = "utf-8") -> str:
        return self.get(path).decode(encoding)

    def exists(self, path: str) -> bool:
        import os

        if path.startswith("file://"):
            path = path[len("file://"):]
        return os.path.exists(path)

    def put(self, path: str, data: bytes):
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)


@FILE_BACKENDS.register
class HTTPBackend:
    """urllib GET backend (read-only)."""

    prefixes = ("http://", "https://")

    def get(self, url: str) -> bytes:
        from urllib.request import urlopen

        with urlopen(url, timeout=30) as r:
            return r.read()

    def get_text(self, url: str, encoding: str = "utf-8") -> str:
        return self.get(url).decode(encoding)

    def exists(self, url: str) -> bool:
        from urllib.error import URLError
        from urllib.request import Request, urlopen

        try:
            with urlopen(Request(url, method="HEAD"), timeout=10) as r:
                return r.status < 400
        except (URLError, OSError):
            return False


@FILE_BACKENDS.register
class MemoryBackend:
    """In-process dict store (tests / caching)."""

    prefixes = ("memory://",)

    def __init__(self):
        self.store: dict[str, bytes] = {}

    def get(self, path: str) -> bytes:
        return self.store[path]

    def get_text(self, path: str, encoding: str = "utf-8") -> str:
        return self.get(path).decode(encoding)

    def exists(self, path: str) -> bool:
        return path in self.store

    def put(self, path: str, data: bytes):
        self.store[path] = data


class FileClient:
    """Prefix-dispatching facade (FileClient.infer_client semantics):
    `FileClient().get("http://...")` routes to the matching backend."""

    def __init__(self, backend: str | None = None, **kwargs):
        self._instances: dict[type, object] = {}
        self._forced = (
            FILE_BACKENDS.build(dict(type=backend, **kwargs))
            if backend else None
        )

    def _backend_for(self, path: str):
        if self._forced is not None:
            return self._forced
        best = None
        best_len = -1
        for name in ("DiskBackend", "HTTPBackend", "MemoryBackend"):
            cls = FILE_BACKENDS.get(name)
            for p in cls.prefixes:
                if path.startswith(p) and len(p) > best_len:
                    best, best_len = cls, len(p)
        if best not in self._instances:
            self._instances[best] = best()
        return self._instances[best]

    def get(self, path: str) -> bytes:
        return self._backend_for(path).get(path)

    def get_text(self, path: str, encoding: str = "utf-8") -> str:
        return self._backend_for(path).get_text(path, encoding)

    def exists(self, path: str) -> bool:
        return self._backend_for(path).exists(path)

    def put(self, path: str, data: bytes):
        return self._backend_for(path).put(path, data)
