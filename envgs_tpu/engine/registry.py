"""Name -> constructor registry with config-driven build.

Mirrors the reference Registry/build_from_cfg behavior
(/root/reference/easyvolcap/engine/registry.py:22-133): `build` pops `type`,
filters kwargs by the constructor signature (warning on, not rejecting,
unknown keys), and `type=None` builds to None.
"""
from __future__ import annotations

import inspect
import warnings
from typing import Any, Callable


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._modules: dict[str, Callable] = {}

    def register(self, cls=None, *, name: str | None = None):
        def _do(c):
            key = name or c.__name__
            if key in self._modules and self._modules[key] is not c:
                warnings.warn(f"{self.name}: overriding registration of {key}")
            self._modules[key] = c
            return c

        return _do(cls) if cls is not None else _do

    # alias matching the reference decorator name
    def register_module(self, name: str | None = None):
        return self.register(name=name)

    def get(self, key: str) -> Callable:
        if key not in self._modules:
            raise KeyError(
                f"{key!r} not registered in {self.name} "
                f"(available: {sorted(self._modules)})"
            )
        return self._modules[key]

    def __contains__(self, key):
        return key in self._modules

    def build(self, cfg: dict | None, **extra) -> Any:
        if cfg is None:
            return None
        cfg = dict(cfg)
        typ = cfg.pop("type", None)
        if typ is None:
            return None
        ctor = self.get(typ) if isinstance(typ, str) else typ
        kwargs = {**cfg, **extra}
        return call_filtered(ctor, kwargs, context=f"{self.name}.{typ}")


def call_filtered(fn: Callable, kwargs: dict, context: str = "") -> Any:
    """Call fn with kwargs filtered to its signature (warn on extras)."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return fn(**kwargs)
    accepts_var_kw = any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
    if accepts_var_kw:
        return fn(**kwargs)
    valid = set(sig.parameters)
    unused = [k for k in kwargs if k not in valid]
    if unused:
        warnings.warn(f"{context}: ignoring unused config keys {unused}")
    return fn(**{k: v for k, v in kwargs.items() if k in valid})
