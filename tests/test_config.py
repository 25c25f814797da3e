import os
import textwrap

import pytest

from envgs_tpu.engine import Registry, load_config, merge_dotted


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_inheritance_merge(tmp_path):
    parent = _write(
        tmp_path,
        "parent.yaml",
        """
        model:
          sampler:
            type: EnvGSSampler
            sh_deg: 3
            densify_until_iter: 21000
        lr: 0.05
        """,
    )
    child = _write(
        tmp_path,
        "child.yaml",
        f"""
        configs: [{parent}]
        model:
          sampler:
            densify_until_iter: 30000
        """,
    )
    cfg = load_config(child)
    assert cfg.model.sampler.sh_deg == 3  # inherited
    assert cfg.model.sampler.densify_until_iter == 30000  # overridden
    assert cfg.lr == 0.05


def test_delete_key(tmp_path):
    parent = _write(tmp_path, "p.yaml", "net: {type: MLP, width: 64}\n")
    child = _write(
        tmp_path,
        "c.yaml",
        f"configs: [{parent}]\nnet:\n  _delete_: True\n  type: NoopNetwork\n",
    )
    cfg = load_config(child)
    assert cfg.net.type == "NoopNetwork"
    assert "width" not in cfg.net


def test_append_and_index(tmp_path):
    parent = _write(tmp_path, "p.yaml", "items: [a, b]\n")
    child = _write(
        tmp_path, "c.yaml", f"configs: [{parent}]\nitems:\n  _append_: [c]\n"
    )
    cfg = load_config(child)
    assert cfg["items"] == ["a", "b", "c"]


def test_basename_substitution(tmp_path):
    p = _write(tmp_path, "envgs_sedan.yaml", "exp_name: '{{fileBasenameNoExtension}}'\n")
    cfg = load_config(p)
    assert cfg.exp_name == "envgs_sedan"


def test_dotted_overrides(tmp_path):
    p = _write(tmp_path, "a.yaml", "runner: {epochs: 80, lr: 0.1}\n")
    cfg = load_config(p, overrides=["runner.epochs=120", "runner.extra=true"])
    assert cfg.runner.epochs == 120
    assert cfg.runner.extra is True


def test_multi_file_chain(tmp_path):
    a = _write(tmp_path, "a.yaml", "x: 1\ny: 1\n")
    b = _write(tmp_path, "b.yaml", "y: 2\n")
    cfg = load_config(f"{a},{b}")
    assert cfg.x == 1 and cfg.y == 2


def test_registry_build_filters_kwargs():
    REG = Registry("test")

    @REG.register
    class Thing:
        def __init__(self, a=1, b=2):
            self.a, self.b = a, b

    with pytest.warns(UserWarning):
        t = REG.build({"type": "Thing", "a": 10, "unknown_key": 5})
    assert t.a == 10 and t.b == 2
    assert REG.build({"type": None}) is None
    assert REG.build(None) is None


def test_file_client_backends(tmp_path):
    """FileClient prefix dispatch: disk, memory, and loopback http."""
    import http.server
    import threading

    from envgs_tpu.engine.file_client import FileClient, MemoryBackend

    fc = FileClient()
    p = tmp_path / "a.txt"
    fc.put(str(p), b"hello disk")
    assert fc.exists(str(p))
    assert fc.get_text(str(p)) == "hello disk"
    assert fc.get_text(f"file://{p}") == "hello disk"
    assert not fc.exists(str(tmp_path / "missing"))

    # memory backend (shared instance within one client)
    fc.put("memory://k", b"mem")
    assert fc.get("memory://k") == b"mem"
    assert fc.exists("memory://k") and not fc.exists("memory://other")

    # loopback http server serving tmp_path
    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/a.txt"
        assert fc.get_text(url) == "hello disk"
        assert fc.exists(url)
        assert not fc.exists(url + ".nope")
    finally:
        srv.shutdown()
