"""Camera residuals, moderators, recorder, websocket protocol, losses."""
import asyncio
import os

import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.models.camera_opt import (
    apply_residual,
    init_camera_residuals,
    so3_exp,
)
from envgs_tpu.ops.losses import msssim, psnr, ssim
from envgs_tpu.serve.websocket_server import (
    decode_camera,
    encode_camera,
    encode_jpeg,
)
from envgs_tpu.train.moderators import CenterCropSchedule, RatioSchedule, resize_view
from envgs_tpu.train.recorder import Recorder, SmoothedValue
from envgs_tpu.utils.camera import make_camera
import pytest


def test_so3_exp_properties():
    w = jnp.asarray([0.1, -0.2, 0.3])
    R = so3_exp(w)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3),
                               atol=1e-8)
    # matches scipy-style Rodrigues from easycam
    from envgs_tpu.utils.easycam import rodrigues

    np.testing.assert_allclose(np.asarray(R), rodrigues(np.asarray(w)),
                               atol=1e-6)


def test_camera_residual_identity_and_grad():
    cam = make_camera(32, 32, np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]),
                      np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    res = init_camera_residuals(3)
    out = apply_residual(cam, res, 1)
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(cam.R), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.K), np.asarray(cam.K), atol=1e-7)

    def loss(se3):
        r = res._replace(se3=se3)
        c = apply_residual(cam, r, 1)
        return jnp.sum(c.R) + jnp.sum(c.T)

    g = jax.grad(loss)(res.se3)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g[1]).sum()) > 0
    assert float(jnp.abs(g[0]).sum()) == 0  # other views untouched


def test_ratio_schedule():
    s = RatioSchedule(0.25, 1.0, 0, 1000)
    assert s(0) == 0.25
    assert s(1000) == 1.0
    assert s(400) in s.buckets
    assert s(400) <= 0.25 + 0.4 * 0.75 + 1e-6
    c = CenterCropSchedule()
    assert c(0) == 0.5 and c(10 ** 6) == 1.0


def test_resize_view():
    cam = make_camera(64, 96, np.array([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1]]),
                      np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    v = dict(camera=cam, rgb=np.zeros((64, 96, 3), np.float32))
    out = resize_view(v, 0.5)
    assert out["camera"].H == 32 and out["camera"].W == 48
    assert out["rgb"].shape == (32, 48, 3)
    np.testing.assert_allclose(out["camera"].K[0, 0], 25.0)


@pytest.mark.slow
def test_recorder(tmp_path):
    r = Recorder(str(tmp_path), enabled=True)
    for i in range(5):
        r.record("TRAIN", {"loss": 1.0 / (i + 1)}, it=i)
    assert r.scalars["loss"].median > 0
    r.close()
    sv = SmoothedValue(window=3)
    for v in [1, 2, 3, 4, 5]:
        sv.update(v)
    assert sv.median == 4.0


def test_websocket_camera_protocol():
    K = np.diag([100.0, 100.0, 1.0]).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.asarray([1.0, 2.0, 3.0], np.float32)
    K2, R2, T2 = decode_camera(encode_camera(K, R, T))
    np.testing.assert_allclose(K2, K)
    np.testing.assert_allclose(T2, T)
    jpg = encode_jpeg(np.random.default_rng(0).random((32, 32, 3)))
    assert jpg[:2] == b"\xff\xd8"


def test_websocket_roundtrip_server():
    """End-to-end: serve one frame over a real websocket."""
    import threading

    import websockets

    # smooth frame so jpeg quality-85 loss stays small
    g = np.linspace(0, 1, 16, dtype=np.float32)
    frame = np.stack(list(np.meshgrid(g, g)) + [np.outer(g, g)], -1).astype(np.float32)

    class FakeRunner:
        views = [dict(camera=make_camera(
            16, 16, np.diag([20.0, 20.0, 1.0]), np.eye(3, dtype=np.float32),
            np.zeros(3, np.float32)))]

        def render_view(self, cam, **kw):
            class Out:
                rgb_map = jnp.asarray(frame)
                dpt_map = jnp.ones((16, 16, 1))
            return Out()

    from envgs_tpu.serve.websocket_server import RenderServer, request_frame

    async def run():
        server = RenderServer(FakeRunner())
        async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
            port = srv.sockets[0].getsockname()[1]
            out = await request_frame(
                f"ws://127.0.0.1:{port}",
                np.diag([20.0, 20.0, 1.0]), np.eye(3), np.zeros(3),
            )
            # raw protocol walk: hello (text) -> camera -> JPEG (binary)
            # -> per-stage timings (text, the HUD profiling frame)
            import json as _json

            from envgs_tpu.serve.websocket_server import encode_camera
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                hello = _json.loads(await ws.recv())
                assert hello["H"] == 16
                assert "RENDER" in hello["types"]  # advertised type list
                await ws.send(encode_camera(
                    np.diag([20.0, 20.0, 1.0]), np.eye(3), np.zeros(3)))
                jpeg = await ws.recv()
                assert isinstance(jpeg, (bytes, bytearray))
                stats = _json.loads(await ws.recv())["stats"]
                assert stats["render_ms"] >= 0 and stats["jpeg_kb"] > 0
                assert stats["type"] == "RENDER"
                # render-type switching (viewer '1-8'/'T' keys): request
                # DEPTH, expect the ack then a DEPTH-typed frame
                await ws.send(_json.dumps({"render_type": "DEPTH"}))
                ack = _json.loads(await ws.recv())
                assert ack["render_type"] == "DEPTH"
                await ws.send(encode_camera(
                    np.diag([20.0, 20.0, 1.0]), np.eye(3), np.zeros(3)))
                jpeg2 = await ws.recv()
                assert isinstance(jpeg2, (bytes, bytearray))
                stats2 = _json.loads(await ws.recv())["stats"]
                assert stats2["type"] == "DEPTH"
            return out

    out = asyncio.run(run())
    assert out.shape == (16, 16, 3)
    assert np.abs(out - frame).mean() < 0.05  # jpeg loss


def test_websocket_watch_attaches_to_live_training(tmp_path):
    """--watch mode: the server hot-reloads the run's latest checkpoint
    before each frame (read-only live-training attach). Checkpoints are
    written the way the Runner writes them; a second save with changed
    params must be picked up without rebuilding the render fn."""
    import os
    import time as _time

    import envgs_tpu.train.checkpoints as ckpt
    from envgs_tpu.models.gaussians import create_pool
    from envgs_tpu.serve.websocket_server import RenderServer
    from envgs_tpu.train.trainer import init_train_state

    rng = np.random.default_rng(0)
    base = create_pool(rng.normal(size=(8, 3)).astype(np.float32),
                       rng.random((8, 3)).astype(np.float32), cap=16)
    env = create_pool(rng.normal(size=(4, 3)).astype(np.float32),
                      rng.random((4, 3)).astype(np.float32), cap=8)
    state = init_train_state(base, env, jax.random.PRNGKey(0))

    class FakeRunner:
        model_dir = str(tmp_path)
        views = [dict(camera=make_camera(
            8, 8, np.diag([10.0, 10.0, 1.0]), np.eye(3, dtype=np.float32),
            np.zeros(3, np.float32)))]

    runner = FakeRunner()
    runner.state = state
    srv = RenderServer(runner, watch=True)
    srv.maybe_reload()
    assert srv.attached_iter is None  # no checkpoint yet -> keep init state

    path = os.path.join(str(tmp_path), "latest.npz")
    ckpt.save_checkpoint(path, state, it=100)
    srv.maybe_reload()
    assert srv.attached_iter == 100

    moved = state._replace(base=state.base._replace(
        params=state.base.params._replace(xyz=state.base.params.xyz + 1.0)))
    _time.sleep(0.01)  # distinct mtime (ms-resolution signature)
    ckpt.save_checkpoint(path, moved, it=200)
    srv.maybe_reload()
    assert srv.attached_iter == 200
    np.testing.assert_allclose(
        np.asarray(runner.state.base.params.xyz)[:8],
        np.asarray(state.base.params.xyz)[:8] + 1.0, atol=1e-6)


def test_msssim_perfect_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    assert float(msssim(x, x)) > 0.999
    assert float(ssim(x, x)) > 0.999
    assert float(psnr(x, x)) > 90


def test_multihost_eval_split_and_merge(monkeypatch, tmp_path):
    """Runner.test under a simulated 2-host world: each rank evaluates its
    stride of the eval views; rank 0 reports means merged over ALL views
    (weighted by per-rank counts), with lpips (NaN, no weights) left
    unmerged. allsum_hosts is replaced by a sequential 2-rank accumulator."""
    import envgs_tpu.train.runner as runner_mod
    from envgs_tpu.parallel.multihost import allsum_hosts

    # single-host identity of the real collective
    np.testing.assert_allclose(
        allsum_hosts(np.asarray([1.0, 2.5])), [1.0, 2.5])

    # a tiny fake runner exercising the real Runner.test body
    H = W = 16

    class FakeOut:
        def __init__(self, v):
            self.rgb_map = jnp.full((H, W, 3), v)

    views = [dict(camera=make_camera(
        H, W, np.array([[20, 0, 8], [0, 20, 8], [0, 0, 1]], np.float32),
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
        rgb=np.full((H, W, 3), 0.5, np.float32), name=f"v{i}")
        for i in range(4)]

    class FakeRec:
        def record(self, *a, **k):
            pass

    sums = {}

    def run_rank(rank):
        r = object.__new__(runner_mod.Runner)
        r.result_dir = str(tmp_path / "res")
        r.eval_views = views
        r.views = views
        r.recorder = FakeRec()
        # rank 0 renders views 0,2 perfectly; rank 1 renders 1,3 as 0.25
        r.render_view = (lambda cam, _v=(0.5 if rank == 0 else 0.25),
                         **kw: FakeOut(_v))
        monkeypatch.setattr(runner_mod, "Evaluator",
                            __import__("envgs_tpu.train.evaluator",
                                       fromlist=["Evaluator"]).Evaluator)
        mh = __import__("envgs_tpu.parallel.multihost",
                        fromlist=["process_count"])
        monkeypatch.setattr(mh, "process_count", lambda: 2)
        monkeypatch.setattr(mh, "process_index", lambda: rank)
        monkeypatch.setattr(mh, "is_main_process", lambda: rank == 0)

        def fake_allsum(vec):
            key = len(vec)
            sums[key] = sums.get(key, np.zeros(len(vec))) + np.asarray(vec)
            return sums[key]

        monkeypatch.setattr(mh, "allsum_hosts", fake_allsum)
        return r.test(save_images=False)

    s1 = run_rank(1)  # runs first so rank 0 sees the full accumulated sum
    s0 = run_rank(0)
    assert s1["summary"]["n_views_total"] >= 2
    assert s0["summary"]["n_views_total"] == 4
    # rank-0 merged psnr = mean over perfect (inf? no: clip) halves —
    # psnr(0.5 vs 0.5) is huge, psnr(0.25 vs 0.5) = ~12dB; merged is the
    # average of the two ranks' psnrs
    p_perfect = s0["summary"]["psnr_mean"]
    assert p_perfect < 80.0  # merged, not rank-0-only (which would be ~80)
    assert np.isfinite(p_perfect)


def test_alternating_and_noop_moderators():
    from envgs_tpu.engine import MODERATORS, SCHEDULERS
    from envgs_tpu.train.moderators import AlternatingSchedule, NoopSchedule

    alt = AlternatingSchedule(patterns=("patch", "full"))
    assert [alt(i) for i in range(4)] == ["patch", "full", "patch", "full"]
    assert NoopSchedule()(5) is None
    for name in ("AlternatingModerator", "NoopModerator",
                 "DatasetRatioModerator", "DatasetCenterCropRatioModerator"):
        assert name in MODERATORS
    for name in ("NoopLR", "ExponentialLR", "WarmupExponentialLR"):
        assert name in SCHEDULERS


def test_named_lr_schedulers():
    from envgs_tpu.train.optimizer import (
        exponential_lr,
        noop_lr,
        warmup_exponential_lr,
    )

    assert float(noop_lr(100, 0.01)) == 0.01
    assert np.isclose(float(exponential_lr(0, 0.01)), 0.01)
    assert np.isclose(float(exponential_lr(30000, 0.01)), 0.001)
    assert np.isclose(float(exponential_lr(10 ** 6, 0.01, min_lr=1e-4)), 1e-4)
    assert float(warmup_exponential_lr(0, 0.01)) == 0.0
    assert np.isclose(float(warmup_exponential_lr(250, 0.01, warmup_iter=500)),
                      0.5 * float(exponential_lr(250, 0.01)))


def test_websocket_hello_and_viewer_page():
    """On connect the server sends a JSON hello with the initial camera
    (so browser clients can seed their orbit), and a plain HTTP GET on the
    websocket port serves the bundled viewer page (the imgui-viewer analog,
    reference volumetric_video_viewer.py:267-375)."""
    import json
    import urllib.request

    import websockets

    class FakeRunner:
        views = [dict(camera=make_camera(
            16, 16, np.diag([20.0, 20.0, 1.0]), np.eye(3, dtype=np.float32),
            np.arange(3, dtype=np.float32)))]

        def render_view(self, cam, **kw):
            class Out:
                rgb_map = jnp.zeros((16, 16, 3))
            return Out()

    from envgs_tpu.serve.websocket_server import RenderServer, viewer_page

    async def run():
        server = RenderServer(FakeRunner())
        async with websockets.serve(server.handle, "127.0.0.1", 0,
                                    process_request=viewer_page) as srv:
            port = srv.sockets[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                hello = json.loads(await ws.recv())
            loop = asyncio.get_event_loop()
            page = await loop.run_in_executor(
                None,
                lambda: urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=5).read(),
            )
            return hello, page

    hello, page = asyncio.run(run())
    assert hello["H"] == 16 and hello["W"] == 16
    np.testing.assert_allclose(hello["T"], [0.0, 1.0, 2.0])
    assert len(hello["K"]) == 9 and len(hello["R"]) == 9
    assert b"envgs_tpu viewer" in page and b"CAM0" in page


def test_websocket_overlay_and_camera_path_roundtrip(tmp_path):
    """Viewer overlay geometry + camera-path save/load over a real socket
    (the browser counterpart of the imgui viewer's mesh/point overlays and
    CameraPath editing, volumetric_video_viewer.py:267-375), then the
    saved path drives runner.render_path(path_dir=...) offline."""
    import asyncio
    import json

    import websockets

    from envgs_tpu.serve.websocket_server import RenderServer
    from envgs_tpu.utils.fusion import save_mesh_ply
    from envgs_tpu.utils.ply import save_gaussian_ply

    mdl = tmp_path / "model"
    res = tmp_path / "result"
    mdl.mkdir(); res.mkdir()
    P = 32
    rngl = np.random.default_rng(0)
    save_gaussian_ply(
        str(mdl / "base.ply"), rngl.random((P, 3)).astype(np.float32),
        np.zeros((P, 1, 3), np.float32), np.zeros((P, 0, 3), np.float32),
        np.zeros((P, 1), np.float32), np.zeros((P, 2), np.float32),
        np.tile(np.asarray([[1, 0, 0, 0]], np.float32), (P, 1)))
    save_mesh_ply(str(res / "mesh.ply"),
                  rngl.random((9, 3)).astype(np.float32),
                  np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32))

    frame = np.zeros((16, 16, 3), np.float32)

    class FakeRunner:
        views = [dict(camera=make_camera(
            16, 16, np.diag([20.0, 20.0, 1.0]), np.eye(3, dtype=np.float32),
            np.zeros(3, np.float32)))]
        model_dir = str(mdl)
        result_dir = str(res)

        def render_view(self, cam, **kw):
            class Out:
                rgb_map = jnp.asarray(frame)
            return Out()

    async def run():
        server = RenderServer(FakeRunner())
        async with websockets.serve(server.handle, "127.0.0.1", 0,
                                    max_size=2 ** 24) as srv:
            port = srv.sockets[0].getsockname()[1]
            async with websockets.connect(
                    f"ws://127.0.0.1:{port}", max_size=2 ** 24) as ws:
                json.loads(await ws.recv())  # hello
                # overlays
                await ws.send(json.dumps({"overlay": "points"}))
                ov = json.loads(await ws.recv())["overlay"]
                assert ov["kind"] == "points" and len(ov["verts"]) == P
                await ws.send(json.dumps({"overlay": "mesh"}))
                ov = json.loads(await ws.recv())["overlay"]
                assert ov["kind"] == "mesh" and len(ov["faces"]) == 3
                await ws.send(json.dumps({"overlay": "off"}))
                assert json.loads(await ws.recv())["overlay"]["kind"] == "off"
                # camera-path save + load
                frames = []
                for ang in (0.0, 0.5, 1.0):
                    c, s = np.cos(ang), np.sin(ang)
                    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                 np.float32)
                    frames.append({"R": R.ravel().tolist(),
                                   "T": [0.0, 0.0, float(ang)]})
                await ws.send(json.dumps({"save_path": frames}))
                saved = json.loads(await ws.recv())["saved_path"]
                assert saved and os.path.exists(
                    os.path.join(saved, "extri.yml")), saved
                await ws.send(json.dumps({"load_path": None}))
                loaded = json.loads(await ws.recv())["loaded_path"]
                assert len(loaded["frames"]) == 3
                np.testing.assert_allclose(
                    np.asarray(loaded["frames"][2]["R"]).reshape(3, 3),
                    np.asarray(frames[2]["R"]).reshape(3, 3), atol=1e-5)
                return saved

    saved = asyncio.run(run())

    # the saved path drives offline path rendering (CLI --path-dir)
    from envgs_tpu.train.runner import Runner

    class PathRunner:
        views = FakeRunner.views
        result_dir = str(res)

        def render_view(self, cam, **kw):
            class Out:
                rgb_map = jnp.asarray(frame)
                dpt_map = jnp.ones((16, 16, 1))
                acc_map = jnp.ones((16, 16, 1))
                norm_map = jnp.ones((16, 16, 3))
                surf_norm_map = jnp.ones((16, 16, 3))
                spec_map = jnp.zeros((16, 16, 1))
                dif_rgb_map = jnp.asarray(frame)
                ref_rgb_map = jnp.asarray(frame)
            return Out()

    r = PathRunner()
    out_dir = Runner.render_path(r, n_frames=7, tag="filepath",
                                 types=("RENDER",), path_dir=saved)
    pngs = [f for f in os.listdir(os.path.join(out_dir, "RENDER"))
            if f.endswith(".png")]
    assert len(pngs) == 7
