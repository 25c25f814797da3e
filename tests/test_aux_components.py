"""Camera residuals, moderators, recorder, websocket protocol, losses."""
import asyncio

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

        def render_view(self, cam):
            class Out:
                rgb_map = jnp.asarray(frame)
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
            return out

    out = asyncio.run(run())
    assert out.shape == (16, 16, 3)
    assert np.abs(out - frame).mean() < 0.05  # jpeg loss


def test_msssim_perfect_match():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    assert float(msssim(x, x)) > 0.999
    assert float(ssim(x, x)) > 0.999
    assert float(psnr(x, x)) > 90
