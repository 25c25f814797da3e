"""WebSocket remote-render server + client.

Mirrors the reference's remote rendering service
(/root/reference/easyvolcap/runners/websocket_server.py, scripts/client.py):
the client streams camera poses; the server renders each received camera
with the current model state, JPEG-encodes, and streams frames back.

Protocol:
  server -> client on connect: ONE text frame, JSON
                    {"H", "W", "K": [9], "R": [9], "T": [3]} — the first
                    training view, so clients can seed their camera.
  client -> server: 4-byte header b'CAM0' + float32[3,3] K + float32[3,3] R
                    + float32[3] T  (little-endian, C order), binary.
  server -> client: JPEG bytes of the rendered RGB image, binary.

A plain (non-websocket) HTTP GET on the same port serves the interactive
browser viewer (`viewer.html` — the imgui-viewer analog for headless TPU
pods, reference volumetric_video_viewer.py:267-375): point a browser at
http://host:port/ and orbit.

Run:  python -m envgs_tpu.serve.websocket_server -c <config> [--port 8765]
"""
from __future__ import annotations

import argparse
import asyncio
import io
import os
import struct
import time

import numpy as np


def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.clip(np.nan_to_num(rgb) * 255, 0, 255).astype(np.uint8)
    ).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def decode_camera(payload: bytes):
    assert payload[:4] == b"CAM0", "bad camera frame"
    vals = struct.unpack("<21f", payload[4:4 + 84])
    K = np.asarray(vals[:9], np.float32).reshape(3, 3)
    R = np.asarray(vals[9:18], np.float32).reshape(3, 3)
    T = np.asarray(vals[18:21], np.float32)
    return K, R, T


def encode_camera(K, R, T) -> bytes:
    vals = list(np.asarray(K, np.float32).ravel()) + \
        list(np.asarray(R, np.float32).ravel()) + \
        list(np.asarray(T, np.float32).ravel())
    return b"CAM0" + struct.pack("<21f", *vals)


RENDER_TYPES = ("RENDER", "DEPTH", "ALPHA", "NORMAL", "SURFACE_NORMAL",
                "SPECULAR", "DIFFUSE", "REFLECTION")


def typed_map(out, render_type: str) -> np.ndarray:
    """EnvGSOutput -> display rgb for the requested render type.

    The viewer counterpart of the reference's render-type switching
    (volumetric_video_viewer.py:306-320, visualization_type cycling) —
    same mapping as the offline Visualizer (train/evaluator.py:115-127)."""
    from envgs_tpu.train.evaluator import colorize_depth, colorize_normal

    if render_type == "DEPTH":
        return colorize_depth(np.asarray(out.dpt_map)[..., 0])
    if render_type == "ALPHA":
        return np.repeat(np.asarray(out.acc_map), 3, -1)
    if render_type == "NORMAL":
        return colorize_normal(np.asarray(out.norm_map))
    if render_type == "SURFACE_NORMAL":
        return colorize_normal(np.asarray(out.surf_norm_map))
    if render_type == "SPECULAR":
        return np.repeat(np.asarray(out.spec_map)[..., :1], 3, -1)
    if render_type == "DIFFUSE":
        return np.asarray(out.dif_rgb_map)
    if render_type == "REFLECTION":
        return np.asarray(out.ref_rgb_map)
    return np.asarray(out.rgb_map)


class RenderServer:
    """Serves renders of a trained checkpoint over websockets.

    `watch=True` attaches read-only to a LIVE training run (the reference
    viewer's attach-to-running-training mode,
    volumetric_video_viewer.py:336-375): before each frame the server
    polls the run's latest checkpoint and hot-reloads the model state when
    it changes — pool caps are static, so the jitted render fn is reused
    across reloads."""

    def __init__(self, runner, watch: bool = False):
        self.runner = runner  # envgs_tpu.train.runner.Runner
        self.watch = watch
        self._ckpt_sig = None  # (path, mtime) of the last loaded checkpoint
        self.attached_iter = None

    def maybe_reload(self) -> None:
        """Hot-reload runner.state from the newest checkpoint (watch mode)."""
        if not self.watch:
            return
        import envgs_tpu.train.checkpoints as ckpt

        latest = ckpt.find_latest(self.runner.model_dir)
        if not latest:
            return
        try:
            sig = (latest, int(os.path.getmtime(latest) * 1e3))
            if sig == self._ckpt_sig:
                return
            state, it, _cam = ckpt.load_checkpoint(
                latest, self.runner.state.base.cap,
                self.runner.state.env.cap,
                n_views=len(self.runner.views))
        except Exception as exc:  # mid-write npz: keep serving the old state
            print(f"[watch] reload skipped: {exc}")
            return
        self.runner.state = state
        self._ckpt_sig = sig
        self.attached_iter = int(it)
        print(f"[watch] attached to {latest} @ iter {it}")

    def _overlay_payload(self, kind: str) -> dict:
        """Geometry for the client-side overlay layer (the browser
        counterpart of the imgui viewer's mesh/point overlays,
        volumetric_video_viewer.py:267-375): point clouds from the saved
        gaussian ply, wireframe meshes from the TSDF mesh export. Vertices
        are decimated server-side to keep the JSON frame small."""
        if kind == "off":
            return {"kind": "off"}
        mdl = getattr(self.runner, "model_dir", "")
        res = getattr(self.runner, "result_dir", "")
        if kind == "points":
            from envgs_tpu.utils.ply import load_gaussian_ply

            for name in ("base.ply", "point_cloud.ply", "env.ply"):
                p = os.path.join(mdl, name)
                if os.path.exists(p):
                    xyz = np.asarray(load_gaussian_ply(p)["xyz"], np.float32)
                    step = max(1, len(xyz) // 20000)
                    return {"kind": "points", "name": name,
                            "verts": xyz[::step].round(4).tolist()}
            return {"kind": "off", "error": "no gaussian ply saved yet"}
        if kind == "mesh":
            from envgs_tpu.utils.fusion import load_mesh_ply

            for root in (res, mdl):
                p = os.path.join(root, "mesh.ply")
                if os.path.exists(p):
                    verts, faces = load_mesh_ply(p)
                    step = max(1, len(faces) // 15000)
                    return {"kind": "mesh", "name": p,
                            "verts": verts.round(4).tolist(),
                            "faces": faces[::step].tolist()}
            return {"kind": "off",
                    "error": "no mesh.ply (run the mesh CLI mode first)"}
        return {"kind": "off", "error": f"unknown overlay {kind!r}"}

    def _paths_dir(self) -> str:
        return os.path.join(getattr(self.runner, "result_dir", "."),
                            "camera_paths")

    def _save_camera_path(self, frames: list, K) -> str:
        """Persist viewer keyframes as an easymocap camera path
        (intri/extri under result_dir/camera_paths/<name>; the render CLI
        consumes it via --path-dir — the CameraPath export of
        utils/viewer_utils.py)."""
        from envgs_tpu.utils.easycam import write_cameras

        name = time.strftime("path_%Y%m%d_%H%M%S")
        out = os.path.join(self._paths_dir(), name)
        cams = {}
        for i, fr in enumerate(frames):
            cams[f"{i:04d}"] = dict(
                K=np.asarray(K, np.float32).reshape(3, 3),
                R=np.asarray(fr["R"], np.float32).reshape(3, 3),
                T=np.asarray(fr["T"], np.float32).reshape(3, 1),
            )
        write_cameras(cams, out)
        return out

    def _load_camera_path(self, name: str | None) -> dict:
        from envgs_tpu.utils.easycam import read_cameras

        root = self._paths_dir()
        if not os.path.isdir(root):
            return {"error": "no saved camera paths"}
        names = sorted(os.listdir(root))
        if not names:
            return {"error": "no saved camera paths"}
        pick = name if name in names else names[-1]
        cams = read_cameras(os.path.join(root, pick))
        frames = [
            {"R": np.asarray(c["R"], np.float32).ravel().tolist(),
             "T": np.asarray(c["T"], np.float32).ravel().tolist()}
            for _k, c in sorted(cams.items())
        ]
        return {"name": pick, "frames": frames, "available": names}

    def _render(self, cam, render_type: str) -> np.ndarray:
        self.maybe_reload()
        out = self.runner.render_view(cam)
        return typed_map(out, render_type)  # device fetch blocks here

    async def handle(self, ws):
        import json

        import jax.numpy as jnp

        from envgs_tpu.utils.camera import Camera

        cam0 = self.runner.views[0]["camera"]
        render_type = "RENDER"  # per-connection switchable
        # hello frame: initial camera meta (text, so binary-frame clients
        # can tell it apart from JPEG payloads)
        await ws.send(json.dumps({
            "H": int(cam0.H), "W": int(cam0.W),
            "K": np.asarray(cam0.K, np.float32).ravel().tolist(),
            "R": np.asarray(cam0.R, np.float32).ravel().tolist(),
            "T": np.asarray(cam0.T, np.float32).ravel().tolist(),
            "types": list(RENDER_TYPES),
            "watch": bool(self.watch),
        }))
        async for msg in ws:
            if isinstance(msg, str):  # text frames: control messages
                try:
                    obj = json.loads(msg)
                except Exception:
                    continue
                t = obj.get("render_type")
                if t in RENDER_TYPES:
                    render_type = t
                    await ws.send(json.dumps({"render_type": render_type}))
                if "overlay" in obj:
                    await ws.send(json.dumps(
                        {"overlay": self._overlay_payload(obj["overlay"])}))
                if "save_path" in obj:
                    try:
                        out = self._save_camera_path(
                            obj["save_path"], cam0.K)
                        await ws.send(json.dumps({"saved_path": out}))
                    except Exception as e:  # surface, don't kill the socket
                        await ws.send(json.dumps(
                            {"saved_path": None, "error": str(e)}))
                if "load_path" in obj:
                    await ws.send(json.dumps(
                        {"loaded_path":
                         self._load_camera_path(obj.get("load_path"))}))
                continue
            try:
                K, R, T = decode_camera(msg)
            except Exception:
                await ws.send(b"ERR bad camera")
                continue
            cam = Camera(cam0.H, cam0.W, jnp.asarray(K), jnp.asarray(R),
                         jnp.asarray(T), cam0.znear, cam0.zfar)
            # render off the event loop: a synchronous jit (minutes on first
            # compile) would block the websocket keepalive pings and the
            # client would see the connection drop
            t0 = time.perf_counter()
            rgb = await asyncio.get_event_loop().run_in_executor(
                None, self._render, cam, render_type)
            t1 = time.perf_counter()
            jpeg = encode_jpeg(rgb)
            t2 = time.perf_counter()
            await ws.send(jpeg)
            # per-stage frame timings (the imgui viewer's profiling panel,
            # volumetric_video_viewer.py:267-375): a text frame after each
            # JPEG so the HUD can show server-side costs, not just
            # client-side fps
            stats = {
                "render_ms": round((t1 - t0) * 1e3, 1),
                "encode_ms": round((t2 - t1) * 1e3, 1),
                "jpeg_kb": round(len(jpeg) / 1024, 1),
                "type": render_type,
            }
            if self.attached_iter is not None:
                stats["iter"] = self.attached_iter
            await ws.send(json.dumps({"stats": stats}))

    async def serve(self, host: str = "0.0.0.0", port: int = 8765):
        import websockets

        async with websockets.serve(self.handle, host, port,
                                    max_size=2 ** 24,
                                    process_request=viewer_page):
            print(f"render server listening on ws://{host}:{port} "
                  f"(browser viewer: http://{host}:{port}/)")
            await asyncio.Future()


def viewer_page(connection, request):
    """`process_request` hook: answer plain HTTP GETs (no Upgrade header)
    with the bundled browser viewer; return None to continue the websocket
    handshake."""
    if "upgrade" in (request.headers.get("Connection") or "").lower():
        return None
    import http

    from websockets.datastructures import Headers
    from websockets.http11 import Response

    path = os.path.join(os.path.dirname(__file__), "viewer.html")
    with open(path, "rb") as fh:
        body = fh.read()
    return Response(
        http.HTTPStatus.OK, "OK",
        Headers([("Content-Type", "text/html; charset=utf-8"),
                 ("Content-Length", str(len(body)))]),
        body,
    )


async def request_frame(uri: str, K, R, T) -> np.ndarray:
    """Client helper: send one camera, receive one frame."""
    import websockets
    from PIL import Image

    async with websockets.connect(uri, max_size=2 ** 24) as ws:
        await ws.send(encode_camera(K, R, T))
        data = await ws.recv()
        while isinstance(data, str):  # skip the hello/meta text frame
            data = await ws.recv()
        return np.asarray(Image.open(io.BytesIO(data)), np.float32) / 255.0


def serve_config(config: str, overrides=(), host: str = "0.0.0.0",
                 port: int = 8765, watch: bool = False):
    """Build the runner from a config chain and serve (the evc-ws analog)."""
    from envgs_tpu.cli import make_runner
    from envgs_tpu.engine import load_config

    runner = make_runner(load_config(config, overrides=list(overrides),
                                     root=os.getcwd()))
    asyncio.run(RenderServer(runner, watch=watch).serve(host=host, port=port))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--watch", action="store_true",
                   help="attach read-only to a live training: hot-reload "
                        "the run's latest checkpoint before each frame")
    a = p.parse_args()
    serve_config(a.config, host=a.host, port=a.port, watch=a.watch)


if __name__ == "__main__":
    main()
