"""Multi-view dataset (easyvolcap on-disk conventions, host-side numpy).

Covers the reference's VolumetricVideoDataset capability surface for the
EnvGS path (/root/reference/easyvolcap/dataloaders/datasets/
volumetric_video_dataset.py): easymocap intri/extri cameras, view/frame
selection with the every-8th-view eval protocol (README.md:334-335), ratio
resizing with intrinsics rescale, optional undistortion, RGB + mask +
monocular-normal loading, scene bounds / spatial scale, and SfM point-cloud
init. Images decode on demand into an LRU cache (the 1-image-per-iteration
regime never needs the reference's shared-memory preload).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from envgs_tpu.engine import DATASETS
from envgs_tpu.utils.camera import Camera, make_camera
from envgs_tpu.utils.easycam import read_cameras
from envgs_tpu.utils.ply import load_sfm_ply


def _imread(path: str) -> np.ndarray:
    """-> float32 HWC in [0, 1] (3 channels for rgb, 1 for masks)."""
    try:
        import cv2

        im = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if im is None:
            raise FileNotFoundError(path)
        if im.ndim == 3:
            im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image

        im = np.asarray(Image.open(path))
    im = im.astype(np.float32)
    if im.dtype != np.float32 or im.max() > 1.5:
        im = im / 255.0
    if im.ndim == 2:
        im = im[..., None]
    return im


def _resize(im: np.ndarray, H: int, W: int) -> np.ndarray:
    try:
        import cv2

        out = cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA)
        return out[..., None] if out.ndim == 2 else out
    except ImportError:
        from PIL import Image

        chans = [
            np.asarray(
                Image.fromarray((im[..., c] * 255).astype(np.uint8)).resize(
                    (W, H), Image.BILINEAR
                ),
                np.float32,
            )
            / 255.0
            for c in range(im.shape[-1])
        ]
        return np.stack(chans, -1)


def _undistort(im, K, D):
    if np.abs(D).max() < 1e-12:
        return im
    try:
        import cv2

        return cv2.undistort(im, K.astype(np.float64), D.astype(np.float64))
    except ImportError:
        return im  # distortion ignored without cv2 (warned at load)


@dataclass
class View:
    name: str
    camera: Camera
    image_path: str
    mask_path: Optional[str] = None
    normal_path: Optional[str] = None
    K_orig: np.ndarray = None
    D: np.ndarray = None
    H: int = 0
    W: int = 0
    depth_path: Optional[str] = None


def _load_depth(path: str, H: int, W: int) -> np.ndarray:
    """Metric depth map -> (H, W, 1) f32. Supports .npy/.npz (raw meters,
    the reference's dpt convention — data_utils.load_depth) and 16-bit png
    (millimeters, the common mono-depth export)."""
    if path.endswith(".npy"):
        d = np.load(path).astype(np.float32)
    elif path.endswith(".npz"):
        z = np.load(path)
        d = z[list(z.keys())[0]].astype(np.float32)
    else:
        try:
            import cv2

            d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if d is None:
                raise FileNotFoundError(path)
            d = d.astype(np.float32)
            if d.dtype != np.float32 or d.max() > 1000:  # uint16 mm -> m
                d = d / 1000.0
        except ImportError:
            from PIL import Image

            d = np.asarray(Image.open(path), np.float32) / 1000.0
    if d.ndim == 3:
        d = d[..., 0]
    if d.shape[:2] != (H, W):
        d = _resize(d[..., None], H, W)[..., 0]
    return d[..., None]


@DATASETS.register
class MultiViewDataset:
    """Static multi-view scene (the EnvGS regime: one frame, many views).

    Args mirror the reference dataset's EnvGS-relevant knobs: data_root,
    images_dir, ratio, view_sample, split ('train' keeps views not in the
    every-8th eval set; 'val' keeps them), use_masks/use_normals, near/far.
    """

    def __init__(
        self,
        data_root: str,
        images_dir: str = "images",
        masks_dir: str = "masks",
        normals_dir: str = "normals",
        depths_dir: str = "depths",
        split: str = "train",
        ratio: float = 1.0,
        view_sample: list | None = None,  # [begin, end, step]
        eval_every: int = 8,  # every-8th-view protocol
        use_masks: bool = False,
        use_normals: bool = False,
        use_depths: bool = False,
        near: float = 0.02,
        far: float = 20.0,
        frame: int = 0,
        cache_images: bool = True,
    ):
        self.data_root = data_root
        self.split = split
        self.use_masks = use_masks
        self.use_normals = use_normals
        self.near, self.far = near, far
        self.cache: dict[int, dict] = {}
        self.cache_images = cache_images

        cams = read_cameras(data_root)
        names = list(cams.keys())
        if view_sample:
            # reference semantics (volumetric_video_dataset.py:784-785):
            # a 3-element list is [begin, end, step]; any other length is
            # an EXPLICIT index list (the ref_real/nerf_casting dataset
            # configs ship the train/val partitions as such lists)
            if len(view_sample) == 3:
                b, e, s = view_sample
                e = len(names) if e in (None, -1) else e
                names = names[b or 0:e:s or 1]
            else:
                names = [names[i] for i in view_sample]

        # every-8th-view eval split (compute_metadata.py:58-65 convention)
        if eval_every and eval_every > 0 and len(names) > eval_every:
            eval_names = set(names[::eval_every])
        else:
            eval_names = set()
        if split == "train":
            names = [n for n in names if n not in eval_names]
        elif split in ("val", "test") and eval_names:
            names = [n for n in names if n in eval_names]

        self.views: list[View] = []
        for n in names:
            c = cams[n]
            img_dir = os.path.join(data_root, images_dir, n)
            if not os.path.isdir(img_dir):
                continue
            frames = sorted(os.listdir(img_dir))
            if not frames:
                continue
            fidx = min(frame, len(frames) - 1)
            ipath = os.path.join(img_dir, frames[fidx])
            mpath = os.path.join(data_root, masks_dir, n, frames[fidx])
            mpath = self._fuzzy(mpath) if use_masks else None
            npath = os.path.join(data_root, normals_dir, n, frames[fidx])
            npath = self._fuzzy(npath) if use_normals else None
            dpath = None
            if use_depths:
                dpath = os.path.join(data_root, depths_dir, n, frames[fidx])
                stem = os.path.splitext(dpath)[0]
                for ext in (".npy", ".npz", ".png", ".jpg"):
                    if os.path.exists(stem + ext):
                        dpath = stem + ext
                        break
                else:
                    dpath = None

            H = c.get("H") or self._probe_hw(ipath)[0]
            W = c.get("W") or self._probe_hw(ipath)[1]
            Hs, Ws = int(H * ratio), int(W * ratio)
            K = c["K"].copy().astype(np.float32)
            K[:2] *= ratio
            cam = make_camera(
                Hs, Ws, K, c["R"].astype(np.float32),
                c["T"].reshape(3).astype(np.float32),
                znear=c.get("n", near), zfar=c.get("f", far),
            )
            self.views.append(
                View(n, cam, ipath, mpath, npath, c["K"], c.get("D"), Hs, Ws,
                     depth_path=dpath)
            )

        # scene extent: camera-center bounding sphere radius (the reference's
        # spatial_scale drives densification thresholds)
        centers = np.stack([np.asarray(v.camera.center) for v in self.views])
        self.center = centers.mean(0)
        self.spatial_scale = float(
            np.linalg.norm(centers - self.center, axis=-1).max()
        ) or 1.0

    @staticmethod
    def _fuzzy(path: str) -> Optional[str]:
        """Accept sibling extensions (masks/normals often differ: jpg/png)."""
        if os.path.exists(path):
            return path
        stem = os.path.splitext(path)[0]
        for ext in (".png", ".jpg", ".jpeg", ".webp"):
            if os.path.exists(stem + ext):
                return stem + ext
        return None

    @staticmethod
    def _probe_hw(path: str):
        from PIL import Image

        with Image.open(path) as im:
            return im.height, im.width

    def __len__(self):
        return len(self.views)

    def load_sfm(self, ply_path: str | None = None):
        """Initial point cloud: explicit ply, else <root>/sparse points."""
        cands = [ply_path] if ply_path else []
        cands += [
            os.path.join(self.data_root, "sparse", "0", "points3D.ply"),
            os.path.join(self.data_root, "points3D.ply"),
            os.path.join(self.data_root, "sparse.ply"),
        ]
        for c in cands:
            if c and os.path.exists(c):
                return load_sfm_ply(c)
        from envgs_tpu.utils.colmap import load_colmap_model

        for sp in ("sparse/0", "sparse", "colmap/sparse/0"):
            d = os.path.join(self.data_root, sp)
            if os.path.isdir(d):
                _, _, (xyz, rgb, _) = load_colmap_model(d)
                return xyz.astype(np.float32), rgb.astype(np.float32) / 255.0
        # SfM-free captures (blender/dnerf synthetic): random cloud inside
        # the scene bounds — the reference's random-init path
        # (gaussian2d_sampler.py:194-216)
        md = os.path.join(self.data_root, "metadata.json")
        if os.path.exists(md):
            import json as _json

            with open(md) as f:
                meta = _json.load(f)
            lo, hi = np.asarray(meta["bounds"], np.float32)
            rng = np.random.default_rng(0)
            n = int(os.environ.get("ENVGS_RANDOM_INIT_PTS", 4096))
            xyz = rng.random((n, 3), np.float32) * (hi - lo) + lo
            return xyz.astype(np.float32), rng.random(
                (n, 3), np.float32) * 0.5 + 0.25
        raise FileNotFoundError(
            f"no SfM point cloud found under {self.data_root}"
        )

    _native = None

    def _load_rgb(self, v: View) -> np.ndarray:
        """Native C++ decode+undistort+resize when built; python fallback."""
        from envgs_tpu.data import native_loader

        if native_loader.available():
            if MultiViewDataset._native is None:
                MultiViewDataset._native = native_loader.NativeLoader(4)
            try:
                return MultiViewDataset._native.load(
                    v.image_path, v.H, v.W, v.K_orig, v.D
                )
            except IOError:
                pass
        im = _imread(v.image_path)[..., :3]
        if v.D is not None and v.K_orig is not None:
            im = _undistort(im, v.K_orig, v.D)
        return _resize(im, v.H, v.W)

    def __getitem__(self, i: int) -> dict:
        if self.cache_images and i in self.cache:
            return self.cache[i]
        v = self.views[i]
        im = self._load_rgb(v)
        item = dict(rgb=im, camera=v.camera, name=v.name, index=i)
        if v.mask_path:
            m = _resize(_imread(v.mask_path)[..., :1], v.H, v.W)
            item["msk"] = (m > 0.5).astype(np.float32)[..., :1]
        else:
            item["msk"] = np.ones((v.H, v.W, 1), np.float32)
        if v.normal_path:
            nm = _resize(_imread(v.normal_path)[..., :3], v.H, v.W)
            item["norm"] = nm
        if v.depth_path:
            item["dpt"] = _load_depth(v.depth_path, v.H, v.W)
        if self.cache_images:
            self.cache[i] = item
        return item
