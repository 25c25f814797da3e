"""Volumetric-video dataset: the temporal (frame) axis + index samplers.

TPU-native counterpart of the reference's video-capable dataset/sampler
stack (/root/reference/easyvolcap/dataloaders/datasets/
volumetric_video_dataset.py + dataloaders/datasamplers.py):

- `MultiViewVideoDataset` — (view, frame) items over an easymocap-layout
  capture (`images/<cam>/<frame>.jpg`); `frame_sample=[begin, end, step]`
  selects frames, items carry `t` (normalized time), `frame_index` and
  `latent_index` (consumed by LatentCodeEmbedder-style temporal codes).
  DDP-style FRAME sharding across hosts mirrors the reference's
  `ims[:, rank::world_size]` split (volumetric_video_dataset.py:395-413)
  via `frame_shard=(rank, world_size)`.
- Index samplers (datasamplers.py): `RandomSampler`, `SequentialSampler`,
  `IterationBasedBatchSampler` (infinite epoch-free batches up to
  max_iter), `SameFrameBatchSampler` (all batch items share one frame),
  `StreamSampler` (frames in order, views random within a frame — the
  online-streaming regime).

Host-side pure python/numpy; device code never sees ragged shapes.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from envgs_tpu.data.dataset import MultiViewDataset, View
from envgs_tpu.engine import DATASAMPLERS, DATASETS


@DATASETS.register
class MultiViewVideoDataset(MultiViewDataset):
    """Multi-view + multi-frame dataset (one item per (view, frame))."""

    def __init__(
        self,
        data_root: str,
        frame_sample: list | None = None,  # [begin, end, step]
        frame_shard: tuple | None = None,  # (rank, world_size) frame split
        **kwargs,
    ):
        super().__init__(data_root, **kwargs)
        b, e, s = ((frame_sample or [0, None, 1]) + [None, None, None])[:3]

        # re-enumerate every view's frame directory (the base class kept
        # only one frame per view)
        images_dir = kwargs.get("images_dir", "images")
        masks_dir = kwargs.get("masks_dir", "masks")
        normals_dir = kwargs.get("normals_dir", "normals")
        vf: list[View] = []
        frame_ids: list[int] = []
        n_frames = 0
        for v in self.views:
            img_dir = os.path.dirname(v.image_path)
            frames = sorted(os.listdir(img_dir))
            e_v = len(frames) if e in (None, -1) else min(e, len(frames))
            sel_all = list(range(b or 0, e_v, s or 1))
            if frame_shard is not None:
                rank, world = frame_shard
                # GLOBAL frame positions survive sharding: t / latent_index
                # must name the same physical frame on every host (the
                # reference computes ts before the rank split,
                # volumetric_video_dataset.py:395-413)
                pairs = list(enumerate(sel_all))[rank::world]
            else:
                pairs = list(enumerate(sel_all))
            n_frames = max(n_frames, len(sel_all))
            for fi, fidx in pairs:
                fname = frames[fidx]
                mp = os.path.join(self.data_root, masks_dir, v.name, fname)
                np_ = os.path.join(self.data_root, normals_dir, v.name, fname)
                vf.append(View(
                    v.name, v.camera,
                    os.path.join(img_dir, fname),
                    self._fuzzy(mp) if self.use_masks else None,
                    self._fuzzy(np_) if self.use_normals else None,
                    v.K_orig, v.D, v.H, v.W,
                ))
                frame_ids.append(fi)
        self.views = vf
        self.frame_ids = np.asarray(frame_ids, np.int32)
        self.n_frames = max(n_frames, 1)
        self.n_views = len({v.name for v in vf})

    def __getitem__(self, i: int) -> dict:
        item = dict(super().__getitem__(i))
        fi = int(self.frame_ids[i])
        item["frame_index"] = fi
        item["latent_index"] = fi
        item["t"] = fi / max(self.n_frames - 1, 1)
        return item


# ---------------------------------------------------------------------------
# Index samplers (datasamplers.py semantics, torch-free)
# ---------------------------------------------------------------------------

@DATASAMPLERS.register
class SequentialSampler:
    def __init__(self, n: int):
        self.n = n

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.n))

    def __len__(self):
        return self.n


@DATASAMPLERS.register
class RandomSampler:
    def __init__(self, n: int, seed: int = 0):
        self.n, self.rng = n, np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        return iter(self.rng.permutation(self.n).tolist())

    def __len__(self):
        return self.n


@DATASAMPLERS.register
class IterationBasedBatchSampler:
    """Wrap a sampler into an infinite stream of `batch_size` batches up to
    `max_iter` (datasamplers.py:83-104): epoch-free training."""

    def __init__(self, sampler, batch_size: int = 1,
                 max_iter: int = 10 ** 9, start_iter: int = 0):
        self.sampler, self.batch_size = sampler, batch_size
        self.max_iter, self.start_iter = max_iter, start_iter

    def __iter__(self):
        it = self.start_iter
        batch = []  # carried ACROSS sampler passes: a sampler shorter than
        # batch_size keeps accumulating instead of spinning forever
        while it < self.max_iter:
            for idx in self.sampler:
                batch.append(idx)
                if len(batch) == self.batch_size:
                    yield batch
                    batch = []
                    it += 1
                    if it >= self.max_iter:
                        return

    def __len__(self):
        return self.max_iter - self.start_iter


@DATASAMPLERS.register
class SameFrameBatchSampler:
    """Batches whose items all share one frame (multi-view consistency
    training for temporal models)."""

    def __init__(self, dataset: MultiViewVideoDataset, batch_size: int = 1,
                 seed: int = 0):
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.by_frame: dict[int, list[int]] = {}
        for i, fi in enumerate(np.asarray(dataset.frame_ids)):
            self.by_frame.setdefault(int(fi), []).append(i)

    def __iter__(self):
        frames = list(self.by_frame)
        self.rng.shuffle(frames)
        for f in frames:
            idxs = self.by_frame[f]
            sel = self.rng.choice(
                idxs, size=min(self.batch_size, len(idxs)), replace=False
            )
            yield [int(x) for x in sel]

    def __len__(self):
        return len(self.by_frame)


@DATASAMPLERS.register
class StreamSampler:
    """Frames strictly in order, random view within each frame (the online
    streaming regime of dynamic capture)."""

    def __init__(self, dataset: MultiViewVideoDataset, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.by_frame: dict[int, list[int]] = {}
        for i, fi in enumerate(np.asarray(dataset.frame_ids)):
            self.by_frame.setdefault(int(fi), []).append(i)

    def __iter__(self):
        for f in sorted(self.by_frame):
            yield int(self.rng.choice(self.by_frame[f]))

    def __len__(self):
        return len(self.by_frame)


@DATASETS.register
class ImageBasedDataset(MultiViewDataset):
    """Source-view-stack dataset for image-based models (ENeRF/IBR).

    Counterpart of the reference's ImageBasedDataset
    (easyvolcap/dataloaders/datasets/image_based_dataset.py): each item is a
    target view plus its `n_srcs` nearest training views (by camera-center
    distance, target excluded — the source-view selection that conditions
    the generalizable network). Items add `src_inps` (S, H, W, 3),
    `src_cams` (list[Camera]) and `src_indices`.
    """

    def __init__(self, data_root: str, n_srcs: int = 3,
                 extra_src_pool: int = 0, seed: int = 0, **kwargs):
        super().__init__(data_root, **kwargs)
        self.n_srcs = n_srcs
        self.extra_src_pool = extra_src_pool  # jitter: sample n from n+pool
        self._rng = np.random.default_rng(seed)
        self._centers = np.stack(
            [np.asarray(v.camera.center) for v in self.views])

    def src_indices_for(self, i: int) -> list[int]:
        d = np.linalg.norm(self._centers - self._centers[i], axis=-1)
        d[i] = np.inf
        pool = np.argsort(d)[: self.n_srcs + self.extra_src_pool]
        if self.extra_src_pool > 0:
            pool = self._rng.choice(pool, size=self.n_srcs, replace=False)
        return [int(x) for x in pool[: self.n_srcs]]

    def __getitem__(self, i: int) -> dict:
        item = dict(super().__getitem__(i))
        src = self.src_indices_for(i)
        item["src_indices"] = src
        item["src_inps"] = np.stack(
            [super(ImageBasedDataset, self).__getitem__(j)["rgb"]
             for j in src])
        item["src_cams"] = [self.views[j].camera for j in src]
        return item


@DATASETS.register
class ImageBasedStreamingDataset:
    """Live source-view stacks for the IBR path (demo / no-GT rendering).

    Counterpart of the reference's ImageBasedStreamingDataset
    (easyvolcap/dataloaders/datasets/image_based_streaming_dataset.py:26-112),
    which pulls frames from USB webcams for the GUI. TPU pods have no
    cameras, so the capture device is a pluggable `frame_source` callable:
    () -> (V, H, W, 3) float32, the latest frame of every calibrated view
    (a socket receiver, a directory poller, a synthetic generator, ...).
    Calibration (K/R/T per view) is fixed at construction; items are
    effectively infinite (`max_len`), carry no GT, and stack the `n_srcs`
    views nearest the requested target camera — the get_sources semantics
    at reference :100-107.
    """

    def __init__(self, cameras: list, frame_source, n_srcs: int = 3,
                 max_len: int = 1_000_000_000):
        assert len(cameras) >= n_srcs
        self.cameras = cameras  # list[Camera], one per stream view
        self.frame_source = frame_source
        self.n_srcs = n_srcs
        self.max_len = max_len
        self._centers = np.stack([np.asarray(c.center) for c in cameras])

    def __len__(self):
        return self.max_len

    def src_indices_for(self, target_center: np.ndarray) -> list[int]:
        d = np.linalg.norm(self._centers - np.asarray(target_center),
                           axis=-1)
        if len(d) > self.n_srcs:
            # a stream view coincident with the target is the target: exclude
            # it from its own source stack (ImageBasedDataset semantics)
            d = np.where(d < 1e-6, np.inf, d)
        return [int(x) for x in np.argsort(d)[: self.n_srcs]]

    def get_sources(self, target_cam) -> dict:
        """Latest frames for the n_srcs views nearest `target_cam`."""
        frames = np.asarray(self.frame_source(), np.float32)
        src = self.src_indices_for(np.asarray(target_cam.center))
        return dict(
            src_inps=np.stack([frames[j] for j in src]),
            src_cams=[self.cameras[j] for j in src],
            src_indices=src,
            stream=True,
        )

    def __getitem__(self, i: int) -> dict:
        # round-robin target over the calibrated views (the GUI normally
        # supplies its own free-viewpoint camera through get_sources)
        cam = self.cameras[i % len(self.cameras)]
        item = self.get_sources(cam)
        item["camera"] = cam
        item["view_index"] = i % len(self.cameras)
        item["frame_index"] = i // len(self.cameras)
        return item
