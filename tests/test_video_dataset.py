"""Temporal (video) dataset + index samplers — frame axis, t emission,
DDP-style frame sharding, and the datasamplers.py sampler semantics."""
import os

import numpy as np
from PIL import Image

from envgs_tpu.data.video_dataset import (
    IterationBasedBatchSampler,
    MultiViewVideoDataset,
    RandomSampler,
    SameFrameBatchSampler,
    SequentialSampler,
    StreamSampler,
)
from envgs_tpu.utils.easycam import write_cameras


def _make_capture(root, n_views=3, n_frames=5, H=16, W=20):
    rng = np.random.default_rng(0)
    cams = {}
    for v in range(n_views):
        name = f"{v:02d}"
        cams[name] = dict(
            K=np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]]),
            D=np.zeros((5, 1)), R=np.eye(3), T=np.zeros((3, 1)), H=H, W=W,
        )
        d = os.path.join(root, "images", name)
        os.makedirs(d)
        for f in range(n_frames):
            arr = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{f:06d}.jpg"))
    write_cameras(cams, root)
    return cams


def test_video_items_and_t(tmp_path):
    _make_capture(str(tmp_path))
    ds = MultiViewVideoDataset(str(tmp_path), frame_sample=[0, None, 2],
                               eval_every=0, cache_images=False)
    # 3 views x frames {0, 2, 4}
    assert len(ds) == 9
    assert ds.n_frames == 3
    ts = sorted({round(ds[i]["t"], 3) for i in range(len(ds))})
    assert ts == [0.0, 0.5, 1.0]
    it = ds[0]
    assert it["rgb"].shape == (16, 20, 3)
    assert it["frame_index"] == it["latent_index"]


def test_frame_sharding(tmp_path):
    _make_capture(str(tmp_path), n_frames=6)
    shards = []
    for rank in range(2):
        ds = MultiViewVideoDataset(str(tmp_path), frame_shard=(rank, 2),
                                   eval_every=0, cache_images=False)
        shards.append({os.path.basename(v.image_path) for v in ds.views})
    # disjoint frame sets covering all frames (ims[:, rank::world] split)
    assert shards[0] & shards[1] == set()
    assert len(shards[0] | shards[1]) == 6


def test_samplers(tmp_path):
    _make_capture(str(tmp_path), n_views=2, n_frames=4)
    ds = MultiViewVideoDataset(str(tmp_path), eval_every=0,
                               cache_images=False)
    assert sorted(SequentialSampler(len(ds))) == list(range(len(ds)))
    assert sorted(RandomSampler(len(ds))) == list(range(len(ds)))

    batches = list(IterationBasedBatchSampler(
        RandomSampler(len(ds)), batch_size=2, max_iter=7))
    assert len(batches) == 7 and all(len(b) == 2 for b in batches)

    for b in SameFrameBatchSampler(ds, batch_size=2):
        fis = {ds[i]["frame_index"] for i in b}
        assert len(fis) == 1

    stream = list(StreamSampler(ds))
    frames = [ds[i]["frame_index"] for i in stream]
    assert frames == sorted(frames) and len(frames) == 4


def test_image_based_dataset(tmp_path):
    from envgs_tpu.data.video_dataset import ImageBasedDataset

    _make_capture(str(tmp_path), n_views=5, n_frames=1)
    ds = ImageBasedDataset(str(tmp_path), n_srcs=2, eval_every=0,
                           cache_images=False)
    it = ds[2]
    assert it["src_inps"].shape == (2, 16, 20, 3)
    assert len(it["src_cams"]) == 2
    assert 2 not in it["src_indices"]
    # all cameras sit at the origin here, so any 2 others are "nearest";
    # with distinct centers selection must be by proximity:
    ds._centers = np.arange(5, dtype=np.float64)[:, None] * np.array(
        [[1.0, 0, 0]])
    assert sorted(ds.src_indices_for(0)) == [1, 2]
    assert sorted(ds.src_indices_for(4)) == [2, 3]


def test_frame_sharding_keeps_global_time(tmp_path):
    """Regression: t / frame_index must name the same physical frame on
    every host (computed before the rank split, not per-shard)."""
    _make_capture(str(tmp_path), n_views=1, n_frames=6)
    by_file = {}
    for rank in range(2):
        ds = MultiViewVideoDataset(str(tmp_path), frame_shard=(rank, 2),
                                   eval_every=0, cache_images=False)
        assert ds.n_frames == 6  # GLOBAL frame count
        for i in range(len(ds)):
            fname = os.path.basename(ds.views[i].image_path)
            by_file.setdefault(fname, []).append(
                (ds[i]["frame_index"], round(ds[i]["t"], 4)))
    # global positions: 000002.jpg is frame 2 at t=0.4 regardless of rank
    assert by_file["000002.jpg"] == [(2, 0.4)]
    assert by_file["000000.jpg"] == [(0, 0.0)]
    assert by_file["000005.jpg"] == [(5, 1.0)]


def test_iteration_sampler_smaller_than_batch():
    """Regression: a sampler shorter than batch_size must accumulate
    across passes instead of spinning forever."""
    batches = list(IterationBasedBatchSampler(
        SequentialSampler(3), batch_size=4, max_iter=3))
    assert len(batches) == 3
    assert all(len(b) == 4 for b in batches)
    flat = [i for b in batches for i in b]
    assert flat == [0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2]


def test_image_based_streaming_dataset():
    """Live IBR source stacks: pluggable frame source, nearest-view
    selection per target, fresh frames per item, no GT (reference
    image_based_streaming_dataset.py parity)."""
    import numpy as np

    from envgs_tpu.data.video_dataset import ImageBasedStreamingDataset
    from envgs_tpu.engine import DATASETS
    from envgs_tpu.utils.camera import make_camera

    K = np.array([[50, 0, 16], [0, 50, 16], [0, 0, 1]], np.float32)
    cams = [make_camera(32, 32, K, np.eye(3, dtype=np.float32),
                        np.array([i * 1.0, 0, 0], np.float32))
            for i in range(4)]
    counter = [0]

    def src():
        counter[0] += 1
        return np.full((4, 32, 32, 3), counter[0], np.float32)

    ds = ImageBasedStreamingDataset(cams, src, n_srcs=2)
    a, b = ds[0], ds[1]
    assert a["src_inps"].shape == (2, 32, 32, 3)
    assert float(b["src_inps"].max()) == 2.0  # a fresh capture per item
    assert a["stream"] and "rgb" not in a and len(ds) > 10 ** 8
    assert a["src_indices"][0] == 1  # nearest view to camera 0 is camera 1
    srcs = ds.get_sources(cams[3])
    assert srcs["src_indices"][0] == 2
    assert "ImageBasedStreamingDataset" in DATASETS
