"""Multi-host orchestration helpers (single-controller JAX).

TPU-native counterpart of the reference's torch.distributed helpers
(/root/reference/easyvolcap/utils/dist_utils.py:1-69 — get_rank /
get_world_size / synchronize) and its rank-0-only service policy
(scripts/main.py:237, runners/volumetric_video_runner.py:104-108: val
dataloader, evaluator, visualizer, recorder and checkpoints built/run only
on rank 0). Under JAX there is no process group to manage: each host runs
the same program; `jax.process_index()` is the rank, collectives ride the
ICI mesh.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def process_index() -> int:
    """This host's rank (0 on single-host)."""
    return jax.process_index()


def process_count() -> int:
    """Number of participating hosts."""
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for eval/visualize/record/save services."""
    return jax.process_index() == 0


def barrier():
    """Block until all hosts reach this point (dist.barrier() role): a
    tiny all-reduce across every global device, then a host-side fetch."""
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    jax.block_until_ready(y)
    float(y[0])  # force the fetch (axon: block_until_ready may not block)


def shard_for_host(items: Sequence, rank: int | None = None,
                   world: int | None = None) -> list:
    """The reference's frame-sharding split `ims[:, rank::world_size]`
    (volumetric_video_dataset.py:395-413) for any item list."""
    rank = process_index() if rank is None else rank
    world = process_count() if world is None else world
    return list(items)[rank::world]


def allsum_hosts(vec) -> "np.ndarray":
    """Element-wise sum of a small float vector across hosts (one psum over
    every global device; each host pre-divides by its local device count so
    its contribution counts once). Single-host: identity."""
    import numpy as np

    if jax.process_count() == 1:
        return np.asarray(vec, np.float64)
    n = jax.local_device_count()
    x = jnp.tile(jnp.asarray(vec, jnp.float32)[None] / n, (n, 1))
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    return np.asarray(y[0], np.float64)
