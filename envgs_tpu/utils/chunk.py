"""Ray-chunk evaluation: the reference `chunkify` decorator
(/root/reference/easyvolcap/utils/chunk_utils.py:6-104) bounds memory by
splitting the leading P = H*W axis into render_chunk_size chunks and
merging the outputs.

TPU-native form: pad P to a chunk multiple (static shapes) and `lax.map`
the jitted fn over the chunk axis — one compile regardless of P, chunks
executed sequentially on device, outputs concatenated and cropped. Works
for array / tuple / dict-of-array outputs (merged along axis 0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def chunkify(chunk_size: int = 65536):
    """Decorator: fn(rays (P, ...), *consts) -> pytree of (P, ...) outputs
    becomes memory-bounded chunked evaluation. Extra positional args are
    broadcast (passed whole to every chunk)."""

    def wrap(fn):
        @functools.wraps(fn)
        def run(rays, *consts):
            P = rays.shape[0]
            n = -(-P // chunk_size)
            pad = n * chunk_size - P
            rp = jnp.pad(rays, [(0, pad)] + [(0, 0)] * (rays.ndim - 1))
            blocks = rp.reshape(n, chunk_size, *rays.shape[1:])
            out = jax.lax.map(lambda r: fn(r, *consts), blocks)
            return jax.tree_util.tree_map(
                lambda x: x.reshape(n * chunk_size, *x.shape[2:])[:P], out)

        return run

    return wrap
