import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.fill_forward import BROWS, LANES, fill_forward


def _ref_fill(vals, valid):
    out = np.zeros_like(vals)
    cur = np.zeros(vals.shape[0], vals.dtype)
    for j in range(vals.shape[1]):
        if valid[j]:
            cur = vals[:, j]
        out[:, j] = cur
    return out


def test_fill_forward_random():
    rng = np.random.default_rng(0)
    N = LANES * BROWS * 3
    C = 4
    vals = rng.integers(0, 10 ** 6, (C, N)).astype(np.int32)
    valid = (rng.random(N) < 0.01).astype(np.int32)
    valid[0] = 1
    out = np.asarray(
        fill_forward(jnp.asarray(vals), jnp.asarray(valid), interpret=True)
    )
    np.testing.assert_array_equal(out, _ref_fill(vals, valid))


def test_fill_forward_sparse_blocks():
    """Markers far apart: carry must cross many empty blocks and rows."""
    N = LANES * BROWS * 4
    vals = np.zeros((2, N), np.int32)
    valid = np.zeros(N, np.int32)
    for pos, v in [(0, 7), (5, 9), (LANES * 3 + 17, 11),
                   (LANES * BROWS * 2 + 1, 13), (N - 1, 99)]:
        valid[pos] = 1
        vals[0, pos] = v
        vals[1, pos] = v * 2
    out = np.asarray(
        fill_forward(jnp.asarray(vals), jnp.asarray(valid), interpret=True)
    )
    np.testing.assert_array_equal(out, _ref_fill(vals, valid))


def test_fill_forward_dense():
    N = LANES * BROWS
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 100, (1, N)).astype(np.int32)
    valid = np.ones(N, np.int32)
    out = np.asarray(
        fill_forward(jnp.asarray(vals), jnp.asarray(valid), interpret=True)
    )
    np.testing.assert_array_equal(out, vals)
