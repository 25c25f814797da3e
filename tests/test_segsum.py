import jax
import jax.numpy as jnp
import numpy as np

from envgs_tpu.ops.segsum import SROWS, gather_rows, segmented_inclusive_sum


def test_segmented_sum_matches_numpy():
    rng = np.random.default_rng(0)
    N = SROWS * 3
    rows = rng.normal(size=(N, 128)).astype(np.float32)
    seg = np.zeros(N, np.int32)
    starts = np.sort(rng.choice(N, 37, replace=False))
    seg[starts] = 1
    seg[0] = 1
    out = np.asarray(segmented_inclusive_sum(
        jnp.asarray(rows), jnp.asarray(seg), interpret=True))
    ref = np.zeros_like(rows)
    acc = np.zeros(128, np.float32)
    for i in range(N):
        if seg[i]:
            acc = np.zeros(128, np.float32)
        acc = acc + rows[i]
        ref[i] = acc
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_gather_rows_vjp_matches_scatter_add():
    rng = np.random.default_rng(1)
    P = 57
    N = SROWS  # one block
    packed = jnp.asarray(rng.normal(size=(P + 1, 128)).astype(np.float32))
    idx = jnp.asarray(
        np.concatenate([rng.integers(0, P, N - 40), np.full(40, P)])
        .astype(np.int32)
    )
    g_out = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))

    def loss_fast(p):
        return jnp.sum(gather_rows(p, idx, P + 1, True) * g_out)

    def loss_ref(p):
        return jnp.sum(p[idx] * g_out)

    g_fast = jax.grad(loss_fast)(packed)
    g_ref = jax.grad(loss_ref)(packed)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_permute_rows_vjp_matches_scatter_transpose():
    """`permute_rows` (gather-by-inverse backward) must match plain x[perm]
    autodiff exactly — the pack-table permutation's transpose is a
    permutation gather, not a generic scatter-add."""
    from envgs_tpu.ops.segsum import invert_permutation, permute_rows

    rng = np.random.default_rng(3)
    n, w = 257, 5
    x = jnp.asarray(rng.random((n, w), np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    inv = invert_permutation(perm)
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                  np.arange(n))
    cot = jnp.asarray(rng.random((n, w), np.float32))

    y_ref, vjp_ref = jax.vjp(lambda a: a[perm], x)
    y_new, vjp_new = jax.vjp(lambda a: permute_rows(a, perm, inv), x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    np.testing.assert_allclose(np.asarray(vjp_ref(cot)[0]),
                               np.asarray(vjp_new(cot)[0]), rtol=0, atol=0)


def test_gather_transpose_marker_bounds_and_empty_segments():
    """The marker-row transpose must match a numpy scatter-add and keep
    EXACT zeros for segments with no pairs (sparse Adam's grad==0 skip
    relies on untouched splats seeing exact-zero gradients, not
    prefix-difference rounding noise)."""
    from envgs_tpu.ops.segsum import gather_transpose

    rng = np.random.default_rng(7)
    N, S = 2048, 301
    # leave a band of segments empty on purpose
    ids = rng.integers(0, 150, N).astype(np.int32)
    ids[::7] = rng.integers(250, S, ids[::7].shape[0])
    g = rng.standard_normal((N, 48)).astype(np.float32)
    out = np.asarray(gather_transpose(
        jnp.asarray(g), jnp.asarray(ids), S, S, width=40))
    ref = np.zeros((S, 40), np.float32)
    np.add.at(ref, ids, g[:, :40])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    counts = np.bincount(ids, minlength=S)
    assert (out[counts == 0] == 0).all()

    # drop_last_segment zeroes the sentinel row even when its cotangent
    # rows are NaN (garbage pair rows must not poison the reduction)
    g_nan = g.copy()
    g_nan[ids == S - 1] = np.nan
    out2 = np.asarray(gather_transpose(
        jnp.asarray(g_nan), jnp.asarray(ids), S, S, width=40,
        drop_last_segment=True))
    ref2 = ref.copy()
    ref2[S - 1] = 0.0
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-4)
