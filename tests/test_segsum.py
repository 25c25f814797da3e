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
