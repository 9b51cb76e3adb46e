"""Distance-kernel correctness vs numpy exact baseline.

Mirrors the reference's SIMD-vs-generic correctness strategy
(reference: internal/simd/simd_check_test.go, dimension-specific
simd_128_test.go / simd_384_test.go).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.ops.distance import (
    Metric,
    distance_matrix,
    exact_search,
    pairwise_distance,
    squared_norms,
)


def np_distance(q, v, metric):
    ip = q @ v.T
    if metric == Metric.L2:
        return (
            (q**2).sum(-1)[:, None] - 2 * ip + (v**2).sum(-1)[None, :]
        ).clip(0)
    if metric == Metric.COSINE:
        qn = np.linalg.norm(q, axis=-1)[:, None]
        vn = np.linalg.norm(v, axis=-1)[None, :]
        return 1.0 - ip / np.maximum(qn * vn, 1e-30)
    return -ip


@pytest.mark.parametrize("metric", [Metric.L2, Metric.COSINE, Metric.DOT])
@pytest.mark.parametrize("dim", [128, 384])
def test_distance_matrix_matches_numpy(metric, dim):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, dim), dtype=np.float32)
    v = rng.standard_normal((100, dim), dtype=np.float32)
    got = np.asarray(distance_matrix(jnp.asarray(q), jnp.asarray(v), metric))
    want = np_distance(q, v, metric)
    # the |q|^2 - 2qv + |v|^2 expansion has mild cancellation vs numpy's
    # direct form; 3e-3 relative is well within ranking-safe territory
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=2e-2)


def test_distance_matrix_precomputed_norms():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 64), dtype=np.float32)
    v = rng.standard_normal((50, 64), dtype=np.float32)
    norms = squared_norms(jnp.asarray(v))
    got = distance_matrix(
        jnp.asarray(q), jnp.asarray(v), Metric.L2, corpus_norms_sq=norms
    )
    want = np_distance(q, v, Metric.L2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=2e-2)


def test_distance_matrix_valid_mask():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 32), dtype=np.float32)
    v = rng.standard_normal((10, 32), dtype=np.float32)
    valid = np.array([True] * 5 + [False] * 5)
    d = np.asarray(
        distance_matrix(jnp.asarray(q), jnp.asarray(v), Metric.L2, valid=jnp.asarray(valid))
    )
    assert (d[:, 5:] > 1e30).all()
    assert (d[:, :5] < 1e30).all()


@pytest.mark.parametrize("metric", [Metric.L2, Metric.COSINE, Metric.DOT])
def test_exact_search_matches_numpy_argsort(metric):
    rng = np.random.default_rng(3)
    q = rng.standard_normal((5, 96), dtype=np.float32)
    v = rng.standard_normal((500, 96), dtype=np.float32)
    k = 10
    dist, idx = exact_search(jnp.asarray(q), jnp.asarray(v), k, metric)
    want = np.argsort(np_distance(q, v, metric), axis=1)[:, :k]
    # allow order swaps between near-equal distances: compare as sets
    for i in range(q.shape[0]):
        assert set(np.asarray(idx)[i].tolist()) == set(want[i].tolist())


def test_exact_search_chunked_equals_single_shot():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((3, 32), dtype=np.float32)
    v = rng.standard_normal((1000, 32), dtype=np.float32)
    d1, i1 = exact_search(jnp.asarray(q), jnp.asarray(v), 7, Metric.L2)
    d2, i2 = exact_search(
        jnp.asarray(q), jnp.asarray(v), 7, Metric.L2, chunk_rows=256
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5)
    for i in range(3):
        assert set(np.asarray(i1)[i].tolist()) == set(np.asarray(i2)[i].tolist())


def test_exact_search_respects_tombstones():
    rng = np.random.default_rng(5)
    v = rng.standard_normal((100, 16), dtype=np.float32)
    q = v[:2]  # query with corpus rows: nearest is itself
    valid = np.ones(100, dtype=bool)
    valid[0] = False  # tombstone row 0
    _, idx = exact_search(
        jnp.asarray(q), jnp.asarray(v), 3, Metric.L2, valid=jnp.asarray(valid)
    )
    assert 0 not in np.asarray(idx)[0]
    assert np.asarray(idx)[1, 0] == 1


def test_pairwise_distance():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((4, 24), dtype=np.float32)
    b = rng.standard_normal((4, 24), dtype=np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(a), jnp.asarray(b), Metric.L2))
    want = ((a - b) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_complex_l2_search_matches_numpy():
    """Complex corpora ride the real MXU kernels on a widened (re, im)
    view (reference ships dedicated complex64/128 SIMD kernels,
    internal/simd/distance_functions.go)."""
    rng = np.random.default_rng(7)
    v = (
        rng.standard_normal((500, 16)) + 1j * rng.standard_normal((500, 16))
    ).astype(np.complex64)
    q = v[:3] + (0.01 + 0.01j)
    d, idx = exact_search(jnp.asarray(q), jnp.asarray(v), 5, Metric.L2)
    idx = np.asarray(idx)
    # numpy oracle: |q - v|^2 over complex entries
    for row in range(3):
        want = np.argsort(np.sum(np.abs(q[row][None] - v) ** 2, axis=-1))[:5]
        assert idx[row, 0] == want[0] == row
        assert set(idx[row].tolist()) == set(want.tolist())
    # distances are the true complex squared distances
    want_d = np.sum(np.abs(q[0][None] - v[idx[0]]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d)[0], want_d, rtol=1e-3, atol=1e-3)


def test_complex_dot_uses_real_part():
    rng = np.random.default_rng(8)
    v = (
        rng.standard_normal((200, 8)) + 1j * rng.standard_normal((200, 8))
    ).astype(np.complex64)
    q = v[:1]
    d, idx = exact_search(jnp.asarray(q), jnp.asarray(v), 3, Metric.DOT)
    want = np.argsort(-np.real(np.sum(q[0][None] * np.conj(v), axis=-1)))[:3]
    assert list(np.asarray(idx)[0]) == list(want)


def test_float64_inputs_search_correctly():
    """f64 inputs are accepted everywhere; without jax_enable_x64 they
    compute at PRECISION_EXACT f32 (TPU has no native f64 MXU,
    reference: f64 SIMD kernels simd/batch_operations.go)."""
    rng = np.random.default_rng(9)
    v = rng.standard_normal((300, 12))  # float64 by default
    q = v[:2]
    d, idx = exact_search(jnp.asarray(q), jnp.asarray(v), 4, Metric.L2)
    assert np.asarray(idx)[0, 0] == 0 and np.asarray(idx)[1, 0] == 1
    got = np.asarray(pairwise_distance(jnp.asarray(v[:4]), jnp.asarray(v[4:8])))
    want = ((v[:4] - v[4:8]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bucket_queries_pads_to_pow2():
    from longbow_tpu.ops.distance import bucket_queries

    q = np.ones((3, 8), np.float32)
    p, b = bucket_queries(q)
    assert b == 3 and p.shape == (4, 8)
    assert (p[:3] == 1).all() and (p[3] == 0).all()
    # exact powers of two pass through untouched
    q = np.ones((4, 8), np.float32)
    p, b = bucket_queries(q)
    assert p is q and b == 4
    # past the cap: bulk batches keep their exact shape
    q = np.ones((5000, 2), np.float32)
    p, b = bucket_queries(q)
    assert p is q and b == 5000
