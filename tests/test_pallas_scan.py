"""Fused Pallas scan kernel vs the XLA exact oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import fused_flat_search


def _data(n=700, d=96, b=5, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((b, d), dtype=np.float32)
    return queries, corpus


@pytest.mark.parametrize("metric", [Metric.L2, Metric.DOT])
def test_fused_scan_matches_oracle(metric):
    q, c = _data()
    k = 10
    norms = squared_norms(jnp.asarray(c))
    valid = jnp.ones((c.shape[0],), dtype=bool)
    dist, idx = fused_flat_search(
        jnp.asarray(q), jnp.asarray(c), norms, valid, k, metric,
        tile_n=256, interpret=True,
    )
    want_d, want_i = exact_search(jnp.asarray(q), jnp.asarray(c), k, metric)
    for i in range(q.shape[0]):
        assert set(np.asarray(idx)[i].tolist()) == set(np.asarray(want_i)[i].tolist()), i
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(want_d), rtol=3e-3, atol=2e-2
    )
    # results sorted ascending
    d_np = np.asarray(dist)
    assert (np.diff(d_np, axis=1) >= -1e-6).all()


def test_fused_scan_tombstones():
    q, c = _data(n=300, d=32, b=3, seed=1)
    q = c[:3].copy()  # query rows present in corpus
    valid = np.ones(300, dtype=bool)
    valid[:3] = False
    norms = squared_norms(jnp.asarray(c))
    _, idx = fused_flat_search(
        jnp.asarray(q), jnp.asarray(c), norms, jnp.asarray(valid), 5,
        Metric.L2, tile_n=256, interpret=True,
    )
    assert not np.isin(np.asarray(idx), [0, 1, 2]).any()


def test_fused_scan_unaligned_shapes():
    # n not a multiple of tile, d not 128-aligned, b odd
    q, c = _data(n=513, d=33, b=3, seed=2)
    norms = squared_norms(jnp.asarray(c))
    valid = jnp.ones((513,), dtype=bool)
    dist, idx = fused_flat_search(
        jnp.asarray(q), jnp.asarray(c), norms, valid, 7, Metric.L2,
        tile_n=256, interpret=True,
    )
    want_d, want_i = exact_search(jnp.asarray(q), jnp.asarray(c), 7, Metric.L2)
    for i in range(3):
        assert set(np.asarray(idx)[i].tolist()) == set(np.asarray(want_i)[i].tolist())


def test_fused_scan_k_exceeds_limit():
    # candidate registers hold DEPTH*LANES = 512 per query
    q, c = _data(n=256, d=32, b=2)
    norms = squared_norms(jnp.asarray(c))
    valid = jnp.ones((256,), dtype=bool)
    with pytest.raises(ValueError):
        fused_flat_search(
            jnp.asarray(q), jnp.asarray(c), norms, valid, 600, Metric.L2,
            interpret=True,
        )


@pytest.mark.parametrize("metric", [Metric.L2, Metric.DOT])
def test_fused_scan_ghost_rows_exact_masked(metric):
    """Fewer valid rows than k: the unfilled slots must decode to
    EXACTLY (MASKED, -1) — never a tombstoned row with a score a few
    ulps below the sentinel (round-3 deferred kernel fix: group-id
    packing used to truncate the sentinel downward)."""
    from longbow_tpu.ops.distance import MASKED

    q, c = _data(n=300, d=32, b=3, seed=3)
    valid = np.zeros(300, dtype=bool)
    valid[:4] = True  # only 4 valid rows, k=10
    norms = squared_norms(jnp.asarray(c))
    dist, idx = fused_flat_search(
        jnp.asarray(q), jnp.asarray(c), norms, jnp.asarray(valid), 10,
        metric, tile_n=256, interpret=True,
    )
    d_np, i_np = np.asarray(dist), np.asarray(idx)
    for b in range(3):
        real = i_np[b] >= 0
        assert real.sum() == 4
        assert set(i_np[b][real]) <= {0, 1, 2, 3}
        # every unfilled slot is the exact sentinel, not a ghost
        assert (i_np[b][~real] == -1).all()
        assert (d_np[b][~real] == np.float32(MASKED)).all()
        assert (d_np[b][real] < 1e37).all()


def test_fused_scan_all_masked():
    q, c = _data(n=256, d=32, b=2, seed=4)
    norms = squared_norms(jnp.asarray(c))
    valid = jnp.zeros((256,), dtype=bool)
    from longbow_tpu.ops.distance import MASKED

    dist, idx = fused_flat_search(
        jnp.asarray(q), jnp.asarray(c), norms, valid, 5, Metric.L2,
        tile_n=256, interpret=True,
    )
    assert (np.asarray(idx) == -1).all()
    assert (np.asarray(dist) == np.float32(MASKED)).all()


# ---- fused uint8-codes kernel (quantized tier, round 5) ----

def _sq8_setup(n=768, d=64, b=6, seed=5):
    """Global-affine SQ8 artifacts + the dequantized f32 corpus that
    defines ground truth for the quantized scan. Codes are the
    kernel's recentered-int8 convention (u8 - 128) with the shift
    folded into lo_eff."""
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    lo, hi = corpus.min(axis=0), corpus.max(axis=0)
    scale = np.maximum(hi - lo, 1e-12) / 255.0
    codes_u8 = np.clip(np.round((corpus - lo) / scale), 0, 255)
    codes = (codes_u8 - 128).astype(np.int8)
    lo_eff = lo + 128.0 * scale
    deq = codes.astype(np.float32) * scale + lo_eff
    return queries, codes, deq, lo_eff, scale


def _sq8_fold(queries, lo, scale):
    qs = queries * scale[None, :]
    qn_eff = np.sum(queries * queries, axis=1) - 2.0 * (queries @ lo)
    return qs, qn_eff


def test_fused_codes_matches_dequant_oracle():
    from longbow_tpu.ops.pallas_scan import fused_codes_search

    q, codes, deq, lo, scale = _sq8_setup()
    k = 10
    qs, qn_eff = _sq8_fold(q, lo, scale)
    vn = np.sum(deq * deq, axis=1)
    valid = jnp.ones((codes.shape[0],), bool)
    dist, idx = fused_codes_search(
        jnp.asarray(qs), jnp.asarray(qn_eff), jnp.asarray(codes),
        jnp.asarray(vn), valid, k, tile_n=256, interpret=True,
    )
    want_d, want_i = exact_search(
        jnp.asarray(q), jnp.asarray(deq), k, Metric.L2,
        exact_precision=True,
    )
    # coarse scan: bf16 matmul noise can swap near-ties, so gate on
    # overlap not exact set equality (serving reranks the pool exactly)
    overlap = np.mean([
        len(set(np.asarray(idx)[i].tolist())
            & set(np.asarray(want_i)[i].tolist())) / k
        for i in range(q.shape[0])
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(
        np.sort(np.asarray(dist), axis=1)[:, 0],
        np.asarray(want_d)[:, 0], rtol=5e-2, atol=5e-2,
    )
    assert (np.diff(np.asarray(dist), axis=1) >= -1e-6).all()


def test_fused_codes_group_term_residual():
    """sq8r-style: cluster-grouped rows, residual codes, and the
    -2*q.center[cid] term fed per 128-row lane group."""
    from longbow_tpu.ops.pallas_scan import LANES, fused_codes_search

    rng = np.random.default_rng(7)
    n_groups, d, b, k = 6, 64, 4, 8
    n = n_groups * LANES
    centers = rng.standard_normal((3, d)).astype(np.float32) * 3.0
    gcid = rng.integers(0, 3, n_groups)
    corpus = (
        centers[np.repeat(gcid, LANES)]
        + rng.standard_normal((n, d)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 3, b)]
        + rng.standard_normal((b, d)).astype(np.float32)
    )
    res = corpus - centers[np.repeat(gcid, LANES)]
    lo, hi = res.min(axis=0), res.max(axis=0)
    scale = np.maximum(hi - lo, 1e-12) / 255.0
    codes = (
        np.clip(np.round((res - lo) / scale), 0, 255) - 128
    ).astype(np.int8)
    lo_eff = lo + 128.0 * scale
    deq = (
        codes.astype(np.float32) * scale + lo_eff
        + centers[np.repeat(gcid, LANES)]
    )
    qs = queries * scale[None, :]
    qn_eff = np.sum(queries * queries, axis=1) - 2.0 * (queries @ lo_eff)
    gt = -2.0 * (queries @ centers.T)[:, gcid]  # [B, n_groups]
    vn = np.sum(deq * deq, axis=1)
    valid = jnp.ones((n,), bool)
    dist, idx = fused_codes_search(
        jnp.asarray(qs), jnp.asarray(qn_eff), jnp.asarray(codes),
        jnp.asarray(vn), valid, k,
        group_term=jnp.asarray(gt), tile_n=256, interpret=True,
    )
    want_d, want_i = exact_search(
        jnp.asarray(queries), jnp.asarray(deq), k, Metric.L2,
        exact_precision=True,
    )
    overlap = np.mean([
        len(set(np.asarray(idx)[i].tolist())
            & set(np.asarray(want_i)[i].tolist())) / k
        for i in range(b)
    ])
    assert overlap >= 0.85, overlap
    np.testing.assert_allclose(
        np.asarray(dist)[:, 0], np.asarray(want_d)[:, 0],
        rtol=5e-2, atol=5e-2,
    )


def test_fused_codes_tombstones_and_ghosts():
    from longbow_tpu.ops.distance import MASKED
    from longbow_tpu.ops.pallas_scan import fused_codes_search

    q, codes, deq, lo, scale = _sq8_setup(n=512, d=32, b=3, seed=9)
    qs, qn_eff = _sq8_fold(q, lo, scale)
    vn = np.sum(deq * deq, axis=1)
    valid = np.zeros(512, bool)
    valid[:4] = True
    dist, idx = fused_codes_search(
        jnp.asarray(qs), jnp.asarray(qn_eff), jnp.asarray(codes),
        jnp.asarray(vn), jnp.asarray(valid), 10, tile_n=256,
        interpret=True,
    )
    d_np, i_np = np.asarray(dist), np.asarray(idx)
    for r in range(3):
        real = i_np[r] >= 0
        assert real.sum() == 4
        assert set(i_np[r][real]) <= {0, 1, 2, 3}
        assert (i_np[r][~real] == -1).all()
        assert (d_np[r][~real] == np.float32(MASKED)).all()


def test_coarse_flat_search_rerank_matches_bf16_ranking():
    """The flat tier's int8 coarse scan + exact bf16 re-rank must
    reproduce bf16-storage ranking quality (the coarse pass only
    nominates the pool)."""
    from longbow_tpu.ops.pallas_scan import coarse_flat_search_rerank

    rng = np.random.default_rng(11)
    n, d, b, k = 896, 64, 5, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    c16 = jnp.asarray(corpus, jnp.bfloat16)
    cf = np.asarray(c16.astype(jnp.float32))
    lo = cf.min(axis=0) - 0.05
    hi = cf.max(axis=0) + 0.05
    scale = np.maximum(hi - lo, 1e-12) / 255.0
    codes = (
        np.clip(np.round((cf - lo) / scale), 0, 255) - 128
    ).astype(np.int8)
    deq = codes.astype(np.float32) * scale + (lo + 128 * scale)
    cnorms = np.sum(deq * deq, axis=1)
    valid = jnp.ones((n,), bool)
    dist, idx = coarse_flat_search_rerank(
        jnp.asarray(q), c16, jnp.asarray(codes), jnp.asarray(lo),
        jnp.asarray(hi), jnp.asarray(cnorms), valid, k,
        tile_n=256, interpret=True,
    )
    # oracle: exact f32 ranking against the bf16-rounded storage
    want_d, want_i = exact_search(
        jnp.asarray(q), jnp.asarray(cf), k, Metric.L2,
        exact_precision=True,
    )
    overlap = np.mean([
        len(set(np.asarray(idx)[i].tolist())
            & set(np.asarray(want_i)[i].tolist())) / k
        for i in range(b)
    ])
    assert overlap >= 0.9, overlap
    np.testing.assert_allclose(
        np.asarray(dist)[:, 0], np.asarray(want_d)[:, 0],
        rtol=1e-3, atol=1e-3,
    )
