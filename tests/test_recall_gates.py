"""Full-size recall gates mirroring the reference CI thresholds
(reference: recall_validation_test.go:38-50 — 10K/384d >= 0.99 with
M=48 efC=400; 50K >= 0.92 with M=64 efC=600; queries are corpus rows,
self-match excluded).

These run at full size and take minutes on the CPU mesh, so they're
gated behind LONGBOW_FULL_GATES=1 (the TPU round-drive runs them).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.ops.distance import exact_search

pytestmark = pytest.mark.skipif(
    os.environ.get("LONGBOW_FULL_GATES") != "1",
    reason="full-size recall gates: set LONGBOW_FULL_GATES=1",
)


def _gate(n, d, m, m_max, efs, threshold, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    idx = HNSWIndex(d, config=HNSWConfig(m=m, m_max=m_max, ef_search=efs))
    idx.add(vecs)
    qi = rng.choice(n, 100, replace=False)
    q = vecs[qi]
    _, er = exact_search(
        jnp.asarray(q), jnp.asarray(vecs), 11, exact_precision=False
    )
    er = np.asarray(er)
    want = [[x for x in er[i] if x != qi[i]][:10] for i in range(100)]
    _, r = idx.search(q, 11, ef_search=efs)
    got = np.asarray(r)
    got = [[x for x in got[i] if x != qi[i]][:10] for i in range(100)]
    rec = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(100)])
    assert rec >= threshold, f"recall {rec} < {threshold}"
    return rec


def test_gate_10k_384d():
    # reference: >= 0.990 (M=48, efC=400); we gate at the same number
    _gate(10_000, 384, m=48, m_max=64, efs=200, threshold=0.99)


def test_gate_50k_384d():
    # reference: >= 0.920 (M=64, efC=600)
    _gate(50_000, 384, m=64, m_max=96, efs=200, threshold=0.92)


def test_gate_1m_uniform_served_recall():
    """1M x 128 uniform Gaussian, held-out queries — the adversarial
    distance-concentrated distribution. Graph beam search plateaus at
    ~0.34 recall here regardless of build quality (round-3 sweep:
    nn-descent rounds x diversified pruning x efS up to 300), so the
    serving answer is hardness-aware routing (index/hardness.py): the
    adaptive index detects low relative contrast and keeps the exact
    fused scan, which serves this corpus at recall 0.9895 and ~12x the
    graph's QPS on TPU. The gate asserts the ROUTED result: >= 0.95
    end-to-end recall on uniform 1M at default settings."""
    from longbow_tpu.index.adaptive import AdaptiveIndex

    rng = np.random.default_rng(7)
    n, d = 1_000_000, 128
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((100, d), dtype=np.float32)
    idx = AdaptiveIndex(d, migration_threshold=500_000)
    for a in range(0, n, 250_000):
        idx.add(vecs[a : a + 250_000])
    idx.wait_migration(timeout_s=600)
    assert idx.kind == "flat", (
        f"contrast probe failed: rc={idx.last_contrast}"
    )
    assert idx.last_contrast is not None and idx.last_contrast < 2.0
    _, er = exact_search(
        jnp.asarray(q), jnp.asarray(vecs), 10, exact_precision=True,
        chunk_rows=131_072,
    )
    want = np.asarray(er)
    _, r = idx.search(jnp.asarray(q), 10)
    got = np.asarray(r)
    rec = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(100)]
    )
    assert rec >= 0.95, f"served uniform-1M recall {rec} < 0.95"


def test_gate_sq8_in_graph_10k_384d():
    """SQ8-quantized graph at the reference's own scale and bar
    (reference: recall_validation_test.go:42-46 — 10k x 384d, SQ8,
    efSearch=100, recall@10 >= 0.95)."""
    n, d, k = 10_000, 384, 10
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    idx = HNSWIndex(
        d, storage="sq8",
        config=HNSWConfig(m=48, m_max=64, ef_search=100),
    )
    idx.add(vecs)
    qi = rng.choice(n, 100, replace=False)
    q = vecs[qi]
    _, er = exact_search(
        jnp.asarray(q), jnp.asarray(vecs), k + 1, exact_precision=False
    )
    er = np.asarray(er)
    want = [[x for x in er[i] if x != qi[i]][:k] for i in range(100)]
    _, r = idx.search(q, k + 1, ef_search=100)
    got = np.asarray(r)
    got = [[x for x in got[i] if x != qi[i]][:k] for i in range(100)]
    rec = np.mean(
        [len(set(got[i]) & set(want[i])) / k for i in range(100)]
    )
    assert rec >= 0.95, f"SQ8-in-graph recall {rec} < 0.95"


def test_gate_sq8r_262k_clustered():
    """Quantized-tier gate (round 5): residual SQ8 at 262k clustered
    must hold recall@10 >= 0.95 at 1 byte/dim through the two-region
    layout + relayout machinery (the fused kernel serves this path on
    TPU — benchmarks/sq8_fused_1M.json holds the 1M on-chip numbers:
    0.9592 @ 141.5k QPS)."""
    from longbow_tpu.index.sq8 import SQ8ResidualIndex

    n, d, k = 262_144, 64, 10
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((512, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, 512, n)
    v = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    idx = SQ8ResidualIndex(d, n_clusters=512)
    idx.train(v[:65536])
    for off in range(0, n, 65536):
        idx.add(v[off : off + 65536])
    idx._rebuild_layout()
    q = centers[rng.integers(0, 512, 100)] + rng.standard_normal(
        (100, d)
    ).astype(np.float32)
    _, er = exact_search(
        jnp.asarray(q), jnp.asarray(v), k, exact_precision=True,
        chunk_rows=65536,
    )
    er = np.asarray(er)
    _, r = idx.search(q, k)
    r = np.asarray(r)
    rec = np.mean([
        len(set(r[i].tolist()) & set(er[i].tolist())) / k
        for i in range(100)
    ])
    assert rec >= 0.95, f"sq8r recall {rec}"


def test_gate_filtered_tombstoned_1m_flat():
    """BASELINE config 3 machinery at 1M on the CPU path: predicate
    masks at 50%/10%/1% selectivity + 10% tombstones through the flat
    scan must match the filtered exact oracle (>=0.95; the scan is
    exact so this really gates mask plumbing at scale). On-chip
    recall/QPS artifact: benchmarks/filtered_1M.json (fused kernel +
    graph tier). Reference: dataset.go:226-297 + adaptive_search.go:7."""
    from longbow_tpu.ops.distance import Metric, exact_search

    n, d, k = 1_000_000, 32, 10
    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((50, d)).astype(np.float32)
    alive = rng.random(n) >= 0.10
    vj = jnp.asarray(v)
    for sel in (0.5, 0.1, 0.01):
        fmask = rng.random(n) < sel
        eff = jnp.asarray(alive & fmask)
        _, want = exact_search(
            jnp.asarray(q), vj, k, Metric.L2, valid=eff,
            exact_precision=True, chunk_rows=131072,
        )
        _, got = exact_search(
            jnp.asarray(q), vj, k, Metric.L2,
            valid=jnp.asarray(alive), extra_mask=jnp.asarray(fmask),
            exact_precision=False, chunk_rows=131072,
        )
        want, got = np.asarray(want), np.asarray(got)
        rec = np.mean([
            len(set(got[i].tolist()) & set(want[i].tolist())) / k
            for i in range(50)
        ])
        assert rec >= 0.95, (sel, rec)
