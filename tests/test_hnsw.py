"""Graph index recall validation vs the exact oracle.

Mirrors the reference's recall gates
(reference: store/recall_validation_test.go:24-50) at CI-friendly sizes;
the full 10K/384d >= 0.99 gate runs in test_recall_gates.py on demand.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.ops.distance import Metric, exact_search


def _recall(idx, vecs, queries, k=10, **kw):
    d, r = idx.search(jnp.asarray(queries), k, **kw)
    got = np.asarray(r)
    ed, er = exact_search(jnp.asarray(queries), jnp.asarray(vecs), k, idx.metric)
    want = np.asarray(er)
    return np.mean(
        [len(set(got[i]) & set(want[i])) / k for i in range(len(queries))]
    )


def test_small_graph_recall():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((2000, 64), dtype=np.float32)
    idx = HNSWIndex(64, config=HNSWConfig(m=16, ef_construction=80, ef_search=64))
    idx.add(vecs)
    q = rng.standard_normal((32, 64), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.95, rec


def test_search_speed_profile():
    """search_m_max/search_expand trade a little recall for QPS by
    traversing only the best edges per node and expanding wider per
    iteration (round-3 on-chip frontier: 32/8 at 1M = +67% QPS at
    -0.7% recall). Correctness gate: recall stays high at small n."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((2000, 64), dtype=np.float32)
    idx = HNSWIndex(
        64,
        config=HNSWConfig(
            m=16, m_max=24, ef_construction=80, ef_search=64,
            search_m_max=16, search_expand=8,
        ),
    )
    idx.add(vecs)
    q = rng.standard_normal((32, 64), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.92, rec


def test_incremental_adds():
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((3000, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64, ef_search=64,
                                          insert_batch_size=512))
    for off in range(0, 3000, 1000):
        idx.add(vecs[off : off + 1000])
    assert len(idx) == 3000
    q = rng.standard_normal((16, 32), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.9, rec


def test_padded_tail_batch_no_self_loops():
    """HNSWIndex.add edge-pads the tail batch by repeating its last
    row; the intra-batch kNN must not hand the duplicate a distance-0
    self edge (wasted adjacency slots on every non-multiple add)."""
    rng = np.random.default_rng(7)
    idx = HNSWIndex(16, config=HNSWConfig(m=8, ef_construction=32,
                                          ef_search=32,
                                          insert_batch_size=64))
    idx.add(rng.standard_normal((200, 16), dtype=np.float32))
    # tail batch of 3 -> padded with 61 copies of its last row
    idx.add(rng.standard_normal((131, 16), dtype=np.float32))
    nbrs = np.asarray(idx.state.nbrs)
    rows = np.arange(len(idx))[:, None]
    assert not np.any(nbrs[: len(idx)] == rows), "self-loop edge found"


def test_assign_clusters_tail_beyond_chunk_multiple():
    """Capacity is any 8192-multiple, NOT necessarily a chunk
    multiple: the final window's dynamic_slice clamps, and the tail
    rows must still receive THEIR OWN cluster ids (a silent recall
    killer when mis-assigned)."""
    import jax.numpy as jnp

    from longbow_tpu.index.graph_build import _assign_clusters

    rng = np.random.default_rng(11)
    cap, n, d = 24, 22, 8          # chunk=16 -> n_pad=32 > cap
    v = rng.standard_normal((cap, d)).astype(np.float32)
    cent = rng.standard_normal((4, d)).astype(np.float32)
    got = _assign_clusters(
        jnp.asarray(v), jnp.asarray((v * v).sum(1)), jnp.asarray(cent),
        n, chunk=16,
    )
    want = np.argmin(
        ((v[:n, None, :] - cent[None, :, :]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(got, want)


def test_self_query_returns_self():
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((1000, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64))
    idx.add(vecs)
    d, r = idx.search(jnp.asarray(vecs[:20]), 1)
    hit = (np.asarray(r)[:, 0] == np.arange(20)).mean()
    assert hit >= 0.95, hit


def test_tombstones_excluded_but_routable():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((1500, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64))
    idx.add(vecs)
    dead = np.arange(0, 1500, 3)
    idx.delete_rows(dead)
    q = rng.standard_normal((8, 32), dtype=np.float32)
    _, r = idx.search(jnp.asarray(q), 10)
    assert not np.isin(np.asarray(r), dead).any()


def test_filtered_search():
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((1200, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64))
    idx.add(vecs)
    mask = np.zeros(idx.capacity, dtype=bool)
    mask[200:400] = True
    _, r = idx.search(jnp.asarray(vecs[:5]), 5, filter_mask=jnp.asarray(mask))
    got = np.asarray(r)
    real = got[got >= 0]
    assert ((real >= 200) & (real < 400)).all()


def test_cosine_metric_graph():
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((800, 24), dtype=np.float32)
    idx = HNSWIndex(24, metric=Metric.COSINE, config=HNSWConfig(m=16, ef_construction=64))
    idx.add(vecs)
    q = vecs[123] * 4.2  # scaled copy: cosine-nearest is row 123
    d, r = idx.search(jnp.asarray(q), 1)
    assert np.asarray(r)[0, 0] == 123


def test_export_import_roundtrip():
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((600, 16), dtype=np.float32)
    idx = HNSWIndex(16, config=HNSWConfig(m=8, ef_construction=48))
    idx.add(vecs)
    idx.delete_rows(np.array([5, 6]))
    st = idx.export_state()
    idx2 = HNSWIndex.import_state(st)
    assert len(idx2) == 600
    q = rng.standard_normal((8, 16), dtype=np.float32)
    d1, r1 = idx.search(jnp.asarray(q), 5)
    d2, r2 = idx2.search(jnp.asarray(q), 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_dot_metric_via_mips_augmentation():
    """MIPS-to-NN reduction: graph search on [x, sqrt(M^2-|x|^2)]."""
    rng = np.random.default_rng(8)
    vecs = (rng.standard_normal((1500, 24)) *
            rng.uniform(0.5, 2.0, (1500, 1))).astype(np.float32)
    idx = HNSWIndex(24, metric=Metric.DOT,
                    config=HNSWConfig(m=16, ef_construction=64, ef_search=64))
    idx.add(vecs)
    q = rng.standard_normal((16, 24)).astype(np.float32)
    d, r = idx.search(jnp.asarray(q), 10)
    _, er = exact_search(jnp.asarray(q), jnp.asarray(vecs), 10, Metric.DOT)
    got, want = np.asarray(r), np.asarray(er)
    rec = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(16)])
    assert rec >= 0.9, rec
    # out-of-bound add after the 1.5x headroom must raise
    with pytest.raises(ValueError):
        idx.add(vecs[0] * 10.0)


def test_clustered_bulk_build_recall():
    """Cluster-blocked kNN-graph build matches the exact build's recall
    (CI-sized; the TPU drive validates at 200k+)."""
    from longbow_tpu.index.graph_build import bulk_build_clustered

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((5000, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64, ef_search=64))
    # store vectors without linking, then run the clustered builder
    idx._grow_to(5000)
    import jax.numpy as jnp
    import jax

    jv = jnp.asarray(vecs)
    s = idx.state
    idx.state = s._replace(
        vectors=jax.lax.dynamic_update_slice(s.vectors, jv.astype(s.vectors.dtype), (0, 0)),
        norms_sq=jax.lax.dynamic_update_slice(
            s.norms_sq, jnp.sum(jv * jv, axis=1), (0,)
        ),
        valid=jax.lax.dynamic_update_slice(s.valid, jnp.ones(5000, bool), (0,)),
    )
    idx.count = 5000
    idx._sample_dirty = True
    idx.state = bulk_build_clustered(
        idx.state, 5000, m=16, m_max=32, knn_k=32, n_clusters=16, probes=4
    )
    q = rng.standard_normal((24, 32), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.9, rec


def test_sq8_graph_storage_recall():
    """Equal-memory config: SQ8 codes ARE the graph's vector payload
    (reference: SQ8-in-HNSW arrow_hnsw.go:94, recall gate >= 0.95 with
    SQ8, recall_validation_test.go:42-46)."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((4000, 64), dtype=np.float32)
    idx = HNSWIndex(
        64, storage="sq8",
        config=HNSWConfig(m=16, ef_construction=80, ef_search=100),
    )
    idx.add(vecs)
    assert idx.state.vectors.dtype == jnp.uint8
    assert idx.state.scale is not None
    q = rng.standard_normal((32, 64), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.95, rec


def test_sq8_graph_incremental_adds():
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((2400, 32), dtype=np.float32)
    idx = HNSWIndex(
        32, storage="sq8",
        config=HNSWConfig(m=16, ef_construction=64, ef_search=80,
                          insert_batch_size=512),
    )
    for off in range(0, 2400, 800):
        idx.add(vecs[off : off + 800])
    assert len(idx) == 2400
    q = rng.standard_normal((16, 32), dtype=np.float32)
    rec = _recall(idx, vecs, q, k=10)
    assert rec >= 0.88, rec


def test_sq8_graph_export_import():
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((1200, 32), dtype=np.float32)
    idx = HNSWIndex(
        32, storage="sq8", config=HNSWConfig(m=16, ef_construction=64)
    )
    idx.add(vecs)
    st = idx.export_state()
    assert st["vectors"].dtype == np.uint8  # codes persist as codes
    idx2 = HNSWIndex.import_state(st)
    q = rng.standard_normal((8, 32), dtype=np.float32)
    d1, r1 = idx.search(jnp.asarray(q), 5)
    d2, r2 = idx2.search(jnp.asarray(q), 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    # and adds keep working on the restored index
    idx2.add(vecs[:10])
    assert len(idx2) == 1210


def test_sq8_graph_cosine():
    rng = np.random.default_rng(10)
    vecs = rng.standard_normal((1500, 32), dtype=np.float32)
    idx = HNSWIndex(
        32, metric=Metric.COSINE, storage="sq8",
        config=HNSWConfig(m=16, ef_construction=64, ef_search=80),
    )
    idx.add(vecs)
    d, r = idx.search(jnp.asarray(vecs[:20] * 3.0), 1)
    hit = (np.asarray(r)[:, 0] == np.arange(20)).mean()
    assert hit >= 0.9, hit


def test_rp_blocked_builder():
    """Random-projection blocked build + NN-descent converges to a
    searchable graph (the TPU large-n bulk path; exercised on CPU at
    small scale)."""
    from longbow_tpu.index.graph import graph_init, beam_search
    from longbow_tpu.index.graph_build import bulk_build_rp

    rng = np.random.default_rng(0)
    n, d = 6000, 32
    v = rng.standard_normal((n, d), dtype=np.float32)
    st = graph_init(8192, d, 64, jnp.float32)
    st = st._replace(
        vectors=st.vectors.at[:n].set(v),
        norms_sq=st.norms_sq.at[:n].set(np.sum(v * v, 1)),
        valid=st.valid.at[:n].set(True),
    )
    st = bulk_build_rp(
        st, n, m=16, m_max=32, knn_k=32, rounds=6, block=1024, nn_rounds=2
    )
    q = rng.standard_normal((32, d), dtype=np.float32)
    sample = jnp.asarray(np.linspace(0, n - 1, 1024, dtype=np.int32))
    bd, bi = beam_search(st, jnp.asarray(q), sample, 10, 96)
    ed, er = exact_search(jnp.asarray(q), jnp.asarray(v), 10, Metric.L2)
    rec = np.mean([
        len(set(np.asarray(bi)[i]) & set(np.asarray(er)[i])) / 10
        for i in range(32)
    ])
    assert rec >= 0.95, rec


def test_rp_builder_capacity_below_block_padding():
    """Regression: state capacity is padded at 4096 granularity but the
    RP builder pads n at block granularity (8192 default at 1M) — when
    cap < n_pad the round used to crash with a broadcast shape error."""
    from longbow_tpu.index.graph import graph_init, beam_search
    from longbow_tpu.index.graph_build import bulk_build_rp

    rng = np.random.default_rng(1)
    n, d, cap = 4200, 16, 5120  # block=2048 -> n_pad=6144 > cap
    v = rng.standard_normal((n, d), dtype=np.float32)
    st = graph_init(cap, d, 32, jnp.float32)
    st = st._replace(
        vectors=st.vectors.at[:n].set(v),
        norms_sq=st.norms_sq.at[:n].set(np.sum(v * v, 1)),
        valid=st.valid.at[:n].set(True),
    )
    st = bulk_build_rp(
        st, n, m=12, m_max=24, knn_k=24, rounds=5, block=2048, nn_rounds=2
    )
    q = rng.standard_normal((16, d), dtype=np.float32)
    sample = jnp.asarray(np.linspace(0, n - 1, 512, dtype=np.int32))
    bd, bi = beam_search(st, jnp.asarray(q), sample, 10, 96)
    ed, er = exact_search(jnp.asarray(q), jnp.asarray(v), 10, Metric.L2)
    rec = np.mean([
        len(set(np.asarray(bi)[i]) & set(np.asarray(er)[i])) / 10
        for i in range(16)
    ])
    assert rec >= 0.9, rec


def test_pq_graph_storage():
    """PQ codes as the traversal payload (reference: PQ/ADC inside
    HNSW, quantization_integration.go + pq/adc_table.go): codebooks
    train on the first batch, beam search ranks via per-query ADC
    tables, incremental adds encode, export/import round-trips."""
    from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex

    rng = np.random.default_rng(0)
    n, d = 4000, 32
    # clustered data (PQ residual is tiny relative to cluster spread)
    centers = rng.standard_normal((64, d)).astype(np.float32) * 4.0
    v = (centers[rng.integers(0, 64, n)]
         + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    idx = HNSWIndex(
        d, config=HNSWConfig(m=12, m_max=24, ef_search=64),
        dtype=jnp.bfloat16, storage="pq", pq_m=8, capacity=n,
    )
    idx.add(v)
    assert idx.state.vectors.shape == (idx.capacity, 8)
    assert idx.state.vectors.dtype == jnp.uint8
    assert idx.state.pq_books.shape == (8, 256, 4)

    q = v[:64] + 0.01 * rng.standard_normal((64, d)).astype(np.float32)
    dd, rr = idx.search(q, 10)
    ed, er = exact_search(
        jnp.asarray(q), jnp.asarray(v), 10, Metric.L2,
        exact_precision=True,
    )
    rec = np.mean([
        len(set(np.asarray(rr)[i]) & set(np.asarray(er)[i])) / 10
        for i in range(64)
    ])
    assert rec >= 0.9, rec  # ADC pool + exact host re-rank

    # incremental adds encode through the trained books
    idx.add(v[:100] + 0.05)
    assert idx.count == n + 100
    dd, rr = idx.search(q, 10)  # post-add reference

    # export/import: books + codes + rerank copy survive, results
    # identical
    st = idx.export_state()
    idx2 = HNSWIndex.import_state(st)
    dd2, rr2 = idx2.search(q, 10)
    assert np.array_equal(np.asarray(rr), np.asarray(rr2))


def test_pq_graph_rejects_dot_metric():
    from longbow_tpu.index.hnsw import HNSWIndex

    with pytest.raises(ValueError):
        HNSWIndex(32, metric="dot", storage="pq")


def test_pq_graph_through_factory():
    from longbow_tpu.index.factory import make_index

    idx = make_index(
        "hnsw", 16, "l2", storage="pq", pq_m=4, migration_threshold=0
    )
    rng = np.random.default_rng(1)
    v = rng.standard_normal((3000, 16), dtype=np.float32)
    idx.add(v)
    d, r = idx.search(v[:8], 5)
    assert (np.asarray(r)[:, 0] == np.arange(8)).mean() >= 0.8


def test_bulk_build_no_dead_row_edges():
    """The symmetrizer operates on the builder's PADDED arrays, and
    padded rows are zero vectors whose kNN lists hold real target ids
    (the knn phase pads its query chunks). Without masking them as
    reverse-edge sources they inject dead-row edges into live nodes'
    adjacency — 771 dead edges and recall 0.959 -> 0.898 on the
    10k x 384 SQ8 gate (round-4 regression, fixed in _symm_edges)."""
    rng = np.random.default_rng(3)
    n = 3000  # pads to 8192 capacity: 5192 dead rows
    vecs = rng.standard_normal((n, 96), dtype=np.float32)
    idx = HNSWIndex(96, config=HNSWConfig(m=16, ef_search=64))
    idx.add(vecs)
    nb = np.asarray(idx.state.nbrs)[:n]
    dead = int((nb >= n).sum())
    assert dead == 0, f"{dead} adjacency edges point at dead rows"


def test_symmetrize_no_duplicate_neighbors():
    """Adjacency rows stay duplicate-free after symmetrize (the dedup
    only checks incoming-vs-forward; each list is internally unique)."""
    from longbow_tpu.index.graph_build import bulk_build_edges
    from longbow_tpu.index.graph import graph_init

    rng = np.random.default_rng(3)
    n, d = 3000, 24
    v = rng.standard_normal((n, d), dtype=np.float32)
    st = graph_init(4096, d, 32, jnp.float32)
    st = st._replace(
        vectors=st.vectors.at[:n].set(v),
        norms_sq=st.norms_sq.at[:n].set(np.sum(v * v, 1)),
        valid=st.valid.at[:n].set(True),
    )
    st = bulk_build_edges(st, n, m=16, m_max=32, knn_k=32)
    # last 2 slots are Kleinberg long-range randoms (may repeat a
    # neighbor by design) — the merged/deduped region is the rest
    nbrs = np.asarray(st.nbrs[:n])[:, :-2]
    for i in range(0, n, 37):
        row = nbrs[i][nbrs[i] >= 0]
        assert len(row) == len(set(row.tolist())), i


def test_graph_search_batch_bucketing():
    """HNSWIndex.search pads B to powers of two; results must match
    the per-query answers and slice back to the caller's B."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal((200, 32), dtype=np.float32)
    idx = HNSWIndex(32, config=HNSWConfig(m=16, ef_construction=64,
                                          ef_search=64))
    idx.add(v)
    for b in (1, 3, 7):
        d, r = idx.search(v[:b] + 0.0005, 5)
        assert d.shape == (b, 5) and r.shape == (b, 5)
        assert [int(r[i, 0]) for i in range(b)] == list(range(b))


def test_warm_graph_gate_and_resilience(monkeypatch):
    """_warm_graph respects LONGBOW_WARMUP_AFTER_BUILD and never
    propagates a failure into the builder thread."""
    from longbow_tpu.index.adaptive import AdaptiveIndex
    from longbow_tpu.ops.distance import Metric

    idx = AdaptiveIndex(8, Metric.L2, migration_threshold=10**9)
    calls = []

    class G:
        def __len__(self):
            return 50

        def search(self, q, k):
            calls.append((q.shape, k))
            raise RuntimeError("boom")  # must be swallowed

    monkeypatch.setenv("LONGBOW_WARMUP_AFTER_BUILD", "0")
    idx._warm_graph(G())
    assert not calls
    monkeypatch.setenv("LONGBOW_WARMUP_AFTER_BUILD", "1")
    idx._warm_graph(G())  # exception swallowed
    assert calls == [((1, 8), 10)]
