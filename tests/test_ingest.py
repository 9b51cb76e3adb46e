"""Ingest-path tests: flat host staging, coalescing ingest queue,
in-batch dedupe, and non-blocking background migration
(reference: the async dual-queue ingest pipeline store_actions.go:426-708
and background auto-sharding migration hnsw_autoshard.go:49).
"""
import time

import numpy as np
import pytest

from longbow_tpu.index.adaptive import AdaptiveIndex
from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d), dtype=np.float32)


def test_flat_staging_search_sees_staged_rows():
    idx = FlatIndex(8)
    v = _vecs(100, 8)
    rows = idx.add(v)          # stays in the host stage
    assert idx._stage_rows == 100 and len(idx) == 100
    d, r = idx.search(v[:5], 1)  # search flushes
    assert idx._stage_rows == 0
    np.testing.assert_array_equal(np.asarray(r)[:, 0], rows[:5])


def test_flat_staged_delete_applies_at_flush():
    idx = FlatIndex(8)
    v = _vecs(50, 8)
    idx.add(v)
    idx.delete_rows(np.asarray([3]))   # still staged
    d, r = idx.search(v[3:4], 1)
    assert int(np.asarray(r)[0, 0]) != 3


def test_flat_staging_export_roundtrip():
    idx = FlatIndex(8)
    v = _vecs(40, 8)
    idx.add(v)                         # staged
    st = idx.export_state()            # must flush
    idx2 = FlatIndex.import_state(st)
    d, r = idx2.search(v[7:8], 1)
    assert int(np.asarray(r)[0, 0]) == 7


def test_flat_capacity_stable_across_flush():
    idx = FlatIndex(8)
    idx.add(_vecs(100, 8))
    cap_before = idx.capacity
    idx.flush()
    assert idx.capacity == cap_before


def test_dataset_put_duplicate_ids_in_batch_dedupes_to_last():
    vs = VectorStore()
    v = _vecs(4, 8)
    vs.put("d", np.asarray([1, 2, 1, 3]), v)
    ds = vs.get("d")
    assert ds.live_count == 3
    got = ds.get_vectors_by_rows(
        np.asarray([ds._id_to_row[1]])
    )[0]
    # last occurrence (row 2 of the batch) wins
    np.testing.assert_allclose(got, v[2], rtol=0.02, atol=0.02)


def test_dataset_put_per_row_timestamps_lww():
    vs = VectorStore()
    v = _vecs(2, 8)
    vs.put("d", np.asarray([7]), v[:1], timestamp=100.0)
    # stale per-row write is dropped, fresh one applies
    vs.put(
        "d", np.asarray([7, 8]), v,
        timestamp=np.asarray([50.0, 200.0]),
    )
    ds = vs.get("d")
    got = ds.get_vectors_by_rows(np.asarray([ds._id_to_row[7]]))[0]
    np.testing.assert_allclose(got, v[0], rtol=0.02, atol=0.02)
    assert ds._lww[8] == 200.0


def test_ingest_queue_coalesces_same_dataset():
    from longbow_tpu.serving.ingest import IngestQueue

    vs = VectorStore()
    calls = []
    orig = vs.put

    def counting_put(*a, **kw):
        calls.append(len(a[1]))
        return orig(*a, **kw)

    vs.put = counting_put
    q = IngestQueue(vs, max_depth=64)
    # stall the worker so jobs pile up and coalesce
    v = _vecs(10, 8)
    for i in range(20):
        q.submit("c", np.arange(i * 10, i * 10 + 10), v, None, None,
                 float(i))
    assert q.drain(timeout_s=30.0)
    q.close()
    assert vs.get("c").live_count == 200
    # fewer store.put calls than jobs = coalescing happened
    assert len(calls) < 20
    # per-row timestamps preserved job origin ts
    assert vs.get("c")._lww[5] == 0.0
    assert vs.get("c")._lww[195] == 19.0


def test_ingest_queue_bad_job_spares_group_mates():
    """A wrong-dim job merged into a group must not drop its innocent
    group-mates' acked rows: the dim is part of the group key AND a
    merged-apply failure retries jobs individually."""
    from longbow_tpu.serving.ingest import IngestQueue

    vs = VectorStore()
    q = IngestQueue(vs, max_depth=64)
    good = _vecs(10, 8)
    bad = _vecs(10, 12)  # same dataset, same columns, wrong dim
    q.submit("g", np.arange(0, 10), good, None, None, 1.0)
    q.submit("g", np.arange(100, 110), bad, None, None, 2.0)
    q.submit("g", np.arange(10, 20), good, None, None, 3.0)
    assert q.drain(timeout_s=30.0)
    q.close()
    # both good jobs landed despite the bad one failing
    assert vs.get("g").live_count == 20
    assert len(q.errors) >= 1


def test_ingest_queue_depth_spans_submit_to_applied():
    """depth must count a job from before it's queued until applied —
    a checkpoint polling drain() must never see 0 with acked rows in
    flight (the WAL would truncate them)."""
    import threading

    from longbow_tpu.serving.ingest import IngestQueue

    vs = VectorStore()
    release = threading.Event()
    entered = threading.Event()
    orig = vs.put

    def slow_put(*a, **kw):
        entered.set()
        release.wait(10.0)
        return orig(*a, **kw)

    vs.put = slow_put
    q = IngestQueue(vs, max_depth=8)
    q.submit("s", np.arange(5), _vecs(5, 8), None, None, 1.0)
    assert entered.wait(5.0)
    # job is out of the queue, inside the (stalled) apply: still counted
    assert q.depth == 1
    assert not q.drain(timeout_s=0.1)
    release.set()
    assert q.drain(timeout_s=10.0)
    q.close()
    assert vs.get("s").live_count == 5


def test_background_migration_does_not_block_puts():
    idx = AdaptiveIndex(8, migration_threshold=500)
    slow = {"done": False}
    orig = AdaptiveIndex._graph_chunk

    def slow_chunk(self, g, a, b):
        if not slow["done"]:
            slow["done"] = True
            time.sleep(1.5)  # simulate a long bulk build
        return orig(self, g, a, b)

    AdaptiveIndex._graph_chunk = slow_chunk
    try:
        v = _vecs(700, 8)
        idx.add(v[:600])  # crosses threshold -> background build
        t0 = time.perf_counter()
        for i in range(5):
            idx.add(v[600 + i * 20 : 600 + (i + 1) * 20])
        assert time.perf_counter() - t0 < 1.0, "puts blocked on build"
        assert idx.kind == "flat"  # still serving from flat
        d, r = idx.search(v[650:651], 1)
        assert int(np.asarray(r)[0, 0]) == 650  # dual-read covers tail
        assert idx.wait_migration(timeout_s=60.0)
        assert idx.kind == "hnsw"
        # row ids preserved across migration
        d, r = idx.search(v[650:651], 1)
        assert int(np.asarray(r)[0, 0]) == 650
    finally:
        AdaptiveIndex._graph_chunk = orig


def test_sync_migration_for_explicit_hnsw_kind():
    idx = AdaptiveIndex(8, migration_threshold=0)
    idx.add(_vecs(300, 8))
    assert idx.kind == "hnsw"


def test_hardness_probe_does_not_block_puts():
    """The contrast probe's exact self-search runs on the migration
    worker, not in the put that crossed the threshold (and it computes
    on an immutable snapshot outside the mutation lock)."""
    idx = AdaptiveIndex(8, migration_threshold=1100, min_contrast=2.0)
    slow = {"calls": 0}
    import longbow_tpu.index.adaptive as adaptive_mod

    orig = adaptive_mod.relative_contrast_from_sample

    def slow_probe(db, q, **kw):
        slow["calls"] += 1
        time.sleep(1.5)  # simulate the multi-second device program
        return orig(db, q, **kw)

    adaptive_mod.relative_contrast_from_sample = slow_probe
    try:
        v = _vecs(1400, 8)
        t0 = time.perf_counter()
        idx.add(v[:1300])  # crosses threshold -> background probe
        assert time.perf_counter() - t0 < 1.0, "put blocked on probe"
        t0 = time.perf_counter()
        for i in range(5):
            idx.add(v[1300 + i * 20 : 1300 + (i + 1) * 20])
        assert time.perf_counter() - t0 < 1.0, "puts blocked on probe"
        assert idx.wait_migration(timeout_s=60.0)
        assert slow["calls"] == 1
    finally:
        adaptive_mod.relative_contrast_from_sample = orig


def test_flat_add_list_of_blocks_matches_single_array():
    """Coalesced-ingest fast path: add() takes a list of blocks and
    stages them without an up-front concatenate — results must be
    identical to the equivalent single-array add."""
    v = _vecs(90, 8)
    a = FlatIndex(8)
    rows_a = a.add(v)
    b = FlatIndex(8)
    rows_b = b.add([v[:30], v[30:75], v[75:]])
    np.testing.assert_array_equal(rows_a, rows_b)
    q = _vecs(4, 8, seed=3)
    da, ia = a.search(q, 5)
    db, ib = b.search(q, 5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, rtol=1e-6)


def test_dataset_put_blocks_lww_drop_path():
    """A merged group whose blocks contain a stale (LWW-losing) row
    must pay the concatenate fallback and still land the right rows."""
    vs = VectorStore()
    d = 8
    vs.put("blk", np.arange(5), _vecs(5, d, seed=1), timestamp=10.0)
    newer = _vecs(5, d, seed=2)
    stale = _vecs(5, d, seed=3)
    # list-of-blocks put: block 1 is newer (wins), block 2 rows 0-4
    # are stale (ts 5.0 < 10.0 -> dropped)
    vs.put(
        "blk",
        np.concatenate([np.arange(5, 10), np.arange(5)]),
        [newer, stale],
        timestamp=np.array([20.0] * 5 + [5.0] * 5),
    )
    ds = vs.get("blk")
    assert ds.live_count == 10
    # row 0 still answers with its ORIGINAL (ts 10) vector
    got = ds.search(_vecs(5, d, seed=1)[:1], 1)
    assert got[0][0][0] == 0


def test_ingest_queue_merged_blocks_roundtrip():
    """End-to-end: merged groups ride the list-of-blocks path; every
    row must be searchable with its own vector afterwards."""
    from longbow_tpu.serving.ingest import IngestQueue

    vs = VectorStore()
    q = IngestQueue(vs, max_depth=64)
    d = 16
    blocks = [(_vecs(20, d, seed=s), np.arange(s * 20, s * 20 + 20))
              for s in range(12)]
    for v, ids in blocks:
        q.submit("mb", ids, v, None, None, None)
    assert q.drain(timeout_s=30.0)
    q.close()
    ds = vs.get("mb")
    assert ds.live_count == 240
    for v, ids in blocks[::5]:
        got_ids, _, _ = ds.search(v[:2], 1)
        assert got_ids[0][0] == ids[0] and got_ids[1][0] == ids[1]
