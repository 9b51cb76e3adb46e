"""Compaction, fragmentation, eviction (reference: compaction.go,
fragmentation_tracker.go, record_eviction.go)."""
import time

import numpy as np

from longbow_tpu.query.parser import Filter
from longbow_tpu.store.compaction import (
    CompactionWorker,
    EvictionManager,
    FragmentationTracker,
    compact_dataset,
)
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_compaction_reclaims_tombstones():
    vs = VectorStore()
    v = _vecs(100, 8)
    vs.put("d", np.arange(100), v, columns={"price": np.arange(100.0),
                                            "cat": np.array(["a", "b"] * 50)})
    vs.delete("d", list(range(0, 60)))
    ds = vs.get("d")
    assert FragmentationTracker().needs_compaction(ds)
    st = compact_dataset(ds)
    assert st["reclaimed_rows"] == 60 + 0  # 60 deleted rows reclaimed
    assert st["live_rows"] == 40
    assert len(ds.index) == 40  # index rebuilt to live rows only
    # data still correct after renumbering
    ids, _, ok = ds.search(v[75][None], 1)
    assert ids[0, 0] == 75
    # columns survived
    ids, _, ok = ds.search(v[75][None], 3, filters=[Filter("price", ">", "70")])
    assert all(i > 70 for i in ids[0] if i is not None)
    # string columns too
    ids, _, ok = ds.search(v[75][None], 3, filters=[Filter("cat", "=", "b")])
    assert all(int(i) % 2 == 1 for i in ids[0] if i is not None)


def test_ttl_eviction():
    vs = VectorStore()
    v = _vecs(20, 8)
    vs.put("d", np.arange(20), v)
    ds = vs.get("d")
    # age half the rows
    for uid in range(10):
        ds._lww[uid] = time.time() - 100
    ev = EvictionManager(ttl_s=50)
    n = ev.sweep(ds)
    assert n == 10
    assert ds.live_count == 10


def test_lru_eviction_to_max_rows():
    vs = VectorStore()
    v = _vecs(30, 8)
    vs.put("d", np.arange(30), v)
    ds = vs.get("d")
    ev = EvictionManager(policy="lru", max_rows=20)
    ev.record_access(range(10, 30))  # 0-9 cold
    assert ev.sweep(ds) == 10
    assert ds.live_count == 20
    assert all(uid in ds._id_to_row for uid in range(10, 30))


def test_lfu_eviction():
    vs = VectorStore()
    vs.put("d", np.arange(10), _vecs(10, 8))
    ds = vs.get("d")
    ev = EvictionManager(policy="lfu", max_rows=8)
    for _ in range(5):
        ev.record_access(range(2, 10))
    ev.record_access([0, 1])
    assert ev.sweep(ds) == 2
    assert 0 not in ds._id_to_row and 1 not in ds._id_to_row


def test_compaction_worker_run_once():
    vs = VectorStore()
    vs.put("a", np.arange(50), _vecs(50, 8))
    vs.delete("a", list(range(30)))
    w = CompactionWorker(vs, frag_threshold=0.3)
    stats = w.run_once()
    assert stats["a"]["compacted"]["live_rows"] == 20
    # second run: nothing to do
    stats = w.run_once()
    assert stats["a"]["compacted"] is None


def test_compaction_of_quantized_dataset():
    """Quantized adapter kinds must compact via the dataset's
    construction params (the adapter has no AdaptiveIndex attrs), and
    trained quantizer state must survive so codes stay stable."""
    from longbow_tpu.store.compaction import compact_dataset

    vs = VectorStore()
    v = _vecs(600, 16)
    vs.get_or_create("q", 16, index_kind="pq", index_params={"pq_m": 4})
    vs.put("q", np.arange(600), v)
    books = np.asarray(vs.get("q").index._inner.codebooks)
    vs.delete("q", list(range(300)))
    stats = compact_dataset(vs.get("q"))
    assert stats["live_rows"] == 300 and stats["reclaimed_rows"] == 300
    ds = vs.get("q")
    assert ds.index.kind == "pq" and len(ds.index) == 300
    np.testing.assert_array_equal(
        np.asarray(ds.index._inner.codebooks), books
    )
    ids, _, _ = vs.search("q", v[450], 1, use_cache=False)
    assert ids[0, 0] == 450


def test_compaction_worker_handles_quantized(caplog):
    vs = VectorStore()
    vs.get_or_create("s", 8, index_kind="sq8")
    vs.put("s", np.arange(50), _vecs(50, 8))
    vs.delete("s", list(range(30)))
    w = CompactionWorker(vs, frag_threshold=0.3)
    stats = w.run_once()
    assert stats["s"]["compacted"]["live_rows"] == 20


def test_memory_backpressure():
    """Soft limit evicts coldest rows to target; hard limit rejects
    writes (reference: memory_backpressure.go:31,
    memory_enforcement.go:66)."""
    import pytest

    from longbow_tpu.store.compaction import (
        MemoryBackpressureController,
        MemoryPressureError,
    )

    vs = VectorStore()
    v = _vecs(12000, 16)
    vs.put("big", np.arange(12000), v, timestamp=100.0)
    # refresh the tail so it's "hot" by LWW
    vs.put("big", np.arange(10000, 12000), v[10000:], timestamp=200.0)
    used = vs.get("big").hbm_bytes()

    # capacity halves when live rows drop under 8192: target 70%%
    ctrl = MemoryBackpressureController(
        soft_bytes=int(used * 0.7), batch_rows=2048
    )
    vs.backpressure = ctrl
    evicted = ctrl.enforce(vs)
    assert evicted > 0
    assert ctrl.total_bytes(vs) <= int(used * 0.7)
    # coldest (oldest-write) rows went first; hot tail survives
    assert 11999 in vs.get("big")._id_to_row
    assert 0 not in vs.get("big")._id_to_row

    hard = MemoryBackpressureController(hard_bytes=1)
    vs.backpressure = hard
    with pytest.raises(MemoryPressureError):
        vs.put("big", [99999], _vecs(1, 16))
    assert hard.rejected_total == 1


def test_compaction_mesh_strided_rows():
    """Regression (review finding): compaction rebuilt id maps with
    new_rows[-1] and contiguous column appends — wrong for the
    shard-strided rows mesh indexes assign."""
    from longbow_tpu.query.parser import Filter
    from longbow_tpu.store.compaction import compact_dataset
    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    vs.get_or_create("cm", 8, index_kind="mesh_flat")
    rng = np.random.default_rng(0)
    v = rng.standard_normal((240, 8), dtype=np.float32)
    vs.put("cm", np.arange(240), v, columns={"g": np.arange(240) % 4})
    vs.delete("cm", list(range(0, 240, 3)))  # 33% tombstones
    ds = vs.get("cm")
    out = compact_dataset(ds)
    assert out["live_rows"] == 160
    ids, sc, ok = vs.search("cm", v[1], 3)
    assert ids[0, 0] == 1
    # filter columns landed at the strided rows
    ids, sc, ok = vs.search("cm", v[2], 4, filters=[Filter("g", "=", "2")])
    got = [ids[0, j] for j in range(4) if ok[0, j]]
    assert got and all(int(i) % 4 == 2 for i in got)


def test_dataset_ttl_drops_idle_datasets():
    """Reference LONGBOW_TTL semantics (docs/eviction.md): whole
    datasets not read/written for the duration are dropped by the
    background sweep; accessed datasets survive."""
    import time

    from longbow_tpu.store.compaction import CompactionWorker

    store = VectorStore()
    v = _vecs(10, 8)
    store.put("stale", np.arange(10), v)
    store.put("fresh", np.arange(10), v)
    w = CompactionWorker(store, dataset_ttl_s=0.5)
    time.sleep(0.7)
    store.search("fresh", v[0], 1, use_cache=False)  # touches fresh
    w.run_once()
    assert store.list_datasets() == ["fresh"]


def test_upsert_clears_stale_row_slot_for_sparse_filters():
    """An upsert must null the OLD row's slot in the row->id map —
    hybrid/sparse filtering builds its allowed-set from
    row_ids_array() and matched the id against its pre-upsert column
    values otherwise (review finding)."""
    store = VectorStore()
    v = _vecs(10, 8)
    store.put(
        "up", np.arange(10), v,
        columns={"color": np.asarray(["red"] * 10)},
    )
    ds = store.get("up")
    old_row = ds._id_to_row[3]
    store.put(
        "up", np.asarray([3]), v[3:4],
        columns={"color": np.asarray(["blue"])},
    )
    assert ds._row_to_id[old_row] is None  # stale slot cleared
    from longbow_tpu.query.parser import Filter

    ids, _, ok = store.search(
        "up", v[3], 10, filters=[Filter("color", "=", "red")],
        use_cache=False,
    )
    got = [i for i in ids[0] if i is not None]
    assert 3 not in got  # id 3 is blue now


def test_compaction_reclaims_fully_deleted_dataset():
    """Deleting every row then compacting must actually release the
    index capacity (the old early-return kept full capacity forever
    and re-triggered a no-op compaction every sweep)."""
    from longbow_tpu.store.compaction import compact_dataset

    store = VectorStore()
    store.put("gone", np.arange(40_000), _vecs(40_000, 16))
    ds = store.get("gone")
    before = ds.hbm_bytes()
    store.delete("gone", list(range(40_000)))
    out = compact_dataset(ds)
    assert out["reclaimed_rows"] == 40_000
    assert ds.hbm_bytes() < before
    assert len(ds.index) == 0
    # second compaction is a no-op, not a re-trigger
    out = compact_dataset(ds)
    assert out["reclaimed_rows"] == 0


# ---- concurrent compaction (the rebuild must not block serving) ----


def _slow_build_hook(monkeypatch, in_build, release):
    """Make the compaction-phase-2 bulk add block on `release` after
    signalling `in_build` (only the FIRST add — the phase-3 delta add
    must run normally)."""
    import longbow_tpu.store.compaction as comp

    orig_fresh = comp._fresh_index

    def slow_fresh(dataset):
        idx = orig_fresh(dataset)
        orig_add = idx.add
        state = {"first": True}

        def add(vecs):
            if state["first"]:
                state["first"] = False
                in_build.set()
                assert release.wait(30), "test never released the build"
            return orig_add(vecs)

        idx.add = add
        return idx

    monkeypatch.setattr(comp, "_fresh_index", slow_fresh)


def test_compaction_does_not_block_serving(monkeypatch):
    """A slow index rebuild (minutes for a graph kind) must not hold
    the dataset lock: searches and puts during the build complete
    immediately (observed pre-fix: a 329s rebuild timed out every
    concurrent search)."""
    import threading

    vs = VectorStore()
    v = _vecs(3000, 16)
    vs.put("c", np.arange(3000), v)
    vs.delete("c", list(range(1500)))  # make it genuinely fragmented
    ds = vs.get("c")

    in_build, release = threading.Event(), threading.Event()
    _slow_build_hook(monkeypatch, in_build, release)

    out = {}
    t = threading.Thread(target=lambda: out.update(compact_dataset(ds)))
    t.start()
    assert in_build.wait(30)
    # the build is parked holding NO dataset lock: serving proceeds
    t0 = time.time()
    ids, _, ok = ds.search(v[2000][None], 1)
    assert ids[0, 0] == 2000
    ds.put(np.array([99_001]), _vecs(1, 16, seed=9))
    assert time.time() - t0 < 5.0  # not blocked behind the rebuild
    release.set()
    t.join(timeout=120)
    assert not t.is_alive()
    # the put that landed during the build survived the swap
    assert 99_001 in ds._id_to_row
    assert out["live_rows"] == 1501


def test_compaction_reconciles_concurrent_mutations(monkeypatch):
    """Upserts, inserts and deletes that land DURING the offline
    rebuild must all be present/absent in the swapped-in trio."""
    import threading

    vs = VectorStore()
    v = _vecs(500, 16)
    vs.put("r", np.arange(500), v,
           columns={"tag": np.array(["old"] * 500)})
    vs.delete("r", list(range(0, 250)))  # fragment to justify compaction
    ds = vs.get("r")

    in_build, release = threading.Event(), threading.Event()
    _slow_build_hook(monkeypatch, in_build, release)

    out = {}
    t = threading.Thread(target=lambda: out.update(compact_dataset(ds)))
    t.start()
    assert in_build.wait(30)
    new_vec = _vecs(1, 16, seed=42)
    ds.put(np.array([300]), new_vec,
           columns={"tag": np.array(["new"])})  # upsert survivor id 300
    ds.put(np.array([777]), _vecs(1, 16, seed=7))  # brand-new id
    ds.delete(np.array([301]))  # delete a snapshot survivor
    release.set()
    t.join(timeout=120)
    assert not t.is_alive()

    assert out["delta_upserts"] == 2  # id 300 re-put + id 777 new
    assert out["delta_deletes"] >= 2  # id 301 + id 300's stale version
    # upsert: the NEW vector serves, with the NEW column value
    ids, dist, ok = ds.search(new_vec, 1)
    assert ids[0, 0] == 300 and dist[0, 0] < 1e-3
    ids, _, ok = ds.search(new_vec, 5, filters=[Filter("tag", "=", "new")])
    assert ids[0, 0] == 300
    # insert present, delete absent
    assert 777 in ds._id_to_row
    assert 301 not in ds._id_to_row
    ids, _, ok = ds.search(v[301][None], 1)
    assert ids[0, 0] != 301
    # map invariants after reconcile
    for uid, row in ds._id_to_row.items():
        assert ds._row_to_id[row] == uid


def test_fragmentation_ratio_not_torn_by_ingest():
    """put() appends index rows before rebuilding the id map; the
    tracker must read both under the dataset lock or a fresh ingest
    looks >30% dead and triggers a full zero-reclaim rebuild
    (observed on a live server: 329s rebuild, 0 rows reclaimed)."""
    import threading

    vs = VectorStore()
    vs.put("t", np.arange(100), _vecs(100, 16))
    ds = vs.get("t")
    tracker = FragmentationTracker()
    stop = threading.Event()
    fired = []

    def poll():
        while not stop.is_set():
            if tracker.needs_compaction(ds):
                fired.append(tracker.ratio(ds))

    th = threading.Thread(target=poll)
    th.start()
    base = 100
    try:
        for _ in range(60):
            ds.put(np.arange(base, base + 2000), _vecs(2000, 16, seed=base))
            base += 2000
    finally:
        stop.set()
        th.join(timeout=10)
    assert not fired, f"spurious compaction triggers mid-ingest: {fired}"
