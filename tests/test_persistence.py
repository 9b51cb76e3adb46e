"""Durability: write -> crash -> replay (reference:
durability_verify_test.go, wal_recovery_test.go, engine fail-fast CRC
replay engine.go:160-220).
"""
import numpy as np
import pytest

from longbow_tpu.storage.native import crc32c, native_available
from longbow_tpu.storage.wal import WAL
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_native_library_builds():
    # the C++ runtime must actually build in this image (g++ baked in)
    assert native_available()


def test_crc32c_known_vector():
    # RFC 3720 test vector: crc32c("123456789") == 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283


def test_wal_roundtrip(tmp_path):
    import pyarrow as pa

    wal = WAL(tmp_path / "w.log", sync="always")
    t = pa.table({"id": pa.array([1, 2], pa.int64())})
    wal.append_batch("ds1", t)
    wal.append_op("ds1", {"op": "delete", "ids": [1]})
    wal.close()

    entries = list(WAL.replay(tmp_path / "w.log"))
    assert len(entries) == 2
    seq, ts, name, kind, payload = entries[0]
    assert name == "ds1" and kind == 0
    assert WAL.decode_batch(payload).num_rows == 2
    assert entries[1][3] == 1


def test_wal_detects_corruption(tmp_path):
    import pyarrow as pa

    wal = WAL(tmp_path / "w.log", sync="always")
    t = pa.table({"id": pa.array([1], pa.int64())})
    for _ in range(3):
        wal.append_batch("d", t)
    wal.close()
    # flip a byte in the middle of the file
    raw = bytearray((tmp_path / "w.log").read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    (tmp_path / "w.log").write_bytes(bytes(raw))
    entries = list(WAL.replay(tmp_path / "w.log"))
    assert 0 < len(entries) < 3  # fail-fast at the corrupt frame


def test_crash_replay_restores_store(tmp_path):
    v = _vecs(50, 8)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.put("docs", np.arange(50), v, columns={"price": np.arange(50.0)})
    store.delete("docs", [7])
    store.add_edge("docs", 1, 2, "rel", 1.0)
    # simulate crash: no close(), no snapshot
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("docs").live_count == 49
    ids, scores, ok = store2.search("docs", v[3], 1, use_cache=False)
    assert ids[0, 0] == 3
    ids, _, _ = store2.search("docs", v[7], 1, use_cache=False)
    assert ids[0, 0] != 7
    # filters survive
    from longbow_tpu.query.parser import Filter

    ids, _, ok = store2.search(
        "docs", v[3], 3, filters=[Filter("price", "<", "10")],
        use_cache=False,
    )
    assert all(i < 10 for i in ids[0] if i is not None)
    assert store2.traverse_graph("docs", 1, 2) == [1, 2]


def test_snapshot_and_wal_truncate(tmp_path):
    v = _vecs(30, 8)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.put("a", np.arange(30), v,
              columns={"text": np.array([f"doc {i} words" for i in range(30)])})
    store.snapshot()
    assert store.engine.wal.size_bytes == 0
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("a").live_count == 30
    # BM25 state restored from snapshot
    assert len(store2.get("a").bm25) == 30
    ids, _, _ = store2.search("a", v[5], 1, use_cache=False)
    assert ids[0, 0] == 5


def test_snapshot_plus_tail(tmp_path):
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _vecs(20, 8)
    store.put("a", np.arange(20), v)
    store.snapshot()
    v2 = _vecs(5, 8, seed=2)
    store.put("a", np.arange(100, 105), v2)  # lands in WAL tail
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("a").live_count == 25
    ids, _, _ = store2.search("a", v2[0], 1, use_cache=False)
    assert ids[0, 0] == 100


def test_upsert_after_recovery(tmp_path):
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _vecs(10, 8)
    store.put("a", np.arange(10), v)
    store.put("a", np.array([3]), v[3] + 50.0)  # upsert
    del store
    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("a").live_count == 10
    ids, _, _ = store2.search("a", v[3] + 50.0, 1, use_cache=False)
    assert ids[0, 0] == 3


def test_drop_survives_recovery(tmp_path):
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.put("gone", [1], _vecs(1, 4))
    store.put("kept", [1], _vecs(1, 4))
    store.drop("gone")
    del store
    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.list_datasets() == ["kept"]


def test_snapshot_preserves_columns(tmp_path):
    """Snapshot must carry metadata columns: a filter on a column that
    only ever lived in a snapshot (WAL truncated) must still work."""
    from longbow_tpu.query.parser import Filter

    v = _vecs(40, 8)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.put(
        "docs", np.arange(40), v,
        columns={"price": np.arange(40.0),
                 "cat": np.array(["a", "b"] * 20)},
    )
    store.snapshot()  # truncates the WAL: columns must live in the snapshot
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ids, _, ok = store2.search(
        "docs", v[3], 5, filters=[Filter("price", "<", "10")],
        use_cache=False,
    )
    got = [i for i in ids[0] if i is not None]
    assert got and all(i < 10 for i in got)
    ids, _, _ = store2.search(
        "docs", v[2], 3, filters=[Filter("cat", "=", "a")], use_cache=False
    )
    got = [i for i in ids[0] if i is not None]
    assert got and all(i % 2 == 0 for i in got)


def test_snapshot_restores_graph_index_without_rebuild(tmp_path, monkeypatch):
    """v2 snapshots persist the graph adjacency; recovery imports it
    instead of re-linking (reference: arrow_hnsw_persistence.go)."""
    v = _vecs(600, 16)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.get_or_create("g", 16, index_kind="hnsw")
    store.put("g", np.arange(600), v)
    ds = store.get("g")
    assert ds.index.kind == "hnsw"
    nbrs_before = np.asarray(ds.index._graph.state.nbrs[:600])
    store.close()

    # any attempt to (re)link the graph during recovery is a bug
    import longbow_tpu.index.hnsw as hnsw_mod

    def boom(*a, **kw):
        raise AssertionError("recovery must not rebuild the graph")

    monkeypatch.setattr(hnsw_mod, "insert_batch", boom)
    monkeypatch.setattr(hnsw_mod, "bulk_build_edges", boom)

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ds2 = store2.get("g")
    assert ds2.index.kind == "hnsw"
    assert ds2.index_kind == "hnsw"
    np.testing.assert_array_equal(
        np.asarray(ds2.index._graph.state.nbrs[:600]), nbrs_before
    )
    ids, _, _ = store2.search("g", v[11], 1, use_cache=False)
    assert ids[0, 0] == 11


def test_pq_codes_stable_across_restart(tmp_path):
    """Recovery must import PQ codebooks, not retrain (retraining
    changes every code; reference: pq/persistence.go:15-38)."""
    v = _vecs(800, 16)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.get_or_create("p", 16, index_kind="pq", index_params={"pq_m": 4})
    store.put("p", np.arange(800), v)
    inner = store.get("p").index._inner
    codes = np.asarray(inner.codes[: inner.count])
    books = np.asarray(inner.codebooks)
    store.close()

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    inner2 = store2.get("p").index._inner
    np.testing.assert_array_equal(
        np.asarray(inner2.codes[: inner2.count]), codes
    )
    np.testing.assert_array_equal(np.asarray(inner2.codebooks), books)
    ids, _, _ = store2.search("p", v[5], 1, use_cache=False)
    assert ids[0, 0] == 5


def test_lww_survives_snapshot(tmp_path):
    """Deletion markers + write timestamps persist: a replicated stale
    write arriving after restart must still lose."""
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _vecs(10, 8)
    store.put("a", np.arange(10), v, timestamp=1000.0)
    store.delete("a", [3])
    store.snapshot()
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ds = store2.get("a")
    assert 3 not in ds._id_to_row and 3 in ds._lww  # marker kept
    # stale write (older timestamp) must be dropped by LWW
    store2.put("a", [5], _vecs(1, 8, seed=9), timestamp=10.0)
    ids, _, _ = store2.search("a", v[5], 1, use_cache=False)
    assert ids[0, 0] == 5


def test_wal_seq_monotonic_after_reopen(tmp_path):
    import pyarrow as pa

    t = pa.table({"id": pa.array([1], pa.int64())})
    wal = WAL(tmp_path / "w.log", sync="always")
    for _ in range(3):
        wal.append_batch("d", t)
    wal.close()
    wal2 = WAL(tmp_path / "w.log", sync="always")
    s = wal2.append_batch("d", t)
    wal2.close()
    seqs = [e[0] for e in WAL.replay(tmp_path / "w.log")]
    assert seqs == [1, 2, 3, 4] and s == 4


def test_dot_metric_index_survives_restart(tmp_path):
    """MIPS augmentation bound must persist: without it restored
    dot-metric indexes return wrong scores and reject adds."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((300, 8), dtype=np.float32)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.get_or_create("m", 8, metric="dot", index_kind="hnsw")
    store.put("m", np.arange(300), v)
    q = rng.standard_normal((1, 8), dtype=np.float32)
    _, s1, _ = store.search("m", q, 5, use_cache=False)
    store.close()

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    _, s2, _ = store2.search("m", q, 5, use_cache=False)
    np.testing.assert_allclose(s1, s2, rtol=1e-4)
    # adds after restart must not trip the augmentation bound
    store2.put("m", [1000], v[:1] * 0.5)
    assert store2.get("m").live_count == 301


def test_adaptive_wal_sync(tmp_path):
    """AdaptiveWAL parity: group-commit interval adapts to write load
    (reference: adaptive_wal.go)."""
    import pyarrow as pa
    import time

    wal = WAL(tmp_path / "w.log", sync="adaptive", sync_interval_s=0.02)
    t = pa.table({"id": pa.array(list(range(500)), pa.int64())})
    for _ in range(50):
        wal.append_batch("d", t)
    time.sleep(0.1)
    # idle: the interval shrinks toward the floor
    for _ in range(30):
        time.sleep(0.02)
        if wal._sync_interval <= 0.01:
            break
    assert wal._sync_interval <= 0.02
    wal.close()
    assert len(list(WAL.replay(tmp_path / "w.log"))) == 50


def test_snapshot_remote_mirror(tmp_path):
    """Snapshots mirror to a backend and a FRESH node recovers from it
    (reference: S3 snapshot backend, s3_backend.go:33; exercised with
    the LocalBackend — same interface boto3's S3Backend implements)."""
    from longbow_tpu.storage.backends import LocalBackend

    mirror = tmp_path / "mirror"
    be = LocalBackend(mirror)
    v = _vecs(30, 8)
    store = VectorStore(
        persist_dir=tmp_path / "node_a", wal_sync="always",
        snapshot_backend=be,
    )
    store.put("m", np.arange(30), v)
    store.snapshot()
    del store
    # brand-new node, empty local state, same backend
    store2 = VectorStore(
        persist_dir=tmp_path / "node_b", wal_sync="always",
        snapshot_backend=LocalBackend(mirror),
    )
    assert store2.get("m").live_count == 30
    ids, _, _ = store2.search("m", v[4], 1, use_cache=False)
    assert ids[0, 0] == 4


def test_mesh_dataset_snapshot_recover(tmp_path):
    """A mesh-sharded dataset snapshots its sharded state and recovers
    onto the same mesh size with identical results."""
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.get_or_create("mm", 8, index_kind="mesh_flat")
    rng = np.random.default_rng(0)
    v = rng.standard_normal((200, 8), dtype=np.float32)
    store.put("mm", np.arange(200), v, columns={"g": np.arange(200) % 3})
    ids1, sc1, ok1 = store.search("mm", v[7], 3)
    store.snapshot()
    store.close()

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ds = store2.get("mm")
    assert ds.index.kind == "mesh_flat"
    ids2, sc2, ok2 = store2.search("mm", v[7], 3)
    assert [i for r in ids2 for i in r] == [i for r in ids1 for i in r]
    # filters survive (column values at the strided rows)
    from longbow_tpu.query.parser import Filter

    ids3, _, ok3 = store2.search(
        "mm", v[9], 3, filters=[Filter("g", "=", "0")]
    )
    got = [ids3[0, j] for j in range(3) if ok3[0, j]]
    assert got and all(int(i) % 3 == 0 for i in got)
    store2.close()


def test_wal_io_uring_backend(tmp_path):
    """io_uring WAL writes + fsync + truncate round trip (reference:
    UringBackend wal_backend_linux.go:15-125). Skips cleanly where the
    kernel/sandbox refuses io_uring (WAL falls back to FS)."""
    import pytest

    from longbow_tpu.storage.wal import WAL

    w = WAL(tmp_path / "u.log", sync="always", io_uring=True)
    if w.backend_name != "io_uring":
        w.close()
        pytest.skip("io_uring unavailable on this host")
    for i in range(50):
        w.append_op("ds", {"op": "delete", "ids": [i]})
    w.flush()
    assert w.size_bytes > 0
    frames = list(WAL.replay(tmp_path / "u.log"))
    assert len(frames) == 50
    assert frames[-1][0] == 50  # seq preserved
    w.truncate()
    assert w.size_bytes == 0
    w.append_op("ds", {"op": "delete", "ids": [99]})
    w.close()
    frames = list(WAL.replay(tmp_path / "u.log"))
    assert len(frames) == 1 and frames[0][0] == 51


def test_store_with_io_uring_wal(tmp_path):
    """Full store persistence through the io_uring backend."""
    import numpy as np

    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore(
        persist_dir=tmp_path, wal_sync="always", wal_io_uring=True
    )
    v = np.random.default_rng(0).standard_normal((20, 8), np.float32)
    vs.put("d", np.arange(20), v)
    vs.engine.wal.flush()
    # crash-style recovery: new store replays the WAL
    vs2 = VectorStore(
        persist_dir=tmp_path, wal_sync="always", wal_io_uring=True
    )
    assert vs2.get("d").live_count == 20
    vs.close()
    vs2.close()


def test_periodic_snapshot_with_reference_env(tmp_path):
    """Serve with the REFERENCE's env names (LISTEN_ADDR, DATA_PATH,
    SNAPSHOT_INTERVAL as a Go duration): the alias layer translates,
    the periodic snapshot loop fires, and a kill -9 later a fresh
    store recovers from the snapshot (reference: SNAPSHOT_INTERVAL,
    cmd/longbow/main.go:57)."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    from longbow_tpu.serving.client import LongbowClient

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    dp, mp = free_port(), free_port()
    env = dict(os.environ)
    env.update(
        LONGBOW_LISTEN_ADDR=f"127.0.0.1:{dp}",
        LONGBOW_META_ADDR=f"0.0.0.0:{mp}",
        LONGBOW_METRICS_PORT="0",
        LONGBOW_DATA_PATH=str(tmp_path / "data"),
        LONGBOW_SNAPSHOT_INTERVAL="2s",
        LONGBOW_FORCE_CPU="1",
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "longbow_tpu.serve"],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
    )
    try:
        c = LongbowClient("127.0.0.1", dp, mp)
        t0 = time.time()
        while time.time() - t0 < 60:
            try:
                c.check_readiness()
                break
            except Exception:
                time.sleep(0.5)
        c.write("snapdocs", np.arange(25), _vecs(25, 8, seed=9))
        # wait until the async ingest applied the write...
        t0 = time.time()
        while time.time() - t0 < 30:
            try:
                if c.scan("snapdocs").num_rows == 25:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        t_vis = time.time()
        # ...then for an interval snapshot NEWER than the applied write
        # (an earlier empty snapshot may already have truncated the WAL)
        snapdir = tmp_path / "data" / "snapshot"
        t0 = time.time()
        fired = False
        while time.time() - t0 < 30:
            if snapdir.exists() and any(
                f.stat().st_mtime >= t_vis for f in snapdir.rglob("*")
            ):
                fired = True
                break
            time.sleep(0.5)
        assert fired, "periodic snapshot never fired"
        c.close()
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=10)
    vs = VectorStore(persist_dir=str(tmp_path / "data"))
    assert vs.get("snapdocs").live_count == 25
    vs.close()


def test_snapshot_concurrent_with_puts_loses_nothing(tmp_path):
    """Snapshot's export+truncate is exclusive against the WAL-append
    + apply commit unit: an acked write always survives crash recovery
    no matter how snapshots interleave (review finding: a frame
    WAL-appended before truncate but applied after export vanished
    from both)."""
    import threading

    vs = VectorStore(persist_dir=str(tmp_path), wal_sync="always")
    errors = []

    def put_loop():
        try:
            for i in range(40):
                vs.put(
                    "race",
                    np.arange(i * 50, (i + 1) * 50),
                    _vecs(50, 8, seed=i),
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def snap_loop():
        try:
            for _ in range(15):
                vs.snapshot()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=put_loop),
        threading.Thread(target=snap_loop),
        threading.Thread(target=snap_loop),  # concurrent snapshots too
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    vs.close()
    # crash-style recovery: every acked row must be present
    vs2 = VectorStore(persist_dir=str(tmp_path))
    assert vs2.get("race").live_count == 2000
    vs2.close()


def test_rejected_write_does_not_poison_wal(tmp_path):
    """A schema-rejected put must be validated BEFORE the WAL append —
    otherwise the rejected frame replays on every restart and bricks
    recovery (review finding). Also: recovery skips (loudly) any
    semantically-unreplayable frame instead of crashing startup."""
    vs = VectorStore(persist_dir=str(tmp_path), wal_sync="always")
    v = _vecs(5, 8)
    vs.put("se", np.arange(5), v, columns={"price": np.arange(5.0)})
    with pytest.raises(ValueError):
        vs.put(
            "se", np.arange(5, 10), v,
            columns={"price": np.asarray(["x"] * 5)},
        )
    vs.close()
    vs2 = VectorStore(persist_dir=str(tmp_path))  # must not raise
    assert vs2.get("se").live_count == 5
    vs2.close()


def test_wal_torn_tail_truncated_on_reopen(tmp_path):
    """A torn tail from a mid-frame crash must be TRUNCATED at reopen:
    appending after the garbage makes every later acked+fsynced frame
    unreachable by fail-fast replay on the NEXT restart (review
    finding: silent permanent loss)."""
    import pyarrow as pa

    w = WAL(tmp_path / "w.log", sync="always")
    t = pa.table({"id": pa.array([1], pa.int64())})
    w.append_batch("d", t)
    w.close()
    with open(tmp_path / "w.log", "ab") as f:
        f.write(b"\x01\x02half-a-frame")  # torn tail
    w2 = WAL(tmp_path / "w.log", sync="always")  # truncates
    w2.append_batch("d", t)  # post-crash write
    w2.close()
    entries = list(WAL.replay(tmp_path / "w.log"))
    assert len(entries) == 2  # BOTH frames replay


def test_bm25_int_ids_survive_snapshot_roundtrip(tmp_path):
    """BM25 doc ids must come back as ints after a snapshot (JSON
    stringified dict keys broke hybrid fusion and upserts after every
    recovery — review finding)."""
    store = VectorStore(persist_dir=str(tmp_path), wal_sync="always")
    v = _vecs(10, 8)
    store.put(
        "h", np.arange(10), v,
        columns={"text": np.asarray([f"doc {i} alpha" for i in range(10)])},
    )
    store.snapshot()
    store.close()
    store2 = VectorStore(persist_dir=str(tmp_path))
    hits = store2.get("h").bm25.search("alpha", 5)
    assert hits and all(isinstance(doc, int) for doc, _ in hits)
    # hybrid fusion merges sparse hits with dense int ids again
    ids, _, ok = store2.hybrid_search(
        "h", v[:1], 3, text_query="alpha", alpha=0.5
    )
    assert ids[0, 0] is not None and isinstance(ids[0, 0], (int, np.integer))
    store2.close()


def test_snapshot_survives_crash_between_renames(tmp_path):
    """A crash between write_snapshot's two renames leaves only
    snapshot.old.* — recovery must fall back to it instead of coming
    up empty (review finding: the next snapshot made the loss
    permanent)."""
    store = VectorStore(persist_dir=str(tmp_path), wal_sync="always")
    store.put("s", np.arange(8), _vecs(8, 8))
    store.snapshot()
    store.close()
    # simulate the mid-swap crash: snapshot -> snapshot.old.<ts>,
    # tmp never renamed in
    (tmp_path / "snapshot").rename(tmp_path / "snapshot.old.999999")
    store2 = VectorStore(persist_dir=str(tmp_path))
    assert store2.get("s").live_count == 8
    store2.close()


def test_weighted_path_hop_budget_not_blocked_by_cheap_long_path():
    """Dijkstra's pruning is keyed on (node, hops): a cheap path that
    exhausts the hop budget must not block a feasible within-budget
    path (review finding: find_path wrongly returned None and cached
    it)."""
    from longbow_tpu.hybrid.graph_store import GraphStore

    g = GraphStore()
    # cheap 3-hop chain to X (exhausts budget), expensive 2-hop to X
    g.add_edge("src", "a", weight=10.0)
    g.add_edge("a", "b", weight=10.0)
    g.add_edge("b", "X", weight=10.0)
    g.add_edge("src", "Y", weight=0.5)
    g.add_edge("Y", "X", weight=0.5)
    g.add_edge("X", "dst", weight=1.0)
    path = g.weighted_path("src", "dst", max_hops=3)
    assert path == ["src", "Y", "X", "dst"]


def test_replay_resolves_lww_by_origin_timestamp(tmp_path):
    """A stale replicated write (older origin ts) that loses LWW in
    memory is still WAL-logged with a LATER append time; replay must
    use the persisted origin ts so the stale row does not resurrect
    (advisor finding: engine.py log_put timestamps)."""
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _vecs(2, 8)
    store.put("a", np.array([1]), v[:1], timestamp=100.0)  # newer wins
    store.put("a", np.array([1]), v[1:], timestamp=50.0)   # stale, dropped
    ids, _, _ = store.search("a", v[0], 1, use_cache=False)
    assert ids[0, 0] == 1
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ds = store2.get("a")
    assert ds.live_count == 1
    # the surviving row must be the ts=100 vector, not the stale ts=50
    ids, scores, _ = store2.search("a", v[0], 1, use_cache=False)
    assert ids[0, 0] == 1 and float(scores[0, 0]) < 1e-3
    # and the LWW clock must reflect the winning origin time
    assert ds._lww[1] == 100.0


def test_replay_per_row_timestamps(tmp_path):
    """Coalesced ingest logs one frame holding rows with DIFFERENT
    origin timestamps; replay must keep per-row LWW semantics."""
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    v = _vecs(3, 8)
    store.put(
        "a", np.array([1, 2, 1]), v,
        timestamp=np.array([10.0, 20.0, 5.0]),  # 3rd row is stale dup
    )
    del store
    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    ds = store2.get("a")
    assert ds.live_count == 2
    assert ds._lww[1] == 10.0 and ds._lww[2] == 20.0
    ids, scores, _ = store2.search("a", v[0], 1, use_cache=False)
    assert ids[0, 0] == 1 and float(scores[0, 0]) < 1e-3


def test_wal_direct_io_backend(tmp_path):
    """O_DIRECT WAL backend (reference: direct_io_linux.go
    OpenFileDirect): aligned block staging must preserve every frame
    across syncs, partial-tail rewrites, reopen and truncate. Skips
    where the filesystem refuses O_DIRECT (tmpfs/overlayfs)."""
    w = WAL(tmp_path / "d.log", sync="always", direct_io=True)
    if w.backend_name != "direct":
        w.close()
        pytest.skip("O_DIRECT unavailable on this filesystem")
    # frames deliberately straddle the 4096 block boundary
    for i in range(200):
        w.append_op("ds", {"op": "delete", "ids": [i], "pad": "x" * 37})
    w.flush()
    frames = list(WAL.replay(tmp_path / "d.log"))
    assert len(frames) == 200
    # reopen resumes seq from the trimmed logical tail
    w.close()
    w2 = WAL(tmp_path / "d.log", sync="always", direct_io=True)
    w2.append_op("ds", {"op": "delete", "ids": [999]})
    w2.close()
    frames = list(WAL.replay(tmp_path / "d.log"))
    assert len(frames) == 201
    assert frames[-1][0] == 201  # monotonic seq across reopen
    # truncate resets
    w3 = WAL(tmp_path / "d.log", sync="always", direct_io=True)
    w3.truncate()
    assert w3.size_bytes == 0
    w3.append_op("ds", {"op": "delete", "ids": [1]})
    w3.close()
    assert len(list(WAL.replay(tmp_path / "d.log"))) == 1


def test_wal_direct_io_unclean_stop_keeps_synced_frames(tmp_path):
    """Without a clean close, the padded tail block stays on disk —
    replay must still return every synced frame (the zero padding
    reads as a torn tail, which the scanner already tolerates)."""
    w = WAL(tmp_path / "c.log", sync="always", direct_io=True)
    if w.backend_name != "direct":
        w.close()
        pytest.skip("O_DIRECT unavailable on this filesystem")
    for i in range(25):
        w.append_op("ds", {"op": "delete", "ids": [i]})
    w.flush()
    # simulate a crash: drop the handle without close()
    import os as _os

    _os.close(w._backend._fd)
    w._backend._buf.close()
    frames = list(WAL.replay(tmp_path / "c.log"))
    assert len(frames) == 25


# ---- S3 backend with a stubbed client (round 5: VERDICT missing #5;
# reference: s3_backend.go:33-250) ----

class _FakeS3Client:
    """In-memory S3 surface (upload_file/download_file/
    get_paginator), with optional fail-N-times fault injection and
    small pages so the paginator loop is really exercised."""

    def __init__(self, fail_uploads: int = 0):
        self.objects: dict[str, bytes] = {}
        self.fail_uploads = fail_uploads
        self.upload_calls = 0

    def upload_file(self, filename, bucket, key):
        self.upload_calls += 1
        if self.fail_uploads > 0:
            self.fail_uploads -= 1
            raise OSError("injected mid-upload failure")
        with open(filename, "rb") as f:
            self.objects[key] = f.read()

    def download_file(self, bucket, key, filename):
        with open(filename, "wb") as f:
            f.write(self.objects[key])

    def get_paginator(self, op):
        assert op == "list_objects_v2"
        client = self

        class _Pager:
            def paginate(self, Bucket, Prefix, Delimiter=None):
                keys = sorted(
                    k for k in client.objects if k.startswith(Prefix)
                )
                if Delimiter:
                    prefixes = sorted({
                        k[: len(Prefix)] + k[len(Prefix):].split(
                            Delimiter
                        )[0] + Delimiter
                        for k in keys
                        if Delimiter in k[len(Prefix):]
                    })
                    # one CommonPrefix per page: exercises multi-page
                    for p in prefixes:
                        yield {"CommonPrefixes": [{"Prefix": p}]}
                    if not prefixes:
                        yield {}
                    return
                for i in range(0, len(keys), 2):  # 2 keys per page
                    yield {"Contents": [
                        {"Key": k} for k in keys[i : i + 2]
                    ]}
                if not keys:
                    yield {}

        return _Pager()


def test_s3_backend_upload_list_download(tmp_path):
    from longbow_tpu.storage.backends import S3Backend

    fake = _FakeS3Client()
    be = S3Backend("bkt", prefix="lb", client=fake)
    src = tmp_path / "snapdir"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"alpha")
    (src / "sub" / "b.bin").write_bytes(b"beta" * 100)
    be.upload(src, "snapshot")
    be.upload(src, "snapshot-2")
    assert be.list_snapshots() == ["snapshot", "snapshot-2"]
    dst = tmp_path / "restored"
    assert be.download("snapshot", dst) is True
    assert (dst / "a.bin").read_bytes() == b"alpha"
    assert (dst / "sub" / "b.bin").read_bytes() == b"beta" * 100
    assert be.download("missing", tmp_path / "nope") is False


def test_s3_backend_retry_and_raise(tmp_path):
    """One transient failure is retried (metrics counted); a persistent
    failure surfaces after bounded retries (s3_backend.go retry loop)."""
    import pytest

    from longbow_tpu.storage.backends import S3Backend

    src = tmp_path / "d"
    src.mkdir()
    (src / "x").write_bytes(b"x")

    fake = _FakeS3Client(fail_uploads=1)
    be = S3Backend("bkt", client=fake)
    be.upload(src, "s")  # retry succeeds
    assert any(k.endswith("/s/x") for k in fake.objects)

    fake2 = _FakeS3Client(fail_uploads=99)
    be2 = S3Backend("bkt", client=fake2)
    with pytest.raises(OSError):
        be2.upload(src, "s")
    assert fake2.upload_calls == 3  # 1 try + 2 retries


def test_s3_backend_full_snapshot_restore(tmp_path):
    """End-to-end: node A snapshots to (fake) S3, a brand-new node B
    with empty local state restores from it — the exercised equivalent
    of the LocalBackend test above."""
    from longbow_tpu.storage.backends import AsyncBackend, S3Backend

    fake = _FakeS3Client()
    v = _vecs(30, 8)
    store = VectorStore(
        persist_dir=tmp_path / "node_a", wal_sync="always",
        snapshot_backend=AsyncBackend(S3Backend("bkt", client=fake)),
    )
    store.put("m", np.arange(30), v)
    store.snapshot()
    store.backend_wait() if hasattr(store, "backend_wait") else None
    # AsyncBackend fire-and-forget: join its threads before reading
    store.engine.backend.wait() if hasattr(
        store.engine.backend, "wait"
    ) else None
    del store
    assert fake.objects, "snapshot never reached the backend"

    store2 = VectorStore(
        persist_dir=tmp_path / "node_b", wal_sync="always",
        snapshot_backend=S3Backend("bkt", client=fake),
    )
    assert store2.get("m").live_count == 30
    ids, _, _ = store2.search("m", v[4], 1, use_cache=False)
    assert ids[0, 0] == 4


def test_wal_rotation_snapshot_crash_safety(tmp_path, monkeypatch):
    """Round-5 snapshot restructure: the WAL rotates at snapshot
    capture and file IO runs outside the commit lock. A snapshot that
    FAILS after rotating must not lose the rotated segment — recovery
    replays `wal.log.pre-snapshot` before the live log; a later
    successful snapshot covers and deletes it."""
    import longbow_tpu.storage.engine as eng

    v = _vecs(40, 8)
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    store.put("r", np.arange(20), v[:20])

    # snapshot that dies AFTER the rotation (during the write)
    real_write = eng.write_snapshot

    def boom(*a, **kw):
        raise OSError("injected snapshot failure")

    monkeypatch.setattr(eng, "write_snapshot", boom)
    try:
        store.snapshot()
    except OSError:
        pass
    pre = tmp_path / "wal.log.pre-snapshot"
    assert pre.exists(), "rotated segment must survive the failure"
    # more writes land in the fresh live log
    store.put("r", np.arange(20, 40), v[20:])
    del store  # crash (close() would snapshot again)

    # recovery replays pre-snapshot + live log
    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("r").live_count == 40
    ids, _, _ = store2.search("r", v[7], 1, use_cache=False)
    assert ids[0, 0] == 7
    ids, _, _ = store2.search("r", v[33], 1, use_cache=False)
    assert ids[0, 0] == 33

    # a successful snapshot now covers and deletes the stale segment
    monkeypatch.setattr(eng, "write_snapshot", real_write)
    store2.snapshot()
    assert not pre.exists()
    store2.put("r", np.arange(40, 45), _vecs(5, 8, seed=2))
    del store2
    store3 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store3.get("r").live_count == 45
