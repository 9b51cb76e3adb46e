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
