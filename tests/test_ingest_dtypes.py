"""Dtype-preserving vector ingest (round-4 VERDICT #8).

The reference ingests f16/int8/uint8/int32 vector columns natively with
a published per-dtype matrix (/root/reference/docs/performance.md:27-53).
Here: the wire, the store, the WAL, and the index tier keep the ingest
dtype — int8/uint8 bytes land 1:1 as identity-affine SQ8 codes, f16
lands in float16 storage, and WAL frames log the native dtype.
"""
import numpy as np
import pyarrow as pa
import pytest

from longbow_tpu.store.vector_store import VectorStore


def _search_ids(store, name, q, k=3):
    ids, scores, ok = store.search(name, q, k, use_cache=False)
    return ids, scores


def test_int8_ingest_creates_identity_sq8():
    store = VectorStore()
    rng = np.random.default_rng(0)
    v = rng.integers(-128, 128, (64, 16)).astype(np.int8)
    store.put("i8", np.arange(64), v)
    ds = store.get("i8")
    assert ds.index_kind == "sq8"
    inner = getattr(ds.index, "_inner", ds.index)
    # round-5 convention: codes are RECENTERED int8 (u8 grid - 128),
    # so int8 input stores its bytes 1:1
    codes = np.asarray(inner.codes[:64])
    np.testing.assert_array_equal(codes, v)
    ids, scores = _search_ids(store, "i8", v[7].astype(np.float32))
    assert ids[0, 0] == 7 and float(scores[0, 0]) < 1e-3


def test_uint8_ingest_codes_roundtrip():
    store = VectorStore()
    rng = np.random.default_rng(1)
    v = rng.integers(0, 256, (50, 8)).astype(np.uint8)
    store.put("u8", np.arange(50), v)
    ds = store.get("u8")
    assert ds.index_kind == "sq8"
    inner = getattr(ds.index, "_inner", ds.index)
    # uint8 input recenters by -128 (exactly invertible)
    np.testing.assert_array_equal(
        np.asarray(inner.codes[:50]).astype(np.int16) + 128,
        v.astype(np.int16),
    )
    ids, scores = _search_ids(store, "u8", v[3].astype(np.float32))
    assert ids[0, 0] == 3 and float(scores[0, 0]) < 1e-3


def test_f16_ingest_stores_float16():
    import jax.numpy as jnp

    store = VectorStore()
    rng = np.random.default_rng(2)
    v = rng.standard_normal((40, 12)).astype(np.float16)
    store.put("h", np.arange(40), v)
    ds = store.get("h")
    assert jnp.dtype(ds.dtype) == jnp.float16
    got = ds.index.get_vectors(np.arange(40))
    # exact: f16 -> f16 storage, no bf16 rounding on the way
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), v.astype(np.float32)
    )
    ids, scores = _search_ids(store, "h", v[5].astype(np.float32))
    assert ids[0, 0] == 5 and float(scores[0, 0]) < 1e-3


def test_int32_ingest_accepted():
    store = VectorStore()
    v = np.arange(60 * 4, dtype=np.int32).reshape(60, 4) % 1000
    store.put("i32", np.arange(60), v)
    ids, scores = _search_ids(store, "i32", v[9].astype(np.float32))
    assert ids[0, 0] == 9 and float(scores[0, 0]) < 1e-3


def test_explicit_index_choice_beats_dtype_hint():
    store = VectorStore()
    store.get_or_create("pre", 8, index_kind="flat")
    v = np.random.default_rng(3).integers(-5, 5, (20, 8)).astype(np.int8)
    store.put("pre", np.arange(20), v)
    assert store.get("pre").index_kind == "flat"


def test_dtype_survives_wal_replay(tmp_path):
    store = VectorStore(persist_dir=tmp_path, wal_sync="always")
    rng = np.random.default_rng(4)
    vi = rng.integers(-128, 128, (30, 8)).astype(np.int8)
    vh = rng.standard_normal((30, 8)).astype(np.float16)
    store.put("wi8", np.arange(30), vi)
    store.put("wh", np.arange(30), vh)
    del store

    store2 = VectorStore(persist_dir=tmp_path, wal_sync="always")
    assert store2.get("wi8").index_kind == "sq8"
    inner = store2.get("wi8").index
    inner = getattr(inner, "_inner", inner)
    np.testing.assert_array_equal(  # recentered-int8: bytes 1:1
        np.asarray(inner.codes[:30]), vi
    )
    import jax.numpy as jnp

    assert jnp.dtype(store2.get("wh").dtype) == jnp.float16
    ids, scores = _search_ids(store2, "wh", vh[4].astype(np.float32))
    assert ids[0, 0] == 4 and float(scores[0, 0]) < 1e-3


def test_dtype_over_the_wire():
    """End-to-end through a real Flight server: int8 + f16 columns
    arrive natively, land in dtype-appropriate indexes, and scan back
    value-exact."""
    import socket
    import threading

    from longbow_tpu.serving.client import LongbowClient
    from longbow_tpu.serving.flight_server import LongbowFlightServer

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    store = VectorStore()
    srv = LongbowFlightServer(store, f"grpc://127.0.0.1:{port}")
    threading.Thread(target=srv.serve, daemon=True).start()
    c = LongbowClient("127.0.0.1", port, port).connect()
    try:
        rng = np.random.default_rng(5)
        vi = rng.integers(-128, 128, (25, 8)).astype(np.int8)
        vh = rng.standard_normal((25, 8)).astype(np.float16)
        c.write("wire_i8", np.arange(25), vi)
        c.write("wire_h", np.arange(25), vh)
        assert store.get("wire_i8").index_kind == "sq8"
        import jax.numpy as jnp

        assert jnp.dtype(store.get("wire_h").dtype) == jnp.float16
        t = c.scan("wire_i8")
        got = {
            int(r["id"]): np.asarray(r["vector"], np.float32)
            for r in t.to_pylist()
        }
        for i in range(25):
            np.testing.assert_array_equal(got[i], vi[i].astype(np.float32))
        # f16 dataset scans back as halffloat (stored-dtype downloads,
        # reference docs/performance.md:27-53) and value-exact
        th = c.scan("wire_h")
        assert th.schema.field("vector").type.value_type == pa.float16()
        goth = {
            int(r["id"]): np.asarray(r["vector"], np.float16)
            for r in th.to_pylist()
        }
        for i in range(25):
            np.testing.assert_array_equal(goth[i], vh[i])
    finally:
        c.close()
        srv.shutdown()
