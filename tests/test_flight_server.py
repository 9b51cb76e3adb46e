"""End-to-end Flight protocol tests: real gRPC sockets on localhost,
reference-compatible wire formats (the in-process analogue of the
reference's flight_lifecycle_test.go / store_e2e_test.go).
"""
import numpy as np
import pytest

from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import serve
from longbow_tpu.store.vector_store import VectorStore


@pytest.fixture(scope="module")
def server():
    store = VectorStore()
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    yield handle
    handle.shutdown()


@pytest.fixture(scope="module")
def client(server):
    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{server.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{server.meta_server.port}"
    c.connect()
    yield c
    c.close()


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_write_then_search(client):
    v = _vecs(50, 16)
    client.write("e2e", np.arange(50), v)
    t = client.search("e2e", v[3], k=5)
    assert t.num_rows == 5
    assert t.column("id")[0].as_py() == 3
    # bf16 storage default: self-distance ~0 up to bf16 rounding
    assert t.column("score")[0].as_py() < 0.1


def test_batch_queries_and_query_index(client):
    v = _vecs(30, 8, seed=1)
    client.write("e2e_b", np.arange(30), v)
    t = client.search("e2e_b", vectors=v[:3], k=2)
    qi = t.column("query_index").to_pylist()
    assert sorted(set(qi)) == [0, 1, 2]


def test_filters_over_wire(client):
    v = _vecs(40, 8, seed=2)
    client.write(
        "e2e_f", np.arange(40), v, columns={"price": np.arange(40.0)}
    )
    t = client.search(
        "e2e_f", v[0], k=5,
        filters=[{"field": "price", "op": "<", "value": "10"}],
    )
    assert all(i < 10 for i in t.column("id").to_pylist())


def test_delete_action(client):
    v = _vecs(20, 8, seed=3)
    client.write("e2e_d", np.arange(20), v)
    assert client.delete("e2e_d", [0, 1]) == 2
    t = client.search("e2e_d", v[0], k=3)
    assert 0 not in t.column("id").to_pylist()


def test_search_by_id_action(client):
    v = _vecs(25, 8, seed=4)
    client.write("e2e_s", np.arange(25), v)
    res = client.search_by_id("e2e_s", 7, k=3)
    assert res["ids"][0] == 7


def test_hybrid_search_action(client):
    v = _vecs(30, 8, seed=5)
    texts = [f"document about {'apples' if i % 2 else 'oranges'} {i}"
             for i in range(30)]
    client.write("e2e_h", np.arange(30), v, columns={"text": np.array(texts)})
    res = client.hybrid_search("e2e_h", vector=v[4], text_query="apples",
                               k=5, alpha=0.5)
    assert len(res["ids"]) == 5
    # sparse-only search returns apple docs (odd ids)
    res2 = client.hybrid_search("e2e_h", text_query="apples", k=5, alpha=0.0)
    assert all(i % 2 == 1 for i in res2["ids"])


def test_graph_actions(client):
    v = _vecs(10, 8, seed=6)
    client.write("e2e_g", np.arange(10), v)
    client.add_edge("e2e_g", 1, 2, "rel", 1.0)
    client.add_edge("e2e_g", 2, 3, "rel", 1.0)
    path = client.traverse_graph("e2e_g", 1, 3)
    assert path == [1, 2, 3]


def test_scan_and_discovery(client):
    v = _vecs(15, 8, seed=7)
    client.write("e2e_scan", np.arange(15), v)
    t = client.scan("e2e_scan")
    assert t.num_rows == 15
    assert "e2e_scan" in client.list_namespaces()
    assert client.check_readiness()["status"] == "READY"
    st = client.cluster_status()
    assert st["self"]["status"] == "alive"


def test_string_ids_over_wire(client):
    v = _vecs(10, 8, seed=8)
    ids = np.array([f"doc-{i}" for i in range(10)])
    client.write("e2e_str", ids, v)
    t = client.search("e2e_str", v[2], k=1)
    assert t.column("id")[0].as_py() == "doc-2"


def test_metric_metadata_over_wire(client):
    v = _vecs(20, 8, seed=9)
    client.write("e2e_cos", np.arange(20), v, metric="cosine")
    t = client.search("e2e_cos", v[5] * 3.0, k=1)  # scaled: cosine match
    assert t.column("id")[0].as_py() == 5


def test_include_vectors(client):
    v = _vecs(10, 8, seed=10)
    client.write("e2e_iv", np.arange(10), v)
    t = client.search("e2e_iv", v[1], k=2, include_vectors=True)
    assert "vector" in t.column_names
    got = np.asarray(t.column("vector")[0].as_py(), dtype=np.float32)
    np.testing.assert_allclose(got, v[1], atol=2e-2)  # bf16 storage


def test_bad_requests(client):
    import pyarrow.flight as flight

    with pytest.raises(flight.FlightError):
        client.search("nonexistent", _vecs(1, 8)[0], k=3)
    with pytest.raises(flight.FlightError):
        t = client._dc().do_get(flight.Ticket(b"not json")).read_all()


def test_do_exchange_ingest(client):
    v = _vecs(30, 8, seed=20)
    total = client.exchange_ingest(
        "e2e_ex",
        [(np.arange(0, 15), v[:15]), (np.arange(15, 30), v[15:])],
    )
    assert total == 30
    t = client.search("e2e_ex", v[7], k=1)
    assert t.column("id")[0].as_py() == 7


def test_do_exchange_search(client):
    v = _vecs(40, 8, seed=21)
    client.write("e2e_exs", np.arange(40), v)
    outs = client.exchange_search("e2e_exs", [v[:3], v[3:5]], k=2)
    assert len(outs) == 2
    first = outs[0]
    assert set(first.column("query_index").to_pylist()) == {0, 1, 2}
    top = [r for r in first.to_pylist() if r["query_index"] == 0][0]
    assert top["id"] == 0


def test_health_action(client):
    h = client._action("health", {})
    assert h["status"] == "healthy"
    assert h["checks"]["device"]["healthy"]


def test_sanitizer_rejects_bad_names(client):
    import pyarrow.flight as flight

    v = _vecs(3, 8)
    with pytest.raises(flight.FlightError):
        client.write("../evil", np.arange(3), v)
    with pytest.raises(flight.FlightError):
        client.search("ok", v[0], k=999_999)


def test_create_namespace_with_index_type(client):
    client.create_namespace("nope")  # legacy form: lazy creation
    import json
    import pyarrow.flight as flight

    # eager creation with an explicit quantized index
    body = json.dumps({"name": "e2e_pq", "dim": 32, "index": "pq",
                       "pq_m": 8}).encode()
    list(client._mc().do_action(flight.Action("CreateNamespace", body)))
    v = _vecs(300, 32, seed=30)
    client.write("e2e_pq", np.arange(300), v)
    t = client.search("e2e_pq", v[5], k=3)
    assert t.column("id")[0].as_py() == 5
    st = client.cluster_status()
    assert st["datasets"]["e2e_pq"]["index_kind"] == "pq"
    # the SDK's typed form of the same action (index params forwarded,
    # here sq8r's n_clusters)
    client.create_namespace("e2e_sq8r", dim=32, index="sq8r",
                            n_clusters=16)
    client.write("e2e_sq8r", np.arange(300), v)
    t = client.search("e2e_sq8r", v[7], k=3)
    assert t.column("id")[0].as_py() == 7
    st = client.cluster_status()
    assert st["datasets"]["e2e_sq8r"]["index_kind"] == "sq8r"


def test_scan_streams_in_chunks(client):
    """DoGet scan must stream ~2MB record batches, not one table
    (reference: doget_pipeline.go:33, adaptive_chunk_strategy.go:10)."""
    import pyarrow as pa

    v = _vecs(3000, 64, seed=11)
    client.write("bigscan", np.arange(3000), v)
    # shrink the chunk target so the test exercises multi-batch streams
    from longbow_tpu.serving import flight_server as fs

    old = fs.LongbowFlightServer.SCAN_CHUNK_BYTES
    fs.LongbowFlightServer.SCAN_CHUNK_BYTES = 64 * 1024
    try:
        import json
        import pyarrow.flight as flight

        reader = client._dc().do_get(
            flight.Ticket(json.dumps({"name": "bigscan"}).encode())
        )
        batches = [c.data for c in reader]
    finally:
        fs.LongbowFlightServer.SCAN_CHUNK_BYTES = old
    assert len(batches) > 1  # streamed, not materialized
    total = sum(b.num_rows for b in batches)
    assert total == 3000
    tbl = pa.Table.from_batches(batches)
    got = set(tbl.column("id").to_pylist())
    assert got == set(range(3000))


def test_filtered_scan_with_metadata_columns(client):
    """Reference SDK download_arrow(dataset, filter=[...]) sends
    {"name", "filters"} as a DoGet ticket and expects metadata columns
    in the stream (longbowclientsdk client.py:228-291)."""
    v = _vecs(30, 8, seed=21)
    client.write(
        "e2e_dl", np.arange(30), v,
        columns={
            "price": np.arange(30.0),
            "category": np.asarray(
                ["a" if i % 2 == 0 else "b" for i in range(30)]
            ),
        },
    )
    t = client.scan("e2e_dl")
    assert set(t.column_names) >= {"id", "vector", "price", "category"}
    assert t.num_rows == 30
    got = dict(zip(t.column("id").to_pylist(), t.column("price").to_pylist()))
    assert got[7] == 7.0
    cats = dict(
        zip(t.column("id").to_pylist(), t.column("category").to_pylist())
    )
    assert cats[4] == "a" and cats[5] == "b"
    # filtered download: numeric predicate
    t = client.scan(
        "e2e_dl",
        filters=[{"field": "price", "op": "<", "value": "10"}],
    )
    assert t.num_rows == 10
    assert all(p < 10 for p in t.column("price").to_pylist())
    # filtered download: string equality
    t = client.scan(
        "e2e_dl",
        filters=[{"field": "category", "op": "=", "value": "a"}],
    )
    assert t.num_rows == 15
    # streaming variant yields record batches
    batches = list(
        client.scan_stream(
            "e2e_dl",
            filters=[{"field": "price", "op": ">=", "value": "20"}],
        )
    )
    assert sum(b.num_rows for b in batches) == 10


def test_force_snapshot_and_get_info(client, tmp_path_factory):
    """ForceSnapshot action + GetFlightInfo parity with the reference
    SDK (client.py:349-369)."""
    v = _vecs(12, 8, seed=22)
    client.write("e2e_info", np.arange(12), v)
    info = client.get_info("e2e_info")
    assert info["total_records"] == 12
    assert "vector" in info["schema"]
    # no persist_dir on this store: ForceSnapshot reports, not crashes
    out = client.snapshot()
    assert out["ok"] is False and "persist" in out["error"]


def test_force_snapshot_persists(tmp_path):
    from longbow_tpu.serving.flight_server import serve

    store = VectorStore(persist_dir=str(tmp_path))
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    try:
        c = LongbowClient("127.0.0.1")
        c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
        c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
        c.connect()
        c.write("snapme", np.arange(8), _vecs(8, 8, seed=23))
        assert c.snapshot()["ok"] is True
        c.close()
    finally:
        handle.shutdown()
    # a fresh store recovers the snapshotted rows
    store2 = VectorStore(persist_dir=str(tmp_path))
    assert store2.get("snapme").live_count == 8


def test_async_ingest_busy_then_ready():
    """Async ingest: DoPut acks on enqueue; check_readiness flips
    BUSY -> READY as the queue drains (reference:
    store_actions.go:57-101)."""
    import time

    from longbow_tpu.serving.flight_server import LongbowFlightServer, serve
    from longbow_tpu.serving.ingest import IngestQueue

    store = VectorStore()
    q = IngestQueue(store)
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    handle.data_server.ingest = q
    handle.meta_server.ingest = q
    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
    c.connect()
    try:
        v = _vecs(500, 16, seed=12)
        c.write("async", np.arange(500), v)
        # wait for drain; status must end READY with depth 0
        t0 = time.time()
        while time.time() - t0 < 30:
            r = c.check_readiness()
            if r["status"] == "READY" and r.get("index_queue_depth") == 0:
                break
            time.sleep(0.05)
        assert r["status"] == "READY", r
        assert store.get("async").live_count == 500
        tbl = c.search("async", v[3], k=1)
        assert tbl.column("id")[0].as_py() == 3
        assert not q.errors
    finally:
        c.close()
        q.close()
        handle.shutdown()


def test_degraded_serving_fallback_cache():
    """Severe degradation serves stale cached results; critical rejects
    uncached queries (reference: resilience/graceful_degradation.go)."""
    import pyarrow.flight as flight

    from longbow_tpu.serving.middleware import (
        DEGRADATION_CRITICAL,
        DEGRADATION_NONE,
        DEGRADATION_SEVERE,
        FallbackCache,
        GracefulDegradation,
        MiddlewareChain,
    )

    mw = MiddlewareChain()
    gd = GracefulDegradation()
    mw.degradation = gd
    mw.fallback = FallbackCache(ttl_s=60.0)
    store = VectorStore()
    handle = serve(
        store, data_port=0, meta_port=0, host="127.0.0.1",
        middleware_chain=mw,
    )
    try:
        c = LongbowClient("127.0.0.1")
        c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
        c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
        c.connect()
        v = _vecs(30, 8, seed=9)
        c.write("deg", np.arange(30), v)
        t1 = c.search("deg", v[5], k=3)  # healthy: populates fallback
        assert t1.column("id")[0].as_py() == 5

        gd.set_level(DEGRADATION_SEVERE)
        # mutate the store: a fresh search would see the delete, the
        # fallback path must serve the STALE cached answer
        store.delete("deg", [5])
        t2 = c.search("deg", v[5], k=3)
        assert t2.column("id").to_pylist() == t1.column("id").to_pylist()

        gd.set_level(DEGRADATION_CRITICAL)
        with pytest.raises(flight.FlightError):
            c.search("deg", v[20] + 100.0, k=3)  # uncached -> rejected

        gd.set_level(DEGRADATION_NONE)
        t3 = c.search("deg", v[5], k=3)  # healthy again: fresh result
        assert 5 not in t3.column("id").to_pylist()
        c.close()
    finally:
        handle.shutdown()


def test_doput_slow_down_metadata_and_mesh_status():
    """Backpressure parity (reference docs/admin_api.md): DoPut acks
    {"status": "slow_down", "reason": "wal_pressure"} metadata when
    the ingest queue is >80% full; MeshStatus answers on every node."""
    import time

    from longbow_tpu.serving.flight_server import serve
    from longbow_tpu.serving.ingest import IngestQueue

    store = VectorStore()
    q = IngestQueue(store, max_depth=4)
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    handle.data_server.ingest = q
    handle.meta_server.ingest = q
    # stall the worker so the queue backs up deterministically
    orig_apply = q._apply
    release = time.time() + 4.0

    def slow_apply(*a, **kw):
        while time.time() < release:
            time.sleep(0.05)
        return orig_apply(*a, **kw)

    q._apply = slow_apply
    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
    c.connect()
    try:
        v = _vecs(10, 8, seed=30)
        saw_slow_down = False
        for i in range(4):
            c.write(f"press", np.arange(i * 10, i * 10 + 10), v)
            st = c.last_put_status
            if st and st.get("status") == "slow_down":
                assert st["reason"] == "wal_pressure"
                saw_slow_down = True
                break
        assert saw_slow_down, "no slow_down ack at >80% queue pressure"
        # MeshStatus: no cluster configured -> empty member list, not
        # an unknown-action error
        ms = c._action("MeshStatus", {})
        assert ms["members"] == []
    finally:
        c.close()
        q.close()
        handle.shutdown()


def test_list_namespaces_action_and_metric_aliases(client):
    """ListNamespaces returns the reference's response shape
    (docs/namespaces.md), and the reference's exact wire metric names
    ('euclidean', 'dot_product') are accepted."""
    import json

    import pyarrow.flight as flight

    out = client._action("ListNamespaces", {})
    assert "namespaces" in out and out["count"] == len(out["namespaces"])
    v = _vecs(10, 8, seed=31)
    client.write("e2e_dp", np.arange(10), v, metric="dot_product")
    t = client.search("e2e_dp", v[4], k=1)
    assert t.num_rows == 1
    client.write("e2e_eu", np.arange(10), v, metric="euclidean")
    t = client.search("e2e_eu", v[4], k=1)
    assert t.column("id")[0].as_py() == 4


def test_admin_action_parity(client):
    """The reference's remaining admin actions (servers.go:169-189):
    MeshIdentity, DiscoveryStatus, namespace counters."""
    import pyarrow.flight as flight

    me = client._action("MeshIdentity", {})
    assert "id" in me and "status" in me
    disc = client._action("DiscoveryStatus", {})
    assert disc["provider"] in ("static", "dns", "kubernetes",
                                "multicast", "none")
    assert isinstance(disc["peers"], list)
    v = _vecs(5, 8, seed=32)
    client.write("nsa/alpha", np.arange(5), v)
    client.write("nsa/beta", np.arange(5), v)
    total = client._action("GetTotalNamespaceCount", {})
    assert total["count"] >= 1
    cnt = client._action("GetNamespaceDatasetCount", {"name": "nsa"})
    assert cnt == {"namespace": "nsa", "count": 2}
    with pytest.raises(flight.FlightError):
        client._action("GetNamespaceDatasetCount", {"name": "missing"})


def test_scan_consistent_across_concurrent_compaction():
    """A streaming scan must keep returning the vectors its captured
    row list referred to even when compaction swaps the index (with
    remapped row numbers) mid-stream."""
    import json

    import pyarrow as pa
    import pyarrow.flight as flight

    from longbow_tpu.serving import flight_server as fs
    from longbow_tpu.serving.flight_server import serve
    from longbow_tpu.store.compaction import compact_dataset

    store = VectorStore()
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
    c.connect()
    old = fs.LongbowFlightServer.SCAN_CHUNK_BYTES
    fs.LongbowFlightServer.SCAN_CHUNK_BYTES = 16 * 1024
    try:
        v = _vecs(2000, 32, seed=40)
        c.write("sc", np.arange(2000), v)
        c.delete("sc", list(range(0, 2000, 2)))  # fragment half
        reader = c._dc().do_get(
            flight.Ticket(json.dumps({"name": "sc"}).encode())
        )
        batches = [next(reader).data]  # stream is live...
        compact_dataset(store.get("sc"))  # ...now rows remap
        for chunk in reader:
            batches.append(chunk.data)
        tbl = pa.Table.from_batches(batches)
    finally:
        fs.LongbowFlightServer.SCAN_CHUNK_BYTES = old
        c.close()
        handle.shutdown()
    ids = tbl.column("id").to_pylist()
    assert sorted(ids) == sorted(range(1, 2000, 2))
    got = np.asarray(
        tbl.column("vector").combine_chunks().values, np.float32
    ).reshape(-1, 32)
    want = v[np.asarray(ids)]
    assert np.abs(got - want).max() < 0.05  # bf16 rounding only


def test_client_errors_do_not_open_the_breaker():
    """A client polling a missing dataset (or sending bad requests)
    must never open the serving circuit breaker — breakers protect
    against server failure; successes reset the count (review finding:
    record_success had no serving-edge callers, so 10 client typos
    EVER produced a rolling total outage)."""
    import pyarrow.flight as flight

    from longbow_tpu.serving.flight_server import serve
    from longbow_tpu.serving.middleware import MiddlewareChain

    store = VectorStore()
    mw = MiddlewareChain(breaker_threshold=3)
    handle = serve(
        store, data_port=0, meta_port=0, host="127.0.0.1",
        middleware_chain=mw,
    )
    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
    c.connect()
    try:
        v = _vecs(10, 8, seed=50)
        c.write("ok", np.arange(10), v)
        for _ in range(10):  # way past the threshold
            with pytest.raises(flight.FlightError):
                c.search("nope_missing", v[0], k=1)
        # healthy requests still admitted: breaker stayed closed
        t = c.search("ok", v[3], k=1)
        assert t.column("id")[0].as_py() == 3
    finally:
        c.close()
        handle.shutdown()


def test_ingest_bad_group_does_not_drop_good_group():
    """Group-commit isolation: a dim-mismatched batch in the same
    coalescing window must not silently drop another dataset's acked
    batch (review finding: one try wrapped all groups)."""
    import time as _t

    from longbow_tpu.serving.ingest import IngestQueue

    store = VectorStore()
    store.put("a", np.arange(5), _vecs(5, 8))  # dataset 'a' is 8-dim
    q = IngestQueue(store, max_depth=16)
    # stall the worker so both jobs coalesce into one window
    orig_apply = q._apply
    release = _t.time() + 1.0

    def slow_apply(*args, **kw):
        while _t.time() < release:
            _t.sleep(0.02)
        return orig_apply(*args, **kw)

    q._apply = slow_apply
    q.submit("a", np.arange(5, 10), _vecs(5, 16, seed=1), None, None,
             _t.time())  # WRONG dim -> rejected at apply
    q.submit("b", np.arange(10), _vecs(10, 8, seed=2), None, None,
             _t.time())  # must still land
    assert q.drain(timeout_s=30)
    assert store.get("b").live_count == 10  # good group survived
    assert q.errors  # bad group surfaced loudly
    q.close()


def test_unix_socket_mirror_roundtrip(tmp_path):
    """AF_UNIX mirror listeners share the TCP servers' store: writes
    over the unix socket are visible over TCP and vice versa (the
    host-local fast path — loopback TCP measured 0.5-0.9 GB/s vs
    1.3-1.6 GB/s over unix sockets, tools/flight_floor_probe.py)."""
    store = VectorStore()
    sock_dir = str(tmp_path / "socks")
    handle = serve(
        store, data_port=0, meta_port=0, host="127.0.0.1",
        unix_socket_dir=sock_dir,
    )
    try:
        cu = LongbowClient(f"unix:{sock_dir}").connect()
        v = _vecs(40, 8)
        cu.write("usock", np.arange(40), v)
        t = cu.search("usock", v[7], k=3)
        assert t.column("id")[0].as_py() == 7
        # same rows visible through the TCP listener
        ct = LongbowClient("127.0.0.1")
        ct.data_location = f"grpc://127.0.0.1:{handle.data_server.port}"
        ct.meta_location = f"grpc://127.0.0.1:{handle.meta_server.port}"
        ct.connect()
        t2 = ct.search("usock", v[7], k=3)
        assert t2.column("id")[0].as_py() == 7
        # scan back over unix
        got = cu.scan("usock")
        assert got.num_rows == 40
        cu.close()
        ct.close()
    finally:
        handle.shutdown()


def test_batched_vector_search_via_sdk(client):
    """A [B, D] batch passed to client.search must become a 'vectors'
    ticket (ravel()ing it read as one B*D-dim query and the server
    rejected the dimension)."""
    v = _vecs(40, 16, seed=4)
    client.write("e2e_batch", np.arange(40), v)
    t = client.search("e2e_batch", v[:5] + 0.001, k=3)
    assert t.num_rows == 15
    qi = t.column("query_index").to_numpy()
    assert sorted(set(qi.tolist())) == [0, 1, 2, 3, 4]
    ids = t.column("id").to_numpy(zero_copy_only=False)
    for b in range(5):
        assert ids[qi == b][0] == b  # nearest neighbor of v[b]+eps


def test_large_batch_auto_routes_via_exchange(client):
    """B >= 256 batches ride DoExchange transparently (the JSON ticket
    measured 253ms for a 2048-query batch vs 8ms via Arrow exchange);
    result contract must match the ticket path."""
    v = _vecs(300, 16, seed=6)
    client.write("e2e_xbatch", np.arange(300), v)
    t = client.search("e2e_xbatch", v[:256] + 0.001, k=2)
    assert set(t.column_names) == {"query_index", "id", "score"}
    assert t.num_rows == 512
    qi = t.column("query_index").to_numpy()
    ids = t.column("id").to_numpy(zero_copy_only=False)
    for b in (0, 100, 255):
        assert ids[qi == b][0] == b


def test_compile_window_timeouts_do_not_trip_breaker():
    """A coalesced dispatch that is still running (first-shape compile)
    times requests out — those must NOT open the circuit breaker (a
    single ~30s on-chip compile produced 10 consecutive timeouts and
    took the whole node down for every client), while genuine server
    failures still must."""
    import json as _json

    import pyarrow.flight as flight

    from longbow_tpu.serving.flight_server import LongbowFlightServer
    from longbow_tpu.serving.middleware import MiddlewareChain

    store = VectorStore()
    store.put("d", np.arange(10), _vecs(10, 8))
    mw = MiddlewareChain(breaker_threshold=3)
    srv = LongbowFlightServer(
        store, "grpc://127.0.0.1:0", middleware_chain=mw
    )
    try:
        ticket = flight.Ticket(
            _json.dumps(
                {"search": {"dataset": "d", "k": 2,
                            "vector": [0.0] * 8}}
            ).encode()
        )

        class _TimeoutSearch:
            def search(self, *a, **kw):
                raise TimeoutError("coalesced search timed out")

        srv.coalescer = _TimeoutSearch()
        for _ in range(6):
            with pytest.raises(Exception):
                srv.do_get(None, ticket)
        assert mw.breaker.allow()  # still CLOSED after 6 timeouts

        class _BrokenSearch:
            def search(self, *a, **kw):
                raise RuntimeError("device fell over")

        srv.coalescer = _BrokenSearch()
        for _ in range(3):
            with pytest.raises(Exception):
                srv.do_get(None, ticket)
        assert not mw.breaker.allow()  # genuine failures DO open it
    finally:
        srv.shutdown()


def test_declared_namespace_listed_before_first_put(client):
    """CreateNamespace without a dim must already show in ListFlights /
    ListNamespaces (the reference creates eagerly; its ops_test.py
    asserts the round trip), and materialize lazily on first put."""
    client.create_namespace("declared-ns")
    names = [
        f.descriptor.path[0].decode()
        for f in client._mc().list_flights()
    ] if hasattr(client, "_mc") else None
    if names is None:  # fall back to the SDK surface
        names = client.list_namespaces()
    assert "declared-ns" in names
    # materializes on first put, still listed exactly once
    client.write("declared-ns", np.arange(5), _vecs(5, 8, seed=2))
    names2 = client.list_namespaces()
    assert names2.count("declared-ns") == 1
    client.delete_namespace("declared-ns")
    assert "declared-ns" not in client.list_namespaces()


def test_exchange_unknown_command_acks(client, server):
    """The reference's DoExchange falls back to an ack-per-message loop
    for unrecognized commands (its ops_test.py sends b\"fetch\") —
    do_exchange.go:186-260. Ours must not error."""
    import pyarrow as pa
    import pyarrow.flight as flight

    dc = flight.connect(f"grpc://127.0.0.1:{server.data_server.port}")
    descriptor = flight.FlightDescriptor.for_command(b"fetch")
    writer, reader = dc.do_exchange(descriptor)
    schema = pa.schema([("data", pa.string())])
    writer.begin(schema)
    writer.write_table(pa.table({"data": pa.array(["ping"])}))
    writer.done_writing()
    acks = 0
    while True:
        try:
            chunk = reader.read_chunk()
        except StopIteration:
            break
        if chunk.app_metadata is not None:
            assert chunk.app_metadata.to_pybytes() == b"ack"
            acks += 1
    assert acks >= 1
    writer.close()
    dc.close()


def test_declared_namespace_survives_restart(tmp_path):
    """Declared (dim-less) namespaces persist next to the WAL — the
    reference's eager creation is durable, so a restart must not lose
    the name (review finding)."""
    from longbow_tpu.serving.flight_server import LongbowFlightServer

    store = VectorStore(persist_dir=str(tmp_path))
    srv = LongbowFlightServer(store, "grpc://127.0.0.1:0")
    try:
        import json as _json

        import pyarrow.flight as flight

        srv._do_action(
            flight.Action(
                "CreateNamespace", _json.dumps({"name": "durable-ns"}).encode()
            )
        )
    finally:
        srv.shutdown()
    from longbow_tpu.serving.flight_server import LongbowFlightServer as _S

    store2 = VectorStore(persist_dir=str(tmp_path))
    srv2 = _S(store2, "grpc://127.0.0.1:0")
    try:
        names = [
            f.descriptor.path[0].decode()
            for f in srv2.list_flights(None, None)
        ]
        assert "durable-ns" in names
    finally:
        srv2.shutdown()
