"""The docs/USAGE.md example flow, run end-to-end against a live
server — the documentation's code paths must keep working verbatim
(SDK tour: eager namespace, metadata ingest, filtered/batch search,
scan/stream, hybrid, GraphRAG, lifecycle)."""
import socket
import threading
import time

import numpy as np
import pytest

from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import LongbowFlightServer
from longbow_tpu.store.vector_store import VectorStore


@pytest.fixture(scope="module")
def server():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = LongbowFlightServer(VectorStore(), f"grpc://127.0.0.1:{port}")
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    time.sleep(0.5)
    yield port
    srv.shutdown()


def test_usage_md_sdk_tour(server):
    c = LongbowClient("127.0.0.1", server, server)
    n, d = 2000, 32
    c.create_namespace("docs", dim=d, index="flat", metric="cosine",
                       capacity=4096)

    rng = np.random.default_rng(7)
    v = rng.standard_normal((n, d)).astype(np.float32)
    langs = np.array(["en", "de"] * (n // 2))
    stars = np.arange(n) % 5
    c.write("docs", ids=np.arange(n), vectors=v,
            columns={"lang": langs, "stars": stars})

    # plain search: table {id, score, query_index}, self-match first
    t = c.search("docs", v[0], k=10)
    assert t.num_rows == 10
    assert set(t.column_names) >= {"id", "score", "query_index"}
    assert t.column("id")[0].as_py() == 0

    # batch search: one round trip, rows per query
    t = c.search("docs", vectors=v[:8], k=5)
    assert t.num_rows == 40
    assert t.column("id")[0].as_py() == 0

    # filtered search with the documented operator aliases
    t = c.search("docs", v[0], k=10, filters=[
        {"field": "lang", "operator": "eq", "value": "en"},
        {"field": "stars", "operator": ">=", "value": 3},
    ])
    ids = [i.as_py() for i in t.column("id")]
    assert ids, "filtered search returned nothing"
    for i in ids:
        assert langs[i] == "en" and stars[i] >= 3

    # lookup / scan / stream (response: {ids, scores, query_index})
    r = c.search_by_id("docs", 42, k=5)
    assert r["ids"][0] == 42
    tbl = c.scan("docs", limit=100)
    assert tbl.num_rows == 100
    streamed = sum(b.num_rows for b in c.scan_stream("docs"))
    assert streamed == n

    # hybrid through the ticket path (text rides the same search)
    c.write("docs", ids=np.arange(n, n + 3),
            vectors=rng.standard_normal((3, d)).astype(np.float32),
            columns={"text": np.array([
                "tpu kernels go fast",
                "slow cpu loops",
                "tpu matmul kernels",
            ]), "lang": np.array(["en"] * 3),
               "stars": np.zeros(3, np.int64)})
    t = c.search("docs", v[0], k=5, text_query="tpu kernels", alpha=0.5)
    assert t.num_rows >= 1

    # GraphRAG: edges + traversal + graph-boosted ranking
    c.add_edge("docs", src=1, dst=2, edge_type="cites", weight=0.8)
    path = c.traverse_graph("docs", src=1, dst=2, max_hops=2)
    assert path == [1, 2]
    t = c.search("docs", v[1], k=5, graph_alpha=0.3, graph_depth=2)
    assert t.num_rows == 5

    # lifecycle
    assert c.delete("docs", [1, 2, 3]) == 3
    assert "docs" in c.list_namespaces()
    info = c.get_info("docs")
    assert info["total_records"] == n + 3 - 3
    assert c.delete_namespace("docs")
    c.close()
