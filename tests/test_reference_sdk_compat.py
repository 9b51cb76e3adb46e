"""The acid test for wire compatibility: the REFERENCE's own Python
SDK (longbowclientsdk, unmodified, imported straight from the
reference checkout) runs its full surface against a longbow-tpu
server — insert from dicts, search, filtered search, search-by-id,
filtered download, streaming download, snapshot, graph edges +
traverse (reference Path wire shape), per-id delete (stringified ids),
namespace ops.

Skipped when the reference checkout isn't present.
"""
import os
import sys
import time

import numpy as np
import pytest

REF_SDK = "/root/reference/longbowclientsdk/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SDK),
    reason="reference SDK checkout not available",
)


@pytest.fixture(scope="module")
def ref_client():
    from longbow_tpu.serving.flight_server import serve
    from longbow_tpu.store.vector_store import VectorStore

    sys.path.insert(0, REF_SDK)
    try:
        from longbow import LongbowClient  # the reference SDK
    finally:
        sys.path.remove(REF_SDK)
    store = VectorStore()
    handle = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    c = LongbowClient(
        f"grpc://127.0.0.1:{handle.data_server.port}",
        meta_uri=f"grpc://127.0.0.1:{handle.meta_server.port}",
    )
    c.connect()
    yield c, store
    c.close()
    handle.shutdown()


def test_reference_sdk_full_surface(ref_client):
    c, store = ref_client
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [
        {
            "id": i,
            "vector": vecs[i].tolist(),
            "price": float(i),
            "cat": "a" if i % 2 == 0 else "b",
        }
        for i in range(200)
    ]
    c.insert("refsdk", rows)
    t0 = time.time()
    while time.time() - t0 < 30:
        try:
            if c.get_info("refsdk")["total_records"] == 200:
                break
        except Exception:
            pass
        time.sleep(0.2)
    assert c.get_info("refsdk")["total_records"] == 200

    df = c.search("refsdk", vecs[7].tolist(), k=3)
    assert df["id"][0] == 7
    df = c.search(
        "refsdk", vecs[0].tolist(), k=5,
        filters=[{"field": "price", "operator": "<", "value": "10"}],
    )
    assert all(i < 10 for i in df["id"])
    assert c.search_by_id("refsdk", 7, k=3)["ids"][0] == 7

    tbl = c.download_arrow(
        "refsdk",
        filter=[{"field": "cat", "operator": "=", "value": "a"}],
    )
    assert tbl.num_rows == 100
    assert sum(b.num_rows for b in c.download_stream("refsdk")) == 200

    # graph: reference wire shapes (subject/predicate/object; traverse
    # returns a JSON list of Path{Nodes, Edges, Score})
    c.add_edge("refsdk", 1, "knows", 2, weight=1.0)
    c.add_edge("refsdk", 2, "knows", 3, weight=0.5)
    flat = c.traverse("refsdk", 1, max_hops=2)[0]
    assert any(p["Nodes"] == [1, 2] for p in flat)
    deep = [p for p in flat if p["Nodes"] == [1, 2, 3]]
    assert deep and abs(deep[0]["Score"] - 0.5) < 1e-6
    assert c.get_graph_stats("refsdk")["edges"] == 2

    # per-id delete with the SDK's stringified-int ids
    c.delete("refsdk", ids=[0, 1])
    t0 = time.time()
    while time.time() - t0 < 15:
        if c.get_info("refsdk")["total_records"] == 198:
            break
        time.sleep(0.2)
    assert c.get_info("refsdk")["total_records"] == 198

    # namespace ops: DeleteNamespace uses {"dataset": ...}
    c.create_namespace("refns")
    c.delete_namespace("refsdk")
    assert "refsdk" not in c.list_namespaces()
    assert "refsdk" not in store.list_datasets()
