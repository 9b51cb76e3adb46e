"""Security, snapshot backends, health, tracing spans."""
import json

import numpy as np
import pytest

from longbow_tpu.query.parser import VectorSearchRequest
from longbow_tpu.serving.security import (
    AuditLogger,
    SanitizationError,
    sanitize_dataset_name,
    sanitize_search_request,
)
from longbow_tpu.storage.backends import AsyncBackend, LocalBackend
from longbow_tpu.utils.health import HealthManager, device_checker


def test_sanitize_dataset_name():
    assert sanitize_dataset_name("ns1/docs-v2.1") == "ns1/docs-v2.1"
    for bad in ("", "../etc/passwd", "/abs", "a b", "x" * 300, "a;b"):
        with pytest.raises(SanitizationError):
            sanitize_dataset_name(bad)


def test_sanitize_search_request():
    req = VectorSearchRequest(dataset="ok", vector=[1.0], k=5)
    sanitize_search_request(req)
    with pytest.raises(SanitizationError):
        sanitize_search_request(
            VectorSearchRequest(dataset="ok", vector=[1.0], k=999_999)
        )
    with pytest.raises(SanitizationError):
        sanitize_search_request(
            VectorSearchRequest(dataset="../bad", vector=[1.0], k=5)
        )


def test_audit_logger(tmp_path):
    log = AuditLogger(tmp_path / "audit.jsonl")
    log.record("put", "docs", {"rows": 10})
    log.record("delete", "docs", {"ids": [1]})
    lines = (tmp_path / "audit.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["op"] == "put"


def test_local_snapshot_backend(tmp_path):
    src = tmp_path / "snap"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    be = LocalBackend(tmp_path / "remote")
    be.upload(src, "snap-001")
    assert be.list_snapshots() == ["snap-001"]
    dst = tmp_path / "restored"
    assert be.download("snap-001", dst)
    assert (dst / "a.txt").read_text() == "hello"
    assert not be.download("nope", tmp_path / "x")


def test_async_backend(tmp_path):
    src = tmp_path / "snap"
    src.mkdir()
    (src / "a").write_text("x")
    be = AsyncBackend(LocalBackend(tmp_path / "remote"))
    be.upload(src, "s1")
    be.wait()
    assert be.list_snapshots() == ["s1"]


def test_health_manager_failure_path():
    hm = HealthManager()
    hm.register("ok", lambda: {"healthy": True})
    hm.register("boom", lambda: 1 / 0)
    out = hm.check()
    assert out["status"] == "unhealthy"
    assert "error" in out["checks"]["boom"]
    hm2 = HealthManager()
    hm2.register("dev", device_checker())
    assert hm2.check()["status"] == "healthy"


def test_tracing_span_records_metric():
    from longbow_tpu.metrics.registry import MetricsRegistry
    from longbow_tpu.utils.tracing import span

    reg = MetricsRegistry()
    with span("TestOp", reg):
        pass
    from prometheus_client import generate_latest

    text = generate_latest(reg.registry)
    # spans count into the reference's trace counter and a duration
    # histogram, labeled by span name (docs/metrics.md Observability)
    assert b'longbow_trace_spans_total{name="TestOp"} 1.0' in text
    assert b'longbow_tpu_span_duration_seconds_count{name="TestOp"}' in text


def test_cascade_fusion():
    """Cascade: dense gates the candidates, sparse re-ranks within
    (reference: hybrid pipeline cascade stage)."""
    from longbow_tpu.hybrid.fusion import fuse_cascade

    dense = [("a", 0.9), ("b", 0.8), ("c", 0.1)]
    sparse = [("b", 5.0), ("c", 1.0), ("z", 9.0)]  # z not in dense -> excluded
    out = fuse_cascade(dense, sparse, alpha=0.5, k=3)
    docs = [d for d, _ in out]
    assert "z" not in docs
    assert docs[0] == "b"  # dense-good + sparse-boosted wins


def test_graph_navigator_parity():
    """A*, parallel BFS, path cache, analytics (reference:
    navigator_strategy_astar.go:11, navigator_strategy_parallel.go,
    graph_navigator.go:149, graph_analytics.go)."""
    import numpy as np

    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    rng = np.random.default_rng(0)
    v = rng.standard_normal((10, 8), np.float32)
    vs.put("g", np.arange(10), v)
    for a, b in [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5)]:
        vs.add_edge("g", a, b)
    # strategies agree on reachability
    assert vs.traverse_graph("g", 0, 3, 5, strategy="bfs")
    assert vs.traverse_graph("g", 0, 3, 5, strategy="weighted")
    p = vs.traverse_graph("g", 0, 3, 5, strategy="astar")
    assert p[0] == 0 and p[-1] == 3
    # parallel multi-source BFS
    out = vs.traverse_graph("g", [0, 5], max_hops=2, strategy="parallel")
    nodes = {row[0] for row in out}
    assert {0, 1, 4, 5} <= nodes
    # path cache hit: same query returns identical object state fast
    assert vs.traverse_graph("g", 0, 3, 5, strategy="bfs") == \
        vs.traverse_graph("g", 0, 3, 5, strategy="bfs")
    a = vs.graph_analytics("g")
    assert a["edges"] == 6 and a["nodes"] == 6
    assert a["components"] == 1


def test_disk_graph_store(tmp_path):
    """Disk-backed edge store with crash-safe replay (reference:
    disk_graph.go:19)."""
    import numpy as np

    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore(persist_dir=tmp_path)
    vs.get_or_create("dg", 8, index_params={"graph_disk": True})
    vs.put("dg", np.arange(5),
           np.random.default_rng(1).standard_normal((5, 8), np.float32))
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        vs.add_edge("dg", a, b)
    assert vs.traverse_graph("dg", 0, 3, 5) == [0, 1, 2, 3]
    st = vs.graph_stats("dg")
    assert st["edges"] == 3 and "disk" in st
    vs.close()


def test_import_graph_initializes_no_backend():
    """Importing the package must NOT initialize a jax backend: a
    module-level jnp constant pins the process platform before
    serve.py's LONGBOW_FORCE_CPU can switch it, wedging multi-process
    tests on the single-TPU relay (round-3 coalescer-hang root cause)."""
    import subprocess
    import sys

    code = (
        "import longbow_tpu.serve, longbow_tpu.index.graph_build,"
        " longbow_tpu.index.ivf, longbow_tpu.index.factory,"
        " longbow_tpu.hybrid.bm25, longbow_tpu.distributed.cluster;"
        "import jax;"
        "import sys;"
        "sys.exit(1 if jax._src.xla_bridge._backends else 0)"
    )
    r = subprocess.run([sys.executable, "-c", code], timeout=240)
    assert r.returncode == 0, "package import initialized a jax backend"
