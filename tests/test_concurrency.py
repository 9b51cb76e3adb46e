"""Concurrent ingest + search stress (reference: hnsw_concurrency_test.go,
arrow_insert_concurrent_test.go, -race CI target). JAX state is
functional so device races can't exist; these exercise the host-side
bookkeeping (dataset maps, primary index, caches) under threads.
"""
import threading

import numpy as np
import pytest

from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import serve
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_concurrent_puts_and_searches_store():
    vs = VectorStore()
    vs.put("c", np.arange(100), _vecs(100, 16, 0))
    errors = []

    def writer(tid):
        try:
            for i in range(10):
                base = 1000 * (tid + 1) + i * 50
                vs.put("c", np.arange(base, base + 50), _vecs(50, 16, tid))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher(tid):
        try:
            q = _vecs(4, 16, 100 + tid)
            for _ in range(20):
                ids, scores, ok = vs.search("c", q, 5, use_cache=False)
                assert ids.shape == (4, 5)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(3)]
    threads += [threading.Thread(target=searcher, args=(t,)) for t in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert vs.get("c").live_count == 100 + 3 * 10 * 50


def test_concurrent_clients_over_wire():
    store = VectorStore()
    h = serve(store, data_port=0, meta_port=0, host="127.0.0.1")
    errors = []

    def worker(tid):
        try:
            c = LongbowClient("127.0.0.1")
            c.data_location = f"grpc://127.0.0.1:{h.data_server.port}"
            c.meta_location = f"grpc://127.0.0.1:{h.meta_server.port}"
            c.connect()
            v = _vecs(50, 8, tid)
            c.write(f"w{tid}", np.arange(50), v)
            t = c.search(f"w{tid}", v[3], k=3)
            assert t.column("id")[0].as_py() == 3
            # cross-dataset reads while others write
            for name in store.list_datasets():
                c.search(name, v[0], k=1)
            c.close()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    h.shutdown()
    assert not errors, errors


def test_concurrent_deletes_and_compaction():
    from longbow_tpu.store.compaction import CompactionWorker

    vs = VectorStore()
    vs.put("d", np.arange(500), _vecs(500, 8, 0))
    w = CompactionWorker(vs, frag_threshold=0.2)
    errors = []

    def deleter():
        try:
            for i in range(0, 300, 30):
                vs.delete("d", list(range(i, i + 30)))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def compactor():
        try:
            for _ in range(5):
                w.run_once()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=deleter),
               threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    w.run_once()
    assert vs.get("d").live_count == 200
