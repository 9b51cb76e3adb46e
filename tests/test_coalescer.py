"""Search coalescing (serving/coalescer.py): concurrent requests share
one kernel dispatch; results match per-request searches exactly."""
import threading

import numpy as np

from longbow_tpu.query.parser import Filter
from longbow_tpu.serving.coalescer import SearchCoalescer, _Future
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def _mk_store():
    vs = VectorStore()
    v = _vecs(300, 16)
    vs.put("d", np.arange(300), v,
           columns={"par": (np.arange(300) % 2).astype(np.int64)})
    return vs, v


def test_coalesced_batch_matches_individual():
    vs, v = _mk_store()
    co = SearchCoalescer(vs, autostart=False)
    futs = []
    for i in range(6):
        f = _Future()
        co._q.put(("d", v[i * 3 : i * 3 + 3], 5, None, None, False,
                   True, f))
        futs.append(f)
    batch = [co._q.get_nowait() for _ in range(6)]
    co._drain(batch)
    assert co.dispatches == 1 and co.coalesced == 6
    for i, f in enumerate(futs):
        ids, scores, ok = f.get(5)
        want_ids, want_scores, want_ok = vs.search(
            "d", v[i * 3 : i * 3 + 3], 5, use_cache=False
        )
        assert (ids == want_ids).all()
        np.testing.assert_allclose(scores, want_scores, rtol=1e-5)


def test_incompatible_requests_split_groups():
    vs, v = _mk_store()
    co = SearchCoalescer(vs, autostart=False)
    f1, f2, f3 = _Future(), _Future(), _Future()
    flt = [Filter("par", "eq", "0")]
    co._q.put(("d", v[:2], 5, None, None, False, True, f1))
    co._q.put(("d", v[2:4], 5, flt, None, False, True, f2))
    co._q.put(("d", v[4:6], 5, None, None, False, True, f3))
    co._drain([co._q.get_nowait() for _ in range(3)])
    assert co.dispatches == 2  # {plain x2} + {filtered}
    ids2, _, ok2 = f2.get(5)
    for b in range(2):
        for j in range(5):
            if ok2[b, j]:
                assert ids2[b, j] % 2 == 0
    f1.get(5), f3.get(5)


def test_max_batch_row_ceiling():
    vs, v = _mk_store()
    co = SearchCoalescer(vs, max_batch=4, autostart=False)
    futs = [_Future() for _ in range(3)]
    for i, f in enumerate(futs):
        co._q.put(("d", v[i * 3 : i * 3 + 3], 2, None, None, False,
                   True, f))
    co._drain([co._q.get_nowait() for _ in range(3)])
    # 3 rows each, ceiling 4 -> no two requests fit together
    assert co.dispatches == 3
    for f in futs:
        f.get(5)


def test_error_propagates_to_all_futures():
    vs, v = _mk_store()
    co = SearchCoalescer(vs, autostart=False)
    f1, f2 = _Future(), _Future()
    co._q.put(("missing", v[:1], 5, None, None, False, True, f1))
    co._q.put(("missing", v[1:2], 5, None, None, False, True, f2))
    co._drain([co._q.get_nowait() for _ in range(2)])
    for f in (f1, f2):
        try:
            f.get(5)
            assert False, "expected KeyError"
        except KeyError:
            pass


def test_stop_fails_queued_futures_fast():
    """Requests still queued when the coalescer stops must get an
    error immediately, not block their callers for the 30s request
    timeout."""
    vs, v = _mk_store()
    co = SearchCoalescer(vs, autostart=False)
    fut = _Future()
    co._q.put(("d", v[:1], 5, None, None, False, True, fut))
    co._stop.set()
    co.start()
    co.stop()
    try:
        fut.get(5)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "stopped" in str(e)


def test_grouping_failure_fails_batch_not_hangs():
    """An exception in the grouping phase (e.g. a malformed filter
    object whose cache_key raises) must set_err on every future in the
    batch instead of orphaning them."""
    vs, v = _mk_store()
    co = SearchCoalescer(vs, autostart=False)

    class BadFilter:
        def cache_key(self):
            raise ValueError("malformed filter")

    f1, f2 = _Future(), _Future()
    co._q.put(("d", v[:1], 5, [BadFilter()], None, False, True, f1))
    co._q.put(("d", v[1:2], 5, None, None, False, True, f2))
    co.start()
    try:
        # the bad filter poisons the whole batch's grouping phase —
        # both futures must resolve (with the error), not time out
        for f in (f1, f2):
            try:
                f.get(5)
            except ValueError:
                pass
    finally:
        co.stop()


def test_threaded_end_to_end():
    vs, v = _mk_store()
    co = SearchCoalescer(vs)
    results = {}

    def worker(i):
        results[i] = co.search("d", v[i : i + 2], 3)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(30)
    assert len(results) == 8
    for i, (ids, scores, ok) in results.items():
        want = vs.search("d", v[i : i + 2], 3, use_cache=False)
        assert (ids == want[0]).all()
    co.stop()


def test_dataset_sharding_isolates_slow_tenants():
    """One dataset's stalled dispatch (a first-shape compile) must not
    head-of-line-block other datasets: dispatch threads are sharded by
    dataset hash."""
    import threading
    import time

    import numpy as np

    from longbow_tpu.serving.coalescer import SearchCoalescer

    block = threading.Event()
    entered = threading.Event()

    class SlowStore:
        def search(self, dataset, qs, k, **kw):
            if dataset == "slow":
                entered.set()
                assert block.wait(30)
            b = qs.shape[0]
            ids = np.zeros((b, k), object)
            return ids, np.zeros((b, k), np.float32), np.ones((b, k), bool)

    # find two dataset names landing on DIFFERENT shards
    co = SearchCoalescer(SlowStore(), shards=4)
    nshards = len(co._qs)
    slow_shard = hash("slow") % nshards
    other = next(
        n for n in (f"fast{i}" for i in range(64))
        if hash(n) % nshards != slow_shard
    )
    q = np.zeros((1, 8), np.float32)
    t = threading.Thread(
        target=lambda: co.search("slow", q, 1, timeout=60)
    )
    t.start()
    assert entered.wait(10)
    t0 = time.time()
    co.search(other, q, 1, timeout=10)  # must NOT wait for "slow"
    assert time.time() - t0 < 5.0
    block.set()
    t.join(timeout=30)
    co.stop()
