"""Search coalescing: merge concurrent search requests into one kernel
dispatch.

The fused scan's cost is strongly sub-linear in the query batch (one
v5e chip, 1M x 128 bf16, honest reduction-forced timing: B=128 ->
3.8 ms, B=2048 -> 5.9 ms — 16x the queries for 1.6x the time, 350k
vs 33k QPS), because the corpus read is amortized across every query in
the batch. Per-request dispatch therefore wastes most of the chip's
bandwidth under concurrency.

The reference serves each request on its own goroutine (Go's model;
its SIMD scan is per-query anyway). The TPU-native answer is NATURAL
BATCHING: a single dispatch thread drains whatever requests have
queued while the previous kernel ran, groups them by compatible
signature (dataset, k, filters, ef, exact), concatenates their query
rows, runs ONE search, and splits the results. An idle server runs a
lone request immediately — coalescing only kicks in when concurrency
exists, so it adds throughput without a latency tax (no timer windows,
no artificial delay).
"""
from __future__ import annotations

import logging
import queue
import threading
from typing import Optional

import numpy as np

log = logging.getLogger("longbow.coalescer")


class _Future:
    __slots__ = ("_ev", "_val", "_err")

    def __init__(self):
        self._ev = threading.Event()
        self._val = None
        self._err = None

    def set(self, val) -> None:
        self._val = val
        self._ev.set()

    def set_err(self, err: BaseException) -> None:
        self._err = err
        self._ev.set()

    def get(self, timeout: Optional[float] = None):
        if not self._ev.wait(timeout):
            raise TimeoutError("coalesced search timed out")
        if self._err is not None:
            raise self._err
        return self._val


def _filters_key(filters) -> str:
    if not filters:
        return ""
    return "|".join(f.cache_key() for f in filters)


class SearchCoalescer:
    """Wraps a VectorStore's search with natural request batching.

    max_batch bounds the concatenated query rows per dispatch (the
    kernel's VMEM-validated ceiling); excess requests stay queued for
    the next dispatch. Requests in a multi-request group bypass the
    query cache (their concatenated batch key would never repeat);
    lone requests keep full cache semantics.
    """

    def __init__(
        self,
        store,
        *,
        max_batch: int = 2048,
        max_group: int = 64,
        shards: int = 4,
        autostart: bool = True,
    ):
        self.store = store
        self.max_batch = max_batch
        self.max_group = max_group
        # dataset-sharded dispatch: one thread per shard, routed by
        # hash(dataset). A single dispatch thread head-of-line-blocked
        # every OTHER dataset behind one dataset's first-shape compile
        # (~30s through the remote compiler) — multi-tenant nodes need
        # tenant isolation. Per-dataset ordering is preserved (a
        # dataset always lands on the same shard); device-side
        # execution serializes in dispatch order regardless.
        self._qs = [queue.Queue() for _ in range(max(1, shards))]
        self._stop = threading.Event()
        self.dispatches = 0       # kernel dispatches issued
        self.coalesced = 0        # requests that shared a dispatch
        self.requests = 0
        # dataset -> dispatch start time, for timeout diagnostics: a
        # request that times out while a long dispatch is running is
        # almost always waiting on a first-shape XLA compile, and the
        # error should say so instead of looking like a wedge
        self._inflight: dict = {}
        # back-compat alias: single-shard callers/tests poke ._q
        self._q = self._qs[0]
        self._ts: Optional[list] = None
        if autostart:
            self.start()

    def start(self) -> None:
        if self._ts is None:
            self._ts = [
                threading.Thread(
                    target=self._loop, args=(q,), daemon=True,
                    name=f"longbow-coalesce-{i}",
                )
                for i, q in enumerate(self._qs)
            ]
            for t in self._ts:
                t.start()

    def stop(self) -> None:
        self._stop.set()
        for q in self._qs:
            q.put(None)
        if self._ts is not None:
            for t in self._ts:
                t.join(timeout=5.0)
            self._ts = None

    # ------------------------------------------------------------------

    def search(
        self,
        dataset: str,
        queries,
        k: int,
        *,
        filters=None,
        ef_search: Optional[int] = None,
        exact: bool = False,
        use_cache: bool = True,
        timeout: Optional[float] = 30.0,
    ):
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        fut = _Future()
        self.requests += 1
        self._qs[hash(dataset) % len(self._qs)].put(
            (dataset, q, k, filters, ef_search, exact, use_cache, fut)
        )
        try:
            return fut.get(timeout)
        except TimeoutError:
            t0 = self._inflight.get(dataset)
            if t0 is not None:
                import time as _t

                raise TimeoutError(
                    "coalesced search timed out (a dispatch for "
                    f"'{dataset}' has been running {_t.time() - t0:.0f}s"
                    " — likely a first-shape XLA compile; retry shortly)"
                )
            raise

    # ------------------------------------------------------------------

    def _loop(self, _q: queue.Queue) -> None:
        while not self._stop.is_set():
            item = _q.get()
            if item is None:
                continue
            batch = [item]
            while len(batch) < self.max_group:
                try:
                    nxt = _q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            try:
                self._drain(batch)
            except Exception as e:  # pragma: no cover - defensive
                log.exception("coalescer dispatch failed")
                # a grouping-phase failure must not orphan the batch:
                # an unresolved future blocks its caller for the full
                # request timeout (30s) instead of surfacing the error
                for it in batch:
                    if not it[7]._ev.is_set():
                        it[7].set_err(e)
        # shutdown: fail whatever is still queued instead of leaving
        # callers to time out
        while True:
            try:
                item = _q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[7].set_err(RuntimeError("coalescer stopped"))

    def _drain(self, batch: list) -> None:
        """Group compatible requests, one store.search per group."""
        groups: dict = {}
        for it in batch:
            dataset, q, k, filters, ef, exact, use_cache, fut = it
            # dimensionality is part of the signature: a wrong-dim
            # query must not poison a group's np.concatenate and
            # orphan innocent coalesced futures
            sig = (
                dataset, k, _filters_key(filters), ef, exact,
                q.shape[-1],
            )
            groups.setdefault(sig, []).append(it)
        for sig, items in groups.items():
            # respect the row ceiling: split oversized groups
            start = 0
            while start < len(items):
                chunk, rows = [], 0
                while start < len(items):
                    nrows = items[start][1].shape[0]
                    if chunk and rows + nrows > self.max_batch:
                        break
                    chunk.append(items[start])
                    rows += nrows
                    start += 1
                self._run(chunk)

    def _run(self, items: list) -> None:
        dataset, _, k, filters, ef, exact, _, _ = items[0]
        try:
            qs = (
                items[0][1]
                if len(items) == 1
                else np.concatenate([it[1] for it in items], axis=0)
            )
        except Exception as e:  # malformed member: fail THIS group only
            for it in items:
                it[7].set_err(e)
            return
        use_cache = items[0][6] if len(items) == 1 else False
        self.dispatches += 1
        if len(items) > 1:
            self.coalesced += len(items)
        try:
            from longbow_tpu.metrics import get_registry

            get_registry().observe(
                "longbow_search_coalesce_batch_size", qs.shape[0]
            )
        except Exception:
            pass
        import time as _t

        self._inflight[dataset] = _t.time()
        try:
            ids, scores, ok = self.store.search(
                dataset, qs, k, filters=filters, ef_search=ef,
                exact=exact, use_cache=use_cache,
            )
        except BaseException as e:
            for it in items:
                it[7].set_err(e)
            return
        finally:
            self._inflight.pop(dataset, None)
        off = 0
        for it in items:
            n = it[1].shape[0]
            it[7].set((ids[off:off + n], scores[off:off + n],
                       ok[off:off + n]))
            off += n
