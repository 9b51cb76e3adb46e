"""Asynchronous ingestion: DoPut acks fast, index linking happens off
the gRPC thread.

reference: the dual-queue backpressured ingest pipeline
(store_actions.go:426-708 — adaptive batching, persistence queue +
lock-free ingestion ring, backpressure wait loop) and
`check_readiness` reporting BUSY from queue depths
(store_actions.go:57-101). The TPU shape is one bounded host queue in
front of `store.put`: the queue exists to decouple gRPC threads from
index builds (which may jit-compile or bulk-link for seconds), not to
shard CPU work — XLA owns the device.

Durability note: with async ingest the DoPut ack means "accepted",
not "applied" — same contract as the reference's async persistence
queue; `check_readiness` flips READY only when the queue drains.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Optional


class IngestQueue:
    def __init__(self, store, *, max_depth: int = 256, workers: int = 1):
        self.store = store
        self._q: queue.Queue = queue.Queue(maxsize=max_depth)
        self._stop = threading.Event()
        # jobs counted from BEFORE they enter the queue until applied:
        # deriving depth from qsize()+in-flight had an unavoidable
        # window between get() returning and the in-flight bump where
        # depth read 0 with an acked batch in hand — a checkpoint
        # polling drain() there could truncate the WAL with acked rows
        # unapplied
        self._pending = 0
        self._lock = threading.Lock()
        self.errors: list[str] = []
        self._threads = [
            threading.Thread(target=self._loop, args=(i,), daemon=True)
            for i in range(workers)
        ]
        for t in self._threads:
            t.start()

    @property
    def pressure(self) -> float:
        """Queue fullness 0..1 (reference: DoPut signals slow_down at
        80% WAL-queue capacity, docs/admin_api.md)."""
        return self.depth / max(self._q.maxsize, 1)

    @property
    def depth(self) -> int:
        with self._lock:
            return self._pending

    def _observe_depth(self) -> None:
        from longbow_tpu.metrics import get_registry

        get_registry().gauge("longbow_index_queue_depth").set(self.depth)

    def submit(
        self, dataset, ids, vectors, columns, metric, timestamp,
        block_s: float = 30.0,
    ) -> None:
        """Enqueue one put; blocks (backpressure) when the queue is
        full — the reference's backpressure wait loop
        (store_actions.go:655-672). The hard HBM limit is checked
        BEFORE acking: an enqueued batch is a durability promise, so
        over-limit writes must be rejected up front, not dropped by
        the worker later."""
        bp = getattr(self.store, "backpressure", None)
        if bp is not None:
            # raises MemoryPressureError over the hard cap
            bp.check_admit(self.store)
        with self._lock:
            self._pending += 1
        try:
            self._q.put(
                (dataset, ids, vectors, columns, metric, timestamp),
                timeout=block_s,
            )
        except Exception:
            with self._lock:
                self._pending -= 1
            raise
        self._observe_depth()

    # coalescing cap: one device append per <= this many rows
    # (reference: adaptive batching to 50k rows / 32MB,
    # store_actions.go:530-618)
    MAX_COALESCE_ROWS = 65536

    @staticmethod
    def _stamp(j):
        """Give a None-timestamp job its LWW timestamp AT DEQUEUE, in
        queue order. Stamping only merged groups (and letting
        single-job groups be stamped later, inside Dataset.put) let a
        later-submitted same-id write in a DIFFERENT group win LWW
        over the client's actual last write."""
        if j[5] is None:
            return (j[0], j[1], j[2], j[3], j[4], time.time())
        return j

    def _loop(self, worker_id: int = 0):
        import numpy as np

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            # group-commit: greedily drain queued jobs and apply each
            # (dataset, metric, column-key) group as ONE store.put —
            # one WAL write, one device append, one metrics pass.
            # Per-row origin timestamps preserve LWW across the merge.
            # (depth accounting lives in _pending, spanning submit ->
            # applied — no get/bump window to race a checkpoint.)
            batch = [self._stamp(first)]
            rows = len(first[1])
            while rows < self.MAX_COALESCE_ROWS:
                try:
                    j = self._q.get_nowait()
                except queue.Empty:
                    break
                batch.append(self._stamp(j))
                rows += len(j[1])
            try:
                from longbow_tpu.metrics import get_registry

                # fraction of the coalescing window this worker filled
                # (reference: pipeline_worker_utilization per worker)
                get_registry().set(
                    "longbow_pipeline_worker_utilization",
                    min(rows / self.MAX_COALESCE_ROWS, 1.0),
                    worker_id=str(worker_id),
                )
            except Exception:
                pass
            groups: dict = {}
            order = []
            for j in batch:
                # vector dtype, vector DIM and column dtypes are all
                # part of the group key: coalescing an int8 batch with
                # an f32 one would upcast the codes; a dim mismatch
                # fails np.concatenate; a column dtype flip promotes
                # the whole merged column and fails check_types —
                # either way one bad job would take its innocent
                # group-mates' acked rows down with it
                try:
                    shp = getattr(j[2], "shape", None)
                    dim = shp[-1] if shp else len(j[2][0])
                except Exception:
                    dim = -1
                colsig = tuple(sorted(
                    (c, str(np.asarray(v).dtype))
                    for c, v in (j[3] or {}).items()
                ))
                key = (
                    j[0], j[4], colsig,
                    getattr(j[2], "dtype", None) and str(j[2].dtype),
                    dim,
                )
                if key not in groups:
                    groups[key] = []
                    order.append(key)
                groups[key].append(j)
            try:
                for key in order:
                    gs = groups[key]
                    # per-group isolation: one bad group (e.g. dim
                    # mismatch) must not silently drop the OTHER
                    # groups' already-acked batches
                    try:
                        if len(gs) == 1:
                            (
                                dataset, ids, vectors, columns, metric,
                                ts,
                            ) = gs[0]
                        else:
                            dataset, metric, colsig, _vdt, _dim = key
                            ids = np.concatenate(
                                [np.asarray(g[1]) for g in gs]
                            )
                            # pass the payload blocks through as a
                            # list: Dataset.put stages them into the
                            # index buffer directly, so the merge
                            # costs zero extra copies of the vector
                            # bytes (np.concatenate here re-copied
                            # every ingested byte — ~18% of the apply
                            # thread under sustained load). Non-flat
                            # indexes and the WAL path concatenate
                            # downstream where actually required.
                            vectors = [np.atleast_2d(g[2]) for g in gs]
                            columns = (
                                {
                                    c: np.concatenate(
                                        [np.asarray(g[3][c]) for g in gs]
                                    )
                                    for c, _dt in colsig
                                }
                                or None
                            )

                            def _ts_rows(g):
                                # jobs were _stamp()ed at dequeue, but a
                                # replicated write carries a PER-ROW ts
                                # array — expand scalars, pass arrays
                                t = np.asarray(g[5], np.float64)
                                if t.ndim == 0:
                                    return np.full(len(g[1]), float(t))
                                return t

                            ts = np.concatenate([_ts_rows(g) for g in gs])
                        self._apply(
                            dataset, ids, vectors, columns, metric, ts
                        )
                    except Exception as e:
                        if len(gs) > 1:
                            # merged apply failed: retry each job alone
                            # so one bad job can't drop its group-mates'
                            # acked rows
                            for g in gs:
                                try:
                                    self._apply(
                                        g[0], g[1], g[2], g[3], g[4], g[5]
                                    )
                                except Exception as e2:
                                    self.errors.append(
                                        f"{time.time():.0f} {e2!r}"
                                    )
                                    del self.errors[:-20]
                        else:  # surface via errors
                            self.errors.append(f"{time.time():.0f} {e!r}")
                            del self.errors[:-20]
            finally:
                with self._lock:
                    self._pending -= len(batch)
                self._observe_depth()

    def _apply(self, dataset, ids, vectors, columns, metric, ts):
        while not self._stop.is_set():
            try:
                self.store.put(
                    dataset, ids, vectors, columns,
                    metric=metric, timestamp=ts,
                )
                return
            except Exception as e:
                from longbow_tpu.store.compaction import (
                    MemoryPressureError,
                )

                if not isinstance(e, MemoryPressureError):
                    raise
                # the batch was ACKED at DoPut time: dropping it here
                # would be silent data loss. Block the worker until the
                # backpressure controller admits again — the queue
                # fills, readiness reports BUSY, and DoPut's hard-limit
                # check rejects NEW writes up front.
                time.sleep(0.5)

    def drain(self, timeout_s: float = 60.0) -> bool:
        t0 = time.time()
        while self.depth > 0 and time.time() - t0 < timeout_s:
            time.sleep(0.02)
        return self.depth == 0

    def close(self) -> None:
        self.drain(timeout_s=30.0)
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
