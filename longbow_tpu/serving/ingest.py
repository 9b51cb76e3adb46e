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
        self._active = 0  # jobs being applied right now
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
            return self._q.qsize() + self._active

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
        self._q.put(
            (dataset, ids, vectors, columns, metric, timestamp),
            timeout=block_s,
        )
        self._observe_depth()

    # coalescing cap: one device append per <= this many rows
    # (reference: adaptive batching to 50k rows / 32MB,
    # store_actions.go:530-618)
    MAX_COALESCE_ROWS = 65536

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
            # account each job the moment it leaves the queue: a gap
            # between get() and the _active bump makes depth==0 lie to
            # drain(), and a checkpoint could truncate the WAL with
            # acked rows still unapplied
            with self._lock:
                self._active += 1
            batch = [first]
            rows = len(first[1])
            while rows < self.MAX_COALESCE_ROWS:
                try:
                    j = self._q.get_nowait()
                except queue.Empty:
                    break
                with self._lock:
                    self._active += 1
                batch.append(j)
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
                # vector dtype is part of the group key: coalescing an
                # int8 batch with an f32 one would upcast the codes
                key = (
                    j[0], j[4], tuple(sorted((j[3] or {}).keys())),
                    getattr(j[2], "dtype", None) and str(j[2].dtype),
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
                            dataset, metric, colkeys, _vdt = key
                            ids = np.concatenate(
                                [np.asarray(g[1]) for g in gs]
                            )
                            vectors = np.concatenate([g[2] for g in gs])
                            columns = (
                                {
                                    c: np.concatenate(
                                        [np.asarray(g[3][c]) for g in gs]
                                    )
                                    for c in colkeys
                                }
                                or None
                            )
                            now = time.time()
                            ts = np.concatenate(
                                [
                                    np.full(
                                        len(g[1]),
                                        g[5] if g[5] is not None else now,
                                    )
                                    for g in gs
                                ]
                            )
                        self._apply(
                            dataset, ids, vectors, columns, metric, ts
                        )
                    except Exception as e:  # surface via errors
                        self.errors.append(f"{time.time():.0f} {e!r}")
                        del self.errors[:-20]
            finally:
                with self._lock:
                    self._active -= len(batch)
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
