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
            threading.Thread(target=self._loop, daemon=True)
            for _ in range(workers)
        ]
        for t in self._threads:
            t.start()

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

    def _loop(self):
        while not self._stop.is_set():
            try:
                job = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            with self._lock:
                self._active += 1
            try:
                dataset, ids, vectors, columns, metric, ts = job
                while not self._stop.is_set():
                    try:
                        self.store.put(
                            dataset, ids, vectors, columns,
                            metric=metric, timestamp=ts,
                        )
                        break
                    except Exception as e:
                        from longbow_tpu.store.compaction import (
                            MemoryPressureError,
                        )

                        if not isinstance(e, MemoryPressureError):
                            raise
                        # the batch was ACKED at DoPut time: dropping
                        # it here would be silent data loss. Block the
                        # worker until the backpressure controller
                        # admits again — the queue fills, readiness
                        # reports BUSY, and DoPut's hard-limit check
                        # rejects NEW writes up front.
                        time.sleep(0.5)
            except Exception as e:  # keep draining; surface via errors
                self.errors.append(f"{time.time():.0f} {e!r}")
                del self.errors[:-20]
            finally:
                with self._lock:
                    self._active -= 1
                self._observe_depth()

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
