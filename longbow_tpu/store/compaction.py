"""Compaction and eviction: reclaim tombstoned rows, enforce memory
targets, expire by TTL.

reference: CompactionWorker leveled merge + in-place HNSW remap
(compaction.go:59, batch_remap.go), FragmentationTracker
(fragmentation_tracker.go:11), RecordEvictionManager LRU/LFU/TTL
(record_eviction.go:79-230), evictToTarget (memory_enforcement.go:66),
MemoryBackpressureController (memory_backpressure.go:31).

TPU-native shape: because index state is functional arrays, compaction
is not an in-place remap under locks — it is a rebuild of the live
rows into fresh arrays (bulk kNN-graph build makes this cheap), swapped
in atomically. The reference pays a similar cost for its autoshard
migration (docs/autoshard.md:30-33).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np


class FragmentationTracker:
    """Dead-row ratio per dataset (reference: fragmentation_tracker.go)."""

    def __init__(self, threshold: float = 0.3):
        self.threshold = threshold

    def ratio(self, dataset) -> float:
        # read (index rows, live ids) under the dataset lock: put()
        # appends index rows BEFORE rebuilding the id map, so an
        # unlocked read mid-put sees a torn pair whose gap looks like
        # dead rows (observed: a fresh 50k-row ingest read ratio 0.33
        # and triggered a 329s zero-reclaim rebuild)
        with dataset._lock:
            total = len(dataset.index)
            live = dataset.live_count
        if total == 0:
            return 0.0
        return 1.0 - live / total

    def needs_compaction(self, dataset) -> bool:
        return self.ratio(dataset) > self.threshold


def compact_dataset(dataset) -> dict:
    """Rebuild the dataset's index/columns with only live rows.

    The expensive rebuild (a bulk index build — minutes for a graph
    kind) runs OUTSIDE the dataset lock so searches and puts keep
    being served; the lock is held only to snapshot the live rows and
    to swap the rebuilt trio in. Mutations that land during the build
    are reconciled at swap time: a re-put id changes its row number
    (rows are append-only within an index generation), so comparing
    the id→row map against the snapshot detects every upsert and
    delete exactly. (Observed before this: a 329s graph rebuild under
    the lock timed out every concurrent search. The reference compacts
    concurrently too — compaction.go's worker remaps batches while
    readers proceed.)

    Returns stats {reclaimed_rows, live_rows, seconds, ...}.
    """
    from longbow_tpu.metrics import get_registry

    reg = get_registry()
    ds_label = getattr(dataset, "name", "") or "default"
    try:
        with dataset._compact_mu:
            out = _compact_concurrent(dataset)
    except Exception:
        reg.inc(
            "longbow_compaction_operations_total",
            dataset=ds_label, status="error",
        )
        raise
    reg.inc(
        "longbow_compaction_operations_total",
        dataset=ds_label, status="ok",
    )
    reg.observe(
        "longbow_compaction_duration_seconds",
        out["seconds"], dataset=ds_label,
    )
    reg.inc(
        "longbow_compaction_records_removed_total",
        out["reclaimed_rows"], dataset=ds_label,
    )
    return out


def _fresh_index(dataset):
    """New empty index from the dataset's construction params
    (quantized adapter kinds have none of AdaptiveIndex's attrs)."""
    from longbow_tpu.index.factory import make_index

    return make_index(
        dataset.index_kind,
        dataset.dim,
        dataset.metric,
        dtype=dataset.dtype,
        migration_threshold=dataset.migration_threshold,
        hnsw_config=dataset.hnsw_config,
        **{
            k: v
            for k, v in dataset.index_params.items()
            if k != "graph_disk"  # dataset-level knob, not an index kwarg
        },
    )


def _gather_cols(cols, rows: np.ndarray) -> dict:
    """Snapshot column values at the given rows (strings decoded back
    from their dictionary codes)."""
    out = {}
    for name in cols.fields():
        if name in cols._host_numeric:
            out[name] = cols._host_numeric[name][rows]
        elif name in cols._numeric:
            out[name] = np.asarray(cols._numeric[name])[rows]
        else:
            codes = np.asarray(cols._str_codes[name])[rows]
            rev = {v: k for k, v in cols._str_dicts[name].items()}
            out[name] = np.asarray([rev.get(int(c), "") for c in codes])
    return out


def _compact_concurrent(dataset) -> dict:
    t0 = time.time()

    # ---- phase 1 (locked): snapshot the live rows ----
    with dataset._lock:
        pairs = list(dataset._id_to_row.items())
        dead = len(dataset.index) - len(pairs)
        if not pairs:
            if dead == 0:
                return {"reclaimed_rows": 0, "live_rows": 0, "seconds": 0.0}
            # fully-deleted dataset: swap in a minimal fresh index so
            # the device bytes actually come back (the old early-return
            # kept full capacity forever, re-triggering a no-op sweep)
            from longbow_tpu.query.filters import ColumnStore

            dataset.index = _fresh_index(dataset)
            dataset.columns = ColumnStore(dataset.index.capacity)
            dataset._id_to_row = {}
            dataset._row_to_id = []
            dataset._row_ids_np = None
            dataset.filter_cache.invalidate()
            return {
                "reclaimed_rows": dead,
                "live_rows": 0,
                "seconds": time.time() - t0,
            }

        rows = np.asarray([r for _, r in pairs])
        ids = [u for u, _ in pairs]
        # device-resident gather when the index supports it: the np
        # path fetched EVERY live vector to host then re-uploaded
        # (2 x 1.4GB through the device relay at 2.7M x 128); the
        # device array feeds the new index's device add fast path
        gv_dev = getattr(dataset.index, "get_vectors_device", None)
        vecs = (
            gv_dev(rows) if gv_dev is not None
            else dataset.index.get_vectors(rows)
        )
        live_cols = _gather_cols(dataset.columns, rows)
        # host scan mirror snapshot, carried into the rebuilt index so
        # compaction never silently demotes scans to device fetches
        # (the new index's device-origin bulk add disables its own)
        mr = None
        if (
            getattr(dataset.index, "_flat", None) is not None
            and getattr(dataset.index, "_graph", None) is None
        ):
            mr = dataset.index._flat.mirror_rows(rows)
        old_inner = getattr(dataset.index, "_inner", None)

    # ---- phase 2 (UNLOCKED): build the new trio off to the side.
    # This is the expensive part (a graph kind bulk-builds here —
    # minutes on some backends); searches and puts keep being served
    # against the old trio, which stays internally consistent. ----
    from longbow_tpu.query.filters import ColumnStore

    new_index = _fresh_index(dataset)
    # keep trained quantizer state so PQ/SQ8/BQ codes stay stable
    # across compactions (reference keeps codebooks on the Dataset,
    # quantization_integration.go)
    new_inner = getattr(new_index, "_inner", None)
    if (
        old_inner is not None
        and new_inner is not None
        and type(old_inner) is type(new_inner)
    ):
        for attr in ("codebooks", "lo", "hi", "mean"):
            val = getattr(old_inner, attr, None)
            if val is not None and hasattr(new_inner, attr):
                setattr(new_inner, attr, val)
    new_rows = new_index.add(vecs)
    if (
        mr is not None
        and getattr(new_index, "_flat", None) is not None
        and getattr(new_index, "_graph", None) is None
    ):
        new_index._flat.adopt_mirror(mr)
    new_columns = ColumnStore(new_index.capacity)
    # rows= and max(): mesh-sharded indexes return shard-strided
    # (non-ascending) row ids — same fix as Dataset.put
    new_columns.append(
        live_cols, len(ids), new_index.capacity, rows=new_rows
    )
    new_i2r = {uid: int(new_rows[j]) for j, uid in enumerate(ids)}
    top = int(np.max(new_rows)) if len(new_rows) else -1
    new_r2i: list = [None] * (top + 1)
    for j, uid in enumerate(ids):
        new_r2i[int(new_rows[j])] = uid

    # ---- phase 3 (locked): reconcile mutations that landed during
    # the build, then swap. Rows are append-only within an index
    # generation (an upsert tombstones the old row and appends a new
    # one), so comparing the live id→row map against the snapshot
    # detects every upsert and delete exactly. ----
    snap_map = dict(pairs)
    with dataset._lock:
        cur = dataset._id_to_row
        # deletes — and the stale snapshot version of every re-put
        # id — leave the new trio
        drop_new_rows = []
        for uid, old_row in snap_map.items():
            if cur.get(uid) == old_row:
                continue  # unchanged since the snapshot
            nr = new_i2r.pop(uid, None)
            if nr is not None:
                drop_new_rows.append(nr)
                if nr < len(new_r2i):
                    new_r2i[nr] = None
        if drop_new_rows:
            new_index.delete_rows(np.asarray(drop_new_rows))
        # upserts and brand-new ids: re-add their CURRENT version
        changed = [
            uid for uid, row in cur.items() if snap_map.get(uid) != row
        ]
        if changed:
            rows2 = np.asarray([cur[uid] for uid in changed])
            # host-path gather + add: feeds the new index's scan
            # mirror (a device add would disable it) and the delta is
            # small — proportional to writes during the build
            vecs2 = dataset.index.get_vectors(rows2)
            cols2 = _gather_cols(dataset.columns, rows2)
            nr2 = new_index.add(vecs2)
            new_columns.append(
                cols2, len(changed), new_index.capacity, rows=nr2
            )
            nr2_list = nr2.tolist()
            need = max(nr2_list) + 1 - len(new_r2i)
            if need > 0:
                new_r2i.extend([None] * need)
            for uid, r in zip(changed, nr2_list):
                new_i2r[uid] = int(r)
                new_r2i[int(r)] = uid
        dataset.index = new_index
        dataset.columns = new_columns
        dataset._id_to_row = new_i2r
        dataset._row_to_id = new_r2i
        dataset._row_ids_np = None
        dataset.filter_cache.invalidate()
    return {
        "reclaimed_rows": dead,
        "live_rows": len(new_i2r),
        "delta_upserts": len(changed),
        "delta_deletes": len(drop_new_rows),
        "seconds": time.time() - t0,
    }


class EvictionManager:
    """TTL + LRU/LFU eviction per dataset
    (reference: record_eviction.go:79-230, evictToTarget
    memory_enforcement.go:66).

    TTL: rows older than ttl_s (by LWW write timestamp) are deleted on
    sweep. LRU/LFU: when live_count exceeds max_rows, the coldest rows
    go first; access recency/frequency is fed by record_access().
    """

    def __init__(
        self,
        policy: str = "lru",
        ttl_s: Optional[float] = None,
        max_rows: Optional[int] = None,
    ):
        if policy not in ("lru", "lfu"):
            raise ValueError("policy must be lru|lfu")
        self.policy = policy
        self.ttl_s = ttl_s
        self.max_rows = max_rows
        self._last_access: dict = {}
        self._freq: dict = {}
        self.evicted_total = 0

    def record_access(self, ids) -> None:
        now = time.time()
        for uid in ids:
            self._last_access[uid] = now
            self._freq[uid] = self._freq.get(uid, 0) + 1

    def sweep(self, dataset, store=None) -> int:
        """Apply TTL + size policy; returns rows evicted. With a
        store, evictions go through the WAL-logged delete path so
        evicted rows don't resurrect on restart (a direct ds.delete
        is invisible to replay)."""
        victims = []
        now = time.time()
        with dataset._lock:  # ingest mutates these dicts concurrently
            if self.ttl_s is not None:
                for uid, ts in dataset._lww.items():
                    if (
                        uid in dataset._id_to_row
                        and now - ts > self.ttl_s
                    ):
                        victims.append(uid)
            ttl_n = len(victims)
            if self.max_rows is not None:
                over = dataset.live_count - len(victims) - self.max_rows
                if over > 0:
                    vs = set(victims)
                    pool = [u for u in dataset._id_to_row if u not in vs]
                    if self.policy == "lru":
                        pool.sort(
                            key=lambda u: self._last_access.get(u, 0.0)
                        )
                    else:
                        pool.sort(key=lambda u: self._freq.get(u, 0))
                    victims.extend(pool[:over])
        if victims:
            ids = np.asarray(victims, dtype=object)
            if store is not None:
                store.delete(dataset.name, ids)
            else:
                dataset.delete(ids)
            self.evicted_total += len(victims)
            from longbow_tpu.metrics import get_registry

            # attribute each victim to the policy branch that chose it
            # (reason was previously picked from CONFIG — lru/lfu
            # size-policy evictions all reported as "ttl" whenever a
            # ttl was merely configured)
            reg = get_registry()
            if ttl_n:
                reg.inc("longbow_evictions_total", ttl_n, reason="ttl")
            if len(victims) > ttl_n:
                reg.inc(
                    "longbow_evictions_total", len(victims) - ttl_n,
                    reason=self.policy,
                )
        return len(victims)


class CompactionWorker:
    """Background sweep: eviction then fragmentation-triggered
    compaction (reference: CompactionWorker compaction.go:59)."""

    def __init__(
        self,
        store,
        *,
        interval_s: float = 30.0,
        frag_threshold: float = 0.3,
        eviction: Optional[EvictionManager] = None,
        backpressure: Optional["MemoryBackpressureController"] = None,
        dataset_ttl_s: float = 0.0,
    ):
        self.store = store
        self.interval_s = interval_s
        self.tracker = FragmentationTracker(frag_threshold)
        self.eviction = eviction
        self.backpressure = backpressure
        # dataset-level TTL (reference: docs/eviction.md LONGBOW_TTL —
        # drop whole datasets not read/written for the duration; row
        # TTL/LRU above is the record_eviction.go analogue)
        self.dataset_ttl_s = dataset_ttl_s
        self._stop = None
        self._thread = None

    def run_once(self) -> dict:
        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        if self.backpressure is not None:
            self.backpressure.enforce(self.store)
        if self.dataset_ttl_s > 0:
            now = time.time()
            for name in self.store.list_datasets():
                ds = self.store.get(name)
                if now - ds.last_access > self.dataset_ttl_s:
                    # count the dataset's live ROWS under a distinct
                    # reason: the counter's unit is rows everywhere
                    # else, and +1-per-dataset silently mixed units
                    rows = ds.live_count
                    self.store.drop(name)
                    reg.inc(
                        "longbow_evictions_total", rows,
                        reason="dataset_ttl",
                    )
        stats = {}
        worst_frag = 0.0
        for name in self.store.list_datasets():
            ds = self.store.get(name)
            evicted = (
                self.eviction.sweep(ds, store=self.store)
                if self.eviction
                else 0
            )
            compacted = None
            if self.tracker.needs_compaction(ds):
                reg.inc("longbow_compaction_auto_triggers_total")
                compacted = compact_dataset(ds)
                self.store.query_cache.clear()
            frag = self.tracker.ratio(ds)
            worst_frag = max(worst_frag, frag)
            stats[name] = {
                "evicted": evicted,
                "fragmentation": round(frag, 3),
                "compacted": compacted,
            }
        reg.gauge("longbow_memory_fragmentation_ratio").set(worst_frag)
        return stats

    def start(self) -> None:
        import threading

        self._stop = threading.Event()

        def loop():
            while not self._stop.wait(self.interval_s):
                try:
                    self.run_once()
                except Exception:  # keep the worker alive, but loudly
                    import logging

                    logging.getLogger("longbow.compaction").exception(
                        "compaction sweep failed"
                    )

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._stop:
            self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


class MemoryPressureError(RuntimeError):
    """Raised by the hard admission limit (callers map it to a
    resource-exhausted RPC error)."""


class MemoryBackpressureController:
    """Byte-target HBM enforcement (reference:
    MemoryBackpressureController soft/hard limits
    memory_backpressure.go:31, evictToTarget memory_enforcement.go:66).

    - above `soft_bytes`: enforce() evicts coldest rows (LRU by access
      when an EvictionManager supplies stats, else oldest LWW write)
      until usage drops below the soft target
    - above `hard_bytes`: check_admit() raises — writes are rejected
      rather than OOMing the device
    """

    def __init__(
        self,
        soft_bytes: Optional[int] = None,
        hard_bytes: Optional[int] = None,
        eviction: Optional[EvictionManager] = None,
        batch_rows: int = 1024,
    ):
        self.soft_bytes = soft_bytes
        self.hard_bytes = hard_bytes
        self.eviction = eviction
        self.batch_rows = batch_rows
        self.rejected_total = 0
        self.evicted_total = 0

    @staticmethod
    def total_bytes(store) -> int:
        return sum(
            store.get(n).hbm_bytes() for n in store.list_datasets()
        )

    def check_admit(self, store) -> None:
        if self.hard_bytes is None:
            return
        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        used = self.total_bytes(store)
        reg.set("longbow_memory_pressure_level", self._level(used))
        if used > self.hard_bytes:
            self.rejected_total += 1
            reg.inc("longbow_memory_backpressure_rejects_total")
            raise MemoryPressureError(
                f"HBM hard limit: {used} > {self.hard_bytes} bytes"
            )
        reg.inc("longbow_memory_backpressure_acquires_total")

    def _level(self, used: int) -> int:
        """0 = under soft, 1 = soft..hard, 2 = over hard (reference:
        longbow_memory_pressure_level, docs/metrics.md)."""
        if self.hard_bytes is not None and used > self.hard_bytes:
            return 2
        if self.soft_bytes is not None and used > self.soft_bytes:
            return 1
        return 0

    def _coldest_rows(self, ds, k: int) -> list:
        # snapshot the id set under the dataset lock: this runs on the
        # CompactionWorker thread while ingest mutates _id_to_row/_lww —
        # an unlocked sorted() dies with "dictionary changed size
        # during iteration" and silently disables HBM enforcement
        # under exactly the write load that causes memory pressure
        with ds._lock:
            ids = list(ds._id_to_row)
            lww = dict(ds._lww)
        if self.eviction is not None and self.eviction._last_access:
            ids.sort(
                key=lambda u: self.eviction._last_access.get(u, 0.0)
            )
        else:  # oldest write first
            ids.sort(key=lambda u: lww.get(u, 0.0))
        return ids[:k]

    def enforce(self, store) -> int:
        """Evict until under the soft target; returns rows evicted.
        Eviction tombstones rows; compaction reclaims the bytes, so a
        compaction pass runs on every dataset we touched."""
        if self.soft_bytes is None:
            return 0
        evicted = 0
        no_progress = 0
        # index buffers grow by capacity doubling, so bytes reclaim in
        # power-of-two steps: evict proportionally to the overshoot,
        # compact, re-check; stop when bytes stop shrinking twice in a
        # row (the minimum-capacity floor) or nothing is left to evict.
        for _ in range(8):
            used = self.total_bytes(store)
            if used <= self.soft_bytes:
                break
            # largest dataset pays first (reference evicts per-dataset
            # toward a target the same way)
            names = store.list_datasets()
            if not names:
                break
            name = max(names, key=lambda n: store.get(n).hbm_bytes())
            ds = store.get(name)
            live = ds.live_count
            # rows to drop so this dataset's share shrinks past the
            # next capacity halving
            want = max(
                int(live * (1.0 - self.soft_bytes / used)),
                self.batch_rows,
            )
            victims = self._coldest_rows(ds, min(want, live))
            if not victims:
                break
            # WAL-logged path: evicted rows must not resurrect on
            # restart, and the query cache must drop them
            store.delete(name, np.asarray(victims, dtype=object))
            evicted += len(victims)
            compact_dataset(ds)  # reclaim bytes now, not at next sweep
            if self.total_bytes(store) >= used:
                # no bytes reclaimed yet: one grace pass may cross the
                # next capacity halving; two in a row = the floor
                no_progress += 1
                if no_progress >= 2:
                    break
            else:
                no_progress = 0
        self.evicted_total += evicted
        if evicted:
            store.query_cache.clear()
            from longbow_tpu.metrics import get_registry

            get_registry().inc(
                "longbow_evictions_total", evicted, reason="backpressure"
            )
        return evicted
