"""StorageEngine: WAL + snapshot + recovery facade.

reference: storage/engine.go:39-551 (WriteToWAL/ReplayWAL/Snapshot/
LoadSnapshots/TruncateWAL), auto-snapshot at MAX_WAL_SIZE 100MB
(docs/components.md:118-122), recovery = snapshots then WAL tail
(store_persistence.go:12-150).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np
import pyarrow as pa

from longbow_tpu.storage.snapshot import read_snapshot, write_snapshot
from longbow_tpu.storage.wal import KIND_BATCH, KIND_OP, WAL
from longbow_tpu.wire_types import NATIVE_VECTOR_DTYPES

MAX_WAL_BYTES = 100 * 1024 * 1024  # reference default MAX_WAL_SIZE


class _RWLock:
    """Many committers / one snapshotter. Writer-preferring so a
    pending snapshot isn't starved by a steady put stream."""

    def __init__(self) -> None:
        import threading

        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self) -> None:
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        with self._cond:
            self._writers_waiting += 1
            while self._writer or self._readers:
                self._cond.wait()
            self._writers_waiting -= 1
            self._writer = True

    def release_write(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()


def _dtype_name(dt) -> str:
    import jax.numpy as jnp

    return str(jnp.dtype(dt))


# reserved per-row column carrying each row's origin/LWW timestamp in
# WAL frames; never surfaced as user metadata
_TS_COL = "__longbow_ts"


def _put_table(
    ids, vectors: np.ndarray, columns: Optional[dict], timestamp=None
) -> pa.Table:
    ids = np.asarray(ids)
    d = vectors.shape[1]
    id_arr = (
        pa.array([str(i) for i in ids], pa.string())
        if ids.dtype.kind in "OUS"
        else pa.array(ids.astype(np.int64), pa.int64())
    )
    # preserve the ingest dtype in the frame (f16/i8/u8/i32 columns are
    # logged as themselves — a quarter the bytes for int8, and replay
    # reconstructs the same dtype-appropriate index)
    v = np.asarray(vectors)
    if v.dtype not in NATIVE_VECTOR_DTYPES:
        v = v.astype(np.float32)
    cols = {
        "id": id_arr,
        "vector": pa.FixedSizeListArray.from_arrays(
            pa.array(
                np.ascontiguousarray(v).reshape(-1),
                pa.from_numpy_dtype(v.dtype),
            ),
            d,
        ),
    }
    for name, vals in (columns or {}).items():
        cols[name] = pa.array(np.asarray(vals))
    if timestamp is not None:
        # persist the put's LWW timestamp(s): replay must resolve
        # conflicts with origin time, not WAL append time — otherwise a
        # stale replicated write that lost LWW in memory (but was
        # logged before ds.put filtered it) resurrects on restart
        ts_arr = np.broadcast_to(
            np.asarray(timestamp, dtype=np.float64), (len(ids),)
        )
        cols[_TS_COL] = pa.array(np.ascontiguousarray(ts_arr), pa.float64())
    return pa.table(cols)


def _table_to_put(table: pa.Table):
    """Returns (ids, vectors, columns, timestamp) — timestamp is a
    per-row float64 array when the frame carried one, else None (old
    frames fall back to the WAL append time)."""
    ids = np.asarray(table.column("id").to_pylist())
    vec_col = table.column("vector").combine_chunks()
    d = vec_col.type.list_size
    vectors = np.asarray(vec_col.values).reshape(-1, d)  # dtype preserved
    ts = None
    if _TS_COL in table.column_names:
        ts = np.asarray(table.column(_TS_COL).to_pylist(), dtype=np.float64)
    columns = {
        n: np.asarray(table.column(n).to_pylist())
        for n in table.column_names
        if n not in ("id", "vector", _TS_COL)
    }
    return ids, vectors, columns or None, ts


class StorageEngine:
    def __init__(
        self,
        directory: str | Path,
        *,
        max_wal_bytes: int = MAX_WAL_BYTES,
        sync: str = "batch",
        snapshot_backend=None,
        io_uring: bool = False,
        direct_io: bool = False,
    ):
        """snapshot_backend: optional remote mirror (S3/MinIO/R2 or the
        LocalBackend; reference: s3_backend.go:33) — every snapshot
        uploads after the local atomic swap, and recovery pulls the
        latest remote snapshot when the local slot is empty."""
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        import threading

        self.max_wal_bytes = max_wal_bytes
        self.wal = WAL(
            self.dir / "wal.log", sync=sync, io_uring=io_uring,
            direct_io=direct_io,
        )
        self.backend = snapshot_backend
        # commit/snapshot coordination: a WAL append + its apply must
        # not interleave with snapshot's export+truncate, or an acked
        # write can land in neither (post-export apply, pre-truncate
        # WAL frame). Puts hold the read side; snapshot the write side.
        self._commit_rw = _RWLock()
        # one snapshot at a time: the timer loop, ForceSnapshot, and
        # the WAL-size trigger may all fire together; write_snapshot's
        # directory rename-swap is not concurrency-safe
        self._snap_lock = threading.Lock()
        self._snap_bg = None  # WAL-triggered background snapshot

    def commit_guard(self):
        """Context manager for the WAL-append+apply critical section."""
        from contextlib import contextmanager

        @contextmanager
        def _guard():
            self._commit_rw.acquire_read()
            try:
                yield
            finally:
                self._commit_rw.release_read()

        return _guard()

    # -- logging --------------------------------------------------------

    def log_put(
        self, dataset, ids, vectors, columns, metric=None, timestamp=None
    ) -> None:
        table = _put_table(ids, vectors, columns, timestamp=timestamp)
        if metric:
            table = table.replace_schema_metadata({"longbow.metric": metric})
        self.wal.append_batch(dataset, table)

    def log_delete(self, dataset: str, ids) -> None:
        ids = [i.item() if hasattr(i, "item") else i for i in np.asarray(ids)]
        self.wal.append_op(dataset, {"op": "delete", "ids": ids})

    def log_drop(self, dataset: str) -> None:
        self.wal.append_op(dataset, {"op": "drop"})

    def log_edge(self, dataset: str, src, dst, edge_type, weight) -> None:
        self.wal.append_op(
            dataset,
            {"op": "add_edge", "from": src, "to": dst,
             "type": edge_type, "weight": weight},
        )

    # -- snapshot / recovery ---------------------------------------------

    def snapshot(self, store) -> None:
        """Dump every dataset's FULL state — index arrays (graph
        adjacency / codes / codebooks), metadata columns, id maps, LWW
        timestamps — then truncate the WAL. Recovery imports this state
        instead of retraining/re-linking (reference: engine.go:298-430
        + arrow_hnsw_persistence.go + pq/persistence.go:15-38)."""
        import time as _time

        t0 = _time.perf_counter()
        with self._snap_lock:
            # commit lock held only for the CAPTURE (state export +
            # WAL rotation) — the file writes run outside it. The
            # inline write used to block every put for the write's
            # duration (round-5 profiled: sustained DoPut collapsed to
            # the snapshot duty cycle). Crash safety: the rotated
            # `wal.log.pre-snapshot` segment replays before the live
            # log on recovery and is deleted only after write_snapshot
            # atomically swaps the new snapshot in (replay of frames
            # the snapshot already covers is idempotent — LWW upserts).
            self._commit_rw.acquire_write()
            try:
                blobs = {}
                for name in store.list_datasets():
                    ds = store.get(name)
                    with ds._lock:
                        blobs[name] = self._export_dataset(ds)
                rotated = self.wal.rotate()
            finally:
                self._commit_rw.release_write()
            final = write_snapshot(self.dir, blobs)
            stale = Path(str(self.wal.path) + self.wal.PRE_SNAPSHOT_SUFFIX)
            if rotated is None:
                # a previous snapshot failed after rotating: that
                # segment is now covered by THIS snapshot — drop it.
                # The live log keeps growing until the next rotation.
                rotated = stale
            try:
                rotated.unlink()
            except OSError:
                pass
        if self.backend is not None:
            try:
                self.backend.upload(final, "snapshot")
            except Exception:
                import logging

                logging.getLogger("longbow.storage").exception(
                    "remote snapshot upload failed (local copy intact)"
                )
        from longbow_tpu.metrics import get_registry

        get_registry().histogram(
            "longbow_snapshot_duration_seconds"
        ).observe(_time.perf_counter() - t0)

    @staticmethod
    def _export_dataset(ds) -> dict:
        def j(u):  # np scalars -> JSON-safe python scalars
            return u.item() if hasattr(u, "item") else u

        cols = ds.columns.export_state()
        aux = {f"colnum:{k}": v for k, v in cols["numeric"].items()}
        aux.update({f"colstr:{k}": v for k, v in cols["str_codes"].items()})
        return {
            "table": None,  # vectors live in index_state, not parquet
            "index_state": ds.index.export_state(),
            "aux": aux,
            "json": {
                "row_to_id": [j(u) for u in ds._row_to_id],
                # full LWW map, deletion markers included, so replica
                # conflict resolution survives restarts
                "lww": [[j(k), ts] for k, ts in ds._lww.items()],
                "str_dicts": cols["str_dicts"],
                "col_count": cols["count"],
            },
            "bm25": ds.bm25.export_state() if len(ds.bm25) else None,
            "graph": (
                ds.graph.export_state()
                if ds.graph.stats()["edges"]
                else None
            ),
            "meta": {
                "version": 2,
                "dim": ds.dim,
                "metric": ds.metric,
                "dtype": _dtype_name(ds.dtype),
                "index_kind": ds.index_kind,
                "index_params": ds.index_params,
                "migration_threshold": ds.migration_threshold,
            },
        }

    def maybe_snapshot(self, store) -> bool:
        # skip (don't queue) when a snapshot is already running: this
        # sits on the put path, and the running snapshot will shrink
        # the WAL anyway
        if (
            self.wal.size_bytes <= self.max_wal_bytes
            or self._snap_lock.locked()
            or self._snap_bg is not None and self._snap_bg.is_alive()
        ):
            return False
        # BACKGROUND, not inline (round-5 profiled finding): the
        # WAL-size trigger fires on the ingest APPLY path, and an
        # inline snapshot blocked every subsequent put for the whole
        # write — sustained DoPut throughput collapsed to the snapshot
        # duty cycle (~4 MB/s at max_wal_mb=100). The periodic
        # snapshot thread already runs concurrently with applies, so
        # the same consistency argument covers this thread.
        import threading

        def _bg():
            try:
                self.snapshot(store)
            except Exception:  # never break ingest on snapshot failure
                pass

        self._snap_bg = threading.Thread(
            target=_bg, daemon=True, name="longbow-wal-snapshot"
        )
        self._snap_bg.start()
        return True

    def recover(self, store) -> int:
        """Snapshot first, then the WAL tail. Returns ops applied."""
        import time as _time

        from longbow_tpu.hybrid.bm25 import BM25Index
        from longbow_tpu.hybrid.graph_store import GraphStore
        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        reg.set("longbow_warmup_progress_percent", 0)
        n = 0
        snap = read_snapshot(self.dir)
        if snap is None and self.backend is not None:
            # cold start on a fresh node: pull the remote snapshot
            # (reference: LoadSnapshots via the S3 backend)
            try:
                if self.backend.download("snapshot", self.dir / "snapshot"):
                    snap = read_snapshot(self.dir)
            except Exception:
                import logging

                logging.getLogger("longbow.storage").exception(
                    "remote snapshot download failed"
                )
        if snap:
            for name, blob in snap.items():
                meta = blob["meta"]
                if meta.get("version", 1) >= 2 and blob["index_state"].get(
                    "kind"
                ):
                    # v2: import index state directly — restart serves
                    # identical results with no rebuild/retrain
                    store.restore_dataset(name, blob)
                elif blob["table"] is not None and blob["table"].num_rows:
                    ids, vecs, cols, _ = _table_to_put(blob["table"])
                    store.put(
                        name, ids, vecs, cols,
                        metric=meta.get("metric"), _log=False,
                    )
                else:
                    store.get_or_create(
                        name, meta["dim"], meta.get("metric")
                    )
                ds = store.get(name)
                if blob["bm25"]:
                    ds.bm25 = BM25Index.import_state(blob["bm25"])
                if blob["graph"] and getattr(ds.graph, "path", None) is None:
                    # disk-backed stores replayed their own log on
                    # open; importing the blob would double the edges
                    ds.graph = GraphStore.import_state(blob["graph"])
                n += 1
        reg.set("longbow_warmup_progress_percent", 50)
        t_wal = _time.perf_counter()
        import itertools as _it

        _pre = Path(
            str(self.dir / "wal.log") + WAL.PRE_SNAPSHOT_SUFFIX
        )
        _frames = _it.chain(
            # a pending pre-snapshot segment (crash mid-snapshot) is
            # OLDER than the live log: replay it first. If the crash
            # happened after the snapshot swap but before the segment
            # was deleted, re-applying it is harmless (LWW upserts).
            WAL.replay(_pre) if _pre.exists() else iter(()),
            WAL.replay(self.dir / "wal.log"),
        )
        for seq, ts, name, kind, payload in _frames:
            try:
                if kind == KIND_BATCH:
                    table = WAL.decode_batch(payload)
                    ids, vecs, cols, put_ts = _table_to_put(table)
                    meta = table.schema.metadata or {}
                    metric = meta.get(b"longbow.metric")
                    store.put(
                        name, ids, vecs, cols,
                        metric=metric.decode() if metric else None,
                        _log=False,
                        timestamp=put_ts if put_ts is not None else ts,
                    )
                else:
                    op = json.loads(payload)
                    if op["op"] == "delete":
                        store.delete(name, op["ids"], _log=False)
                    elif op["op"] == "drop":
                        store.drop(name, _log=False)
                    elif op["op"] == "add_edge":
                        # disk-backed edge stores already restored this
                        # edge from their OWN append-only log; re-adding
                        # from the WAL tail would write a second durable
                        # copy that compounds on every restart
                        try:
                            g = store.get(name).graph
                        except KeyError:
                            g = None
                        if (
                            g is not None
                            and getattr(g, "path", None) is not None
                            and g.has_edge(
                                op["from"], op["to"], op["type"],
                                op["weight"],
                            )
                        ):
                            pass
                        else:
                            store.add_edge(
                                name, op["from"], op["to"], op["type"],
                                op["weight"], _log=False,
                            )
            except (ValueError, KeyError) as e:
                # a semantically-rejected frame (e.g. one logged before
                # its validation bug was fixed) must not brick startup
                # forever — skip it LOUDLY; CRC corruption still
                # fail-fasts inside WAL.replay itself
                import logging

                logging.getLogger("longbow.storage").error(
                    "skipping unreplayable WAL frame seq=%s ds=%s: %s",
                    seq, name, e,
                )
                reg.inc("longbow_wal_replay_skipped_frames_total")
            n += 1
        reg.observe(
            "longbow_wal_replay_duration_seconds",
            _time.perf_counter() - t_wal,
        )
        reg.set("longbow_warmup_progress_percent", 100)
        return n

    def close(self) -> None:
        self.wal.close()
