"""Dataset: one collection of vectors + metadata + indexes.

Mirrors the reference Dataset's responsibilities (reference:
dataset.go:35-102): records, tombstones, primary user-id index, the
vector index, metric from schema metadata (`longbow.metric`,
dataset.go:176-189), filter bitmask generation with caching
(dataset.go:226-297), and hooks for BM25/graph/PQ state.
"""
from __future__ import annotations

import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.hybrid.bm25 import BM25Index
from longbow_tpu.hybrid.graph_store import GraphStore
from longbow_tpu.index.factory import make_index
from longbow_tpu.index.hnsw import HNSWConfig
from longbow_tpu.ops.distance import MASKED, Metric
from longbow_tpu.query.filters import ColumnStore, FilterCache
from longbow_tpu.query.parser import Filter
from longbow_tpu.wire_types import NATIVE_VECTOR_DTYPES  # noqa: F401 (re-export)

# string columns indexed into BM25 for hybrid search (the reference
# indexes document text fed through its BM25 pipeline,
# bm25_inverted_index.go; we adopt conventional column names)
TEXT_COLUMNS = ("text", "content", "body")

# schema metadata key + value aliases (reference: dataset.go:176-189)
METRIC_METADATA_KEY = "longbow.metric"
_METRIC_ALIASES = {
    "euclidean": Metric.L2,
    "l2": Metric.L2,
    "cosine": Metric.COSINE,
    "dot_product": Metric.DOT,
    "dot": Metric.DOT,
}


class Dataset:
    def __init__(
        self,
        name: str,
        dim: int,
        metric: str = Metric.L2,
        *,
        dtype=jnp.float32,
        hnsw_config: Optional[HNSWConfig] = None,
        migration_threshold: int = 200_000,
        index_kind: str = "adaptive",
        index_params: Optional[dict] = None,
        graph_disk_path=None,
    ):
        self.name = name
        self.dim = dim
        self.metric = _METRIC_ALIASES.get(metric.lower(), None) or Metric.validate(metric)
        # construction params kept for compaction rebuilds and snapshot
        # metadata (quantized kinds have none of AdaptiveIndex's attrs,
        # so rebuilds must come from these, not from the index object)
        self.dtype = dtype
        self.hnsw_config = hnsw_config
        self.migration_threshold = migration_threshold
        self.index_kind = (index_kind or "adaptive").lower()
        self.index_params = dict(index_params or {})
        # graph_disk is consumed by the DATASET (disk edge store), not
        # the index — but it stays in index_params so snapshots record
        # it and a restart re-attaches the disk backing
        _idx_params = {
            k: v
            for k, v in self.index_params.items()
            if k != "graph_disk"
        }
        self.index = make_index(
            index_kind,
            dim,
            self.metric,
            dtype=dtype,
            migration_threshold=migration_threshold,
            hnsw_config=hnsw_config,
            **_idx_params,
        )
        self.columns = ColumnStore(self.index.capacity)
        self.filter_cache = FilterCache()
        # primary index: user id -> internal row
        # (reference: PrimaryIndex / ChunkedLocationStore, location_store.go:34)
        self._id_to_row: dict = {}
        self._row_to_id: list = []
        self._row_ids_np: Optional[np.ndarray] = None  # lazy cache
        # LWW timestamps for replication conflict resolution
        # (reference: lww.go:8)
        self._lww: dict = {}
        self.bm25 = BM25Index()
        if graph_disk_path is not None:
            # disk-backed edge store (reference: disk_graph.go:19)
            from longbow_tpu.hybrid.graph_store import DiskGraphStore

            self.graph = DiskGraphStore(graph_disk_path)
        else:
            self.graph = GraphStore()
        # RLock: export_delta/_bucket_map nest under it, and merkle
        # snapshots must hold it to iterate _lww safely vs ingest
        self._lock = threading.RLock()
        # serializes compactions (the rebuild runs OUTSIDE self._lock
        # so serving continues; two concurrent rebuilds of the same
        # dataset would race on the trio swap)
        self._compact_mu = threading.Lock()
        self.created_at = time.time()
        # dataset-level TTL eviction input (reference: docs/eviction.md
        # — LONGBOW_TTL drops datasets not read or written for the
        # duration); touched by put/search/scan
        self.last_access = time.time()

    def touch(self) -> None:
        self.last_access = time.time()

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._id_to_row)

    @property
    def live_count(self) -> int:
        return len(self._id_to_row)

    def put(
        self,
        ids: np.ndarray,
        vectors: np.ndarray,
        columns: Optional[dict] = None,
        timestamp=None,
    ) -> None:
        """Upsert rows by user id. Duplicate ids tombstone the old row
        and write a new one, last-writer-wins by timestamp
        (reference: lww.go, UpdatePrimaryIndex store_actions.go:813).

        timestamp: scalar, per-row array (coalesced ingest batches
        carry each job's origin ts), or None (now). In-batch duplicate
        ids dedupe to the newest occurrence before the device append.

        Hot path discipline: ids become native Python keys in ONE
        `.tolist()` call; all dict updates run over pre-converted lists
        (the per-row `_key()` conversion was 45% of ingest CPU)."""
        ids = np.asarray(ids)
        # device-input fast path: a jax array (e.g. a pre-staged bf16
        # block) goes straight to the index — np conversion here would
        # fetch it back to host (~13s at 1M rows through the relay)
        self.touch()
        device_input = isinstance(vectors, jax.Array)
        # list-of-blocks fast path: the coalescing ingest queue hands
        # merged groups through as a list of np blocks (same dtype/dim,
        # enforced by its group key) so the payload is copied once —
        # into the flat tier's staging buffer — instead of twice. Only
        # indexes that advertise accepts_blocks take the list; anything
        # else (and the rare LWW-drop path below) concatenates here.
        blocks: Optional[list] = None
        if isinstance(vectors, list):
            if not getattr(self.index, "accepts_blocks", False):
                vectors = np.concatenate(vectors)
            else:
                blocks = vectors
        if not device_input:

            def _canon(v):
                # preserve the ingest dtype (NATIVE_VECTOR_DTYPES is
                # the canonical matrix): int8/uint8 reach an sq8 index
                # as raw codes; f16 reaches f16 storage. int32 converts
                # HERE (the index add paths take float input; > 2^24
                # rounds, as in the reference); else casts to f32.
                if v.dtype in (np.float16, np.int8, np.uint8):
                    return np.ascontiguousarray(v)
                return np.ascontiguousarray(v, dtype=np.float32)

            if blocks is not None:
                blocks = [_canon(b) for b in blocks]
                vectors = blocks
            else:
                vectors = _canon(vectors)
        n = len(ids)
        n_vec = (
            sum(b.shape[0] for b in blocks)
            if blocks is not None
            else vectors.shape[0]
        )
        if n_vec != n:
            raise ValueError("ids/vectors length mismatch")
        keys = ids.tolist()
        ts_list = None
        if isinstance(timestamp, np.ndarray):
            ts_list = timestamp.tolist()
            ts = ts_list[-1] if ts_list else time.time()
        else:
            ts = timestamp if timestamp is not None else time.time()

        with self._lock:
            lww = self._lww
            idr = self._id_to_row
            # LWW stale-drop + in-batch dedupe (newest occurrence wins)
            keep = np.ones(n, dtype=bool)
            seen: dict = {}
            dropped = False
            for j, k in enumerate(keys):
                tj = ts_list[j] if ts_list is not None else ts
                old_ts = lww.get(k)
                if old_ts is not None and old_ts > tj:
                    keep[j] = False
                    dropped = True
                    continue
                prev = seen.get(k)
                if prev is not None:
                    if ts_list is not None and ts_list[prev] > tj:
                        keep[j] = False
                        dropped = True
                        continue
                    keep[prev] = False
                    dropped = True
                seen[k] = j
            if dropped:
                sel = np.nonzero(keep)[0]
                if blocks is not None:  # rare path: pay the merge here
                    vectors = np.concatenate(blocks)
                    blocks = None
                ids, vectors = ids[sel], vectors[sel]
                sl = sel.tolist()
                keys = [keys[j] for j in sl]
                if ts_list is not None:
                    ts_list = [ts_list[j] for j in sl]
                if columns:
                    columns = {
                        k: np.asarray(v)[sel] for k, v in columns.items()
                    }
                n = len(keys)
            if n == 0:
                return

            # schema evolution is additive-only: reject type flips
            # BEFORE any mutation (reference: docs/schema_evolution.md
            # "existing columns must match exactly (name and type)")
            self.columns.check_types(columns or {})

            # tombstone overwritten rows — and clear their slot in the
            # row->id map, or hybrid/sparse filtering keeps matching
            # the id against its OLD column values via row_ids_array
            stale_rows = [idr[k] for k in keys if k in idr]
            if stale_rows:
                self.index.delete_rows(np.asarray(stale_rows))
                for r in stale_rows:
                    if r < len(self._row_to_id):
                        self._row_to_id[r] = None
                self._row_ids_np = None

            rows = self.index.add(vectors)
            self.columns.append(
                columns or {}, n, self.index.capacity, rows=rows
            )
            if columns:
                for tc in TEXT_COLUMNS:
                    if tc in columns:
                        vals = np.asarray(columns[tc])
                        for j in range(n):
                            self.bm25.add(keys[j], str(vals[j]))
                        break
            rows_list = rows.tolist()
            if ts_list is None:
                for k, r in zip(keys, rows_list):
                    idr[k] = r
                    lww[k] = ts
            else:
                for k, r, tj in zip(keys, rows_list, ts_list):
                    idr[k] = r
                    lww[k] = tj
            # max(rows), not rows[-1]: mesh-sharded indexes return
            # shard-strided (non-ascending) row ids
            need = max(rows_list) + 1 - len(self._row_to_id)
            if need > 0:
                self._row_to_id.extend([None] * need)
            r2i = self._row_to_id
            for r, k in zip(rows_list, keys):
                r2i[r] = k
            self._row_ids_np = None
            self.filter_cache.invalidate()

    @staticmethod
    def _key(uid):
        return uid.item() if hasattr(uid, "item") else uid

    def apply_remote_tombstones(self, ids, tss) -> int:
        """Anti-entropy tombstones, LWW-checked atomically under the
        dataset lock: a concurrent newer local put survives and its
        timestamp never rolls back to the remote tombstone's."""
        with self._lock:
            rows = []
            n = 0
            for uid, ts in zip(ids, tss):
                key = self._key(np.asarray(uid))
                local = self._lww.get(key)
                if local is not None and local >= ts:
                    continue
                row = self._id_to_row.pop(key, None)
                self._lww[key] = ts
                n += 1
                if row is not None:
                    rows.append(row)
                    self.bm25.remove(key)
                    if row < len(self._row_to_id):
                        self._row_to_id[row] = None
            if rows:
                self.index.delete_rows(np.asarray(rows))
                self._row_ids_np = None
                self.filter_cache.invalidate()
            return n

    def delete(self, ids) -> int:
        """Delete by user id; returns number removed
        (reference: DoAction 'delete', store_actions.go:103)."""
        with self._lock:
            rows = []
            for uid in np.asarray(ids):
                key = self._key(uid)
                row = self._id_to_row.pop(key, None)
                if row is not None:
                    rows.append(row)
                    self._lww[key] = time.time()
                    self.bm25.remove(key)
                    if row < len(self._row_to_id):
                        self._row_to_id[row] = None
            if rows:
                self.index.delete_rows(np.asarray(rows))
                self._row_ids_np = None
                self.filter_cache.invalidate()
            return len(rows)

    # ------------------------------------------------------------------

    def filter_mask(
        self, filters: list[Filter], *, _columns=None, _index=None
    ) -> Optional[jax.Array]:
        """Predicate filters -> device row mask, cached
        (reference: GenerateFilterBitset dataset.go:226). _columns/
        _index: consistency snapshots from search (compaction swaps
        both; a mask built for the old row numbering must pair with
        the old index)."""
        cols = _columns if _columns is not None else self.columns
        idx = _index if _index is not None else self.index
        mask = self.filter_cache.get_or_eval(cols, filters)
        if mask is None:
            return None
        cap = idx.capacity
        if mask.shape[0] < cap:
            mask = jnp.pad(mask, (0, cap - mask.shape[0]))
        elif mask.shape[0] > cap:
            mask = mask[:cap]
        return mask

    def warm(self) -> None:
        """Pre-compile this dataset's serving search program off the
        query path. Indexes that expose warm() compile WITHOUT holding
        their dispatch lock (FlatIndex.warm — a cold-shape compile
        inside search() blocks concurrent ingest flushes behind the
        lock for the compile's duration); anything else warms through
        a plain 1-query search."""
        w = getattr(self.index, "warm", None)
        if w is not None:
            w()
            return
        self.search(np.zeros((1, self.dim), np.float32), 10)

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        filters: Optional[list] = None,
        ef_search: Optional[int] = None,
        exact: bool = False,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched search -> (ids [B,k] object, scores [B,k] f32,
        valid_mask [B,k] bool). Scores follow reference semantics:
        distance for l2/cosine, raw inner product for dot."""
        self.touch()
        # snapshot the (index, row map, columns) TRIO under the lock:
        # compaction swaps them for rebuilt ones with renumbered rows,
        # and mixing a new index with an old row map (or vice versa)
        # returns wrong ids; the old objects stay internally consistent
        with self._lock:
            idx = self.index
            r2i = self._row_to_id
            cols = self.columns
        mask = self.filter_mask(filters or [], _columns=cols, _index=idx)
        if (
            mask is not None
            and not exact
            and getattr(idx, "_graph", None) is not None
        ):
            # Selectivity routing (round 5): highly-selective
            # predicates starve graph beams — measured 0.77 recall@10
            # at 1% selectivity at 1M vs ~1.0 through the exact scan
            # (benchmarks/filtered_1M.json). Below ~2% eligible rows,
            # serve the filtered query from the exact path. The count
            # is cached per (mask, store version), so the device
            # reduction costs one round trip per distinct filter, not
            # per query. (Reference pursues the same goal with
            # adaptive oversampling, adaptive_search.go:7; the TPU
            # answer is the scan it already has.)
            cnt = self.filter_cache.selectivity_count(
                filters or [], mask
            )
            if cnt is not None and cnt < max(4096, idx.capacity // 50):
                exact = True
        # bucket the batch dim to powers of two for host-origin queries:
        # jitted search programs compile per input shape, and the
        # serving coalescer produces whatever size happened to queue —
        # each fresh B cost a full remote compile. FlatIndex buckets
        # internally to its canonical kernel shapes; this covers every
        # other index kind (results sliced back below).
        b_orig = None
        if isinstance(queries, np.ndarray):
            from longbow_tpu.ops.distance import bucket_queries

            queries2d = np.atleast_2d(queries)
            padded, b = bucket_queries(queries2d)
            if padded.shape[0] != queries2d.shape[0]:
                queries, b_orig = padded, b
        t0 = time.perf_counter()
        d, r = idx.search(
            jnp.asarray(queries, dtype=jnp.float32),
            k,
            filter_mask=mask,
            ef_search=ef_search,
            exact=exact,
        )
        dt = time.perf_counter() - t0
        if dt > 1.0:
            # first call on a fresh (corpus, batch) shape = XLA/Mosaic
            # compile (seconds-to-minutes on this platform); warm calls
            # are milliseconds, so >1s is a reliable compile signal
            try:
                from longbow_tpu.metrics import get_registry

                get_registry().histogram(
                    "longbow_tpu_kernel_compile_seconds"
                ).observe(dt)
            except Exception:
                pass
        # overlap the two device->host fetches: sequential np.asarray
        # calls pay two full relay round trips (~26ms each on a bad
        # relay day); async copies issue both transfers before blocking
        for _a in (d, r):
            try:
                _a.copy_to_host_async()
            except AttributeError:
                pass  # already a numpy array (host-only index kinds)
        d = np.asarray(d)
        r = np.asarray(r)
        if b_orig is not None:
            d, r = d[:b_orig], r[:b_orig]
        from longbow_tpu.ops.distance import MASKED_GUARD

        ok = (d < float(MASKED_GUARD)) & (r >= 0)
        scores = -d if self.metric == Metric.DOT else d
        ids = np.empty(r.shape, dtype=object)
        for b in range(r.shape[0]):
            for j in range(r.shape[1]):
                ids[b, j] = (
                    r2i[r[b, j]]
                    if ok[b, j] and r[b, j] < len(r2i)
                    else None
                )
                if ids[b, j] is None:
                    ok[b, j] = False
        return ids, scores, ok

    def row_ids_array(self) -> np.ndarray:
        """row -> user id as an object ndarray (None = dead row), cached
        until the next mutation — keeps allowed-id set construction off
        the O(N)-python path at serving time."""
        if self._row_ids_np is None or len(self._row_ids_np) != len(
            self._row_to_id
        ):
            self._row_ids_np = np.asarray(self._row_to_id, dtype=object)
        return self._row_ids_np

    def graph_heuristic(self):
        """Embedding-distance heuristic for A* graph navigation
        (reference: navigator_strategy_astar.go:11). Vector fetches go
        through a small host cache — each miss is one device gather
        (~30ms behind a relay, microseconds locally)."""
        cache: dict = {}

        def vec(uid):
            v = cache.get(uid)
            if v is None:
                row = self._id_to_row.get(self._key(np.asarray(uid)))
                if row is None:
                    return None
                if len(cache) > 256:
                    cache.clear()
                v = np.asarray(
                    self.index.get_vectors(np.asarray([row]))[0],
                    np.float32,
                )
                cache[uid] = v
            return v

        def h(node, dst):
            a, b = vec(node), vec(dst)
            if a is None or b is None:
                return 0.0  # unknown node: no guidance
            return float(np.linalg.norm(a - b))

        return h

    def search_by_id(self, uid, k: int, **kw):
        """reference: VectorSearchByID action (store_actions.go:341)."""
        import time as _time

        from longbow_tpu.metrics import get_registry

        t0 = _time.perf_counter()
        row = self._id_to_row.get(self._key(np.asarray(uid)))
        if row is None:
            raise KeyError(f"id {uid!r} not found in {self.name!r}")
        vec = self.index.get_vectors(np.asarray([row]))
        get_registry().observe(
            "longbow_id_resolution_duration_seconds",
            _time.perf_counter() - t0,
        )
        return self.search(vec, k, **kw)

    def get_vectors_by_rows(self, rows: np.ndarray) -> np.ndarray:
        return self.index.get_vectors(rows)

    # -- anti-entropy (reference: ExportDelta/ApplyDelta
    #    types/interfaces.go:56-57, merkle.go) -------------------------

    def _bucket_map(self) -> dict:
        """bucket -> [uids], cached until the id set grows (bucket_of
        depends only on the uid, so ts-only LWW updates never move a
        row between buckets). Without this, every export_delta call
        re-hashed the ENTIRE id set — 256 buckets x 65k ids = 16.6M
        hashes per sync round (the chaos-soak heal regression)."""
        from longbow_tpu.distributed.merkle import bucket_of

        with self._lock:  # RLock: callers may already hold it
            ver = len(self._lww)
            cached = getattr(self, "_bucket_cache", None)
            if cached is not None and cached[0] == ver:
                return cached[1]
            m: dict[int, list] = {}
            for uid in self._lww:
                m.setdefault(bucket_of(uid), []).append(uid)
            self._bucket_cache = (ver, m)
            return m

    def export_delta(self, bucket: int, have=None) -> dict:
        """Rows + deletion markers in one Merkle bucket. Vectors come
        from ONE batched index gather (per-row gathers cost
        ~0.45s/bucket at 65k rows -> ~2min per full sync).

        have: optional [[uid, ts], ...] of what the puller already
        holds — only strictly-newer/missing rows are returned, so a
        bucket that differs by one row costs one row, not the whole
        bucket (restart catch-up divergence is spread uniformly over
        hash buckets, the worst case for whole-bucket transfer)."""
        have_ts = {u: t for u, t in (have or [])}
        dead: list = []
        dead_ts: list = []
        live_uids: list = []
        live_ts: list = []
        live_rows: list = []
        # capture (row, ts) pairs atomically under the mutation lock:
        # reading ts after the gather can pair an OLD row's vector with
        # a NEWER concurrent put's ts — both sides then hash identical
        # merkle leaves and the stale vector never re-syncs
        with self._lock:
            lww = self._lww
            for uid in self._bucket_map().get(bucket, ()):
                ts = lww.get(uid, 0.0)
                hts = have_ts.get(uid)
                if hts is not None and ts <= hts:
                    continue  # puller is already current for this row
                row = self._id_to_row.get(uid)
                if row is None:
                    dead.append(uid)
                    dead_ts.append(ts)
                else:
                    live_uids.append(uid)
                    live_ts.append(ts)
                    live_rows.append(row)
        rows = [
            {"id": u, "ts": t, "deleted": True}
            for u, t in zip(dead, dead_ts)
        ]
        if live_rows:
            rowarr = np.asarray(live_rows)
            vecs = self.index.get_vectors(rowarr)
            # metadata columns ride the delta too — rows healed by
            # anti-entropy without them would silently fail filters and
            # drop out of BM25, and identical merkle leaves would hide
            # the loss forever
            cols = (
                self.columns.host_view(rowarr)
                if self.columns.fields()
                else {}
            )
            for j, (u, t, vec) in enumerate(
                zip(live_uids, live_ts, vecs)
            ):
                rec = {"id": u, "ts": t, "vector": vec.tolist()}
                if cols:
                    rec["columns"] = {
                        k: (
                            v[j].item()
                            if hasattr(v[j], "item")
                            else v[j]
                        )
                        for k, v in cols.items()
                    }
                rows.append(rec)
        return {"dataset": self.name, "bucket": bucket, "rows": rows}

    def merkle_state(self) -> dict:
        from longbow_tpu.distributed.merkle import MerkleTree

        t = MerkleTree.from_dataset(self)
        return {"root": t.root_hex, "leaves": t.leaves_hex()}

    # ------------------------------------------------------------------

    def hbm_bytes(self) -> int:
        """Device-memory footprint of this dataset's index arrays
        (the reference tracks process memory via its arenas/GC tuner;
        here the accounting is exact array-byte math)."""
        total = 0
        idx = self.index
        objs = []
        graph = getattr(idx, "_graph", None)
        flat = getattr(idx, "_flat", None)
        inner = getattr(idx, "_inner", None)
        if graph is not None:
            objs = list(graph.state)
        elif flat is not None:
            # post-flush capacity projection: host-staged rows are
            # committed device bytes (they land on the next flush), so
            # backpressure must see them before the flush happens
            cap = flat.capacity
            total += cap * (
                flat.dim * jnp.dtype(flat.dtype).itemsize + 4 + 1
            )
        elif inner is not None:  # quantized adapters
            for attr in ("codes", "codebooks", "valid", "rerank_vectors",
                         "vectors_bf16", "norms_sq"):
                a = getattr(inner, attr, None)
                if a is not None and hasattr(a, "size"):
                    objs.append(a)
        for a in objs:
            if a is not None and hasattr(a, "size"):
                total += a.size * a.dtype.itemsize
        for col in self.columns._numeric.values():
            total += col.size * col.dtype.itemsize
        for col in self.columns._str_codes.values():
            total += col.size * col.dtype.itemsize
        return total

    def stats(self) -> dict:
        return {
            "name": self.name,
            "dim": self.dim,
            "metric": self.metric,
            "live_rows": self.live_count,
            "tombstones": len(self.index) - self.live_count,
            "index_kind": self.index.kind,
            "index_rows": len(self.index),
            "capacity": self.index.capacity,
            "hbm_bytes": self.hbm_bytes(),
            "fields": self.columns.fields(),
        }
