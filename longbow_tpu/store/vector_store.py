"""VectorStore: the top-level object owning all datasets.

Mirrors the reference VectorStore's surface (reference: store.go:29-120,
getOrCreateDataset :294, namespace.go:14-83) minus Go-isms: the RCU
atomic dataset map becomes a plain dict under a lock (the serving edge
is Python; device work is where concurrency lives), and worker queues
become direct calls — ingestion batching happens in serving/ingest.
"""
from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.hnsw import HNSWConfig
from longbow_tpu.ops.distance import Metric
from longbow_tpu.store.dataset import Dataset
from longbow_tpu.wire_types import NATIVE_VECTOR_DTYPES
from longbow_tpu.utils.query_cache import QueryCache

# vector dtypes ingested without a cast (canonical matrix:
# wire_types.NATIVE_VECTOR_DTYPES); the index tier converts exactly
# (f16/i8/u8 -> f32 is lossless) or stores bytes 1:1 (sq8 identity)
_NATIVE_VEC_DTYPES = NATIVE_VECTOR_DTYPES


class VectorStore:
    def __init__(
        self,
        *,
        default_metric: str = Metric.L2,
        # bf16 storage: half the HBM traffic, ~0.99 self-recall@10, and
        # the only dtype the fused Pallas scan serves (see FlatIndex);
        # pass jnp.float32 for bit-exact distances via the XLA path
        dtype=jnp.bfloat16,
        migration_threshold: int = 200_000,
        hnsw_config: Optional[HNSWConfig] = None,
        query_cache_size: int = 1024,
        query_cache_ttl: float = 60.0,
        persist_dir=None,
        wal_sync: str = "batch",
        wal_io_uring: bool = False,
        wal_direct_io: bool = False,
        snapshot_backend=None,
        default_index_kind: str = "adaptive",
        default_index_params: Optional[dict] = None,
    ):
        self._datasets: dict[str, Dataset] = {}
        self._namespaces: dict[str, set] = {}  # ns -> dataset names
        self._lock = threading.Lock()
        self.default_metric = Metric.validate(default_metric)
        self.dtype = dtype
        self.migration_threshold = migration_threshold
        self.hnsw_config = hnsw_config or HNSWConfig()
        # deployment-wide default for datasets created implicitly by
        # DoPut (an explicit CreateNamespace index wins); lets a
        # multi-chip deployment default to the mesh tier
        self.default_index_kind = default_index_kind
        self.default_index_params = dict(default_index_params or {})
        self.query_cache: QueryCache = QueryCache(
            query_cache_size, query_cache_ttl
        )
        self.started_at = time.time()
        # eviction manager hook: serving wires one up so LRU/LFU see
        # read recency (reference: record_eviction.go feeds access
        # stats from reads)
        self.eviction = None
        # pluggable hybrid re-ranker: (query_text, [ids]) -> scores
        # (reference: Reranker interface / CrossEncoder slot in the
        # hybrid pipeline, hybrid_pipeline.go:120-200)
        self.reranker = None
        # memory backpressure hook (reference:
        # memory_backpressure.go:31): hard limit rejects writes here
        self.backpressure = None
        # persistence (reference: InitPersistence store_persistence.go:12
        # — replay WAL + load snapshots before serving)
        self.engine = None
        if persist_dir is not None:
            from longbow_tpu.storage.engine import StorageEngine

            self.engine = StorageEngine(
                persist_dir, sync=wal_sync,
                snapshot_backend=snapshot_backend,
                io_uring=wal_io_uring,
                direct_io=wal_direct_io,
            )
            self.engine.recover(self)

    # -- dataset lifecycle --------------------------------------------

    def get_or_create(
        self,
        name: str,
        dim: int,
        metric: Optional[str] = None,
        *,
        index_kind: Optional[str] = None,
        index_params: Optional[dict] = None,
        dtype_hint=None,
    ) -> Dataset:
        # dtype-aware creation (reference ingests f16/i8/u8 vector
        # columns natively, docs/performance.md:27-53): a dataset first
        # seen with integer vectors stores the bytes 1:1 as
        # identity-affine SQ8 codes; one first seen with f16 stores
        # float16 — no lossy bounce through a coarser storage dtype.
        # Explicit index choices always win over the hint.
        ds_dtype = self.dtype
        if dtype_hint is not None and index_kind is None and (
            self.default_index_kind in (None, "adaptive")
        ):
            hint = np.dtype(dtype_hint)
            if hint in (np.dtype(np.int8), np.dtype(np.uint8)):
                index_kind = "sq8"
            elif hint == np.dtype(np.float16):
                import jax.numpy as _jnp

                ds_dtype = _jnp.float16
        with self._lock:
            ds = self._datasets.get(name)
            if ds is None:
                params = (
                    index_params
                    if index_params is not None
                    else self.default_index_params
                )
                graph_disk_path = None
                if params and params.get("graph_disk"):
                    # disk-backed edge store lives next to the WAL (or
                    # tmp when the store is memory-only)
                    import tempfile

                    base = (
                        self.engine.dir
                        if self.engine is not None
                        else Path(tempfile.gettempdir()) / "longbow_graphs"
                    )
                    graph_disk_path = (
                        Path(base) / "graphs"
                        / f"{name.replace('/', '_')}.edges"
                    )
                ds = Dataset(
                    name,
                    dim,
                    metric or self.default_metric,
                    dtype=ds_dtype,
                    hnsw_config=self.hnsw_config,
                    migration_threshold=self.migration_threshold,
                    index_kind=index_kind or self.default_index_kind,
                    index_params=params,
                    graph_disk_path=graph_disk_path,
                )
                self._datasets[name] = ds
                ns = name.split("/", 1)[0] if "/" in name else "default"
                self._namespaces.setdefault(ns, set()).add(name)
                from longbow_tpu.metrics import get_registry

                get_registry().set(
                    "longbow_store_active_datasets", len(self._datasets)
                )
            elif ds.dim != dim:
                raise ValueError(
                    f"dataset {name!r} has dim {ds.dim}, put has {dim}"
                )
            return ds

    def restore_dataset(self, name: str, blob: dict) -> Dataset:
        """Rebuild a dataset from a v2 snapshot blob: imported index
        state (no rebuild/retrain), column arrays, id maps and LWW
        timestamps (reference: arrow_hnsw_persistence.go,
        pq/persistence.go:15-38, store_persistence.go:151)."""
        import jax.numpy as _jnp

        from longbow_tpu.index.factory import import_index
        from longbow_tpu.query.filters import ColumnStore

        meta = blob["meta"]
        js = blob.get("json") or {}
        aux = blob.get("aux") or {}
        try:
            dtype = _jnp.dtype(meta.get("dtype", "bfloat16"))
        except TypeError:
            dtype = self.dtype
        restore_params = meta.get("index_params") or {}
        graph_disk_path = None
        if restore_params.get("graph_disk") and self.engine is not None:
            # re-attach the disk edge store (its append-only log IS the
            # durable edge state and replays itself on open) — without
            # this a disk-backed graph restarted fully in-memory
            graph_disk_path = (
                Path(self.engine.dir) / "graphs"
                / f"{name.replace('/', '_')}.edges"
            )
        ds = Dataset(
            name,
            meta["dim"],
            meta["metric"],
            dtype=dtype,
            hnsw_config=self.hnsw_config,
            migration_threshold=meta.get(
                "migration_threshold", self.migration_threshold
            ),
            index_kind=meta.get("index_kind", "adaptive"),
            index_params=restore_params,
            graph_disk_path=graph_disk_path,
        )
        ds.index = import_index(blob["index_state"])
        ds.columns = ColumnStore.import_state(
            {
                "count": js.get("col_count", 0),
                "numeric": {
                    k[len("colnum:"):]: v
                    for k, v in aux.items()
                    if k.startswith("colnum:")
                },
                "str_codes": {
                    k[len("colstr:"):]: v
                    for k, v in aux.items()
                    if k.startswith("colstr:")
                },
                "str_dicts": js.get("str_dicts", {}),
            },
            ds.index.capacity,
        )
        ds._row_to_id = list(js.get("row_to_id", []))
        ds._id_to_row = {
            uid: r for r, uid in enumerate(ds._row_to_id) if uid is not None
        }
        ds._lww = {k: ts for k, ts in js.get("lww", [])}
        with self._lock:
            self._datasets[name] = ds
            ns = name.split("/", 1)[0] if "/" in name else "default"
            self._namespaces.setdefault(ns, set()).add(name)
        return ds

    def get(self, name: str) -> Dataset:
        ds = self._datasets.get(name)
        if ds is None:
            raise KeyError(f"dataset {name!r} not found")
        return ds

    def drop(self, name: str, *, _log: bool = True) -> bool:
        """reference: 'delete-dataset' action (store_actions.go:245)."""
        from contextlib import nullcontext

        guard = (
            self.engine.commit_guard()
            if self.engine is not None and _log
            else nullcontext()
        )
        with guard:
            if self.engine is not None and _log:
                self.engine.log_drop(name)
            with self._lock:
                ds = self._datasets.pop(name, None)
                for members in self._namespaces.values():
                    members.discard(name)
                self.query_cache.clear()
                if ds is not None:
                    from longbow_tpu.metrics import get_registry

                    reg = get_registry()
                    reg.inc("longbow_store_dropped_datasets_total")
                    reg.set(
                        "longbow_store_active_datasets",
                        len(self._datasets),
                    )
                return ds is not None

    def list_datasets(self) -> list[str]:
        return sorted(self._datasets)

    def list_namespaces(self) -> list[str]:
        return sorted(self._namespaces)

    def namespace_dataset_counts(self) -> dict[str, int]:
        """namespace -> live dataset count (reference:
        GetNamespaceDatasetCount, servers.go:311)."""
        with self._lock:
            return {ns: len(m) for ns, m in self._namespaces.items()}

    # -- data plane ---------------------------------------------------

    def put(
        self,
        dataset: str,
        ids,
        vectors: np.ndarray,
        columns: Optional[dict] = None,
        metric: Optional[str] = None,
        *,
        _log: bool = True,
        timestamp=None,
    ) -> None:
        import jax as _jax

        dtype_hint = None
        if isinstance(vectors, list):
            # coalesced-ingest blocks (same dtype/dim per the queue's
            # group key): defer the merge — Dataset.put stages blocks
            # into the index without an up-front concatenate. The WAL
            # path below still needs one contiguous array per frame.
            if self.engine is not None and _log:
                vectors = np.concatenate(vectors)
            else:
                if vectors[0].dtype in _NATIVE_VEC_DTYPES:
                    dtype_hint = vectors[0].dtype
                dim = vectors[0].shape[1]
        if not isinstance(vectors, (list, _jax.Array)):
            vectors = np.atleast_2d(np.asarray(vectors))
            if vectors.dtype in _NATIVE_VEC_DTYPES:
                dtype_hint = vectors.dtype
            else:
                vectors = vectors.astype(np.float32)
        if not isinstance(vectors, list):
            dim = vectors.shape[1]
        if self.backpressure is not None:
            self.backpressure.check_admit(self)
        ds = self.get_or_create(
            dataset, dim, metric, dtype_hint=dtype_hint
        )
        # validate BEFORE the WAL append: a rejected frame in the log
        # would re-raise on every restart and brick recovery
        ds.columns.check_types(columns or {})
        if self.engine is not None and _log:
            # WAL append + apply are one atomic unit vs snapshot's
            # export+truncate — otherwise a concurrent snapshot can
            # truncate a frame whose apply it didn't export
            with self.engine.commit_guard():
                self.engine.log_put(
                    dataset, ids, vectors, columns, metric,
                    timestamp=timestamp,
                )
                ds.put(np.asarray(ids), vectors, columns, timestamp=timestamp)
        else:
            ds.put(np.asarray(ids), vectors, columns, timestamp=timestamp)
        if self.backpressure is not None:
            # the admission slot is held only for the apply (reference
            # pairs acquires/releases around each reservation)
            from longbow_tpu.metrics import get_registry

            get_registry().inc(
                "longbow_memory_backpressure_releases_total"
            )
        self.query_cache.clear()
        self._observe_dataset(ds)
        if self.engine is not None and _log:
            self.engine.maybe_snapshot(self)

    def _observe_dataset(self, ds) -> None:
        """Refresh per-dataset gauges (reference metric names,
        README.md:96-110) — called from every mutation."""
        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        reg.gauge("longbow_vector_index_size", ("dataset",)).labels(
            dataset=ds.name
        ).set(len(ds.index))
        reg.gauge("longbow_tombstones_total", ("dataset",)).labels(
            dataset=ds.name
        ).set(len(ds.index) - ds.live_count)
        reg.gauge("longbow_tpu_hbm_bytes_in_use", ("dataset",)).labels(
            dataset=ds.name
        ).set(ds.hbm_bytes())
        # graph-index internals (reference: docs/metrics.md HNSW Index;
        # graph_height is 1 when the single-layer TPU graph is active —
        # beam search from entry samples replaces the HNSW hierarchy)
        idx = ds.index
        graph = getattr(idx, "_graph", None)
        if graph is None and hasattr(idx, "state"):
            graph = idx
        if graph is not None and getattr(graph, "state", None) is not None:
            reg.set(
                "longbow_hnsw_node_count",
                getattr(graph, "count", len(idx)),
                dataset=ds.name,
            )
            reg.set("longbow_hnsw_graph_height", 1, dataset=ds.name)
            pq_on = getattr(graph, "storage", "") == "pq"
            reg.set(
                "longbow_hnsw_pq_enabled", int(pq_on), dataset=ds.name
            )
            codes = getattr(getattr(graph, "state", None), "codes", None)
            if pq_on and codes is not None and hasattr(codes, "size"):
                reg.set(
                    "longbow_hnsw_pq_compressed_bytes_total",
                    codes.size * codes.dtype.itemsize,
                    dataset=ds.name,
                )
        n_shards = getattr(idx, "n_shards", 0)
        if n_shards:
            counts = getattr(idx, "_shard_counts", None)
            per_cap = max(idx.capacity // n_shards, 1)
            for s in range(n_shards):
                c = (
                    int(counts[s])
                    if counts is not None
                    # striped placement: rows round-robin over shards
                    else len(idx) // n_shards
                )
                reg.set(
                    "longbow_sharded_hnsw_shard_size", c,
                    dataset=ds.name, shard=str(s),
                )
                reg.set(
                    "longbow_sharded_hnsw_load_factor", c / per_cap,
                    dataset=ds.name, shard=str(s),
                )

    def search(
        self,
        dataset: str,
        queries: np.ndarray,
        k: int,
        *,
        filters: Optional[list] = None,
        ef_search: Optional[int] = None,
        exact: bool = False,
        use_cache: bool = True,
    ):
        """-> (ids [B,k] object, scores [B,k] f32, ok [B,k] bool).

        Query cache keyed by dataset + query bytes + params
        (reference: cache/query_cache.go:17, store_query.go:625)."""
        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        key = None
        if use_cache:
            key = QueryCache.hash_query(
                dataset, queries.tobytes(), k, filters, ef_search, exact
            )
            hit = self.query_cache.get(key)
            if hit is not None:
                try:
                    # cache hits are reads too: without this, dataset
                    # TTL permanently drops a dataset actively served
                    # from cache (TTL < cache TTL)
                    self.get(dataset).touch()
                except KeyError:
                    pass
                if self.eviction is not None:
                    found = [i for i in hit[0].ravel() if i is not None]
                    if found:
                        self.eviction.record_access(found)
                return hit
        ds = self.get(dataset)
        # engine counters (reference: longbow_bruteforce_searches_total,
        # longbow_hnsw_searches_total — docs/metrics.md Vector Search)
        kind = getattr(ds.index, "kind", None) or ds.index_kind
        graph_search = not exact and kind not in ("flat", "mesh_flat")
        n_shards = getattr(ds.index, "n_shards", 0)
        if n_shards > 1:
            # one logical search fans out over every mesh shard in one
            # jitted dispatch (reference counts per-shard splits,
            # hnsw_parallel.go)
            reg.inc(
                "longbow_hnsw_parallel_search_splits_total", n_shards,
                dataset=dataset,
            )
        if graph_search:
            reg.inc("longbow_hnsw_searches_total")
            reg.gauge(
                "longbow_hnsw_active_readers", ("dataset",)
            ).labels(dataset=dataset).inc()
        else:
            reg.inc("longbow_bruteforce_searches_total")
        reg.gauge("longbow_active_search_contexts").inc()
        t0 = time.perf_counter()
        try:
            out = ds.search(
                queries, k, filters=filters, ef_search=ef_search,
                exact=exact,
            )
        finally:
            reg.gauge("longbow_active_search_contexts").dec()
            if graph_search:
                reg.gauge(
                    "longbow_hnsw_active_readers", ("dataset",)
                ).labels(dataset=dataset).dec()
        if graph_search:
            # traversal work estimate per query: the beam gathers up to
            # ~2*ef*m_max candidate rows (the repo's measured gather
            # ceiling analysis, docs/ARCHITECTURE.md); distance calcs
            # count every gathered row once per query
            g = getattr(ds.index, "_graph", None) or ds.index
            cfg_g = getattr(g, "config", None)
            if cfg_g is not None:
                ef = ef_search or cfg_g.ef_search
                visited = 2 * ef * (cfg_g.search_m_max or cfg_g.m_max)
                reg.observe(
                    "longbow_hnsw_nodes_visited", visited, dataset=dataset
                )
                reg.inc(
                    "longbow_hnsw_distance_calculations_total",
                    visited * queries.shape[0],
                )
        reg.observe(
            "longbow_vector_search_latency_seconds",
            time.perf_counter() - t0,
            dataset=dataset,
        )
        if key is not None:
            self.query_cache.put(key, out)
        if self.eviction is not None:
            found = [i for i in out[0].ravel() if i is not None]
            if found:
                self.eviction.record_access(found)
        return out

    def delete(self, dataset: str, ids, *, _log: bool = True) -> int:
        ds = self.get(dataset)
        if self.engine is not None and _log:
            with self.engine.commit_guard():
                self.engine.log_delete(dataset, ids)
                n = ds.delete(ids)
        else:
            n = ds.delete(ids)
        self.query_cache.clear()
        self._observe_dataset(ds)
        return n

    # -- introspection ------------------------------------------------

    def readiness(self) -> dict:
        """reference: 'check_readiness' action (store_actions.go:57-101)
        — READY unless an index build is in flight (builds are
        synchronous here, so always READY once the call returns)."""
        return {
            "status": "READY",
            "datasets": len(self._datasets),
            "uptime_s": time.time() - self.started_at,
        }

    def cluster_status(self) -> dict:
        """reference: 'cluster-status' action (store_actions.go:31) —
        single-process view; the sharded serving tier overrides this."""
        return {
            "self": {"id": "local", "status": "alive"},
            "members": [{"id": "local", "status": "alive"}],
            "datasets": {
                n: ds.stats() for n, ds in self._datasets.items()
            },
        }

    # -- hybrid search (reference: SearchHybrid hybrid_search.go:29,
    #    hybrid pipeline hybrid_pipeline.go:78-360) ------------------

    def hybrid_search(
        self,
        dataset: str,
        queries,
        k: int,
        *,
        text_query: str = "",
        alpha: float = 0.0,
        filters: Optional[list] = None,
        graph_alpha: float = 0.0,
        graph_depth: int = 2,
        fusion: str = "linear",
        oversample: int = 3,
    ):
        """Dense + BM25 sparse fusion. alpha: 0=sparse-only,
        1=dense-only, <=0 -> estimated from the query text
        (reference: EstimateAlpha hybrid_search.go:235).
        -> (ids [B,k] object, scores [B,k] f32, ok [B,k] bool)."""
        from longbow_tpu.hybrid.fusion import (
            estimate_alpha,
            fuse_cascade,
            fuse_linear,
            fuse_rrf,
        )
        from longbow_tpu.ops.distance import Metric as _M

        from longbow_tpu.metrics import get_registry

        reg = get_registry()
        ds = self.get(dataset)
        # sparse-only hybrids never reach ds.search — count them as
        # access or dataset TTL drops a live BM25-served dataset
        ds.touch()
        if alpha <= 0.0 and text_query:
            alpha = estimate_alpha(text_query)

        kk = max(k * oversample, k)
        have_dense = queries is not None and np.asarray(queries).size > 0
        if have_dense and alpha > 0.0:
            reg.inc("longbow_hybrid_search_vector_total")
            d_ids, d_scores, d_ok = self.search(
                dataset, queries, kk, filters=filters, use_cache=False
            )
            b = d_ids.shape[0]
        else:
            d_ids = d_scores = d_ok = None
            b = 1
        if text_query and alpha < 1.0:
            reg.inc("longbow_hybrid_search_keyword_total")

        sparse: list = []
        if text_query and alpha < 1.0:
            allowed = None
            mask = ds.filter_mask(filters or [])
            if mask is not None:
                # vectorized: mask -> matching rows -> ids (the per-row
                # python scan here was O(N) per request)
                m = np.asarray(mask)
                ids_arr = ds.row_ids_array()
                sel = ids_arr[np.nonzero(m[: len(ids_arr)])[0]]
                allowed = {i for i in sel if i is not None}
            sparse = ds.bm25.search(text_query, kk, allowed=allowed)

        out_ids = np.empty((b, k), dtype=object)
        out_scores = np.zeros((b, k), np.float32)
        out_ok = np.zeros((b, k), bool)
        for row in range(b):
            dense_pairs = []
            if d_ids is not None:
                for j in range(d_ids.shape[1]):
                    if d_ok[row, j]:
                        s = d_scores[row, j]
                        # to similarity: negate distances for l2/cosine
                        sim = s if ds.metric == _M.DOT else -s
                        dense_pairs.append((d_ids[row, j], float(sim)))
            if fusion == "rrf":
                fused = fuse_rrf([dense_pairs, sparse], k)
            elif fusion == "cascade":
                fused = fuse_cascade(dense_pairs, sparse, alpha, k)
            else:
                fused = fuse_linear(dense_pairs, sparse, alpha, k)
            if graph_alpha > 0.0:
                fused = ds.graph.rank_with_graph(
                    fused, graph_alpha, hops=graph_depth
                )[:k]
            if self.reranker is not None:
                # final-stage pluggable re-ranker (reference: Reranker
                # interface with CrossEncoder slot in the hybrid
                # pipeline, hybrid_pipeline.go:120-200): called with
                # (query_text, [ids]) -> scores; fused order replaced
                try:
                    rr = self.reranker(
                        text_query, [doc for doc, _ in fused]
                    )
                    fused = sorted(
                        zip((doc for doc, _ in fused), rr),
                        key=lambda p: -p[1],
                    )[:k]
                except Exception:
                    pass  # reranker failure degrades to fused order
            for j, (doc, score) in enumerate(fused):
                out_ids[row, j] = doc
                out_scores[row, j] = score
                out_ok[row, j] = True
        return out_ids, out_scores, out_ok

    def graph_rerank(
        self, dataset: str, ids, scores, ok, graph_alpha: float,
        graph_depth: int = 2,
    ):
        """Spreading-activation re-rank of dense results
        (reference: RankWithGraph wired in DoGet, store_query.go:679)."""
        from longbow_tpu.ops.distance import Metric as _M

        ds = self.get(dataset)
        b, k = ids.shape
        out_ids = np.empty_like(ids)
        out_scores = np.zeros_like(scores)
        out_ok = np.zeros_like(ok)
        for row in range(b):
            pairs = [
                (
                    ids[row, j],
                    float(scores[row, j])
                    if ds.metric == _M.DOT
                    else -float(scores[row, j]),
                )
                for j in range(k)
                if ok[row, j]
            ]
            fused = ds.graph.rank_with_graph(
                pairs, graph_alpha, hops=graph_depth
            )[:k]
            for j, (doc, score) in enumerate(fused):
                out_ids[row, j] = doc
                out_scores[row, j] = score
                out_ok[row, j] = True
        return out_ids, out_scores, out_ok

    # -- GraphRAG actions (reference: store_actions.go:338-350) -------

    def add_edge(
        self, dataset, src, dst, edge_type="", weight=1.0, *, _log=True
    ):
        if self.engine is not None and _log:
            with self.engine.commit_guard():
                self.engine.log_edge(dataset, src, dst, edge_type, weight)
                self.get(dataset).graph.add_edge(
                    src, dst, edge_type, weight
                )
        else:
            self.get(dataset).graph.add_edge(src, dst, edge_type, weight)

    def traverse_graph(
        self, dataset, src, dst=None, max_hops=3, strategy="bfs"
    ):
        """reference: GraphNavigator strategies (graph_navigator.go:25
        — bfs | weighted | astar | parallel). astar uses embedding
        distance between stored vectors as its guide when available."""
        ds = self.get(dataset)
        g = ds.graph
        if dst is None:
            if strategy == "parallel":
                srcs = src if isinstance(src, (list, tuple)) else [src]
                return [
                    [node, hops, origin]
                    for node, (hops, origin) in g.parallel_bfs(
                        srcs, max_hops
                    ).items()
                ]
            return g.traverse(src, max_hops)
        heuristic = (
            ds.graph_heuristic() if strategy == "astar" else None
        )
        return g.find_path(
            src, dst, max_hops, strategy=strategy, heuristic=heuristic
        )

    def graph_stats(self, dataset: str) -> dict:
        return self.get(dataset).graph.stats()

    def graph_analytics(self, dataset: str) -> dict:
        """reference: graph_analytics.go — degree stats + components."""
        return self.get(dataset).graph.analytics()

    # -- persistence lifecycle (reference: Snapshot
    #    store_persistence_methods.go:27, graceful shutdown final
    #    flush+snapshot cmd/longbow/main.go:524-565) -------------------

    def snapshot(self) -> None:
        if self.engine is None:
            raise RuntimeError("store has no persist_dir")
        self.engine.snapshot(self)

    def close(self) -> None:
        if self.engine is not None:
            self.engine.snapshot(self)
            self.engine.close()
