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
from typing import Optional

import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.hnsw import HNSWConfig
from longbow_tpu.ops.distance import Metric
from longbow_tpu.store.dataset import Dataset
from longbow_tpu.utils.query_cache import QueryCache


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
    ):
        self._datasets: dict[str, Dataset] = {}
        self._namespaces: dict[str, set] = {}  # ns -> dataset names
        self._lock = threading.Lock()
        self.default_metric = Metric.validate(default_metric)
        self.dtype = dtype
        self.migration_threshold = migration_threshold
        self.hnsw_config = hnsw_config or HNSWConfig()
        self.query_cache: QueryCache = QueryCache(
            query_cache_size, query_cache_ttl
        )
        self.started_at = time.time()
        # persistence (reference: InitPersistence store_persistence.go:12
        # — replay WAL + load snapshots before serving)
        self.engine = None
        if persist_dir is not None:
            from longbow_tpu.storage.engine import StorageEngine

            self.engine = StorageEngine(persist_dir, sync=wal_sync)
            self.engine.recover(self)

    # -- dataset lifecycle --------------------------------------------

    def get_or_create(
        self,
        name: str,
        dim: int,
        metric: Optional[str] = None,
        *,
        index_kind: str = "adaptive",
        index_params: Optional[dict] = None,
    ) -> Dataset:
        with self._lock:
            ds = self._datasets.get(name)
            if ds is None:
                ds = Dataset(
                    name,
                    dim,
                    metric or self.default_metric,
                    dtype=self.dtype,
                    hnsw_config=self.hnsw_config,
                    migration_threshold=self.migration_threshold,
                    index_kind=index_kind,
                    index_params=index_params,
                )
                self._datasets[name] = ds
                ns = name.split("/", 1)[0] if "/" in name else "default"
                self._namespaces.setdefault(ns, set()).add(name)
            elif ds.dim != dim:
                raise ValueError(
                    f"dataset {name!r} has dim {ds.dim}, put has {dim}"
                )
            return ds

    def get(self, name: str) -> Dataset:
        ds = self._datasets.get(name)
        if ds is None:
            raise KeyError(f"dataset {name!r} not found")
        return ds

    def drop(self, name: str, *, _log: bool = True) -> bool:
        """reference: 'delete-dataset' action (store_actions.go:245)."""
        if self.engine is not None and _log:
            self.engine.log_drop(name)
        with self._lock:
            ds = self._datasets.pop(name, None)
            for members in self._namespaces.values():
                members.discard(name)
            self.query_cache.clear()
            return ds is not None

    def list_datasets(self) -> list[str]:
        return sorted(self._datasets)

    def list_namespaces(self) -> list[str]:
        return sorted(self._namespaces)

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
        timestamp: Optional[float] = None,
    ) -> None:
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        ds = self.get_or_create(dataset, vectors.shape[1], metric)
        if self.engine is not None and _log:
            self.engine.log_put(dataset, ids, vectors, columns, metric)
        ds.put(np.asarray(ids), vectors, columns, timestamp=timestamp)
        self.query_cache.clear()
        if self.engine is not None and _log:
            self.engine.maybe_snapshot(self)

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
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        key = None
        if use_cache:
            key = QueryCache.hash_query(
                dataset, queries.tobytes(), k, filters, ef_search, exact
            )
            hit = self.query_cache.get(key)
            if hit is not None:
                return hit
        out = self.get(dataset).search(
            queries, k, filters=filters, ef_search=ef_search, exact=exact
        )
        if key is not None:
            self.query_cache.put(key, out)
        return out

    def delete(self, dataset: str, ids, *, _log: bool = True) -> int:
        if self.engine is not None and _log:
            self.engine.log_delete(dataset, ids)
        n = self.get(dataset).delete(ids)
        self.query_cache.clear()
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
        fusion: str = "linear",
        oversample: int = 3,
    ):
        """Dense + BM25 sparse fusion. alpha: 0=sparse-only,
        1=dense-only, <=0 -> estimated from the query text
        (reference: EstimateAlpha hybrid_search.go:235).
        -> (ids [B,k] object, scores [B,k] f32, ok [B,k] bool)."""
        from longbow_tpu.hybrid.fusion import (
            estimate_alpha,
            fuse_linear,
            fuse_rrf,
        )
        from longbow_tpu.ops.distance import Metric as _M

        ds = self.get(dataset)
        if alpha <= 0.0 and text_query:
            alpha = estimate_alpha(text_query)

        kk = max(k * oversample, k)
        have_dense = queries is not None and np.asarray(queries).size > 0
        if have_dense and alpha > 0.0:
            d_ids, d_scores, d_ok = self.search(
                dataset, queries, kk, filters=filters, use_cache=False
            )
            b = d_ids.shape[0]
        else:
            d_ids = d_scores = d_ok = None
            b = 1

        sparse: list = []
        if text_query and alpha < 1.0:
            allowed = None
            mask = ds.filter_mask(filters or [])
            if mask is not None:
                m = np.asarray(mask)
                allowed = {
                    ds._row_to_id[r]
                    for r in np.nonzero(m[: len(ds._row_to_id)])[0]
                    if ds._row_to_id[r] is not None
                }
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
            else:
                fused = fuse_linear(dense_pairs, sparse, alpha, k)
            if graph_alpha > 0.0:
                fused = ds.graph.rank_with_graph(fused, graph_alpha)[:k]
            for j, (doc, score) in enumerate(fused):
                out_ids[row, j] = doc
                out_scores[row, j] = score
                out_ok[row, j] = True
        return out_ids, out_scores, out_ok

    def graph_rerank(self, dataset: str, ids, scores, ok, graph_alpha: float):
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
            fused = ds.graph.rank_with_graph(pairs, graph_alpha)[:k]
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
            self.engine.log_edge(dataset, src, dst, edge_type, weight)
        self.get(dataset).graph.add_edge(src, dst, edge_type, weight)

    def traverse_graph(self, dataset, src, dst=None, max_hops=3):
        g = self.get(dataset).graph
        if dst is None:
            return g.traverse(src, max_hops)
        return g.bfs_path(src, dst, max_hops)

    def graph_stats(self, dataset: str) -> dict:
        return self.get(dataset).graph.stats()

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
