"""AdaptiveIndex: exact scan for small datasets, graph ANN after a
threshold — the reference's adaptive/auto-sharding migration semantics
(reference: adaptive_index.go:59,357,539 migrateToHNSW at threshold;
docs/autoshard.md interim-index dual-read).

Below the threshold everything is a FlatIndex (on TPU the exact scan
is so fast the threshold can be much higher than the reference's 10k).
On crossing it, a graph index is bulk-built from the flat corpus
(bulk_build_edges — seconds, not minutes) and subsequent adds use the
graph's incremental insert. During the build the flat index keeps
serving: "interim sharding" collapses to a plain atomic swap because
index state is functional.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.ops.distance import Metric

DEFAULT_MIGRATION_THRESHOLD = 200_000


class AdaptiveIndex:
    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        *,
        dtype=jnp.float32,
        migration_threshold: int = DEFAULT_MIGRATION_THRESHOLD,
        hnsw_config: Optional[HNSWConfig] = None,
        storage: str = "dense",
        pq_m: Optional[int] = None,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        self.dtype = dtype
        self.migration_threshold = migration_threshold
        self.hnsw_config = hnsw_config or HNSWConfig()
        # graph vector payload: "dense" (dtype), "sq8" codes, or "pq"
        # codes — the equal-memory quantized-graph configs
        # (arrow_hnsw.go:94, quantization_integration.go)
        self.storage = storage
        self.pq_m = pq_m
        self._flat = FlatIndex(dim, metric, dtype)
        self._graph: Optional[HNSWIndex] = None

    # ------------------------------------------------------------------

    @property
    def kind(self) -> str:
        return "hnsw" if self._graph is not None else "flat"

    @property
    def capacity(self) -> int:
        return (self._graph or self._flat).capacity

    def __len__(self) -> int:
        return len(self._graph or self._flat)

    # ------------------------------------------------------------------

    def _maybe_migrate(self) -> None:
        if self._graph is not None:
            return
        if len(self._flat) < self.migration_threshold:
            return
        g = HNSWIndex(
            self.dim,
            self.metric,
            self.hnsw_config,
            self.dtype,
            capacity=self._flat.capacity,
            storage=self.storage,
            pq_m=self.pq_m,
        )
        if (
            self.metric == Metric.L2
            and self.storage == "dense"
            and self._flat.vectors.dtype == g.dtype
        ):
            # device-to-device migration: no host round trip (the
            # vectors are already on device in the flat block)
            g.add(self._flat.vectors[: self._flat.count])
        else:
            vecs = np.asarray(
                self._flat.vectors[: self._flat.count]
            ).astype(np.float32)
            g.add(vecs)
        dead = np.nonzero(~np.asarray(self._flat.valid[: self._flat.count]))[0]
        if len(dead):
            g.delete_rows(dead)
        self._graph = g
        self._flat = FlatIndex(self.dim, self.metric, self.dtype, capacity=1)

    def add(self, vecs: np.ndarray) -> np.ndarray:
        if self._graph is not None:
            return self._graph.add(vecs)
        rows = self._flat.add(vecs)
        self._maybe_migrate()
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        (self._graph or self._flat).delete_rows(rows)

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
        ef_search: Optional[int] = None,
        exact: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        if self._graph is not None and not exact:
            return self._graph.search(
                queries, k, filter_mask=filter_mask, ef_search=ef_search
            )
        if self._graph is not None and exact:
            return self._graph.exact_search(
                queries, k, filter_mask=filter_mask
            )
        return self._flat.search(queries, k, filter_mask=filter_mask)

    # ------------------------------------------------------------------

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        if self._graph is not None:
            return self._graph.get_vectors(rows)
        return np.asarray(
            jnp.take(
                self._flat.vectors, jnp.asarray(rows), axis=0
            ).astype(jnp.float32)
        )

    def export_state(self) -> dict:
        st = (self._graph or self._flat).export_state()
        st["migration_threshold"] = self.migration_threshold
        st.setdefault("storage", self.storage)
        return st

    @classmethod
    def import_state(cls, st: dict) -> "AdaptiveIndex":
        idx = cls(
            st["dim"],
            st["metric"],
            dtype=jnp.dtype(st["dtype"]),
            migration_threshold=st.get(
                "migration_threshold", DEFAULT_MIGRATION_THRESHOLD
            ),
            storage=st.get("storage", "dense"),
            pq_m=int(st.get("pq_m", 0)) or None,
        )
        if st["kind"] == "hnsw":
            idx._graph = HNSWIndex.import_state(st)
            idx.hnsw_config = idx._graph.config
            idx._flat = FlatIndex(st["dim"], st["metric"], idx.dtype,
                                  capacity=1)
        else:
            idx._flat = FlatIndex.import_state(st)
        return idx
