"""Pluggable index construction + uniform adapter.

reference: the VectorIndexer contract and pluggable index adapters
(types/interfaces.go:14-62, pluggable_index.go,
pluggable_index_adapters.go). Every index kind exposes add /
delete_rows / search(queries, k, filter_mask=...) / get_vectors /
export_state; this module normalizes the quantized indexes (which have
no ef_search/exact notions) behind the same surface the Dataset uses.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.adaptive import AdaptiveIndex
from longbow_tpu.index.bq import BQIndex
from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.index.pq import PQIndex
from longbow_tpu.index.sq8 import SQ8Index, SQ8ResidualIndex
from longbow_tpu.index.ivf import IVFIndex
from longbow_tpu.index.tiered import TieredIndex

INDEX_KINDS = (
    "adaptive", "flat", "hnsw", "pq", "sq8", "sq8r", "bq", "disk",
    "ivf",
    "mesh_flat", "mesh_graph",
)


class _MeshAdapter:
    """Uniform surface over the device-mesh sharded indexes
    (parallel/sharded.py, parallel/sharded_graph.py) — the intra-slice
    tier: corpus row-sharded over a jax.sharding.Mesh, per-shard search
    + all_gather top-k merge over ICI in one shard_map program
    (reference capability: ShardedHNSW sharded_hnsw.go:378 +
    scatter-gather, re-shaped for the mesh)."""

    def __init__(self, inner, kind: str, dim: int):
        self._inner = inner
        self.kind = kind
        self.dim = dim

    def __len__(self):
        return len(self._inner)

    @property
    def n_shards(self) -> int:
        # forwarded so the store's sharded metrics (shard_size,
        # load_factor, parallel_search_splits) actually observe the
        # mesh kinds — the only index family that HAS shards
        return getattr(self._inner, "n_shards", 0)

    @property
    def _shard_counts(self):
        return getattr(self._inner, "_shard_counts", None)

    @property
    def capacity(self) -> int:
        cap = getattr(self._inner, "capacity", 0)
        if not cap and getattr(self._inner, "valid", None) is not None:
            cap = self._inner.valid.shape[0]
        return max(cap, len(self._inner), 1)

    def add(self, vecs: np.ndarray) -> np.ndarray:
        return self._inner.add(vecs)

    def delete_rows(self, rows: np.ndarray) -> None:
        self._inner.delete_rows(np.asarray(rows))

    def search(self, queries, k, *, filter_mask=None, ef_search=None,
               exact=False):
        if self.kind == "mesh_flat":
            mask = filter_mask
            if mask is not None and hasattr(mask, "shape"):
                cap = self._inner.valid.shape[0]
                if mask.shape[0] > cap:
                    mask = mask[:cap]
                elif mask.shape[0] < cap:
                    mask = jnp.pad(mask, (0, cap - mask.shape[0]))
            return self._inner.search(queries, k, filter_mask=mask)
        # mesh_graph with exact=True: the oracle contract must not be
        # silently served approximate results — fall back to an exact
        # scan over the host vector copy (oracle/verification paths
        # only; serving uses exact=False)
        if exact:
            from longbow_tpu.ops.distance import exact_search

            allv = self._inner._host_all()
            if len(allv) == 0:
                b = np.atleast_2d(np.asarray(queries)).shape[0]
                from longbow_tpu.ops.distance import MASKED as _MASK

                return (
                    np.full((b, k), np.float32(_MASK)),
                    np.full((b, k), -1, np.int32),
                )
            valid = np.ones((len(allv),), bool)
            deleted = getattr(self._inner, "_deleted", None)
            if deleted:
                valid[np.asarray(sorted(deleted), np.int64)] = False
            if filter_mask is not None:
                m = np.asarray(filter_mask)[: len(allv)]
                valid[: len(m)] &= m
            d, r = exact_search(
                jnp.asarray(np.atleast_2d(queries), jnp.float32),
                jnp.asarray(allv),
                k,
                self._inner.metric,
                valid=jnp.asarray(valid),
                exact_precision=True,
            )
            return np.asarray(d), np.asarray(r)
        # mesh_graph: traversal is unfiltered; oversample + host-side
        # mask filter (the reference's bitmap post-filter semantics)
        if filter_mask is None:
            return self._inner.search(queries, k, ef_search=ef_search)
        kk = min(max(4 * k, 32), max(len(self._inner), k))
        d, r = self._inner.search(queries, kk, ef_search=ef_search)
        d = np.asarray(d)
        r = np.asarray(r)
        m = np.asarray(filter_mask)
        okr = (r >= 0) & (r < m.shape[0])
        keep = okr & m[np.clip(r, 0, m.shape[0] - 1)]
        from longbow_tpu.ops.distance import MASKED as _MASK

        d = np.where(keep, d, np.float32(_MASK))
        order = np.argsort(d, axis=1)[:, :k]
        d2 = np.take_along_axis(d, order, axis=1)
        r2 = np.where(
            d2 < float(_MASK), np.take_along_axis(r, order, axis=1), -1
        )
        return d2.astype(np.float32), r2.astype(np.int32)

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        return self._inner.get_vectors(np.asarray(rows))

    def export_state(self) -> dict:
        st = self._inner.export_state()
        st["kind"] = self.kind
        st["dim"] = self.dim
        return st

    @classmethod
    def import_state(cls, st: dict):
        from longbow_tpu.parallel.sharded import ShardedFlatIndex
        from longbow_tpu.parallel.sharded_graph import ShardedGraphIndex

        inner_cls = (
            ShardedFlatIndex if st["kind"] == "mesh_flat"
            else ShardedGraphIndex
        )
        return cls(inner_cls.import_state(st), st["kind"], st["dim"])


class _QuantizedAdapter:
    """Uniform surface over PQ/SQ8/BQ indexes."""

    def __init__(self, inner, kind: str, dim: int):
        self._inner = inner
        self.kind = kind
        self.dim = dim

    def __len__(self):
        return self._inner.count

    @property
    def capacity(self) -> int:
        cap = getattr(self._inner, "capacity", 0)
        return max(cap, self._inner.count, 1)

    def add(self, vecs: np.ndarray) -> np.ndarray:
        return self._inner.add(vecs)

    def delete_rows(self, rows: np.ndarray) -> None:
        self._inner.delete_rows(rows)

    def search(self, queries, k, *, filter_mask=None, ef_search=None,
               exact=False):
        # quantized scans are already exhaustive; ef/exact don't apply
        mask = filter_mask
        if mask is not None and hasattr(mask, "shape"):
            n = (
                self._inner.valid.shape[0]
                if getattr(self._inner, "valid", None) is not None
                else self._inner.count
            )
            if mask.shape[0] > n:
                mask = mask[:n]
        return self._inner.search(queries, k, filter_mask=mask)

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        inner = self._inner
        if hasattr(inner, "get_vectors"):
            return inner.get_vectors(np.asarray(rows))
        if getattr(inner, "rerank_vectors", None) is not None:
            return np.asarray(
                jnp.take(inner.rerank_vectors, jnp.asarray(rows), axis=0)
            ).astype(np.float32)
        if getattr(inner, "vectors_bf16", None) is not None:
            return np.asarray(
                jnp.take(inner.vectors_bf16, jnp.asarray(rows), axis=0)
            ).astype(np.float32)
        if hasattr(inner, "decode"):
            return inner.decode(np.asarray(rows))
        if hasattr(inner, "_dequant"):  # SQ8
            codes = jnp.take(inner.codes, jnp.asarray(rows), axis=0)
            return np.asarray(inner._dequant(codes))
        raise NotImplementedError(f"get_vectors for {self.kind}")

    def export_state(self) -> dict:
        return self._inner.export_state()

    @classmethod
    def import_state(cls, st: dict) -> "_QuantizedAdapter":
        inner_cls = {
            "pq": PQIndex, "sq8": SQ8Index, "sq8r": SQ8ResidualIndex,
            "bq": BQIndex,
            "disk": TieredIndex, "ivf": IVFIndex,
        }[st["kind"]]
        return cls(inner_cls.import_state(st), st["kind"], st["dim"])


def make_index(
    kind: str,
    dim: int,
    metric: str,
    *,
    dtype=jnp.bfloat16,
    migration_threshold: int = 200_000,
    hnsw_config: Optional[HNSWConfig] = None,
    **params,
):
    kind = (kind or "adaptive").lower()
    storage = str(params.get("storage", "dense")).lower()
    graph_pq_m = int(params.get("pq_m", 0)) or None
    min_contrast = float(
        params.get(
            "min_contrast",
            os.environ.get("LONGBOW_ADAPTIVE_MIN_CONTRAST", 2.0),
        )
    )
    if kind in ("mesh_flat", "mesh_graph"):
        # intra-slice mesh tier: LONGBOW index param mesh_shards picks
        # how many devices; default all (v5e-8 = 8-way row sharding)
        from longbow_tpu.parallel.mesh import make_mesh
        from longbow_tpu.parallel.sharded import ShardedFlatIndex
        from longbow_tpu.parallel.sharded_graph import ShardedGraphIndex

        mesh = make_mesh(int(params.get("mesh_shards", 0)) or None)
        if kind == "mesh_flat":
            inner = ShardedFlatIndex(dim, mesh, metric, dtype=dtype)
        else:
            inner = ShardedGraphIndex(
                dim, mesh, metric,
                config=hnsw_config, dtype=dtype,
            )
        return _MeshAdapter(inner, kind, dim)
    capacity = int(params.get("capacity", 0))
    if kind == "adaptive":
        return AdaptiveIndex(
            dim, metric, dtype=dtype,
            migration_threshold=migration_threshold,
            hnsw_config=hnsw_config, storage=storage, pq_m=graph_pq_m,
            min_contrast=min_contrast, capacity=capacity,
        )
    if kind == "flat":
        return AdaptiveIndex(
            dim, metric, dtype=dtype,
            migration_threshold=2**62,  # never migrate
            hnsw_config=hnsw_config, capacity=capacity,
        )
    if kind == "hnsw":
        return AdaptiveIndex(
            dim, metric, dtype=dtype,
            migration_threshold=0,  # migrate on first add
            hnsw_config=hnsw_config, storage=storage, pq_m=graph_pq_m,
            capacity=capacity,
        )
    if kind == "pq":
        return _QuantizedAdapter(
            PQIndex(
                dim,
                m=int(params.get("pq_m", 16)),
                metric=metric,
                rerank=bool(params.get("rerank", True)),
            ),
            "pq", dim,
        )
    if kind == "sq8":
        return _QuantizedAdapter(SQ8Index(dim, metric), "sq8", dim)
    if kind == "sq8r":
        # mean-centered SQ8: k-means residual codes — same byte/dim as
        # sq8, recalls past the global-affine ceiling on clustered data
        return _QuantizedAdapter(
            SQ8ResidualIndex(
                dim, metric,
                n_clusters=int(params.get("n_clusters", 0)),
            ),
            "sq8r", dim,
        )
    if kind == "bq":
        return _QuantizedAdapter(
            BQIndex(dim, metric, rerank=bool(params.get("rerank", True))),
            "bq", dim,
        )
    if kind == "ivf":
        return _QuantizedAdapter(
            IVFIndex(
                dim, metric,
                n_cells=int(params.get("n_cells", 0)),
                n_probe=int(params.get("n_probe", 8)),
                dtype=dtype,
            ),
            "ivf", dim,
        )
    if kind == "disk":
        # HBM-offload tier: SQ8 scan on device, full vectors in host
        # RAM or an mmap file (reference: disk_vector_store.go:3)
        return _QuantizedAdapter(
            TieredIndex(
                dim, metric,
                path=params.get("path"),
                rerank_factor=int(params.get("rerank_factor", 8)),
            ),
            "disk", dim,
        )
    raise ValueError(f"unknown index kind {kind!r}; want one of {INDEX_KINDS}")


def import_index(state: dict):
    """Rebuild an index from export_state() output — the recovery path
    that avoids retraining/re-linking (reference persists HNSW graphs
    and PQ codebooks the same way, arrow_hnsw_persistence.go,
    pq/persistence.go:15-38)."""
    kind = state["kind"]
    if kind in ("flat", "hnsw"):
        return AdaptiveIndex.import_state(state)
    if kind in ("pq", "sq8", "sq8r", "bq", "disk", "ivf"):
        return _QuantizedAdapter.import_state(state)
    if kind in ("mesh_flat", "mesh_graph"):
        return _MeshAdapter.import_state(state)
    raise ValueError(f"cannot import index state of kind {kind!r}")
