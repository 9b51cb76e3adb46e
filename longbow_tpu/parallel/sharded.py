"""Shard-parallel flat index: row-sharded corpus, collective top-k merge.

The TPU-native ShardedHNSW / GlobalSearchCoordinator
(reference: sharded_hnsw.go:378-470 errgroup fan-out + k*2 oversample
merge; global_search.go:48 per-peer gRPC fan-out + top-k merge): one
`shard_map` program does the per-shard search, converts local rows to
global rows, `all_gather`s the per-shard top-k over ICI and merges —
no RPC, no aggregator service, one compiled program.

Ingestion routing: striped placement (row i of an append goes to shard
i % n_shards) replaces the consistent-hash ring — placement needs no
key affinity because every search fans out to all shards anyway (the
reference's global search does the same, scatter-gather.go:12).

ROW-ID CONTRACT: the public row id of (shard j, slot s) is s*S + j —
interleaved striping, independent of shard capacity. Growth pads each
shard's slot space without relocating any PUBLIC id (the previous
j*capacity+s encoding invalidated every id the Dataset had recorded
when capacity doubled at ~16k rows). Internally arrays stay
shard-major ([j*cap + s]); the public<->internal permutation is
computed in-jit / in numpy at the edges.
"""
from __future__ import annotations

import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from longbow_tpu.ops.distance import (
    MASKED,
    Metric,
    exact_search,
    pad_to,
    squared_norms,
    tombstone_rows,
)
from longbow_tpu.ops.pallas_scan import flat_search_rerank
from longbow_tpu.parallel.mesh import SHARD_AXIS

MIN_SHARD_CAPACITY = 2048


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "mesh", "shard_rows", "normalize", "cosine",
        "fused",
    ),
)
def _sharded_search(
    vectors: jax.Array,   # [S*shard_rows, D] sharded over rows
    norms: jax.Array,     # [S*shard_rows]
    valid: jax.Array,     # [S*shard_rows] internal layout
    queries: jax.Array,   # [B, D] replicated
    public_mask,          # [S*shard_rows] bool public layout, or None
    k: int,
    metric: str,
    mesh: Mesh,
    shard_rows: int,
    normalize: bool,
    cosine: bool = False,
    fused: bool = False,
) -> tuple[jax.Array, jax.Array]:
    n_shards = mesh.size
    if normalize:
        # in-jit (an eager normalize costs a ~30ms relay round trip)
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30
        )
    if public_mask is not None:
        # filter masks arrive in PUBLIC row order (column positions);
        # permute to the internal shard-major layout in-jit:
        # internal p = j*cap + s holds public r = s*S + j
        p = jnp.arange(n_shards * shard_rows)
        pub_of_int = (p % shard_rows) * n_shards + (p // shard_rows)
        valid = jnp.logical_and(valid, public_mask[pub_of_int])

    def local(c, nrm, vld, q):
        if fused:
            # per-shard fused Pallas scan + exact re-rank (round 5):
            # the XLA exact scan inside shard_map measured 96.8 ms vs
            # the kernel's 9.9 ms at 1M on a 1-device mesh
            # (benchmarks/mesh_overhead_1dev.json) — the mesh tier was
            # paying 10x for not riding the kernel
            d, i = flat_search_rerank(
                q, c, nrm, vld, k, metric, pool=64,
            )
        else:
            d, i = exact_search(
                q, c.astype(jnp.float32), k, metric,
                corpus_norms_sq=nrm, valid=vld, exact_precision=False,
            )
        j = jax.lax.axis_index(SHARD_AXIS)
        # public id = slot * S + shard: capacity-independent
        gi = jnp.where(d < MASKED, i * n_shards + j, -1)
        # collective merge over ICI: [S, B, k] -> [B, S*k] -> top-k
        ds = jax.lax.all_gather(d, SHARD_AXIS)
        gs = jax.lax.all_gather(gi, SHARD_AXIS)
        b = q.shape[0]
        dall = jnp.moveaxis(ds, 0, 1).reshape(b, -1)
        iall = jnp.moveaxis(gs, 0, 1).reshape(b, -1)
        neg, pos = jax.lax.top_k(-dall, k)
        return -neg, jnp.take_along_axis(iall, pos, axis=1)

    d, i = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(vectors, norms, valid, queries)
    if cosine:
        # cosine rides the L2 scan (the l2 form cancels the rounded-
        # storage norm wobble that raw -q.v injects — see
        # FlatIndex.search); report 1 - cos = l2^2 / 2, in-jit
        from longbow_tpu.ops.distance import cosine_report

        d = cosine_report(d)
    return d, i


@functools.partial(jax.jit, static_argnames=("mesh", "shard_rows"), donate_argnums=(0, 1, 2))
def _sharded_append(
    vectors, norms, valid,          # sharded state (donated)
    new_vecs,                       # [S, per, D] batch pre-split by shard
    new_norms,                      # [S, per]
    new_mask,                       # [S, per] bool (real row?)
    starts,                         # [S] per-shard write offsets
    mesh: Mesh,
    shard_rows: int,
):
    """Each shard writes its slice of the new batch at its own offset —
    the ingestion-routing step, one program, no host round trips."""
    def local(c, nrm, vld, nv, nn, nm, st):
        row = st[0, 0]
        c = jax.lax.dynamic_update_slice(c, nv[0].astype(c.dtype), (row, 0))
        nrm = jax.lax.dynamic_update_slice(nrm, nn[0], (row,))
        # only extend validity, never clear pre-existing rows (the tail
        # of a striped batch is padding on some shards)
        per = nm.shape[1]
        old = jax.lax.dynamic_slice(vld, (row,), (per,))
        merged = jax.lax.dynamic_update_slice(vld, nm[0] | old, (row,))
        return c, nrm, merged

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
            P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
            P(SHARD_AXIS, None), P(SHARD_AXIS, None),
        ),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
        check_vma=False,
    )(vectors, norms, valid, new_vecs, new_norms, new_mask, starts)


class ShardedFlatIndex:
    """Exact k-NN over a row-sharded corpus on a device mesh."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        metric: str = Metric.L2,
        dtype=jnp.float32,
        shard_capacity: int = MIN_SHARD_CAPACITY,
    ):
        self.dim = dim
        self.mesh = mesh
        self.n_shards = mesh.size
        self.metric = Metric.validate(metric)
        self.dtype = dtype
        self.shard_capacity = pad_to(shard_capacity, MIN_SHARD_CAPACITY)
        self._shard_counts = np.zeros(self.n_shards, np.int64)
        # dispatch lock: appends DONATE the sharded buffers; a search
        # dispatched against the pre-donation array dies with "buffer
        # deleted or donated" (FlatIndex carries the same guard)
        self._mu = threading.Lock()
        self._alloc()

    def _alloc(self):
        cap = self.n_shards * self.shard_capacity
        sh = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        sh1 = NamedSharding(self.mesh, P(SHARD_AXIS))
        self.vectors = jax.device_put(
            jnp.zeros((cap, self.dim), self.dtype), sh
        )
        self.norms_sq = jax.device_put(jnp.zeros((cap,), jnp.float32), sh1)
        self.valid = jax.device_put(jnp.zeros((cap,), bool), sh1)

    def __len__(self) -> int:
        return int(self._shard_counts.sum())

    @property
    def capacity(self) -> int:
        # PUBLIC row space: max public id = (cap-1)*S + (S-1) + 1
        return self.n_shards * self.shard_capacity

    def _to_internal(self, rows: np.ndarray) -> np.ndarray:
        """public r = slot*S + shard -> internal j*cap + slot."""
        rows = np.asarray(rows, np.int64)
        return (rows % self.n_shards) * self.shard_capacity + (
            rows // self.n_shards
        )

    def _grow(self, per_shard_need: int) -> None:
        new_cap = self.shard_capacity
        while new_cap < per_shard_need:
            new_cap *= 2
        if new_cap == self.shard_capacity:
            return
        # public ids are capacity-independent (slot*S + shard), so
        # growth only re-lays-out the INTERNAL shard-major arrays
        old_v = np.asarray(self.vectors).reshape(
            self.n_shards, self.shard_capacity, self.dim
        )
        old_n = np.asarray(self.norms_sq).reshape(
            self.n_shards, self.shard_capacity
        )
        old_m = np.asarray(self.valid).reshape(
            self.n_shards, self.shard_capacity
        )
        old_cap = self.shard_capacity
        self.shard_capacity = new_cap
        self._alloc()
        pad = new_cap - old_cap
        v = np.pad(old_v, ((0, 0), (0, pad), (0, 0))).reshape(-1, self.dim)
        n = np.pad(old_n, ((0, 0), (0, pad))).reshape(-1)
        m = np.pad(old_m, ((0, 0), (0, pad))).reshape(-1)
        sh = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        sh1 = NamedSharding(self.mesh, P(SHARD_AXIS))
        self.vectors = jax.device_put(jnp.asarray(v, self.dtype), sh)
        self.norms_sq = jax.device_put(jnp.asarray(n), sh1)
        self.valid = jax.device_put(jnp.asarray(m), sh1)

    # ------------------------------------------------------------------

    def add(self, vecs: np.ndarray) -> np.ndarray:
        """Append vectors striped across shards; returns global rows."""
        vecs = np.ascontiguousarray(vecs, dtype=np.float32)
        n = vecs.shape[0]
        if vecs.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vecs.shape[1]}")
        if self.metric == Metric.COSINE:
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30
            )

        s = self.n_shards
        # balanced split: shard j takes rows j, j+s, j+2s, ...
        per = -(-n // s)
        counts = np.array(
            [len(range(j, n, s)) for j in range(s)], np.int64
        )
        with self._mu:
            need = int((self._shard_counts + counts).max())
            self._grow(need)

            batch = np.zeros((s, per, self.dim), np.float32)
            mask = np.zeros((s, per), bool)
            rows = np.zeros(n, np.int64)
            for j in range(s):
                take = list(range(j, n, s))
                batch[j, : len(take)] = vecs[take]
                mask[j, : len(take)] = True
                # public id = slot * S + shard (capacity-independent)
                rows[take] = (
                    self._shard_counts[j] + np.arange(len(take))
                ) * s + j
            # norms of the STORED (rounded) dtype: exact norms paired
            # with rounded inner products bias distances (~5% recall@10
            # at 1M)
            br = batch.astype(self.dtype).astype(np.float64)
            norms = (br ** 2).sum(-1).astype(np.float32)
            starts = self._shard_counts.astype(np.int32).reshape(s, 1)

            self.vectors, self.norms_sq, self.valid = _sharded_append(
                self.vectors,
                self.norms_sq,
                self.valid,
                jnp.asarray(batch),
                jnp.asarray(norms),
                jnp.asarray(mask),
                jnp.asarray(starts),
                mesh=self.mesh,
                shard_rows=self.shard_capacity,
            )
            self._shard_counts += counts
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows) == 0:
            return
        internal = self._to_internal(rows)
        with self._mu:
            self.valid = tombstone_rows(self.valid, internal)

    def search(
        self,
        queries,
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        normalize = self.metric == Metric.COSINE
        metric = Metric.L2 if normalize else self.metric
        if filter_mask is not None:
            # pad the public-order mask to the public row space; the
            # internal permutation happens in-jit (no eager dispatches
            # on the serving path)
            cap = self.capacity
            if filter_mask.shape[0] < cap:
                filter_mask = jnp.pad(
                    filter_mask, (0, cap - filter_mask.shape[0])
                )
            elif filter_mask.shape[0] > cap:
                filter_mask = filter_mask[:cap]
        with self._mu:  # serialize dispatch vs donating appends
            return _sharded_search(
                self.vectors,
                self.norms_sq,
                self.valid,
                queries,
                filter_mask,
                k,
                metric,
                mesh=self.mesh,
                shard_rows=self.shard_capacity,
                normalize=normalize,
                cosine=normalize,
                # per-shard fused kernel on TPU (bf16, k<=64): the XLA
                # scan inside shard_map measured 10x slower at 1M
                fused=(
                    jax.default_backend() in ("tpu", "axon")
                    and self.dtype == jnp.bfloat16
                    and k <= 64
                ),
            )

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        internal = self._to_internal(rows)
        return np.asarray(
            jnp.take(
                self.vectors, jnp.asarray(internal), axis=0
            ).astype(jnp.float32)
        )

    def export_state(self) -> dict:
        """Snapshot payload. Public row ids depend only on n_shards
        (slot*S + shard), so the import must reproduce the same mesh
        size; shard capacity may differ (it re-lays-out internally)."""
        return {
            "kind": "mesh_flat",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(jnp.dtype(self.dtype)),
            "n_shards": self.n_shards,
            "shard_capacity": self.shard_capacity,
            "shard_counts": self._shard_counts.copy(),
            "vectors": np.asarray(self.vectors).astype(np.float32),
            "norms_sq": np.asarray(self.norms_sq),
            "valid": np.asarray(self.valid),
        }

    @classmethod
    def import_state(cls, st: dict) -> "ShardedFlatIndex":
        from longbow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(int(st["n_shards"]))  # raises if too few devices
        idx = cls(
            int(st["dim"]), mesh, st["metric"],
            dtype=jnp.dtype(str(st["dtype"])),
            shard_capacity=int(st["shard_capacity"]),
        )
        idx._shard_counts = np.asarray(st["shard_counts"], np.int64)
        sh = NamedSharding(mesh, P(SHARD_AXIS, None))
        sh1 = NamedSharding(mesh, P(SHARD_AXIS))
        idx.vectors = jax.device_put(
            jnp.asarray(st["vectors"], idx.dtype), sh
        )
        idx.norms_sq = jax.device_put(jnp.asarray(st["norms_sq"]), sh1)
        idx.valid = jax.device_put(jnp.asarray(st["valid"]), sh1)
        return idx
