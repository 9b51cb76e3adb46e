"""SQ8 scalar quantization: per-dim affine int8 storage.

Capability match for the reference's SQ8 path (reference:
scalar_quantization.go:15-229 per-dim min/max trainer, simd sq8
distance kernels sq8.go:37, train-at-threshold semantics
arrow_hnsw.go:94). 4x memory reduction vs f32; distances computed by
dequantize-into-matmul (XLA fuses the affine into the MXU feed).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.ops.distance import (
    cosine_report,
    MASKED,
    MASKED_GUARD,
    Metric,
    pad_to,
    tombstone_rows,
)

SQ8_TRAIN_THRESHOLD = 5000  # reference: arrow_hnsw.go:94
MIN_CAPACITY = 4096


@jax.jit
def _quantize(vecs: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    scale = jnp.maximum(hi - lo, 1e-12)
    q = jnp.round((vecs - lo) / scale * 255.0)
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _sq8_append(codes, norms, valid, new_codes, new_norms, row):
    """In-place append at [row, row+n) — donated buffers, no O(N)
    copy/2x-HBM spike (same machinery as FlatIndex._append_block)."""
    n = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (row, 0))
    norms = jax.lax.dynamic_update_slice(norms, new_norms, (row,))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    return codes, norms, valid


class SQ8Index:
    """int8-quantized flat index with exact-style scan.

    Arrays are padded to a power-of-two capacity that doubles on
    demand; appends are donated in-place slice updates (mutation at
    O(batch), not O(N) — reference appends into arena chunks,
    types/graph_data.go:218)."""

    def __init__(self, dim: int, metric: str = Metric.L2):
        self.dim = dim
        self.metric = Metric.validate(metric)
        self.lo: Optional[jax.Array] = None
        self.hi: Optional[jax.Array] = None
        self.codes: Optional[jax.Array] = None
        self.norms_sq: Optional[jax.Array] = None
        self.valid: Optional[jax.Array] = None
        self.count = 0

    @property
    def is_trained(self) -> bool:
        return self.lo is not None

    @property
    def capacity(self) -> int:
        return 0 if self.codes is None else self.codes.shape[0]

    def _prep(self, vecs) -> jax.Array:
        v = jnp.asarray(np.ascontiguousarray(vecs, np.float32))
        if self.metric == Metric.COSINE:
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        return v

    def train(self, vecs: np.ndarray) -> None:
        """Per-dim min/max (reference: scalar_quantization.go:15).

        int8/uint8 input trains an IDENTITY affine (lo/hi = the dtype's
        full range): the stored codes are then the ingested bytes 1:1 —
        the reference's native int8 ingest path, no quantization loss."""
        vecs_np = np.asarray(vecs)
        if self.metric == Metric.COSINE:
            vecs_np = vecs_np.astype(np.float32)  # codes store normalized
        if vecs_np.dtype == np.int8:
            self.lo = jnp.full((self.dim,), -128.0, jnp.float32)
            self.hi = jnp.full((self.dim,), 127.0, jnp.float32)
            return
        if vecs_np.dtype == np.uint8:
            self.lo = jnp.zeros((self.dim,), jnp.float32)
            self.hi = jnp.full((self.dim,), 255.0, jnp.float32)
            return
        v = self._prep(vecs)
        self.lo = jnp.min(v, axis=0)
        self.hi = jnp.max(v, axis=0)

    def _grow_to(self, need: int) -> None:
        cap = max(self.capacity, MIN_CAPACITY)
        while cap < need:
            cap *= 2
        if self.codes is None:
            self.codes = jnp.zeros((cap, self.dim), jnp.uint8)
            self.norms_sq = jnp.zeros((cap,), jnp.float32)
            self.valid = jnp.zeros((cap,), bool)
        elif cap > self.capacity:
            pad = cap - self.capacity
            self.codes = jnp.pad(self.codes, ((0, pad), (0, 0)))
            self.norms_sq = jnp.pad(self.norms_sq, (0, pad))
            self.valid = jnp.pad(self.valid, (0, pad))

    def add(self, vecs: np.ndarray) -> np.ndarray:
        if not self.is_trained:
            self.train(vecs)
        v = self._prep(vecs)
        codes = _quantize(v, self.lo, self.hi)
        deq = self._dequant(codes)
        norms = jnp.sum(deq * deq, axis=1)
        n = codes.shape[0]
        self._grow_to(self.count + n)
        self.codes, self.norms_sq, self.valid = _sq8_append(
            self.codes, self.norms_sq, self.valid, codes, norms, self.count
        )
        rows = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return rows

    def _dequant(self, codes: jax.Array) -> jax.Array:
        scale = jnp.maximum(self.hi - self.lo, 1e-12) / 255.0
        return codes.astype(jnp.float32) * scale[None, :] + self.lo[None, :]

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows):
            self.valid = tombstone_rows(self.valid, rows)

    def search(
        self, queries, k: int, *, filter_mask=None
    ) -> tuple[jax.Array, jax.Array]:
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == Metric.COSINE:
            queries = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30
            )
        valid = self.valid
        if filter_mask is not None:
            valid = jnp.logical_and(valid, filter_mask[: valid.shape[0]])
        return _sq8_scan(
            self.codes, self.lo, self.hi, self.norms_sq, queries, valid, k,
            self.metric,
        )

    def export_state(self) -> dict:
        return {
            "kind": "sq8",
            "dim": self.dim,
            "metric": self.metric,
            "count": self.count,
            "lo": np.asarray(self.lo),
            "hi": np.asarray(self.hi),
            "codes": np.asarray(self.codes[: self.count]),
            "valid": np.asarray(self.valid[: self.count]),
        }

    @classmethod
    def import_state(cls, st: dict) -> "SQ8Index":
        idx = cls(st["dim"], st["metric"])
        idx.lo = jnp.asarray(st["lo"])
        idx.hi = jnp.asarray(st["hi"])
        idx.codes = jnp.asarray(st["codes"])
        idx.norms_sq = jnp.sum(idx._dequant(idx.codes) ** 2, axis=1)
        idx.valid = jnp.asarray(st["valid"])
        idx.count = st["count"]
        return idx


class SQ8ResidualIndex(SQ8Index):
    """SQ8 with k-means mean-centering (index kind "sq8r").

    Codes store `v - center(cluster(v))` under a GLOBAL per-dim affine
    over residuals, plus one int32 cluster id per row. On clustered
    corpora the residual range is the intra-cluster noise, not the
    corpus spread — the quantization step shrinks by the spread ratio,
    which is the fix for the global-affine ceiling (recall@10 ~0.944
    at 1M clustered, CLAUDE.md) at ~1.03 bytes/dim-row at 128d.

    Scan: q.v = q.center[cid] + q.res — the residual term is the same
    affine-folded codes matmul as SQ8, the center term is one small
    [B, C] matmul gathered per row by cluster id (chunked; both on the
    MXU). Reference counterpart: scalar_quantization.go's global
    min/max trainer — this is the TPU-shaped upgrade of it.
    """

    N_CLUSTERS = 1024
    TRAIN_SAMPLE = 131_072

    def __init__(self, dim: int, metric: str = Metric.L2,
                 n_clusters: int = 0):
        super().__init__(dim, metric)
        self.n_clusters = n_clusters or self.N_CLUSTERS
        self.centers: Optional[jax.Array] = None  # [C, D] f32
        self.cluster_ids: Optional[jax.Array] = None  # [cap] i32

    def train(self, vecs: np.ndarray) -> None:
        from longbow_tpu.ops.kmeans import kmeans_init, lloyd

        v = self._prep(vecs)
        n = v.shape[0]
        c = min(self.n_clusters, max(n // 8, 1))
        self.n_clusters = c
        sample = v[: self.TRAIN_SAMPLE]
        cent, _ = lloyd(
            sample[None], kmeans_init(sample[None], c, 0), 10
        )
        self.centers = cent[0]
        res = v[: self.TRAIN_SAMPLE] - jnp.take(
            self.centers, self._assign(v[: self.TRAIN_SAMPLE]), axis=0
        )
        self.lo = jnp.min(res, axis=0)
        self.hi = jnp.max(res, axis=0)

    def _assign(self, v: jax.Array) -> jax.Array:
        ip = jax.lax.dot_general(
            v, self.centers, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cn = jnp.sum(self.centers * self.centers, axis=1)
        return jnp.argmin(cn[None, :] - 2.0 * ip, axis=1).astype(jnp.int32)

    def _grow_to(self, need: int) -> None:
        old_cap = self.capacity
        super()._grow_to(need)
        if self.cluster_ids is None:
            self.cluster_ids = jnp.zeros((self.capacity,), jnp.int32)
        elif self.capacity > old_cap:
            self.cluster_ids = jnp.pad(
                self.cluster_ids, (0, self.capacity - old_cap)
            )

    def add(self, vecs: np.ndarray) -> np.ndarray:
        if not self.is_trained:
            self.train(vecs)
        v = self._prep(vecs)
        cid = self._assign(v)
        res = v - jnp.take(self.centers, cid, axis=0)
        codes = _quantize(res, self.lo, self.hi)
        deq = self._dequant_rows(codes, cid)
        norms = jnp.sum(deq * deq, axis=1)
        n = codes.shape[0]
        self._grow_to(self.count + n)
        self.codes, self.norms_sq, self.valid = _sq8_append(
            self.codes, self.norms_sq, self.valid, codes, norms,
            self.count,
        )
        self.cluster_ids = jax.lax.dynamic_update_slice(
            self.cluster_ids, cid, (self.count,)
        )
        rows = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return rows

    def _dequant_rows(self, codes: jax.Array, cid: jax.Array) -> jax.Array:
        scale = jnp.maximum(self.hi - self.lo, 1e-12) / 255.0
        res = codes.astype(jnp.float32) * scale[None, :] + self.lo[None, :]
        return res + jnp.take(self.centers, cid, axis=0)

    def _dequant(self, codes: jax.Array) -> jax.Array:  # get_vectors path
        # codes here are rows gathered by the adapter; re-gather ids
        raise NotImplementedError("use get_vectors")

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        r = jnp.asarray(np.asarray(rows))
        return np.asarray(
            self._dequant_rows(
                jnp.take(self.codes, r, axis=0),
                jnp.take(self.cluster_ids, r),
            )
        )

    def search(
        self, queries, k: int, *, filter_mask=None
    ) -> tuple[jax.Array, jax.Array]:
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        if self.metric == Metric.COSINE:
            queries = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30
            )
        valid = self.valid
        if filter_mask is not None:
            valid = jnp.logical_and(valid, filter_mask[: valid.shape[0]])
        return _sq8r_scan(
            self.codes, self.cluster_ids, self.centers, self.lo, self.hi,
            self.norms_sq, queries, valid, k, self.metric,
        )

    def export_state(self) -> dict:
        st = super().export_state()
        st["kind"] = "sq8r"
        st["centers"] = np.asarray(self.centers)
        st["cluster_ids"] = np.asarray(self.cluster_ids[: self.count])
        return st

    @classmethod
    def import_state(cls, st: dict) -> "SQ8ResidualIndex":
        idx = cls(st["dim"], st["metric"])
        idx.centers = jnp.asarray(st["centers"])
        idx.n_clusters = idx.centers.shape[0]
        idx.lo = jnp.asarray(st["lo"])
        idx.hi = jnp.asarray(st["hi"])
        idx.codes = jnp.asarray(st["codes"])
        idx.valid = jnp.asarray(st["valid"])
        idx.count = st["count"]
        idx.cluster_ids = jnp.asarray(st["cluster_ids"])
        idx.norms_sq = jnp.sum(
            idx._dequant_rows(idx.codes, idx.cluster_ids) ** 2, axis=1
        )
        return idx


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _sq8r_scan(
    codes, cluster_ids, centers, lo, hi, norms_sq, queries, valid, k,
    metric,
):
    """Residual-SQ8 scan: ip = (q*scale).codes + q.lo + (q@centers.T)
    gathered per row by cluster id. Chunked over corpus rows so the
    [B, chunk] blocks stay bounded at any N."""
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    qs = (queries * scale[None, :]).astype(jnp.bfloat16)
    q_lo = jnp.sum(queries * lo[None, :], axis=1, keepdims=True)
    qc = jax.lax.dot_general(  # [B, C] center inner products
        queries, centers, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    cap = codes.shape[0]
    chunk = min(cap, 131_072)
    n_pad = -(-cap // chunk) * chunk
    if n_pad != cap:
        codes = jnp.pad(codes, ((0, n_pad - cap), (0, 0)))
        cluster_ids = jnp.pad(cluster_ids, (0, n_pad - cap))
        norms_sq = jnp.pad(norms_sq, (0, n_pad - cap))
        valid = jnp.pad(valid, (0, n_pad - cap))
    nb = n_pad // chunk

    def one(b):
        off = b * chunk
        cc = jax.lax.dynamic_slice_in_dim(codes, off, chunk)
        ci = jax.lax.dynamic_slice_in_dim(cluster_ids, off, chunk)
        nn = jax.lax.dynamic_slice_in_dim(norms_sq, off, chunk)
        vv = jax.lax.dynamic_slice_in_dim(valid, off, chunk)
        ip = jax.lax.dot_general(
            qs, cc.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + q_lo + jnp.take(qc, ci, axis=1)
        if metric == Metric.DOT:
            dist = -ip
        else:
            # l2 AND cosine: the l2 form's consistent dequant-norm term
            # cancels the quantized-storage norm wobble that raw -q.v
            # injects un-attenuated (see FlatIndex.search cosine note)
            dist = jnp.maximum(qn - 2.0 * ip + nn[None, :], 0.0)
        dist = jnp.where(vv[None, :], dist, MASKED)
        neg, pos = jax.lax.top_k(-dist, k)
        return -neg, pos.astype(jnp.int32) + off

    bd, bi = jax.lax.map(one, jnp.arange(nb, dtype=jnp.int32))
    # [nb, B, k] -> merge across chunks
    b = queries.shape[0]
    all_d = jnp.moveaxis(bd, 0, 1).reshape(b, nb * k)
    all_i = jnp.moveaxis(bi, 0, 1).reshape(b, nb * k)
    neg, pos = jax.lax.top_k(-all_d, k)
    vals = -neg
    if metric == Metric.COSINE:  # l2^2 on unit vectors -> 1 - cos
        vals = cosine_report(vals)
    return vals, jnp.take_along_axis(all_i, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _sq8_scan(codes, lo, hi, norms_sq, queries, valid, k, metric):
    """Affine-folded scan: q.v = (q*scale).codes + q.lo keeps the int8
    codes as the only big operand (the MXU multiplies bf16(codes))."""
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    qs = (queries * scale[None, :]).astype(jnp.bfloat16)
    ip_codes = jax.lax.dot_general(
        qs, codes.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q_lo = jnp.sum(queries * lo[None, :], axis=1, keepdims=True)
    ip = ip_codes + q_lo
    if metric == Metric.DOT:
        dist = -ip
    else:  # l2 AND cosine (see _sq8r_scan note on the norm wobble)
        qn = jnp.sum(queries * queries, axis=1, keepdims=True)
        dist = jnp.maximum(qn - 2.0 * ip + norms_sq[None, :], 0.0)
    dist = jnp.where(valid[None, :], dist, MASKED)
    neg, pos = jax.lax.top_k(-dist, k)
    vals = -neg
    if metric == Metric.COSINE:  # l2^2 on unit vectors -> 1 - cos
        vals = cosine_report(vals)
    return vals, pos
