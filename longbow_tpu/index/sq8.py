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

from longbow_tpu.ops.distance import MASKED, Metric, pad_to

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
            self.valid = self.valid.at[jnp.asarray(rows)].set(False)

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
    if metric == Metric.L2:
        qn = jnp.sum(queries * queries, axis=1, keepdims=True)
        dist = jnp.maximum(qn - 2.0 * ip + norms_sq[None, :], 0.0)
    else:  # dot / cosine(normalized)
        dist = -ip
    dist = jnp.where(valid[None, :], dist, MASKED)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, pos
