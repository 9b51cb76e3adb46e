"""Binary quantization: 1-bit sign codes + Hamming-distance scan.

Capability match for the reference's BQ (reference:
binary_quantization.go:11-85 sign-bit packing into []uint64, simd
popcount hamming bitops_amd64.s). 32x memory reduction vs f32; the scan
is XOR + `lax.population_count` on the VPU with an exact re-rank of the
top candidates (standard BQ practice; the reference re-ranks too).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.ops.distance import MASKED, Metric, pad_to, tombstone_rows

MIN_CAPACITY = 4096


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _bq_append(codes, valid, new_codes, row):
    n = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (row, 0))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    return codes, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _bq_append_rr(codes, valid, rr, new_codes, new_rr, row):
    n = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (row, 0))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    rr = jax.lax.dynamic_update_slice(rr, new_rr, (row, 0))
    return codes, valid, rr


def _pack_bits(v: jax.Array) -> jax.Array:
    """[N, D] f32 -> [N, D/32] uint32 sign codes (bit = v >= 0)."""
    n, d = v.shape
    d_pad = pad_to(d, 32)
    if d_pad != d:
        # pad with -1 so padded bits are 0 on both sides (cancel in XOR)
        v = jnp.pad(v, ((0, 0), (0, d_pad - d)), constant_values=-1.0)
    bits = (v >= 0).astype(jnp.uint32).reshape(n, d_pad // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=2).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def _hamming_search(
    codes: jax.Array,    # [N, W] u32
    qcodes: jax.Array,   # [B, W] u32
    valid: jax.Array,    # [N]
    k: int,
) -> tuple[jax.Array, jax.Array]:
    x = jax.lax.population_count(
        jnp.bitwise_xor(qcodes[:, None, :], codes[None, :, :])
    )  # [B, N, W]
    ham = jnp.sum(x, axis=2).astype(jnp.float32)
    ham = jnp.where(valid[None, :], ham, MASKED)
    neg, pos = jax.lax.top_k(-ham, k)
    return -neg, pos


class BQIndex:
    """1-bit quantized index: Hamming scan + exact re-rank."""

    def __init__(
        self,
        dim: int,
        metric: str = Metric.COSINE,
        *,
        rerank: bool = True,
        rerank_factor: int = 32,
    ):
        self.dim = dim
        # BQ approximates angular similarity; L2 works after centering
        self.metric = Metric.validate(metric)
        self.rerank = rerank
        self.rerank_factor = rerank_factor
        self.codes: Optional[jax.Array] = None
        self.valid: Optional[jax.Array] = None
        self.vectors_bf16: Optional[jax.Array] = None
        self.mean: Optional[jax.Array] = None
        self.count = 0

    def _prep(self, vecs) -> jax.Array:
        return jnp.asarray(np.ascontiguousarray(vecs, np.float32))

    @property
    def capacity(self) -> int:
        return 0 if self.codes is None else self.codes.shape[0]

    def _grow_to(self, need: int, words: int) -> None:
        cap = max(self.capacity, MIN_CAPACITY)
        while cap < need:
            cap *= 2
        if self.codes is None:
            self.codes = jnp.zeros((cap, words), jnp.uint32)
            self.valid = jnp.zeros((cap,), bool)
            if self.rerank:
                self.vectors_bf16 = jnp.zeros(
                    (cap, self.dim), jnp.bfloat16
                )
        elif cap > self.capacity:
            pad = cap - self.capacity
            self.codes = jnp.pad(self.codes, ((0, pad), (0, 0)))
            self.valid = jnp.pad(self.valid, (0, pad))
            if self.rerank:
                self.vectors_bf16 = jnp.pad(
                    self.vectors_bf16, ((0, pad), (0, 0))
                )

    def add(self, vecs: np.ndarray) -> np.ndarray:
        v = self._prep(vecs)
        if self.mean is None:
            self.mean = jnp.mean(v, axis=0)  # center once on first batch
        codes = _pack_bits(v - self.mean[None, :])
        n = codes.shape[0]
        # donated in-place appends (no O(N) concatenate per batch)
        self._grow_to(self.count + n, codes.shape[1])
        if self.rerank:
            self.codes, self.valid, self.vectors_bf16 = _bq_append_rr(
                self.codes, self.valid, self.vectors_bf16,
                codes, v.astype(jnp.bfloat16), self.count,
            )
        else:
            self.codes, self.valid = _bq_append(
                self.codes, self.valid, codes, self.count
            )
        rows = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows):
            self.valid = tombstone_rows(self.valid, rows)

    def search(
        self, queries, k: int, *, filter_mask=None
    ) -> tuple[jax.Array, jax.Array]:
        queries = jnp.asarray(queries, jnp.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        qcodes = _pack_bits(queries - self.mean[None, :])
        valid = self.valid
        if filter_mask is not None:
            valid = jnp.logical_and(valid, filter_mask[: valid.shape[0]])
        kk = min(k * self.rerank_factor if self.rerank else k, self.count)
        d, i = _hamming_search(self.codes, qcodes, valid, kk)
        if not self.rerank:
            return d[:, :k], i[:, :k]
        cand = jnp.take(self.vectors_bf16, jnp.maximum(i, 0), axis=0).astype(
            jnp.float32
        )
        if self.metric == Metric.COSINE:
            qn = queries / jnp.maximum(
                jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30
            )
            cn = cand / jnp.maximum(
                jnp.linalg.norm(cand, axis=2, keepdims=True), 1e-30
            )
            sim = jnp.einsum("bd,bkd->bk", qn, cn)
            ed = 1.0 - sim
        else:
            ip = jnp.einsum(
                "bd,bkd->bk", queries, cand,
                preferred_element_type=jnp.float32,
            )
            qn2 = jnp.sum(queries * queries, axis=1, keepdims=True)
            cn2 = jnp.sum(cand * cand, axis=2)
            ed = jnp.maximum(qn2 - 2.0 * ip + cn2, 0.0)
        ed = jnp.where(d < MASKED, ed, MASKED)
        neg, pos = jax.lax.top_k(-ed, k)
        return -neg, jnp.take_along_axis(i, pos, axis=1)

    def export_state(self) -> dict:
        return {
            "kind": "bq",
            "dim": self.dim,
            "metric": self.metric,
            "rerank": self.rerank,
            "count": self.count,
            "mean": np.asarray(self.mean),
            "codes": np.asarray(self.codes[: self.count]),
            "valid": np.asarray(self.valid[: self.count]),
            "vectors_bf16": (
                np.asarray(self.vectors_bf16[: self.count]).astype(np.float32)
                if self.rerank
                else None
            ),
        }

    @classmethod
    def import_state(cls, st: dict) -> "BQIndex":
        idx = cls(st["dim"], st["metric"], rerank=st["rerank"])
        idx.mean = jnp.asarray(st["mean"])
        idx.codes = jnp.asarray(st["codes"])
        idx.valid = jnp.asarray(st["valid"])
        if st["rerank"] and st["vectors_bf16"] is not None:
            idx.vectors_bf16 = jnp.asarray(st["vectors_bf16"]).astype(
                jnp.bfloat16
            )
        idx.count = st["count"]
        return idx
