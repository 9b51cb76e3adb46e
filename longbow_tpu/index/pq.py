"""Product quantization: codebook training, encoding, ADC search.

Capability match for the reference's PQ stack (reference:
pq/encoder.go:39 Train/Encode/Decode, adc_table.go:15 BuildADCTable,
simd ADCDistanceBatch batch_operations.go:119, pq_training.go) —
re-shaped for TPU: training is one batched Lloyd program over all M
subspaces (ops/kmeans.py), encoding is a batched nearest-centroid
matmul, and the ADC scan computes per-query LUTs with one einsum then
accumulates code lookups chunk-by-chunk, followed by an exact re-rank
of the top candidates (the reference re-ranks too,
parallel_search.go:41).

Compression matches the reference's claims (docs/vectorsearch.md:97):
m=96 on 1536d = 64x; any m dividing D with 256 centroids = D*4/m x.
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
    tombstone_rows,
)
from longbow_tpu.ops.kmeans import kmeans_init, lloyd

MIN_CAPACITY = 4096


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _pq_append(codes, valid, new_codes, row):
    n = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (row, 0))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    return codes, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _pq_append_rr(codes, valid, rr, new_codes, new_rr, row):
    n = new_codes.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, new_codes, (row, 0))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    rr = jax.lax.dynamic_update_slice(rr, new_rr, (row, 0))
    return codes, valid, rr


@functools.partial(jax.jit, static_argnames=())
def _encode(subvecs: jax.Array, codebooks: jax.Array) -> jax.Array:
    """subvecs [M, N, dsub] x codebooks [M, 256, dsub] -> codes [N, M] u8."""
    ip = jnp.einsum(
        "mnd,mkd->mnk", subvecs, codebooks,
        preferred_element_type=jnp.float32,
    )
    sn = jnp.sum(subvecs * subvecs, axis=2)[:, :, None]
    cn = jnp.sum(codebooks * codebooks, axis=2)[:, None, :]
    assign = jnp.argmin(sn - 2.0 * ip + cn, axis=2)  # [M, N]
    return assign.astype(jnp.uint8).T


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def _adc_search(
    codes: jax.Array,      # [N, M] uint8
    codebooks: jax.Array,  # [M, 256, dsub]
    queries: jax.Array,    # [B, D] f32
    valid: jax.Array,      # [N] bool
    k: int,
    chunk: int = 262144,
    metric: str = Metric.L2,
) -> tuple[jax.Array, jax.Array]:
    """Asymmetric-distance scan -> approximate (dist [B,k], idx [B,k]).

    For the dot metric the LUT holds negated per-subspace inner
    products (sum_m q_m . c_m = q . v_hat) — PQ serves MIPS natively,
    no augmentation needed."""
    b, d = queries.shape
    m, n_cent, dsub = codebooks.shape
    n = codes.shape[0]

    qs = queries.reshape(b, m, dsub)
    # per-query LUT over centroids  [B, M, 256]
    ip = jnp.einsum(
        "bmd,mkd->bmk", qs, codebooks, preferred_element_type=jnp.float32
    )
    if metric == Metric.DOT:
        lut = -ip  # smaller-is-better convention
    else:
        qn = jnp.sum(qs * qs, axis=2)[:, :, None]
        cn = jnp.sum(codebooks * codebooks, axis=2)[None, :, :]
        lut = qn - 2.0 * ip + cn  # [B, M, 256]

    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    codes_p = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
    valid_p = jnp.pad(valid, (0, n_pad - n))
    codes_c = codes_p.reshape(n_chunks, chunk, m)
    valid_c = valid_p.reshape(n_chunks, chunk)

    flat_lut = lut.reshape(b, m * 256)  # gather-friendly layout

    def scan_chunk(carry, xs):
        cc, vv = xs  # [chunk, M], [chunk]
        # index into flat LUT: code j of subspace m -> m*256 + code
        gidx = (
            jnp.arange(m, dtype=jnp.int32)[None, :] * 256
            + cc.astype(jnp.int32)
        )  # [chunk, M]
        # scores [B, chunk] = sum over m of lut[b, gidx]
        per = jnp.take(flat_lut, gidx.reshape(-1), axis=1)  # [B, chunk*M]
        scores = jnp.sum(per.reshape(b, chunk, m), axis=2)
        scores = jnp.where(vv[None, :], scores, MASKED)
        neg, pos = jax.lax.top_k(-scores, k)
        return carry, (-neg, pos)

    _, (cd, ci) = jax.lax.scan(scan_chunk, None, (codes_c, valid_c))
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None, None]
    ci = ci + base
    cd = jnp.moveaxis(cd, 0, 1).reshape(b, -1)
    ci = jnp.moveaxis(ci, 0, 1).reshape(b, -1)
    neg, pos = jax.lax.top_k(-cd, k)
    return -neg, jnp.take_along_axis(ci, pos, axis=1)


class PQIndex:
    """PQ-compressed corpus with ADC scan + exact re-rank.

    m: number of subquantizers (codes bytes per vector).
    rerank: keep full vectors and exactly re-rank the top
    `rerank_factor * k` ADC candidates (the reference re-ranks against
    the original Arrow-resident vectors too, parallel_search.go:41).
    Set rerank=False for the pure compressed-memory mode (reference
    equal-memory config). rerank_dtype trades memory for re-rank
    fidelity (bf16 halves it at ~1% recall cost on clustered data).
    """

    def __init__(
        self,
        dim: int,
        m: int = 16,
        metric: str = Metric.L2,
        *,
        rerank: bool = True,
        rerank_factor: int = 16,
        rerank_dtype=None,
        train_iters: int = 12,
    ):
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        self.dim = dim
        self.m = m
        self.dsub = dim // m
        self.metric = Metric.validate(metric)
        self.rerank = rerank
        self.rerank_factor = rerank_factor
        import jax.numpy as _jnp
        self.rerank_dtype = rerank_dtype or _jnp.float32
        self.train_iters = train_iters
        self.codebooks: Optional[jax.Array] = None  # [M, 256, dsub]
        self.codes: Optional[jax.Array] = None      # [N, M] u8
        self.valid: Optional[jax.Array] = None
        self.rerank_vectors: Optional[jax.Array] = None
        self.count = 0

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    def _prep(self, vecs: np.ndarray) -> jax.Array:
        v = jnp.asarray(np.ascontiguousarray(vecs, np.float32))
        if self.metric == Metric.COSINE:
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        return v

    def train(self, vecs: np.ndarray, seed: int = 0) -> None:
        """K-means codebooks over a training sample
        (reference: PQEncoder.Train pq/encoder.go:39)."""
        v = self._prep(vecs)
        sub = v.reshape(-1, self.m, self.dsub).transpose(1, 0, 2)  # [M,N,dsub]
        init = kmeans_init(sub, 256, seed)
        self.codebooks, _ = lloyd(sub, init, self.train_iters)

    @property
    def capacity(self) -> int:
        return 0 if self.codes is None else self.codes.shape[0]

    def _grow_to(self, need: int) -> None:
        cap = max(self.capacity, MIN_CAPACITY)
        while cap < need:
            cap *= 2
        if self.codes is None:
            self.codes = jnp.zeros((cap, self.m), jnp.uint8)
            self.valid = jnp.zeros((cap,), bool)
            if self.rerank:
                self.rerank_vectors = jnp.zeros(
                    (cap, self.dim), self.rerank_dtype
                )
        elif cap > self.capacity:
            pad = cap - self.capacity
            self.codes = jnp.pad(self.codes, ((0, pad), (0, 0)))
            self.valid = jnp.pad(self.valid, (0, pad))
            if self.rerank:
                self.rerank_vectors = jnp.pad(
                    self.rerank_vectors, ((0, pad), (0, 0))
                )
        return None

    def add(self, vecs: np.ndarray) -> np.ndarray:
        if not self.is_trained:
            self.train(vecs)
        v = self._prep(vecs)
        sub = v.reshape(-1, self.m, self.dsub).transpose(1, 0, 2)
        codes = _encode(sub, self.codebooks)
        n = codes.shape[0]
        # donated in-place appends into capacity-doubled buffers — no
        # O(N) concatenate / 2x HBM spike per batch
        self._grow_to(self.count + n)
        if self.rerank:
            self.codes, self.valid, self.rerank_vectors = _pq_append_rr(
                self.codes, self.valid, self.rerank_vectors,
                codes, v.astype(self.rerank_dtype), self.count,
            )
        else:
            self.codes, self.valid = _pq_append(
                self.codes, self.valid, codes, self.count
            )
        rows = np.arange(self.count, self.count + n, dtype=np.int64)
        self.count += n
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows):
            self.valid = tombstone_rows(self.valid, rows)

    def decode(self, rows: np.ndarray) -> np.ndarray:
        """Approximate reconstruction from codes
        (reference: PQEncoder.Decode pq/encoder.go:139)."""
        cc = np.asarray(self.codes)[rows]  # [R, M]
        cb = np.asarray(self.codebooks)    # [M, 256, dsub]
        out = np.stack(
            [cb[m_][cc[:, m_]] for m_ in range(self.m)], axis=1
        )  # [R, M, dsub]
        return out.reshape(len(rows), self.dim)

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

        kk = k * self.rerank_factor if self.rerank else k
        kk = min(kk, self.count)
        d, i = _adc_search(
            self.codes, self.codebooks, queries, valid, kk,
            metric=self.metric,
        )
        if not self.rerank:
            dd = d[:, :k]
            if self.metric == Metric.COSINE:  # ADC l2^2 -> 1 - cos
                dd = cosine_report(dd)
            return dd, i[:, :k]
        # exact re-rank of ADC candidates on stored full vectors
        cand = jnp.take(
            self.rerank_vectors, jnp.maximum(i, 0), axis=0
        ).astype(jnp.float32)  # [B, kk, D]
        ip = jnp.einsum(
            "bd,bkd->bk", queries, cand, preferred_element_type=jnp.float32
        )
        if self.metric == Metric.DOT:
            ed = -ip
        else:
            qn = jnp.sum(queries * queries, axis=1, keepdims=True)
            cn = jnp.sum(cand * cand, axis=2)
            ed = jnp.maximum(qn - 2.0 * ip + cn, 0.0)
        ed = jnp.where(d < MASKED, ed, MASKED)
        neg, pos = jax.lax.top_k(-ed, k)
        vals = -neg
        if self.metric == Metric.COSINE:
            # rerank distances are l2^2 on unit vectors: report the
            # declared cosine distance 1 - cos = l2^2 / 2
            vals = cosine_report(vals)
        return vals, jnp.take_along_axis(i, pos, axis=1)

    # -- persistence hooks --

    def export_state(self) -> dict:
        return {
            "kind": "pq",
            "dim": self.dim,
            "m": self.m,
            "metric": self.metric,
            "rerank": self.rerank,
            "count": self.count,
            "codebooks": np.asarray(self.codebooks),
            "codes": np.asarray(self.codes[: self.count]),
            "valid": np.asarray(self.valid[: self.count]),
            "rerank_vectors": (
                np.asarray(self.rerank_vectors[: self.count]).astype(
                    np.float32
                )
                if self.rerank
                else None
            ),
        }

    @classmethod
    def import_state(cls, st: dict) -> "PQIndex":
        idx = cls(
            st["dim"], st["m"], st["metric"], rerank=st["rerank"]
        )
        idx.codebooks = jnp.asarray(st["codebooks"])
        idx.codes = jnp.asarray(st["codes"])
        idx.valid = jnp.asarray(st["valid"])
        if st["rerank"] and st["rerank_vectors"] is not None:
            idx.rerank_vectors = jnp.asarray(st["rerank_vectors"]).astype(
                idx.rerank_dtype
            )
        idx.count = st["count"]
        return idx
