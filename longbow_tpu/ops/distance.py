"""Distance kernels — the MXU-native replacement for the reference's SIMD core.

The reference implements ~2.5k lines of hand written AVX-512/NEON
assembly for pairwise distances (reference: internal/simd/
distance_functions.go:17-195, simd_amd64.s, batch_operations.go:17-146).
On TPU the entire family collapses into one shape: a tiled matrix
multiplication on the MXU plus a cheap elementwise epilogue:

    l2sq(q, v)   = |q|^2 - 2 q.v + |v|^2
    cosine_d(q,v)= 1 - q.v / (|q||v|)
    dot_d(q, v)  = -q.v

All three are *distances* internally (smaller is better) so top-k is a
single code path; conversion back to user-facing scores happens at the
serving edge (store/), matching the reference's score semantics.

Everything here is pure XLA (jnp/lax) and serves as both the reference
implementation for Pallas-kernel tests and the fallback path on CPU.
The fused Pallas kernels live in ops/pallas_distance.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

class Metric:
    """Distance metric names (wire-compatible with the reference's
    `longbow.metric` schema metadata values, reference: dataset.go:176-189)."""

    L2 = "l2"
    COSINE = "cosine"
    DOT = "dot"
    HAMMING = "hamming"

    ALL = (L2, COSINE, DOT, HAMMING)

    @staticmethod
    def validate(metric: str) -> str:
        m = (metric or Metric.L2).lower()
        if m in ("euclidean", "l2sq", "squared_l2"):
            m = Metric.L2
        if m in ("ip", "inner_product", "dotproduct", "dot_product"):
            m = Metric.DOT
        if m not in Metric.ALL:
            raise ValueError(f"unknown metric {metric!r}; want one of {Metric.ALL}")
        return m


# A big-but-finite sentinel for masked-out distances. Using +inf breaks
# top-k tie handling and NaN propagation in some XLA reductions, so we
# use a large finite value well above any real distance.
# MUST stay a Python float, not jnp.float32(...): a device-array
# constant captured into jitted programs sends this platform's remote
# compiler into a 200-400s pathological compile (verified empirically —
# the same program with a Python-float constant compiles in ~2s).
MASKED = 3.0e38
# guard threshold for "is this a real result?" comparisons: the fused
# kernel's group-id packing can perturb a MASKED score by a few ulps
# (~1e31 at 3e38), so `d < MASKED` lets a tombstoned/filtered row
# through on sparse-filter scans. Real distances are < 1e30 by many
# orders of magnitude; compare against this instead.
MASKED_GUARD = 1.0e37


def cosine_report(d):
    """Internal l2^2-on-unit-vectors distances -> the DECLARED cosine
    distance 1-cos (= l2^2/2 on unit vectors), leaving masked
    sentinels (>= MASKED_GUARD) intact.

    Every index kind must report cosine through this one helper —
    before round 4 each kind had its own inline copy and they
    disagreed (-cos flat/sq8, 2-2cos hnsw/ivf/pq). Dispatches on the
    input: host numpy stays numpy (eager jnp on a serving path costs
    ~30 ms through the relay), anything else (jax array or tracer)
    rides jnp so the conversion fuses into the calling jit."""
    if isinstance(d, np.ndarray):
        return np.where(d < np.float32(MASKED_GUARD), np.float32(0.5) * d, d)
    return jnp.where(d < MASKED_GUARD, 0.5 * d, d)


def complex_as_real(v: jax.Array) -> jax.Array:
    """Complex [.., D] -> real [.., 2D] by concatenating (real, imag).

    For z, w in C^D:  Re(z . conj(w)) = zr.wr + zi.wi  — exactly the
    real dot product of the concatenated views — and |z|^2 = |view|^2.
    So complex L2 / cosine / (real-part) dot distances collapse onto
    the same MXU kernels as real data, with zero extra kernel code
    (reference ships separate complex64/complex128 SIMD kernels,
    internal/simd/distance_functions.go — on TPU they are the same
    matmul on a widened view).
    """
    return jnp.concatenate([jnp.real(v), jnp.imag(v)], axis=-1)


def _canon_dtype(v: jax.Array) -> jax.Array:
    """Map any supported input dtype onto the MXU compute form:
    complex -> widened real view; f64 -> kept when x64 is enabled
    (CPU / emulated-TPU exactness), else f32 (reference: f64 SIMD
    kernels, simd/batch_operations.go — TPU has no native f64 MXU;
    PRECISION_EXACT recovers full f32 accuracy and x64 mode serves
    the genuinely-f64 case)."""
    if jnp.iscomplexobj(v):
        v = complex_as_real(v)
    if v.dtype == jnp.float64 and not jax.config.jax_enable_x64:
        v = v.astype(jnp.float32)
    return v


def pad_to(n: int, multiple: int) -> int:
    """Round n up to a multiple (for MXU/VPU lane alignment)."""
    if n <= 0:
        return multiple
    return -(-n // multiple) * multiple


def pad_dim(d: int) -> int:
    """Pad feature dim to the 128-lane TPU register width."""
    return pad_to(d, 128)


def bucket_queries(q: "np.ndarray", cap: int = 4096):
    """Pad a [B, ...] host query batch to the next power-of-two rows.

    Jitted search programs compile once per input SHAPE; the serving
    coalescer produces whatever batch size happened to queue (1, 2, 3,
    7, ...), and each fresh B costs a full compile (~30s through the
    remote compiler — measured timing out every client during the
    window). Power-of-two buckets bound compiles at log2(cap) shapes
    and padding waste at 2x. Past `cap` rows batches are bulk/canonical
    already. Returns (padded, original_rows)."""
    import numpy as np

    b = q.shape[0]
    if b <= 0 or b > cap:
        return q, b
    nb = 1 << (b - 1).bit_length()
    if nb == b:
        return q, b
    out = np.zeros((nb,) + q.shape[1:], q.dtype)
    out[:b] = q
    return out, b


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_donated(valid, rows):
    # pad slots carry an out-of-range index; 'drop' skips them instead
    # of the default clamp tombstoning the last row
    return valid.at[rows].set(False, mode="drop")


@jax.jit
def _tombstone_copy(valid, rows):
    return valid.at[rows].set(False, mode="drop")


def tombstone_rows(valid, rows, *, donate: bool = False):
    """valid[rows] = False with a BUCKETED scatter shape.

    Upsert-heavy ingest produces a different stale-row count per
    group-committed batch; an exact-shape scatter (jit or eager —
    eager dispatch also compiles per shape) recompiled per distinct
    length, profiled at 64% of the ingest apply thread through the
    device relay. Pad slots index past the array and are dropped.

    donate=True reuses valid's buffer in place — only safe when the
    caller serializes dispatch against concurrent readers of the SAME
    array object (FlatIndex's _mu invariant); functional-snapshot
    index states must keep the copying default."""
    rows = np.asarray(rows, np.int64)
    bucket = 64
    while bucket < len(rows):
        bucket *= 2
    pad = bucket - len(rows)
    if pad:
        rows = np.concatenate(
            [rows, np.full(pad, valid.shape[0], np.int64)]
        )
    fn = _tombstone_donated if donate else _tombstone_copy
    return fn(valid, jnp.asarray(rows))


# ---------------------------------------------------------------------------
# Pairwise score matrices
# ---------------------------------------------------------------------------

# Matmul precision: on TPU the MXU natively multiplies bf16; "default"
# rounds f32 inputs to bf16 (fast, ~0.4% relative error — fine for
# approximate search), "highest" uses 3/6-pass bf16 passes to recover
# full f32 accuracy (the exact-oracle path). This is the TPU-native
# analogue of the reference's f32-vs-f16 kernel split
# (reference: distance_functions.go:76, docs/vectorsearch.md:137-145).
PRECISION_FAST = jax.lax.Precision.DEFAULT
PRECISION_EXACT = jax.lax.Precision.HIGHEST


def _dot_f32(q: jax.Array, v: jax.Array, precision=PRECISION_FAST) -> jax.Array:
    """q [B, D] @ v.T [D, N] -> [B, N] accumulated in f32 on the MXU
    (f64 inputs keep f64 accumulation — the x64/CPU exact path)."""
    acc = jnp.float64 if q.dtype == jnp.float64 else jnp.float32
    return jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
        precision=precision,
    )


def squared_norms(v: jax.Array) -> jax.Array:
    """Row-wise |v|^2 (f32; f64 inputs keep f64 under x64 so the exact
    oracle's norms match its f64 inner products). Precomputed once at
    ingest per corpus block. Complex rows use |z|^2 = |(re, im)|^2 via
    the widened real view."""
    vf = _canon_dtype(v)
    if vf.dtype != jnp.float64:
        vf = vf.astype(jnp.float32)
    return jnp.sum(vf * vf, axis=-1)


def distance_matrix(
    queries: jax.Array,
    corpus: jax.Array,
    metric: str = Metric.L2,
    *,
    corpus_norms_sq: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    precision=PRECISION_FAST,
) -> jax.Array:
    """All-pairs distances: queries [B, D] x corpus [N, D] -> [B, N] f32.

    Smaller is better for every metric. Invalid corpus rows (padding or
    tombstoned, reference: tombstone bitsets dataset.go:35-102) get the
    MASKED sentinel so they never survive top-k.

    corpus_norms_sq: optional precomputed |v|^2 (ingest-time amortization).
    valid: optional bool/int mask [N]; False rows are masked out.
    precision: MXU precision; PRECISION_EXACT for ground-truth paths.
    """
    metric = Metric.validate(metric)
    if metric == Metric.HAMMING:
        # only the binary-quantized index implements hamming
        # (index/bq.py); falling through to the dot branch silently
        # served negated inner products
        raise ValueError(
            "hamming distance is served by the 'bq' index kind, not "
            "the dense kernels"
        )
    # complex corpora ride the real kernels on a widened view; f64
    # follows the x64 switch (see _canon_dtype)
    queries = _canon_dtype(queries)
    corpus = _canon_dtype(corpus)
    ip = _dot_f32(queries, corpus, precision)  # [B, N] f32, the MXU part

    if metric == Metric.L2:
        qn = squared_norms(queries)[:, None]  # [B, 1]
        vn = (
            corpus_norms_sq.astype(ip.dtype)[None, :]
            if corpus_norms_sq is not None
            else squared_norms(corpus)[None, :]
        )
        dist = jnp.maximum(qn - 2.0 * ip + vn, 0.0)
    elif metric == Metric.COSINE:
        qn = jnp.sqrt(squared_norms(queries))[:, None]
        vn2 = (
            corpus_norms_sq.astype(ip.dtype)[None, :]
            if corpus_norms_sq is not None
            else squared_norms(corpus)[None, :]
        )
        vn = jnp.sqrt(vn2)
        denom = jnp.maximum(qn * vn, 1e-30)
        dist = 1.0 - ip / denom
    else:  # DOT
        dist = -ip

    if valid is not None:
        dist = jnp.where(valid[None, :].astype(bool), dist, MASKED)
    return dist


def pairwise_distance(
    a: jax.Array, b: jax.Array, metric: str = Metric.L2
) -> jax.Array:
    """Elementwise distance between row-aligned batches a,b [B, D] -> [B].

    The moral equivalent of the reference's single-pair kernels
    (reference: simd/distance_functions.go:17-60); on TPU only useful for
    small verification paths — batched matmul form is always preferred.
    """
    metric = Metric.validate(metric)
    if metric == Metric.HAMMING:
        raise ValueError(
            "hamming distance is served by the 'bq' index kind, not "
            "the dense kernels"
        )
    af = _canon_dtype(a)
    bf = _canon_dtype(b)
    if af.dtype != jnp.float64:
        af = af.astype(jnp.float32)
    if bf.dtype != jnp.float64:
        bf = bf.astype(jnp.float32)
    ip = jnp.sum(af * bf, axis=-1)
    if metric == Metric.L2:
        return jnp.maximum(jnp.sum(af * af, -1) - 2 * ip + jnp.sum(bf * bf, -1), 0.0)
    if metric == Metric.COSINE:
        na = jnp.sqrt(jnp.sum(af * af, -1))
        nb = jnp.sqrt(jnp.sum(bf * bf, -1))
        return 1.0 - ip / jnp.maximum(na * nb, 1e-30)
    return -ip


# ---------------------------------------------------------------------------
# Exact top-k search (flat scan) — chunked so [B, N] never fully materializes
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "chunk_rows", "exact_precision", "normalize"
    ),
)
def exact_search(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    metric: str = Metric.L2,
    *,
    corpus_norms_sq: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    extra_mask: Optional[jax.Array] = None,
    normalize: bool = False,
    chunk_rows: int = 131072,
    exact_precision: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN: queries [B, D] vs corpus [N, D] -> (dist [B,k], idx [B,k]).

    This is BASELINE config 1 (flat exact k-NN) and the ground-truth
    oracle for every recall gate (reference: recall_validation_test.go:24).
    `exact_precision=True` (default) forces full-f32 MXU passes so the
    ranking is bit-faithful; flip to False for the fast bf16 serving
    path (~4x faster, ~0.975 self-recall@10 on random data).

    Scans the corpus in chunks of `chunk_rows`, keeping a per-chunk
    top-k and merging at the end, so peak memory is
    O(B * chunk_rows) instead of O(B * N). The matmul per chunk is large
    enough to saturate the MXU.
    """
    precision = PRECISION_EXACT if exact_precision else PRECISION_FAST
    # serving-path fusion: cast, normalization and mask-combines run
    # inside this jit so the host never pays eager-dispatch round trips
    corpus = _canon_dtype(corpus)
    queries = _canon_dtype(queries)
    compute = (
        jnp.float64
        if jnp.float64 in (corpus.dtype, queries.dtype)
        else jnp.float32
    )
    corpus = corpus.astype(compute)
    queries = queries.astype(compute)
    if normalize:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-30
        )
    if extra_mask is not None:
        valid = (
            extra_mask
            if valid is None
            else jnp.logical_and(valid, extra_mask)
        )
    n, d = corpus.shape
    b = queries.shape[0]
    k = min(k, n)

    if n <= chunk_rows:
        dist = distance_matrix(
            queries,
            corpus,
            metric,
            corpus_norms_sq=corpus_norms_sq,
            valid=valid,
            precision=precision,
        )
        neg_vals, idx = jax.lax.top_k(-dist, k)
        return -neg_vals, idx

    n_chunks = -(-n // chunk_rows)
    n_pad = n_chunks * chunk_rows
    pad = n_pad - n
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    valid_p = jnp.pad(valid.astype(bool), (0, pad))
    norms_p = (
        jnp.pad(corpus_norms_sq.astype(jnp.float32), (0, pad))
        if corpus_norms_sq is not None
        else None
    )

    corpus_c = corpus_p.reshape(n_chunks, chunk_rows, d)
    valid_c = valid_p.reshape(n_chunks, chunk_rows)
    norms_c = (
        norms_p.reshape(n_chunks, chunk_rows) if norms_p is not None else None
    )

    def scan_chunk(carry, xs):
        if norms_c is not None:
            vchunk, vmask, vnorm = xs
        else:
            (vchunk, vmask), vnorm = xs, None
        dist = distance_matrix(
            queries,
            vchunk,
            metric,
            corpus_norms_sq=vnorm,
            valid=vmask,
            precision=precision,
        )
        neg_vals, idx = jax.lax.top_k(-dist, k)
        return carry, (-neg_vals, idx)

    xs = (corpus_c, valid_c, norms_c) if norms_c is not None else (corpus_c, valid_c)
    _, (cd, ci) = jax.lax.scan(scan_chunk, None, xs)
    # cd/ci: [n_chunks, B, k] -> [B, n_chunks*k]; rebase indices per chunk
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk_rows)[:, None, None]
    ci = ci + base
    cd = jnp.moveaxis(cd, 0, 1).reshape(b, n_chunks * k)
    ci = jnp.moveaxis(ci, 0, 1).reshape(b, n_chunks * k)
    neg_vals, pos = jax.lax.top_k(-cd, k)
    idx = jnp.take_along_axis(ci, pos, axis=1)
    return -neg_vals, idx
