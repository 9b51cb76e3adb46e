"""Fused flat-scan kernel: tiled MXU distances + streaming on-device top-k.

The TPU-native replacement for the reference's batch distance assembly +
heap select (reference: internal/simd/batch_operations.go:17-146,
simd_blocked.go:15-122, arrow_kernels.go `select_k`:230). One Pallas
kernel streams corpus tiles HBM->VMEM, computes a [B, TILE_N] distance
block on the MXU, and folds it into a per-query running top-k held in
VMEM scratch — the [B, N] score matrix never touches HBM, so the scan
runs at corpus-read bandwidth.

Top-k maintenance uses threshold-gated selection: we track the current
k-th best value per query; a tile is folded in (k argmin rounds) only
when any score beats a query's threshold. After the first few tiles the
threshold converges and fold-ins become rare, so the steady-state cost
is the matmul plus one compare pass per tile.

Supported metric modes:
  - "l2":  needs per-row corpus norms; dist = |q|^2 - 2 q.v + |v|^2
  - "ip":  dist = -q.v  (dot; cosine = pre-normalized rows + "ip")
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from longbow_tpu.ops.distance import MASKED, Metric, pad_to

# Python scalars (not traced arrays) so the kernel body has no captured
# constants — Pallas requires all array inputs to be explicit.
_MASKED = 3.0e38
_BIG_I32 = 2**30


def tile_for_dim(d: int) -> int:
    """Corpus-tile rows that fit the kernel's scoped-VMEM budget at
    this dimensionality (measured on v5e: 2048 OOMs at D=384; 1024
    compiles at D<=512, 512 at D<=1536+)."""
    if d <= 128:
        return 2048
    if d <= 512:
        return 1024
    return 512


def _row_argmin(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (min value [B,1], first column index of the min [B,1])."""
    m = jnp.min(x, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    col = jnp.min(jnp.where(x == m, cols, _BIG_I32), axis=1, keepdims=True)
    return m, col


def _row_argmax(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    m = jnp.max(x, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    col = jnp.min(jnp.where(x == m, cols, _BIG_I32), axis=1, keepdims=True)
    return m, col


def _scan_kernel(
    q_ref,        # [B, D] VMEM
    qn_ref,       # [B, 1] VMEM (|q|^2; zeros for ip mode)
    tile_ref,     # [TILE_N, D] VMEM corpus tile
    vn_ref,       # [1, TILE_N] VMEM (corpus |v|^2, pre-masked with MASKED)
    out_vals_ref,  # [B, KPAD]
    out_idx_ref,   # [B, KPAD]
    best_vals,    # scratch [B, KPAD] f32
    best_idx,    # scratch [B, KPAD] i32
    s_ref,       # scratch [B, TILE_N] f32 (mutable tile scores)
    *,
    k: int,
    tile_n: int,
    mode: str,
):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, _MASKED)
        best_idx[:] = jnp.full_like(best_idx, -1)

    # ---- distances for this tile (MXU + epilogue) ----
    ip = jax.lax.dot_general(
        q_ref[:],
        tile_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE_N]
    if mode == "l2":
        # vn_ref carries |v|^2 for valid rows and MASKED for padding or
        # tombstoned rows, so masking rides the epilogue add for free.
        # NOTE: do NOT clamp negatives here — a jnp.maximum on this
        # expression sends the Mosaic compiler into a minutes-long
        # pathological compile on v5e (verified empirically); the
        # wrapper clamps the final [B, k] output instead.
        scores = qn_ref[:] - 2.0 * ip + vn_ref[:]
    else:  # "ip"
        scores = vn_ref[:] - ip  # vn is 0 for valid rows, MASKED otherwise

    # ---- threshold-gated fold-in ----
    # Exactly `rounds` insert iterations run per tile, where rounds =
    # max over queries of how many tile scores beat that query's current
    # k-th best. In steady state (threshold converged) rounds is 0 for
    # almost every tile, so the scan stays matmul/bandwidth-bound: the
    # per-tile cost is one compare+count pass and a single scalar read
    # for the trip count — no per-round scalar sync like a while-cond.
    # Counting with the *pre-insert* threshold can only overcount, never
    # undercount (inserting lowers the threshold), so this stays exact.
    s_ref[:] = scores
    base = step * tile_n

    def round_():
        """One insert round: move the per-query best remaining tile
        score into that query's top-k slot set (if it improves it)."""
        s = s_ref[:]
        m_val, m_col = _row_argmin(s)
        w_val, w_col = _row_argmax(best_vals[:])
        do = m_val < w_val  # [B, 1]
        kcols = jax.lax.broadcasted_iota(jnp.int32, best_vals.shape, 1)
        at_worst = kcols == w_col
        best_vals[:] = jnp.where(at_worst & do, m_val, best_vals[:])
        best_idx[:] = jnp.where(at_worst & do, base + m_col, best_idx[:])
        scols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # retire the candidate whether or not it was inserted so every
        # round strictly shrinks the remaining hit set
        s_ref[:] = jnp.where(scols == m_col, _MASKED, s)

    # Two unconditional rounds cover the common case (a tile rarely
    # contributes more than 2 of any query's final top-k once the
    # threshold has converged) without any scalar-core sync; the
    # while-loop mops up rare residual hits to keep the scan exact.
    for _ in range(min(2, k)):
        round_()

    def cond(it):
        kth = jnp.max(best_vals[:], axis=1, keepdims=True)
        # hard bound: each round retires one column per row, so > tile_n
        # rounds is impossible; the bound also guards interpret mode
        return jnp.logical_and(it < tile_n, jnp.any(s_ref[:] < kth))

    def body(it):
        round_()
        return it + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))

    # ---- emit sorted results on the final step ----
    @pl.when(step == nsteps - 1)
    def _emit():
        bv = best_vals[:]
        bi = best_idx[:]
        ov = jnp.full_like(bv, _MASKED)
        oi = jnp.full_like(bi, -1)
        kcols = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1)
        for j in range(k):
            m_val, m_col = _row_argmin(bv)
            sel = kcols == m_col
            pick_i = jnp.max(jnp.where(sel, bi, -_BIG_I32), axis=1, keepdims=True)
            ov = jnp.where(kcols == j, m_val, ov)
            oi = jnp.where(kcols == j, pick_i, oi)
            bv = jnp.where(sel, _MASKED, bv)
        out_vals_ref[:] = ov
        out_idx_ref[:] = oi


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "interpret", "normalize"),
)
def fused_flat_search(
    queries: jax.Array,
    corpus: jax.Array,
    corpus_norms_sq: jax.Array,
    valid: jax.Array,
    k: int,
    metric: str = Metric.L2,
    *,
    extra_mask=None,
    normalize: bool = False,
    tile_n: int = 0,  # 0 = dimension-aware default (tile_for_dim)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Flat exact k-NN with fused streaming top-k.

    queries:  [B, D] f32/bf16 (D should be 128-aligned; padded if not)
    corpus:   [N, D] same dtype; N padded internally to tile_n
    corpus_norms_sq: [N] f32 row norms (ignored for ip/dot but required
        shape-wise; pass zeros)
    valid:    [N] bool — False rows (padding/tombstones) never returned
    Returns (dist [B, k] f32, idx [B, k] i32), sorted ascending.

    For cosine: pre-normalize corpus + queries and call with metric="dot".
    """
    metric = Metric.validate(metric)
    if metric == Metric.COSINE:
        raise ValueError("fused_flat_search: pre-normalize and use dot for cosine")
    mode = "l2" if metric == Metric.L2 else "ip"
    # serving-path fusion: query normalization and filter-mask combine
    # happen inside this jit — each would otherwise be a separate eager
    # dispatch costing a ~30ms host round trip on this platform
    if normalize:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries.astype(jnp.float32), axis=1, keepdims=True),
            1e-30,
        ).astype(queries.dtype)
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask)

    b, d = queries.shape
    n = corpus.shape[0]
    if k > 128:
        raise ValueError("fused_flat_search supports k <= 128")

    # pad shapes to hardware tiles (bf16 sublane tiling wants 16 rows)
    d_pad = pad_to(d, 128)
    tile_n = tile_n or min(tile_for_dim(d), 1024)
    n_pad = pad_to(n, tile_n)
    b_pad = pad_to(b, 16 if corpus.dtype == jnp.bfloat16 else 8)
    kpad = 128  # one lane register per query row for the running top-k

    # queries compute in the corpus dtype on the MXU (bf16 corpus halves
    # HBM traffic — the reference's fp16 mode, docs/vectorsearch.md:137)
    queries = queries.astype(corpus.dtype)

    if d_pad != d:
        queries = jnp.pad(queries, ((0, 0), (0, d_pad - d)))
        corpus = jnp.pad(corpus, ((0, 0), (0, d_pad - d)))
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
        corpus_norms_sq = jnp.pad(corpus_norms_sq, (0, n_pad - n))
        valid = jnp.pad(valid.astype(bool), (0, n_pad - n))

    qf = queries.astype(jnp.float32)
    qn = (
        jnp.sum(qf * qf, axis=1, keepdims=True)
        if mode == "l2"
        else jnp.zeros((b_pad, 1), jnp.float32)
    )
    # fold validity into the norm row: invalid -> MASKED so the epilogue
    # add pushes the distance out of top-k range
    vn_base = corpus_norms_sq.astype(jnp.float32) if mode == "l2" else jnp.zeros(
        (n_pad,), jnp.float32
    )
    vn = jnp.where(valid.astype(bool), vn_base, MASKED)[None, :]  # [1, n_pad]

    grid = (n_pad // tile_n,)
    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n, mode=mode)

    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, kpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, kpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, kpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, kpad), jnp.float32),
            pltpu.VMEM((b_pad, kpad), jnp.int32),
            pltpu.VMEM((b_pad, tile_n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, qn, corpus, vn)

    out_vals = out_vals[:b, :k]
    if mode == "l2":
        # clamp bf16 cancellation (self-distance must not go negative);
        # MASKED entries survive max() unscathed
        out_vals = jnp.maximum(out_vals, 0.0)
    return out_vals, out_idx[:b, :k]


@functools.partial(
    jax.jit,
    static_argnames=("k", "pool", "metric", "tile_n", "normalize"),
)
def flat_search_rerank(
    queries: jax.Array,
    corpus: jax.Array,        # bf16 [N, D]
    corpus_norms_sq: jax.Array,
    valid: jax.Array,
    k: int,
    metric: str = Metric.L2,
    *,
    pool: int = 64,
    extra_mask=None,
    normalize: bool = False,
    tile_n: int = 0,  # 0 = dimension-aware default (tile_for_dim)
) -> tuple[jax.Array, jax.Array]:
    """Fused bf16 scan for a candidate pool + exact-f32-arithmetic
    re-rank of the pool (storage stays bf16).

    The scan is HBM-bandwidth-bound, so pool=64 costs the same as
    pool=10; the re-rank removes the bf16 matmul's cancellation noise
    (recall vs the f32 oracle: 0.944 -> 0.9895 on clustered 1M x 128,
    same 4.7 ms/128q). The residual ~1% is bf16 *storage* rounding.
    """
    pool = max(pool, k)
    tile_n = tile_n or tile_for_dim(corpus.shape[1])
    d, i = fused_flat_search(
        queries, corpus, corpus_norms_sq, valid, pool, metric,
        extra_mask=extra_mask, normalize=normalize, tile_n=tile_n,
    )
    cand = jnp.take(corpus, jnp.maximum(i, 0), axis=0).astype(jnp.float32)
    qf = queries.astype(jnp.float32)
    if normalize:
        qf = qf / jnp.maximum(
            jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30
        )
    ip = jnp.einsum(
        "bd,bkd->bk", qf, cand, preferred_element_type=jnp.float32
    )
    if metric == Metric.L2:
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)
        cn = jnp.sum(cand * cand, axis=2)
        ed = jnp.maximum(qn - 2.0 * ip + cn, 0.0)
    else:  # ip/dot (cosine = normalized + dot)
        ed = -ip
    ed = jnp.where(d < MASKED, ed, MASKED)
    neg, pos = jax.lax.top_k(-ed, k)
    return -neg, jnp.take_along_axis(i, pos, axis=1)
