"""Batched graph-traversal search over a fixed-fanout navigable graph.

TPU-native re-design of the reference's ArrowHNSW search
(reference: arrow_hnsw.go:754 SearchVectorsWithBitmap, searchLayer
:1108-1388). The Go implementation is a per-query best-first loop with
heaps, per-node locks and a SIMD-cleared visited bitset. None of that
maps to a TPU, so the design here is:

- **No pointer hierarchy.** The HNSW upper layers exist only to find a
  good entry point. Here a strided sample of the corpus (a few thousand
  rows) is scanned with one MXU matmul per query batch — same role,
  one fixed-shape op, no sequential descent. (CAGRA makes the same
  trade on GPUs.)
- **One flat graph.** `neighbors [N_cap, M2] int32` padded with -1,
  plus stored edge distances (the reference's PackedAdjacency keeps
  f16 edge distances too, types/graph_data.go:89-96).
- **Batched beam search.** B queries advance in lockstep through a
  `lax.while_loop`; each iteration expands one node per query (gather
  neighbors -> batched distance -> masked merge-sort into the beam).
  Visited handling = dedup against the beam + a recent-visit ring
  buffer; re-expansion of long-evicted nodes is possible but harmless
  (wasted distance evals, never wrong results).
- **Filtered search** keeps traversal unfiltered but feeds a separate
  result set only with eligible rows (tombstones/predicates), matching
  the reference's bitmap-search semantics.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from longbow_tpu.ops.distance import MASKED, Metric

# Python ints, NOT jnp scalars: a module-level jnp constant initializes
# the jax backend at import time, which pins the process to the default
# platform before serve.py's LONGBOW_FORCE_CPU can switch it (and wedges
# multi-process tests on the single-TPU relay).
INVALID = -1
_BIG = 2**30


class GraphState(NamedTuple):
    """Device-resident graph index state (a pytree; all arrays padded
    to N_cap rows).

    When `scale`/`offset` are set, `vectors` holds SQ8 codes (uint8)
    and the effective vector is `codes * scale + offset` — the
    equal-memory quantized-graph config (reference stores SQ8 inside
    HNSW the same way, arrow_hnsw.go:94, quantization_integration.go).
    Distance kernels fold the affine into the query so the uint8 codes
    stay the only big gathered operand (4x less HBM traffic than f32).

    When `pq_books` is set, `vectors` holds PQ codes ([N_cap, M] uint8,
    one byte per subspace) and traversal distances come from a
    per-query ADC lookup table (reference: PQ/ADC inside HNSW
    traversal, quantization_integration.go + pq/adc_table.go) — the
    gathered operand shrinks to M bytes per row (dim/M-fold less HBM
    gather traffic than SQ8).
    """

    vectors: jax.Array    # [N_cap, D] storage dtype (f32/bf16/u8 codes)
    norms_sq: jax.Array   # [N_cap] f32 (of the *effective* vectors)
    valid: jax.Array      # [N_cap] bool (allocated and not tombstoned)
    nbrs: jax.Array       # [N_cap, M2] int32, -1 padded
    nbr_dists: jax.Array  # [N_cap, M2] f32/bf16, MASKED padded
    nbr_count: jax.Array  # [N_cap] int32
    scale: Optional[jax.Array] = None   # [D] f32 (SQ8 dequant scale)
    offset: Optional[jax.Array] = None  # [D] f32 (SQ8 dequant offset)
    pq_books: Optional[jax.Array] = None  # [M, 256, dsub] f32 codebooks


def graph_init(
    capacity: int, dim: int, m2: int, dtype=jnp.float32,
    edge_dtype=jnp.float32,
) -> GraphState:
    """edge_dtype=bfloat16 halves the adjacency-distance HBM footprint
    (reference parity: PackedAdjacency's optional f16 edge distances,
    packed_adjacency_f16). Edge distances only steer insert-time
    neighbor eviction — bf16 precision is ample there; beam search
    never reads them."""
    return GraphState(
        vectors=jnp.zeros((capacity, dim), dtype=dtype),
        norms_sq=jnp.zeros((capacity,), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        nbrs=jnp.full((capacity, m2), INVALID, jnp.int32),
        nbr_dists=jnp.full((capacity, m2), MASKED, edge_dtype),
        nbr_count=jnp.zeros((capacity,), jnp.int32),
    )


def pq_decode(codes: jax.Array, books: jax.Array) -> jax.Array:
    """codes [..., M] u8 + books [M, 256, dsub] -> [..., M*dsub] f32."""
    m, _, dsub = books.shape
    flat_books = books.reshape(m * 256, dsub)
    gidx = (
        jnp.arange(m, dtype=jnp.int32) * 256 + codes.astype(jnp.int32)
    )  # [..., M]
    dec = jnp.take(flat_books, gidx, axis=0)  # [..., M, dsub]
    return dec.reshape(codes.shape[:-1] + (m * dsub,))


def gather_vectors_f32(state: GraphState, rows: jax.Array) -> jax.Array:
    """Gather rows as effective f32 vectors (dequantized when the
    state is SQ8- or PQ-coded). rows [...]-shaped -> [..., D] f32."""
    v = jnp.take(state.vectors, rows, axis=0)
    if state.scale is not None:
        return v.astype(jnp.float32) * state.scale + state.offset
    if state.pq_books is not None:
        return pq_decode(v, state.pq_books)
    return v.astype(jnp.float32)


def _gather_dist(
    state: GraphState, queries_f32: jax.Array, qn: jax.Array, rows: jax.Array
) -> jax.Array:
    """Distances from each query to its gathered rows.

    queries_f32 [B, D], qn [B, 1] = |q|^2, rows [B, R] -> [B, R] f32
    (L2 squared; out-of-range/-1 rows get garbage — mask outside).

    SQ8 states fold the dequant affine into the query:
    q.(c*s + o) = (q*s).c + q.o — the codes are never dequantized in
    HBM, only the [B, R] inner products are materialized.

    PQ states gather M-byte codes and read per-subspace inner products
    from a per-query ADC table (tiny einsum, loop-invariant — XLA CSE
    keeps it out of the traversal's hot loop): q.v_hat = sum_m
    lut[b, m, code]. Exact |v_hat|^2 comes from norms_sq (stored at
    encode time), so the only PQ approximation is the codebook
    residual, not a norm estimate.
    """
    safe = jnp.maximum(rows, 0)
    vecs = jnp.take(state.vectors, safe, axis=0)  # [B,R,D] storage dtype
    vn = jnp.take(state.norms_sq, safe, axis=0)  # [B, R]
    if state.scale is not None:
        qs = queries_f32 * state.scale[None, :]
        ip = jnp.einsum(
            "bd,brd->br", qs, vecs.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + (queries_f32 @ state.offset)[:, None]
    elif state.pq_books is not None:
        books = state.pq_books
        m, _, dsub = books.shape
        b, r = rows.shape
        qs = queries_f32.reshape(b, m, dsub)
        lut = jnp.einsum(
            "bmd,mkd->bmk", qs, books, preferred_element_type=jnp.float32
        ).reshape(b, m * 256)  # [B, M*256] per-query ADC table
        gidx = (
            jnp.arange(m, dtype=jnp.int32)[None, None, :] * 256
            + vecs.astype(jnp.int32)
        )  # [B, R, M]
        per = jnp.take_along_axis(lut, gidx.reshape(b, r * m), axis=1)
        ip = jnp.sum(per.reshape(b, r, m), axis=2)
    else:
        ip = jnp.einsum(
            "bd,brd->br", queries_f32, vecs.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    return jnp.maximum(qn - 2.0 * ip + vn, 0.0)


def entry_candidates(
    state: GraphState,
    queries_f32: jax.Array,
    qn: jax.Array,
    sample_rows: jax.Array,
    n_entry: int,
) -> tuple[jax.Array, jax.Array]:
    """Scan a fixed row sample with one matmul -> per-query best rows.

    Replaces the HNSW upper-layer greedy descent
    (reference: arrow_hnsw.go:874-885) with a single MXU op.
    Returns (dist [B, n_entry], rows [B, n_entry]).
    """
    svecs = jnp.take(state.vectors, sample_rows, axis=0)
    svn = jnp.take(state.norms_sq, sample_rows, axis=0)
    svalid = jnp.take(state.valid, sample_rows, axis=0)
    bias = 0.0
    if state.scale is not None:
        q_eff = queries_f32 * state.scale[None, :]
        bias = (queries_f32 @ state.offset)[:, None]
    elif state.pq_books is not None:
        # decode the (small) entry sample: one matmul beats per-row
        # LUT gathers at sample sizes
        svecs = pq_decode(svecs, state.pq_books)
        q_eff = queries_f32
    else:
        q_eff = queries_f32
    ip = jax.lax.dot_general(
        q_eff, svecs.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    dist = jnp.maximum(qn - 2.0 * ip + svn[None, :], 0.0)
    dist = jnp.where(svalid[None, :], dist, MASKED)
    neg, pos = jax.lax.top_k(-dist, n_entry)
    return -neg, jnp.take(sample_rows, pos)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "max_iters", "ring_size", "normalize",
        "expand_per_iter", "track_results", "approx_merge", "m_used",
    ),
)
def beam_search(
    state: GraphState,
    queries: jax.Array,
    sample_rows: jax.Array,
    k: int,
    ef: int,
    *,
    eligible: Optional[jax.Array] = None,
    normalize: bool = False,
    max_iters: int = 0,
    ring_size: int = 128,
    expand_per_iter: int = 4,  # on-chip sweep: +10% QPS vs 2 at -0.1%
                               # recall (iteration count halves; the
                               # loop is gathered-row-bound either way)
    track_results: bool = True,
    approx_merge: bool = False,
    m_used: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Batched best-first graph search.

    queries [B, D]; sample_rows [S] i32 entry-scan sample;
    eligible: optional [N_cap] bool — rows allowed in *results*
    (traversal ignores it; tombstoned rows route but never return,
    mirroring reference bitmap search arrow_hnsw.go:754).
    Returns (dist [B, k] f32, rows [B, k] i32) sorted ascending; empty
    slots have dist >= MASKED and row -1.

    track_results=False defers result extraction to AFTER the loop:
    the beam is exactly HNSW's ef-wide working set W, and any visited
    node outside it is worse than every beam entry, so top-k of the
    validity-filtered final beam equals the tracked result set
    whenever the beam holds >= k valid rows. Callers enable this on
    the unfiltered path when tombstones are light (HNSWIndex gates on
    dead fraction); it removes, per loop iteration, one [B, ex*M2]
    row gather of res_mask (the loop is gather-RATE-bound — this
    gather costs the same as the vector gather despite being 1 byte),
    one top_k over k+ex*M2 columns, and the O(w^2) in-gather dedup.
    """
    b, d = queries.shape
    if 0 < m_used < state.nbrs.shape[1]:
        # traverse only each node's best m_used edges. Bulk-built
        # adjacency rows are distance-sorted (symmetrizer top_k);
        # insert-path reverse updates can leave rows partially
        # unsorted, so the fast profile is meant for bulk-built
        # serving corpora. WARNING: XLA does NOT fuse this slice into
        # the row gather — it re-materializes the sliced adjacency on
        # every call (measured 6.5x QPS loss at 1M). Serving callers
        # must pre-slice and cache instead (HNSWIndex._speed_state);
        # this arg exists for one-off/experiment use.
        state = state._replace(
            nbrs=state.nbrs[:, :m_used],
            nbr_dists=state.nbr_dists[:, :m_used],
            nbr_count=jnp.minimum(state.nbr_count, m_used),
        )
    m2 = state.nbrs.shape[1]
    ex = max(1, expand_per_iter)
    if k > ef:  # deferred extraction needs the beam to cover k
        track_results = True
    if max_iters <= 0:
        # each iteration expands up to `ex` nodes per query; budget the
        # same total expansions as single-node HNSW (~2*ef)
        max_iters = (2 * ef) // ex + 32
    e = ef

    qf = queries.astype(jnp.float32)
    if normalize:
        # in-jit normalization: an eager normalize would cost a ~30ms
        # dispatch round trip per query batch on this platform
        qf = qf / jnp.maximum(
            jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30
        )
    qn = jnp.sum(qf * qf, axis=1, keepdims=True)

    res_mask = state.valid if eligible is None else (state.valid & eligible)

    # ---- init beam from the entry scan ----
    n_entry = min(e, sample_rows.shape[0])
    ed, er = entry_candidates(state, qf, qn, sample_rows, n_entry)
    pad = e - n_entry
    beam_d = jnp.pad(ed, ((0, 0), (0, pad)), constant_values=MASKED)
    beam_i = jnp.pad(er, ((0, 0), (0, pad)), constant_values=-1)
    expanded = jnp.zeros((b, e), bool)

    if track_results:
        # result set: entries eligible for return
        er_ok = jnp.take(res_mask, jnp.maximum(er, 0)) & (er >= 0)
        rd0 = jnp.where(er_ok, ed, MASKED)
        neg, pos = jax.lax.top_k(-rd0, k)
        res_d = -neg
        res_i = jnp.where(
            res_d < MASKED, jnp.take_along_axis(er, pos, axis=1), -1
        )

    visited = jnp.full((b, ring_size), -1, jnp.int32)

    def cond(carry):
        if track_results:
            beam_d, beam_i, expanded, res_d, res_i, visited, it = carry
        else:
            beam_d, beam_i, expanded, visited, it = carry
        frontier = jnp.where(expanded | (beam_d >= MASKED), MASKED, beam_d)
        best_unexp = jnp.min(frontier, axis=1)  # [B]
        # classic ef semantics: explore while the best unexpanded node
        # beats the *worst beam entry* (the ef-wide working set W in
        # HNSW), NOT the k-th result — terminating on the k-th result
        # caps recall at a level independent of ef.
        worst_beam = beam_d[:, -1]
        active = best_unexp < jnp.minimum(worst_beam, MASKED)
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(carry):
        if track_results:
            beam_d, beam_i, expanded, res_d, res_i, visited, it = carry
        else:
            beam_d, beam_i, expanded, visited, it = carry

        # -- pick the `ex` best unexpanded beam entries per query --
        frontier = jnp.where(expanded | (beam_d >= MASKED), MASKED, beam_d)
        _, pick = jax.lax.top_k(-frontier, ex)  # [B, ex] col indices
        cols = jax.lax.broadcasted_iota(jnp.int32, (b, e), 1)
        newly = jnp.any(cols[:, None, :] == pick[:, :, None], axis=1)
        # only mark/expand picks that are real frontier entries
        pick_d = jnp.take_along_axis(frontier, pick, axis=1)  # [B, ex]
        real = pick_d < MASKED
        expanded = expanded | (newly & jnp.any(
            (cols[:, None, :] == pick[:, :, None]) & real[:, :, None], axis=1
        ))
        exp_row = jnp.take_along_axis(beam_i, pick, axis=1)  # [B, ex]
        exp_row = jnp.where(real, exp_row, -1)

        # -- gather neighbors of the expanded nodes --
        nbr = jnp.take(
            state.nbrs, jnp.maximum(exp_row, 0), axis=0
        ).reshape(b, ex * m2)  # [B, ex*M2]
        nbr = jnp.where(
            jnp.repeat(real, m2, axis=1), nbr, -1
        )
        nbr_ok = nbr >= 0
        # dedup vs beam and recent-visit ring
        dup_beam = jnp.any(nbr[:, :, None] == beam_i[:, None, :], axis=2)
        dup_ring = jnp.any(nbr[:, :, None] == visited[:, None, :], axis=2)
        nbr_ok = nbr_ok & ~dup_beam & ~dup_ring

        nd = _gather_dist(state, qf, qn, nbr)
        nd = jnp.where(nbr_ok, nd, MASKED)

        if track_results:
            # -- fold eligible neighbors into the result set --
            ok_res = jnp.take(res_mask, jnp.maximum(nbr, 0)) & nbr_ok
            # a node can be re-discovered after falling out of the beam
            # and the ring; without this mask it re-enters res as a
            # duplicate and silently eats top-k slots (~10% recall at
            # 100k+)
            dup_res = jnp.any(
                nbr[:, :, None] == res_i[:, None, :], axis=2
            )
            # the same id can also appear twice within ONE gather (two
            # expanded nodes sharing a neighbor): keep first occurrence
            w = nbr.shape[1]
            eqn = nbr[:, :, None] == nbr[:, None, :]
            earlier = jnp.tril(jnp.ones((w, w), bool), k=-1)
            dup_in = jnp.any(eqn & earlier[None], axis=2) & nbr_ok
            cd = jnp.where(ok_res & ~dup_res & ~dup_in, nd, MASKED)
            all_d = jnp.concatenate([res_d, cd], axis=1)
            all_i = jnp.concatenate([res_i, nbr], axis=1)
            neg, pos = jax.lax.top_k(-all_d, k)
            res_d = -neg
            res_i = jnp.where(
                res_d < MASKED,
                jnp.take_along_axis(all_i, pos, axis=1),
                -1,
            )

        # -- merge neighbors into the beam (keep best e) --
        md = jnp.concatenate([beam_d, nd], axis=1)
        mi = jnp.concatenate([beam_i, jnp.where(nbr_ok, nbr, -1)], axis=1)
        mx = jnp.concatenate(
            [expanded, jnp.zeros((b, ex * m2), bool)], axis=1
        )
        if approx_merge:
            # TPU-native partial-reduction top-k: avoids the full
            # bitonic sort of e+ex*M2 columns each iteration
            neg, pos = jax.lax.approx_max_k(-md, e, recall_target=0.95)
        else:
            neg, pos = jax.lax.top_k(-md, e)
        beam_d = -neg
        beam_i = jnp.take_along_axis(mi, pos, axis=1)
        expanded = jnp.take_along_axis(mx, pos, axis=1)
        # anything that fell out of beam may re-enter later; the ring
        # (a shift register) guards the recently expanded
        visited = jnp.concatenate([visited[:, ex:], exp_row], axis=1)

        if track_results:
            return beam_d, beam_i, expanded, res_d, res_i, visited, it + 1
        return beam_d, beam_i, expanded, visited, it + 1

    if track_results:
        carry = (
            beam_d, beam_i, expanded, res_d, res_i, visited, jnp.int32(0)
        )
        _, _, _, res_d, res_i, _, _ = jax.lax.while_loop(cond, body, carry)
        return res_d, res_i

    carry = (beam_d, beam_i, expanded, visited, jnp.int32(0))
    beam_d, beam_i, _, _, _ = jax.lax.while_loop(cond, body, carry)
    # deferred extraction: top-k of the validity-filtered final beam.
    # In-gather duplicates can survive in the beam (the loop dedups
    # neighbors vs beam/ring but not within one gather) — drop all but
    # the first occurrence, else duplicates eat top-k slots.
    ok = jnp.take(res_mask, jnp.maximum(beam_i, 0)) & (beam_i >= 0)
    eq = beam_i[:, :, None] == beam_i[:, None, :]
    earlier = jnp.tril(jnp.ones((e, e), bool), k=-1)
    dup = jnp.any(eq & earlier[None], axis=2)
    fd = jnp.where(ok & ~dup, beam_d, MASKED)
    neg, pos = jax.lax.top_k(-fd, k)
    res_d = -neg
    res_i = jnp.where(
        res_d < MASKED, jnp.take_along_axis(beam_i, pos, axis=1), -1
    )
    return res_d, res_i
