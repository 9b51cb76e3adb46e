"""Batched graph construction: the TPU re-design of HNSW insertion.

The reference inserts one vector at a time under per-node versioned
locks (reference: insertion_core.go:16, arrow_hnsw_insert.go:10-60,
selectNeighbors diversity heuristic :20). On TPU, insertion is a pure
batched function over the graph arrays:

  1. search the current graph for each new node's neighborhood
     (batched beam search + exact intra-batch kNN so batch members can
     link to each other like sequential inserts would),
  2. select M diverse neighbors per node with the classic
     keep-pruned-connections heuristic, vectorized over the batch,
  3. scatter forward edges (new rows are unique — conflict-free),
  4. add reverse edges in R conflict-free passes: each pass picks at
     most one incoming edge per target via scatter-min arbitration,
     appends or replaces that target's worst edge, and retires the
     edge. Leftovers beyond R per target in one batch are dropped
     (bounded, rare, and harmless to recall — same spirit as the
     reference dropping work under contention).

Everything is fixed-shape and jittable; the host only orchestrates
batch boundaries and capacity growth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from longbow_tpu.index.graph import (
    GraphState,
    beam_search,
    gather_vectors_f32,
)
from longbow_tpu.ops.distance import MASKED

# Python float, NOT jnp.float32: a module-level jnp constant initializes
# the jax backend at import, pinning the platform before serve.py can
# force CPU (see index/graph.py).
_BIG = 3.0e38


def build_stage_timer(n: int, tag: str = "build"):
    """Stage-timing hook for bulk builds, active under
    LONGBOW_BUILD_DEBUG=1 (each call blocks on the given arrays and
    prints the elapsed stage time to stderr). No-op otherwise."""
    import os
    import sys
    import time as _t

    if os.environ.get("LONGBOW_BUILD_DEBUG") != "1":
        return lambda label, *arrs: None
    state = {"t": _t.time()}

    force = os.environ.get("LONGBOW_BUILD_FORCE") == "1"

    def stage(label, *arrs):
        for a in arrs:
            if force:
                # block_until_ready returns EARLY through the device
                # relay (round-4 finding) — a dependent scalar fetch is
                # the only true barrier; debug-only (eager dispatch)
                import numpy as _np

                float(_np.asarray(a.astype(jnp.float32).sum()))
            else:
                jax.block_until_ready(a)
        now = _t.time()
        print(
            f"[{tag} {n}] {label}: {now - state['t']:.1f}s",
            file=sys.stderr, flush=True,
        )
        state["t"] = now

    return stage


def _pairwise_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """[Bi, C, D] x [Bi, S, D] -> [Bi, C, S] squared L2 (batched MXU)."""
    ip = jnp.einsum("bcd,bsd->bcs", a, b, preferred_element_type=jnp.float32)
    an = jnp.sum(a * a, axis=2)[:, :, None]
    bn = jnp.sum(b * b, axis=2)[:, None, :]
    return jnp.maximum(an - 2.0 * ip + bn, 0.0)


def select_neighbors_heuristic(
    cand_rows: jax.Array,   # [Bi, C] i32 (-1 = empty)
    cand_dist: jax.Array,   # [Bi, C] f32 dist(candidate, q)
    cand_vecs: jax.Array,   # [Bi, C, D] f32
    m: int,
    *,
    protected=None,         # [Bi, C] bool: picked first, never pruned
    fill: bool = False,     # keepPrunedConnections: top up to m slots
) -> tuple[jax.Array, jax.Array]:
    """Vectorized keep-pruned-connections heuristic
    (reference: arrow_hnsw_insert.go:20 selectNeighbors).

    Greedily picks the closest remaining candidate; after each pick,
    candidates closer to the picked node than to the query are pruned.
    Returns (rows [Bi, m], dists [Bi, m]) padded with -1 / MASKED.

    protected: candidates that must survive (picked ahead of everything
    else and exempt from pruning) — carries the symmetrizer's rank-0
    reverse-edge reachability guarantee through the diversity prune.
    fill: after the greedy pass, remaining slots are topped up with the
    closest PRUNED candidates (the reference's keepPrunedConnections
    arm) so nodes keep full degree.
    """
    bi, c, d = cand_vecs.shape
    pair = _pairwise_l2(cand_vecs, cand_vecs)  # [Bi, C, C]
    avail = (cand_rows >= 0) & (cand_dist < MASKED)
    avail0 = avail
    if protected is None:
        protected = jnp.zeros_like(avail)
    # pick ordering: protected first, then by true distance
    order_d = jnp.where(protected, cand_dist - 1.0e9, cand_dist)

    def body(j, carry):
        avail, sel_rows, sel_dists = carry
        dd = jnp.where(avail, order_d, _BIG)
        pick = jnp.argmin(dd, axis=1)  # [Bi]
        has = jnp.take_along_axis(dd, pick[:, None], axis=1)[:, 0] < _BIG
        pick_d = jnp.take_along_axis(cand_dist, pick[:, None], axis=1)
        pick_row = jnp.where(
            has, jnp.take_along_axis(cand_rows, pick[:, None], axis=1)[:, 0], -1
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, sel_rows.shape, 1)
        sel_rows = jnp.where(cols == j, pick_row[:, None], sel_rows)
        sel_dists = jnp.where(
            cols == j,
            jnp.where(has, pick_d[:, 0], MASKED)[:, None],
            sel_dists,
        )
        # prune: drop candidates closer to the pick than to the query
        d_to_pick = jnp.take_along_axis(
            pair, pick[:, None, None], axis=2
        )[:, :, 0]  # [Bi, C]
        prune = (d_to_pick < cand_dist) & ~protected
        ccols = jax.lax.broadcasted_iota(jnp.int32, avail.shape, 1)
        avail = avail & ~prune & (ccols != pick[:, None]) & has[:, None]
        return avail, sel_rows, sel_dists

    sel_rows = jnp.full((bi, m), -1, jnp.int32)
    sel_dists = jnp.full((bi, m), MASKED, jnp.float32)
    _, sel_rows, sel_dists = jax.lax.fori_loop(
        0, m, body, (avail, sel_rows, sel_dists)
    )
    if fill:
        # top up trailing empty slots with the closest candidates the
        # diversity rule pruned (selected entries rank first via the
        # -1e9 bias; duplicates impossible — a candidate is either
        # selected or not)
        in_sel = jnp.any(
            (cand_rows[:, :, None] == sel_rows[:, None, :])
            & (sel_rows[:, None, :] >= 0),
            axis=2,
        )
        fill_d = jnp.where(avail0 & ~in_sel, cand_dist, MASKED)
        md = jnp.concatenate(
            [jnp.where(sel_dists < MASKED, sel_dists - 1.0e9, MASKED),
             fill_d],
            axis=1,
        )
        mr = jnp.concatenate([sel_rows, cand_rows], axis=1)
        mt = jnp.concatenate([sel_dists, cand_dist], axis=1)  # true d
        neg, pos = jax.lax.top_k(-md, m)
        sel_rows = jnp.where(
            -neg < MASKED, jnp.take_along_axis(mr, pos, axis=1), -1
        )
        sel_dists = jnp.where(
            -neg < MASKED,
            jnp.take_along_axis(mt, pos, axis=1),
            MASKED,
        )
    return sel_rows, sel_dists


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef_construction", "m", "cand_cap", "reverse_passes",
        "expand_per_iter",
    ),
    donate_argnums=(0,),
)
def insert_batch(
    state: GraphState,
    new_rows: jax.Array,      # [Bi] i32 rows already holding vectors
    sample_rows: jax.Array,   # [S] entry-scan sample
    *,
    ef_construction: int = 100,
    m: int = 32,
    cand_cap: int = 64,
    reverse_passes: int = 8,
    expand_per_iter: int = 1,  # 1 = quality-first construction beam
) -> GraphState:
    """Link a batch of already-stored vectors into the graph."""
    bi = new_rows.shape[0]
    m2 = state.nbrs.shape[1]
    d = state.vectors.shape[1]

    q = gather_vectors_f32(state, new_rows)

    # -- 1. candidates from the existing graph --
    gd, gi = beam_search(
        state, q, sample_rows, k=cand_cap, ef=ef_construction,
        max_iters=(ef_construction // max(expand_per_iter, 1)) + 16,
        expand_per_iter=expand_per_iter,
    )
    # exclude self-matches (a re-inserted duplicate row is fine, the
    # actual row id must not self-link)
    self_hit = gi == new_rows[:, None]
    gd = jnp.where(self_hit, MASKED, gd)
    gi = jnp.where(self_hit, -1, gi)

    # -- intra-batch exact kNN so batch members can link to each other
    # (sequential-insert behavior the batch would otherwise lose) --
    ip = jnp.einsum("bd,cd->bc", q, q, preferred_element_type=jnp.float32)
    qn = jnp.sum(q * q, axis=1)
    bd = jnp.maximum(qn[:, None] - 2.0 * ip + qn[None, :], 0.0)
    eye = jnp.eye(bi, dtype=bool)
    bd = jnp.where(eye, MASKED, bd)
    kb = min(cand_cap, bi)
    nb, pb = jax.lax.top_k(-bd, kb)
    bd_k = -nb
    bi_k = jnp.where(bd_k < MASKED, jnp.take(new_rows, pb), -1)
    # self-exclusion for DUPLICATED row ids in the batch (HNSWIndex.add
    # edge-pads tail batches by repeating the last row): the eye mask
    # only covers the diagonal, but a duplicate's off-diagonal distance
    # is 0 with bi_k == its own row id — a self-loop edge that wastes
    # adjacency slots. Mirror the graph-candidate self_hit mask above.
    self_b = bi_k == new_rows[:, None]
    bd_k = jnp.where(self_b, MASKED, bd_k)
    bi_k = jnp.where(self_b, -1, bi_k)

    all_d = jnp.concatenate([gd, bd_k], axis=1)
    all_i = jnp.concatenate([gi, bi_k], axis=1)
    # dedup (graph search may already contain batch rows? it cannot —
    # they are unlinked — but keep it cheap and safe by top_k select)
    neg, pos = jax.lax.top_k(-all_d, cand_cap)
    cand_d = -neg
    cand_i = jnp.take_along_axis(all_i, pos, axis=1)

    cand_vecs = gather_vectors_f32(state, jnp.maximum(cand_i, 0))

    # -- 2. diverse neighbor selection --
    sel_rows, sel_dists = select_neighbors_heuristic(
        cand_i, cand_d, cand_vecs, m
    )

    # -- 3. forward edges (new rows unique -> plain scatter) --
    pad_cols = m2 - m
    fwd_rows = jnp.pad(sel_rows, ((0, 0), (0, pad_cols)), constant_values=-1)
    fwd_dists = jnp.pad(
        sel_dists, ((0, 0), (0, pad_cols)), constant_values=MASKED
    )
    nbrs = state.nbrs.at[new_rows].set(fwd_rows)
    nbr_dists = state.nbr_dists.at[new_rows].set(
        fwd_dists.astype(state.nbr_dists.dtype)
    )
    nbr_count = state.nbr_count.at[new_rows].set(
        jnp.sum(sel_rows >= 0, axis=1).astype(jnp.int32)
    )

    # -- 4. reverse edges in conflict-free passes --
    n_cap = state.nbrs.shape[0]
    tgt = sel_rows.reshape(-1)          # [E] target of reverse edge
    src = jnp.repeat(new_rows, m)       # [E] the new node
    edist = sel_dists.reshape(-1)       # [E]
    alive = tgt >= 0

    def rev_pass(p, carry):
        nbrs, nbr_dists, nbr_count, alive = carry
        # arbitration: per target keep the single lowest-distance edge
        key = jnp.where(alive, edist, _BIG)
        tgt_safe = jnp.where(alive, tgt, n_cap - 1)
        best = jnp.full((n_cap,), _BIG, jnp.float32).at[tgt_safe].min(
            jnp.where(alive, key, _BIG)
        )
        is_best = alive & (key == jnp.take(best, tgt_safe)) & (key < _BIG)
        # first-of-equal wins: mask later duplicates of the same target
        big_i = 2**30
        eidx = jnp.arange(tgt.shape[0], dtype=jnp.int32)
        first = jnp.full((n_cap,), big_i, jnp.int32).at[tgt_safe].min(
            jnp.where(is_best, eidx, big_i)
        )
        chosen = is_best & (eidx == jnp.take(first, tgt_safe))

        # apply chosen edges
        t = jnp.where(chosen, tgt, n_cap)  # out-of-range rows -> dropped
        t_safe = jnp.where(chosen, tgt, 0)
        cnt = jnp.take(nbr_count, t_safe)                # [E]
        row_n = jnp.take(nbrs, t_safe, axis=0)           # [E, M2]
        row_d = jnp.take(nbr_dists, t_safe, axis=0)      # [E, M2]
        worst_col = jnp.argmax(row_d, axis=1)            # [E]
        worst_val = jnp.take_along_axis(row_d, worst_col[:, None], axis=1)[:, 0]
        has_space = cnt < m2
        slot = jnp.where(has_space, cnt, worst_col)
        do = chosen & (has_space | (edist < worst_val))
        cols = jax.lax.broadcasted_iota(jnp.int32, row_n.shape, 1)
        at_slot = cols == slot[:, None]
        new_row_n = jnp.where(at_slot & do[:, None], src[:, None], row_n)
        new_row_d = jnp.where(at_slot & do[:, None], edist[:, None], row_d)
        new_cnt = jnp.where(do & has_space, cnt + 1, cnt)

        nbrs = nbrs.at[t].set(new_row_n, mode="drop")
        nbr_dists = nbr_dists.at[t].set(
            new_row_d.astype(nbr_dists.dtype), mode="drop"
        )
        nbr_count = nbr_count.at[t].set(new_cnt, mode="drop")
        alive = alive & ~chosen
        return nbrs, nbr_dists, nbr_count, alive

    nbrs, nbr_dists, nbr_count, _ = jax.lax.fori_loop(
        0, reverse_passes, rev_pass, (nbrs, nbr_dists, nbr_count, alive)
    )

    return state._replace(
        nbrs=nbrs, nbr_dists=nbr_dists, nbr_count=nbr_count
    )


# ---------------------------------------------------------------------------
# Bulk construction: exact kNN graph -> heuristic prune -> symmetrize.
#
# The TPU-native fast path for large static ingests (the reference has no
# equivalent — its build is inherently sequential insert; this is where
# the MXU wins by orders of magnitude). Incremental adds after a bulk
# build keep using insert_batch.
# ---------------------------------------------------------------------------

import numpy as np

from longbow_tpu.ops.distance import exact_search


@functools.partial(
    jax.jit, static_argnames=("k", "qb", "tile_n", "n_pad")
)
def _self_knn_fused_all(
    vectors, norms_sq, valid, n: int, k: int, n_pad: int,
    qb: int = 128, tile_n: int = 0,  # B=128: the canonical fused shape
):
    """The WHOLE exact self-kNN in ONE jitted program: lax.map over
    query blocks, each a fused Pallas scan of the full corpus.

    One dispatch for the entire build — the previous per-chunk eager
    loop paid a ~30ms relay round trip per 128 queries (that overhead,
    not compute, was ~80% of round 1's 59s 200k build)."""
    from longbow_tpu.ops.pallas_scan import (
        fused_flat_search,
        tile_for_dim as _tile_for_dim,
    )

    n_blocks = -(-n_pad // qb)

    def one(b):
        rows = b * qb + jnp.arange(qb, dtype=jnp.int32)
        rows = jnp.minimum(rows, n - 1)
        q = jnp.take(vectors, rows, axis=0)
        d, i = fused_flat_search(
            q, vectors, norms_sq, valid, min(k + 1, 64),
            tile_n=tile_n or _tile_for_dim(vectors.shape[1])
        )
        self_hit = i == rows[:, None]
        d = jnp.where(self_hit, MASKED, d)
        i = jnp.where(self_hit, -1, i)
        neg, pos = jax.lax.top_k(-d, k)
        return -neg, jnp.take_along_axis(i, pos, axis=1)

    kd, ki = jax.lax.map(one, jnp.arange(n_blocks, dtype=jnp.int32))
    return kd.reshape(-1, k)[:n_pad], ki.reshape(-1, k)[:n_pad]


def _chunked_self_knn(
    vectors: jax.Array,
    norms_sq: jax.Array,
    valid: jax.Array,
    n: int,
    k: int,
    chunk_b: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN of each of the first n rows against all valid rows,
    excluding self. Returns (dists [n_pad, k], rows [n_pad, k]) where
    n_pad rounds n up to chunk_b.

    On TPU with bf16 storage this rides the fused Pallas scan (the
    score matrix never hits HBM), which makes even a 1M-row *exact*
    kNN-graph build take tens of seconds; other configs use the XLA
    chunked scan."""
    import jax as _jax

    use_fused = (
        _jax.default_backend() in ("tpu", "axon")
        and vectors.dtype == jnp.bfloat16
        # kernel scoped-VMEM limit: its k must stay <= 64 on v5e
        and k + 1 <= 64
    )
    n_pad = -(-n // chunk_b) * chunk_b
    out_d, out_i = [], []
    vf = vectors
    if use_fused:
        return _self_knn_fused_all(
            vectors, norms_sq, valid, n, k, n_pad
        )
    for off in range(0, n_pad, chunk_b):
        rows = jnp.arange(off, off + chunk_b, dtype=jnp.int32)
        rows = jnp.minimum(rows, n - 1)
        q = jnp.take(vf, rows, axis=0).astype(jnp.float32)
        d, i = exact_search(
            q, vf, k + 1,
            corpus_norms_sq=norms_sq, valid=valid, exact_precision=False,
        )
        self_hit = i == rows[:, None]
        d = jnp.where(self_hit, MASKED, d)
        i = jnp.where(self_hit, -1, i)
        # re-sort so the masked self-slot falls to the end, keep k
        neg, pos = jax.lax.top_k(-d, k)
        out_d.append(-neg)
        out_i.append(jnp.take_along_axis(i, pos, axis=1))
    return jnp.concatenate(out_d), jnp.concatenate(out_i)


@functools.partial(jax.jit, static_argnames=("m",))
def _prune_chunk(cand_i, cand_d, cand_vecs, m):
    return select_neighbors_heuristic(cand_i, cand_d, cand_vecs, m)


@functools.partial(jax.jit, static_argnames=("m", "chunk"))
def _prune_forward_all(state, knn_d, knn_i, m: int, chunk: int):
    """All prune chunks in ONE program (lax.map) — the eager per-chunk
    loop costs a ~30ms dispatch round trip per 1024 rows here."""
    n_pad = knn_d.shape[0]
    n_blocks = n_pad // chunk

    def one(b):
        ci = jax.lax.dynamic_slice_in_dim(knn_i, b * chunk, chunk)
        cd = jax.lax.dynamic_slice_in_dim(knn_d, b * chunk, chunk)
        cv = gather_vectors_f32(state, jnp.maximum(ci, 0))
        return select_neighbors_heuristic(ci, cd, cv, m)

    sr, sd = jax.lax.map(one, jnp.arange(n_blocks, dtype=jnp.int32))
    return sr.reshape(n_pad, m), sd.reshape(n_pad, m)


def _is_quantized(state: GraphState) -> bool:
    return state.scale is not None or state.pq_books is not None


def _densified(state: GraphState) -> GraphState:
    """SQ8/PQ-coded state -> transient bf16 dense state for bulk builds
    (graph construction wants the fused bf16 scan; costs 2 bytes/dim/row
    for the duration of the build, freed when it returns)."""
    if state.scale is not None:
        dense = (
            state.vectors.astype(jnp.float32) * state.scale + state.offset
        ).astype(jnp.bfloat16)
    elif state.pq_books is not None:
        from longbow_tpu.index.graph import pq_decode

        dense = pq_decode(state.vectors, state.pq_books).astype(
            jnp.bfloat16
        )
    else:
        return state
    return state._replace(
        vectors=dense, scale=None, offset=None, pq_books=None
    )


def _reattach_codes(orig: GraphState, built: GraphState) -> GraphState:
    """Put the original SQ8/PQ codes back on the built state. Keep
    `built`'s non-vector buffers: the build may have donated the shared
    norms/valid/adjacency buffers, so `orig`'s copies are dead."""
    return built._replace(
        vectors=orig.vectors, scale=orig.scale, offset=orig.offset,
        pq_books=orig.pq_books,
    )


def bulk_build_edges(
    state: GraphState,
    n: int,
    *,
    m: int,
    m_max: int,
    knn_k: int = 64,
    chunk_b: int = 1024,
) -> GraphState:
    """Build the whole adjacency for rows [0, n) from scratch.

    1. exact kNN graph on the MXU (chunked flat scans)
    2. keep-pruned-connections heuristic -> m forward edges per node
    3. symmetrize: stable two-key sort of the edge list groups incoming
       edges by target; each node keeps the best m_max of
       (forward + incoming) — the fixed-shape, sort-based equivalent of
       HNSW's bidirectional linking + pruning.
    """
    if _is_quantized(state):
        return _reattach_codes(
            state,
            bulk_build_edges(
                _densified(state), n, m=m, m_max=m_max,
                knn_k=knn_k, chunk_b=chunk_b,
            ),
        )
    knn_d, knn_i = _chunked_self_knn(
        state.vectors, state.norms_sq, state.valid, n, knn_k, chunk_b
    )
    n_pad = knn_d.shape[0]

    # -- prune to m diverse forward edges (one program for all chunks;
    #    chunking bounds the candidate-vector gather memory) --
    fwd_rows, fwd_dists = _prune_forward_all(
        state, knn_d, knn_i, m, chunk_b
    )
    del knn_d, knn_i
    # full padded arrays: dead rows are -1/MASKED, no exact-n copies
    return _symmetrize_and_store(
        state, fwd_rows, fwd_dists, n, m_max=m_max
    )


@functools.partial(jax.jit, static_argnames=("m_max",))
def _symm_edges(
    fwd_rows: jax.Array, fwd_dists: jax.Array, n_live, *, m_max: int
):
    """Edge-list sorts -> per-node incoming candidates [R, m_max].

    Operates on the builder's full padded arrays: no exact-n slice
    copies, and the compiled shape stays bucketed. n_live (a TRACED
    scalar — static would recompile per exact corpus size) masks
    padded-row sources: dead rows are zero vectors whose kNN lists
    hold REAL target ids (the knn phase pads its query chunks), so
    without the mask they become reverse-edge sources and inject
    dead-row edges into live nodes' adjacency — measured 771 dead
    edges and recall 0.959 -> 0.898 on the 10k x 384 SQ8 gate.
    Returns (inc_src, inc_d, inc_prot) — the protected flag is a bool
    [R, m_max] instead of a second f32 priority array (that third
    full-size f32 cost 768MB at 4M x m_max=48; priorities are
    reconstructed in-segment)."""
    n, m = fwd_rows.shape
    # reverse-candidate edges come from the TOP m_rev forward ranks
    # only: low-rank (far) forward edges essentially never win a slot
    # in the m_max-best incoming merge, and the edge list's two argsorts
    # (keys + 4 payload gathers each + sort workspace) dominate the
    # build's HBM peak at >=4M rows (round-4 worker-crash diagnostic)
    m_rev = min(m, 16)
    e = n * m_rev
    src = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m_rev)  # [E]
    dst = fwd_rows[:, :m_rev].reshape(-1)
    d = fwd_dists[:, :m_rev].reshape(-1)
    ok = (dst >= 0) & (src < n_live) & (dst < n_live)
    dst_s = jnp.where(ok, dst, n)  # invalid -> sentinel bucket n

    # protect each source's rank-0 reverse edge: without it, anti-hub
    # nodes (common under high-dim hubness) lose every in-edge at the
    # prune below and become unreachable except via the entry sample
    rank_in_src = jax.lax.broadcasted_iota(
        jnp.int32, (n, m_rev), 1
    ).reshape(-1)
    protected = ok & (rank_in_src == 0)
    d_eff = jnp.where(protected, d - 1.0e9, d)

    # stable two-key sort: by effective priority first, then by target —
    # within a target group edges end up best-first, protected leading
    o1 = jnp.argsort(d_eff, stable=True)
    dst1, src1, d1, de1 = dst_s[o1], src[o1], d[o1], d_eff[o1]
    o2 = jnp.argsort(dst1, stable=True)
    dst2, src2, d2, de2 = dst1[o2], src1[o2], d1[o2], de1[o2]

    starts = jnp.searchsorted(dst2, jnp.arange(n, dtype=jnp.int32))
    ends = jnp.searchsorted(
        dst2, jnp.arange(n, dtype=jnp.int32), side="right"
    )
    counts = ends - starts  # [n] incoming degree

    r_slots = m_max  # incoming candidates kept per node
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, r_slots), 1)
    pos = jnp.minimum(starts[:, None] + slot, e - 1)
    inc_ok = slot < jnp.minimum(counts, r_slots)[:, None]
    inc_src = jnp.where(inc_ok, jnp.take(src2, pos), -1)      # [n, R]
    inc_d = jnp.where(inc_ok, jnp.take(d2, pos), MASKED)
    inc_prot = inc_ok & (jnp.take(de2, pos) < jnp.take(d2, pos) - 1.0e8)
    return inc_src, inc_d, inc_prot


@functools.partial(
    jax.jit, static_argnames=("seg_rows", "m_max", "diversify")
)
def _symm_select_seg(
    state: GraphState,
    fwd_rows, fwd_dists, inc_src, inc_d, inc_prot, off,
    *, seg_rows: int, m_max: int, diversify: bool,
):
    """Merge forward + incoming for a ROW SEGMENT, dedup, keep the
    best m_max by priority. Takes the FULL builder arrays + a dynamic
    row offset and slices in-program (host-side segment slices cost a
    copy of every segment — ~2.5GB of transients at 4M rows).
    Duplicates only occur BETWEEN the lists (each is internally
    unique), so the dedup mask is [seg, R, m] — and the chunked map
    keeps it a few MB (the full-N mask was ~6GB bool at 4M rows)."""
    fwd_rows = jax.lax.dynamic_slice_in_dim(fwd_rows, off, seg_rows)
    fwd_dists = jax.lax.dynamic_slice_in_dim(fwd_dists, off, seg_rows)
    inc_src = jax.lax.dynamic_slice_in_dim(inc_src, off, seg_rows)
    inc_d = jax.lax.dynamic_slice_in_dim(inc_d, off, seg_rows)
    inc_prot = jax.lax.dynamic_slice_in_dim(inc_prot, off, seg_rows)
    # effective priority: protected reverse edges sort first (the
    # full-size f32 priority array this replaces is reconstructed
    # segment-locally for free inside the fusion)
    inc_de = jnp.where(inc_prot, inc_d - 1.0e9, inc_d)
    nseg, m = fwd_rows.shape
    r_slots = inc_src.shape[1]
    _mc = next(
        c for c in (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32,
                    16, 8, 4, 2, 1)
        if nseg % c == 0
    )
    _nch = nseg // _mc

    def _dedup_chunk(args):
        inc_s_c, inc_d_c, inc_de_c, fwd_r_c, fwd_d_c = args
        dup = jnp.any(
            (inc_s_c[:, :, None] == fwd_r_c[:, None, :])
            & (fwd_r_c[:, None, :] >= 0),
            axis=2,
        )
        i_d = jnp.where(dup, MASKED, inc_d_c)
        i_de = jnp.where(dup, MASKED, inc_de_c)
        a_i = jnp.concatenate([fwd_r_c, inc_s_c], axis=1)
        a_d = jnp.concatenate([fwd_d_c, i_d], axis=1)
        a_de = jnp.concatenate([fwd_d_c, i_de], axis=1)
        a_d = jnp.where(a_i >= 0, a_d, MASKED)
        a_de = jnp.where(a_i >= 0, a_de, MASKED)
        return a_i, a_d, a_de

    all_i, all_d, all_de = jax.lax.map(
        _dedup_chunk,
        (
            inc_src.reshape(_nch, _mc, r_slots),
            inc_d.reshape(_nch, _mc, r_slots),
            inc_de.reshape(_nch, _mc, r_slots),
            fwd_rows.reshape(_nch, _mc, m),
            fwd_dists.reshape(_nch, _mc, m),
        ),
    )
    w_all = m + r_slots
    all_i = all_i.reshape(nseg, w_all)
    all_d = all_d.reshape(nseg, w_all)
    all_de = all_de.reshape(nseg, w_all)
    n = nseg  # segment-local names for the branches below

    if diversify:
        # HNSW applies selectNeighbors on overflow, not plain
        # closest-m_max (reference: arrow_hnsw_insert.go:20 on the
        # bidirectional-link path): diversity-prune the merged
        # forward+incoming list with keepPruned fill so degree stays
        # m_max; protected reverse edges survive via the heuristic's
        # protected lane. Chunked — the candidate-vector gather is
        # [chunk, m+R, D].
        c_w = all_i.shape[1]
        chunk = 1024
        n_pad2 = -(-n // chunk) * chunk
        ai = jnp.pad(
            all_i, ((0, n_pad2 - n), (0, 0)), constant_values=-1
        )
        ad = jnp.pad(
            all_d, ((0, n_pad2 - n), (0, 0)),
            constant_values=float(MASKED),
        )
        ade = jnp.pad(
            all_de, ((0, n_pad2 - n), (0, 0)),
            constant_values=float(MASKED),
        )

        def one(bi):
            ci = jax.lax.dynamic_slice_in_dim(ai, bi * chunk, chunk)
            cd = jax.lax.dynamic_slice_in_dim(ad, bi * chunk, chunk)
            cde = jax.lax.dynamic_slice_in_dim(ade, bi * chunk, chunk)
            cv = gather_vectors_f32(state, jnp.maximum(ci, 0))
            prot = cde < cd - 1.0e8
            return select_neighbors_heuristic(
                ci, cd, cv, m_max, protected=prot, fill=True
            )

        sr, sd = jax.lax.map(
            one, jnp.arange(n_pad2 // chunk, dtype=jnp.int32)
        )
        sel_i = sr.reshape(n_pad2, m_max)[:n]
        sel_d = sd.reshape(n_pad2, m_max)[:n]
    else:
        neg, ppos = jax.lax.top_k(-all_de, m_max)
        sel_d = jnp.take_along_axis(all_d, ppos, axis=1)
        sel_d = jnp.where(-neg < MASKED, sel_d, MASKED)
        sel_i = jnp.where(
            sel_d < MASKED, jnp.take_along_axis(all_i, ppos, axis=1), -1
        )
    cnt = jnp.sum(sel_i >= 0, axis=1).astype(jnp.int32)
    return sel_i, sel_d, cnt


@functools.partial(
    jax.jit, static_argnames=("n", "m_max"), donate_argnums=(0,)
)
def _symm_store(
    state: GraphState, sel_i, sel_d, cnt, n: int, *, m_max: int
) -> GraphState:
    """Long-range edges + one scatter into the (donated) state."""
    # selections may arrive at the padded row count — trim in-program
    # (rows past n are dead; a host-side slice would copy)
    if sel_i.shape[0] > n:
        sel_i, sel_d, cnt = sel_i[:n], sel_d[:n], cnt[:n]
    # pad to the adjacency width actually allocated in the state (a
    # builder may use a smaller m_max than the index was created with)
    m2 = state.nbrs.shape[1]
    if m_max < m2:
        sel_i = jnp.pad(
            sel_i, ((0, 0), (0, m2 - m_max)), constant_values=-1
        )
        sel_d = jnp.pad(
            sel_d, ((0, 0), (0, m2 - m_max)), constant_values=MASKED
        )

    rows = jnp.arange(n, dtype=jnp.int32)

    # Kleinberg-style long-range edges: the last 2 adjacency slots get
    # deterministic pseudo-random targets so clustered corpora stay
    # navigable across clusters (HNSW gets this from its hierarchy +
    # insertion order; a pure kNN graph has none). Edge distances are
    # never read by search, so MASKED is fine there.
    n_rand = min(2, sel_i.shape[1])
    kcols2 = jax.lax.broadcasted_iota(jnp.int32, sel_i.shape, 1)
    for j in range(n_rand):
        tgt = ((rows.astype(jnp.uint32) * jnp.uint32(2654435761 + j * 40503)
                + jnp.uint32(12345 + j)) % jnp.uint32(n)).astype(jnp.int32)
        tgt = jnp.where(tgt == rows, (tgt + 1) % n, tgt)
        col = sel_i.shape[1] - 1 - j
        sel_i = jnp.where(kcols2 == col, tgt[:, None], sel_i)
        sel_d = jnp.where(kcols2 == col, MASKED, sel_d)
    nbrs = state.nbrs.at[rows].set(sel_i)
    nbr_dists = state.nbr_dists.at[rows].set(
        sel_d.astype(state.nbr_dists.dtype)
    )
    nbr_count = state.nbr_count.at[rows].set(cnt)
    return state._replace(nbrs=nbrs, nbr_dists=nbr_dists, nbr_count=nbr_count)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _symm_acc(sel_i, sel_d, cnt, si, sd, cn, off):
    """Write one segment's selection into the (donated) full-size
    accumulators — the list+concat this replaces held every segment
    twice (~1.9GB of transients at 4M rows)."""
    return (
        jax.lax.dynamic_update_slice_in_dim(sel_i, si, off, 0),
        jax.lax.dynamic_update_slice_in_dim(sel_d, sd, off, 0),
        jax.lax.dynamic_update_slice_in_dim(cnt, cn, off, 0),
    )


def _symmetrize_and_store(
    state: GraphState,
    fwd_rows: jax.Array,   # [R, m], R >= n; dead rows -1 / MASKED
    fwd_dists: jax.Array,  # [R, m]
    n: int,
    *,
    m_max: int,
    diversify: bool = False,
) -> GraphState:
    """Host-orchestrated symmetrize: edge sorts (one program), row-
    segmented dedup/select programs, one store scatter — every dispatch
    bounded under the relay's 60s execution limit at any N, and no
    full-size host-slice/pad copies at any stage (callers pass their
    padded working arrays as-is; the 4M x 128 build OOMed on the
    padded-copy version of this phase)."""
    R = fwd_rows.shape[0]
    inc_src, inc_d, inc_prot = _symm_edges(
        fwd_rows, fwd_dists, jnp.int32(n), m_max=m_max
    )
    seg = min(R, SEG_ROWS)
    if R <= seg:
        sel_i, sel_d, cnt = _symm_select_seg(
            state, fwd_rows, fwd_dists, inc_src, inc_d, inc_prot,
            jnp.int32(0), seg_rows=R, m_max=m_max, diversify=diversify,
        )
        return _symm_store(state, sel_i, sel_d, cnt, n, m_max=m_max)
    sel_i = jnp.full((R, m_max), -1, jnp.int32)
    sel_d = jnp.full((R, m_max), MASKED, jnp.float32)
    cnt = jnp.zeros((R,), jnp.int32)
    for off in range(0, R, seg):
        this = min(seg, R - off)
        si, sd, cn = _symm_select_seg(
            state, fwd_rows, fwd_dists, inc_src, inc_d, inc_prot,
            jnp.int32(off), seg_rows=this, m_max=m_max,
            diversify=diversify,
        )
        sel_i, sel_d, cnt = _symm_acc(
            sel_i, sel_d, cnt, si, sd, cn, jnp.int32(off)
        )
    return _symm_store(state, sel_i, sel_d, cnt, n, m_max=m_max)


# ---------------------------------------------------------------------------
# Clustered bulk build: k-means cells + per-cell kNN against the T
# nearest cells. Replaces the O(N^2) exact kNN graph with
# O(N * T * N/C) — the standard blocked kNN-graph construction, and the
# shape TPUs like: C identical padded matmuls under one lax.map.
# ---------------------------------------------------------------------------

from longbow_tpu.ops.kmeans import kmeans_init, lloyd


def _assign_clusters(
    vectors: jax.Array, norms: jax.Array, cent: jax.Array, n: int,
    chunk: int = 65536,
) -> np.ndarray:
    """Row -> nearest centroid id for rows [0, n)."""
    cn = jnp.sum(cent * cent, axis=1)
    chunk = min(chunk, vectors.shape[0])

    @jax.jit
    def one(chunk_vecs, chunk_norms):
        ip = jax.lax.dot_general(
            chunk_vecs.astype(jnp.float32), cent,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = chunk_norms[:, None] - 2.0 * ip + cn[None, :]
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    out = []
    n_pad = -(-n // chunk) * chunk
    cap = vectors.shape[0]
    for off in range(0, n_pad, chunk):
        # capacity is any 8192-multiple (NOT necessarily a power of
        # two or a chunk multiple — explicit CreateNamespace capacity,
        # restored counts), so the final window can overrun it.
        # dynamic_slice would silently CLAMP the start and assign the
        # tail rows cluster ids computed for earlier rows; slice from
        # the clamped start ourselves and index the wanted rows out of
        # the window instead.
        start = min(off, max(cap - chunk, 0))
        sl_v = jax.lax.dynamic_slice_in_dim(vectors, start, chunk)
        sl_n = jax.lax.dynamic_slice_in_dim(norms, start, chunk)
        out.append(np.asarray(one(sl_v, sl_n))[off - start:])
    return np.concatenate(out)[:n]


def bulk_build_clustered(
    state: GraphState,
    n: int,
    *,
    m: int,
    m_max: int,
    knn_k: int = 64,
    n_clusters: int = 0,
    probes: int = 4,
    train_sample: int = 65536,
    prune_chunk: int = 1024,
    nn_descent_rounds: int = 2,
) -> GraphState:
    """Cluster-blocked kNN-graph build for large corpora."""
    if _is_quantized(state):
        return _reattach_codes(
            state,
            bulk_build_clustered(
                _densified(state), n, m=m, m_max=m_max, knn_k=knn_k,
                n_clusters=n_clusters, probes=probes,
                train_sample=train_sample, prune_chunk=prune_chunk,
                nn_descent_rounds=nn_descent_rounds,
            ),
        )
    if n_clusters <= 0:
        n_clusters = max(64, min(4096, n // 1024))
    d = state.vectors.shape[1]

    _timer = build_stage_timer(n)

    def _stage(label):
        _timer(label, state.vectors)

    # -- 1. centroids on a strided sample --
    s = min(train_sample, n)
    srows = jnp.asarray(np.linspace(0, n - 1, s, dtype=np.int32))
    sample = jnp.take(state.vectors, srows, axis=0).astype(jnp.float32)
    init = kmeans_init(sample[None], n_clusters, 0)
    cent, _ = lloyd(sample[None], init, n_iters=8)
    cent = cent[0]  # [C, D]
    _stage("kmeans")

    # -- 2. assign + bucket (host-side bookkeeping) --
    cid = _assign_clusters(state.vectors, state.norms_sq, cent, n)
    order = np.argsort(cid, kind="stable")
    cid_sorted = cid[order]
    counts = np.bincount(cid_sorted, minlength=n_clusters)
    cap = int(counts.max())
    # guard against pathological skew: fall back to exact build
    if cap > max(8 * n // n_clusters, 4096):
        return bulk_build_edges(state, n, m=m, m_max=m_max, knn_k=knn_k)
    starts = np.zeros(n_clusters, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    bucket_rows = np.full((n_clusters, cap), -1, np.int32)
    for c in range(n_clusters):
        rows_c = order[starts[c] : starts[c] + counts[c]]
        bucket_rows[c, : counts[c]] = rows_c

    _stage("assign+bucket")

    # -- 3. T nearest clusters per cluster (centroid space) --
    cc = jnp.sum(cent * cent, axis=1)
    cd = cc[:, None] - 2.0 * (cent @ cent.T) + cc[None, :]
    _, nbr_c = jax.lax.top_k(-cd, probes)  # [C, T] includes self

    cand_rows = np.take(
        bucket_rows, np.asarray(nbr_c), axis=0
    ).reshape(n_clusters, probes * cap)  # [C, T*cap]

    # -- 4. per-cluster kNN under one lax.map --
    vecs = state.vectors
    norms = state.norms_sq

    @functools.partial(jax.jit, static_argnames=("kk",))
    def all_clusters(bucket_rows_j, cand_rows_j, kk):
        def one(args):
            rows_c, cands_c = args  # [cap], [T*cap]
            q = jnp.take(vecs, jnp.maximum(rows_c, 0), axis=0).astype(
                jnp.float32
            )
            qv = jnp.take(norms, jnp.maximum(rows_c, 0))
            cvec = jnp.take(vecs, jnp.maximum(cands_c, 0), axis=0).astype(
                jnp.float32
            )
            cn_ = jnp.take(norms, jnp.maximum(cands_c, 0))
            ip = jax.lax.dot_general(
                q, cvec, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dist = qv[:, None] - 2.0 * ip + cn_[None, :]
            bad = (cands_c[None, :] < 0) | (
                cands_c[None, :] == rows_c[:, None]
            )
            dist = jnp.where(bad, MASKED, dist)
            neg, pos = jax.lax.top_k(-dist, kk)
            gi = jnp.take(cands_c, pos)
            gd = -neg
            gi = jnp.where(gd < MASKED, gi, -1)
            return gd, gi

        return jax.lax.map(one, (bucket_rows_j, cand_rows_j))

    kd, ki = all_clusters(
        jnp.asarray(bucket_rows), jnp.asarray(cand_rows), knn_k
    )  # [C, cap, kk]
    kd.block_until_ready()
    _stage("per-cell knn")

    # -- 5. scatter per-row candidate lists back to row order --
    flat_rows = bucket_rows.reshape(-1)
    keep = flat_rows >= 0
    n_pad = -(-n // prune_chunk) * prune_chunk
    knn_d = np.full((n_pad, knn_k), float(MASKED), np.float32)
    knn_i = np.full((n_pad, knn_k), -1, np.int32)
    knn_d[flat_rows[keep]] = np.asarray(kd).reshape(-1, knn_k)[keep]
    knn_i[flat_rows[keep]] = np.asarray(ki).reshape(-1, knn_k)[keep]
    knn_d_j = jnp.asarray(knn_d)
    knn_i_j = jnp.asarray(knn_i)

    _stage("scatter-back")

    # -- 5b. NN-descent repair of cell-coverage holes --
    knn_d_j, knn_i_j = nn_descent_refine(
        state, knn_d_j, knn_i_j, n, rounds=nn_descent_rounds
    )

    knn_d_j.block_until_ready()
    _stage("nn-descent")

    # -- 6. prune + symmetrize (same tail as the exact build) --
    fwd_rows, fwd_dists = _prune_forward_all(
        state, knn_d_j, knn_i_j, m, prune_chunk
    )
    del knn_d_j, knn_i_j
    fwd_rows.block_until_ready()
    _stage("prune")
    out = _symmetrize_and_store(state, fwd_rows, fwd_dists, n, m_max=m_max)
    out.nbrs.block_until_ready()
    _stage("symmetrize")
    return out


def _reverse_lists(
    knn_i: jax.Array, knn_d: jax.Array, n_pad: int, r_slots: int = 32
) -> jax.Array:
    """Per-node incoming-edge lists [n_pad, R] from the forward kNN
    lists (the NN-descent reverse join), best-first via the same stable
    two-key sort the symmetrizer uses."""
    kk = knn_i.shape[1]
    src = jnp.repeat(jnp.arange(n_pad, dtype=jnp.int32), kk)
    dst = knn_i.reshape(-1)
    d = knn_d.reshape(-1)
    dst_s = jnp.where(dst >= 0, dst, n_pad)
    o1 = jnp.argsort(d, stable=True)
    dst1, src1 = dst_s[o1], src[o1]
    o2 = jnp.argsort(dst1, stable=True)
    dst2, src2 = dst1[o2], src1[o2]
    starts = jnp.searchsorted(dst2, jnp.arange(n_pad, dtype=jnp.int32))
    ends = jnp.searchsorted(
        dst2, jnp.arange(n_pad, dtype=jnp.int32), side="right"
    )
    counts = ends - starts
    slot = jax.lax.broadcasted_iota(jnp.int32, (n_pad, r_slots), 1)
    pos = jnp.minimum(starts[:, None] + slot, n_pad * kk - 1)
    ok = slot < jnp.minimum(counts, r_slots)[:, None]
    return jnp.where(ok, jnp.take(src2, pos), -1)


def nn_descent_refine(
    state: GraphState,
    knn_d: jax.Array,   # [n_pad, K]
    knn_i: jax.Array,   # [n_pad, K]
    n: int,
    *,
    rounds: int = 2,
    expand: int = 6,
    rev_slots: int = 32,
    chunk: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """NN-descent refinement of a kNN-graph estimate.

    Each round, every node considers: its current neighbors, its
    REVERSE neighbors (nodes listing it -- the join that makes
    NN-descent converge), and the forward lists of sampled heads from
    both. Keeps the best K.

    Thin wrapper over `_nn_descent_round` -- the ONE implementation
    (valid-masked candidates, sampled expansion heads, <60s segmented
    dispatches). An earlier inline duplicate here lacked the valid
    mask and ran an eager per-512-row dispatch loop. knn_d/knn_i must
    be `chunk`-aligned in rows (the clustered builder pads to
    prune_chunk, a multiple of every chunk used here).
    """
    # share the rp path's compiled shapes when alignment allows (1024),
    # halving down only if the caller's row padding is finer
    chunk = 1024
    n_pad = knn_d.shape[0]
    while chunk > 1 and n_pad % chunk:
        chunk //= 2
    root = jax.random.PRNGKey(987_654_321)
    for r in range(rounds):
        knn_d, knn_i = _nn_descent_round(
            state.vectors, state.norms_sq, state.valid, knn_d, knn_i, n,
            jax.random.fold_in(root, r),
            expand=expand, rev_slots=rev_slots, chunk=chunk,
        )
    return knn_d, knn_i


# ---------------------------------------------------------------------------
# Random-projection blocked build: the large-corpus bulk path.
#
# Sorting by a random projection puts near neighbors into the same
# contiguous block with useful probability; R rounds with fresh
# directions + a reverse-join NN-descent polish converge to a high-
# recall kNN graph (the EFANNA/kgraph recipe). The TPU-shaped payoff:
# every round is ONE jitted program — device-side sort, one batched
# [block, block] matmul per block under lax.map, scatter-merge into the
# running top-k. No host bucketing, no per-chunk dispatches, no
# device<->host traffic (the previous clustered builder moved hundreds
# of MB of buckets through the host — minutes on this platform's relay).
# ---------------------------------------------------------------------------


# Segmenting rule (round-4 platform finding, CLAUDE.md): the device
# relay KILLS any single program that executes >~60s. Build stages are
# therefore host-orchestrated over per-segment jitted programs sized so
# each dispatch stays far under the limit at any corpus size.
SEG_ROWS = 1 << 20  # rows per dispatched program segment


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _rp_order(vectors, valid, rkey, n, *, n_pad):
    """Random-projection sort: returns the row permutation only (the
    sorted-corpus copy this used to materialize cost 1GB of HBM at
    4M x 128 — segments gather their own rows instead)."""
    d = vectors.shape[1]
    rowid = jnp.arange(n_pad, dtype=jnp.int32)
    live = (rowid < n) & valid[:n_pad]
    dirs = jax.random.normal(rkey, (d,), jnp.float32)
    proj = vectors[:n_pad].astype(jnp.float32) @ dirs
    proj = jnp.where(live, proj, jnp.float32(3.4e38))
    return jnp.argsort(proj).astype(jnp.int32)  # [n_pad]


@functools.partial(jax.jit, static_argnames=("block", "kb"))
def _rp_block_seg(vectors, norms_sq, valid, orb, n, *, block, kb):
    """Per-block kNN over a SEGMENT of sorted blocks (the matmul+top_k
    hot loop — the stage that crosses the 60s limit if unsegmented).
    orb: [nbs, block] sorted row ids; rows are gathered per block so no
    full-corpus sorted copy is ever held."""

    def one(ob):
        vb = jnp.take(vectors, ob, axis=0)
        nbq = jnp.take(norms_sq, ob)
        lv = (ob < n) & jnp.take(valid, ob)
        ip = jax.lax.dot_general(
            vb, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dist = jnp.maximum(nbq[:, None] - 2.0 * ip + nbq[None, :], 0.0)
        eye = jnp.eye(block, dtype=bool)
        dist = jnp.where(eye | ~lv[None, :], MASKED, dist)
        neg, pos = jax.lax.top_k(-dist, kb)
        dd = -neg
        rows = jnp.where(dd < MASKED, jnp.take(ob, pos), -1)
        dd = jnp.where(lv[:, None], dd, MASKED)  # dead query rows
        return dd, rows

    return jax.lax.map(one, orb)


@functools.partial(
    jax.jit, static_argnames=("block",), donate_argnums=(0, 1)
)
def _rp_merge_seg(kd_s, ki_s, bd, bi, off, *, block):
    """Merge one segment's block results into the running top-K IN
    SORTED DOMAIN, in place (donated buffers + dynamic_update_slice —
    the previous row-domain scatter allocated two full-N [n, kb]
    scratch arrays plus a concat of all segments: ~4.7GB of transients
    at 4M rows, which HBM-OOMed the build)."""
    K = kd_s.shape[1]
    nbs, _, kb = bd.shape
    rows = nbs * block
    kd_c = jax.lax.dynamic_slice_in_dim(kd_s, off, rows)
    ki_c = jax.lax.dynamic_slice_in_dim(ki_s, off, rows)

    def merge_chunk(args):
        kd_c, ki_c, nd_c, ni_c = args
        dup = jnp.any(
            ni_c[:, :, None] == ki_c[:, None, :], axis=2
        ) & (ni_c >= 0)
        nd_c = jnp.where(dup, MASKED, nd_c)
        all_d = jnp.concatenate([kd_c, nd_c], axis=1)
        all_i = jnp.concatenate([ki_c, ni_c], axis=1)
        neg, pos = jax.lax.top_k(-all_d, K)
        kd2_c = -neg
        ki2_c = jnp.where(
            kd2_c < MASKED, jnp.take_along_axis(all_i, pos, axis=1), -1
        )
        return kd2_c, ki2_c

    kd2, ki2 = jax.lax.map(
        merge_chunk,
        (
            kd_c.reshape(nbs, block, K), ki_c.reshape(nbs, block, K),
            bd, bi,
        ),
    )
    kd_s = jax.lax.dynamic_update_slice_in_dim(
        kd_s, kd2.reshape(rows, K), off, 0
    )
    ki_s = jax.lax.dynamic_update_slice_in_dim(
        ki_s, ki2.reshape(rows, K), off, 0
    )
    return kd_s, ki_s


@functools.partial(jax.jit, donate_argnums=(0,))
def _permute_rows(a, order):
    """a[order] (sorted domain <-> row domain moves; donation lets XLA
    retire the source buffer)."""
    return jnp.take(a, order, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _unpermute_rows(a_sorted, order):
    """Inverse of _permute_rows: order is a permutation, so every row
    is written and the init value never survives."""
    return jnp.zeros_like(a_sorted).at[order].set(a_sorted)


def _rp_round(
    vectors, norms_sq, valid, kd, ki, rkey, n, block: int, kb: int
):
    """One random-projection round, segmented into <60s programs with
    a bounded-HBM merge (per-segment gather + in-place sorted-domain
    top-K update)."""
    n_pad = kd.shape[0]
    order = _rp_order(vectors, valid, rkey, n, n_pad=n_pad)
    orb = order.reshape(n_pad // block, block)
    kd_s = _permute_rows(kd, order)
    ki_s = _permute_rows(ki, order)
    nb = n_pad // block
    seg_b = max(1, SEG_ROWS // block)
    for s0 in range(0, nb, seg_b):
        s1 = min(s0 + seg_b, nb)
        bd, bi = _rp_block_seg(
            vectors, norms_sq, valid, orb[s0:s1], n, block=block, kb=kb
        )
        kd_s, ki_s = _rp_merge_seg(
            kd_s, ki_s, bd, bi, jnp.int32(s0 * block), block=block
        )
    kd = _unpermute_rows(kd_s, order)
    ki = _unpermute_rows(ki_s, order)
    return kd, ki


_reverse_lists_jit = None  # initialized lazily below


@functools.partial(
    jax.jit,
    static_argnames=("seg", "expand", "chunk", "ext_k", "sampled"),
)
def _nd_segment(
    vectors, norms_sq, valid, knn_d, knn_i, rev_i, rkey, off0, n,
    *, seg: int, expand: int, chunk: int, ext_k: int, sampled: bool,
):
    """NN-descent join for rows [off0, off0+seg): lax.map over row
    chunks; one bounded program per segment (the single full-N program
    crossed the relay's 60s execution limit at 4M rows)."""
    kk = knn_d.shape[1]
    rev_slots = rev_i.shape[1]
    nf = expand
    nr = max(expand // 2, 2)
    if sampled:
        # per-row random head slots, fresh every round+segment
        fcols = jax.random.randint(
            jax.random.fold_in(rkey, 1), (seg, nf), 0, kk
        )
        rcols = jax.random.randint(
            jax.random.fold_in(rkey, 2), (seg, nr), 0, rev_slots
        )
    else:
        fcols = jnp.tile(jnp.arange(nf, dtype=jnp.int32), (seg, 1))
        rcols = jnp.tile(jnp.arange(nr, dtype=jnp.int32), (seg, 1))

    def one(b):
        loc = b * chunk
        off = off0 + loc
        rows_c = jnp.minimum(
            off + jnp.arange(chunk, dtype=jnp.int32), n - 1
        )
        kd_c = jax.lax.dynamic_slice_in_dim(knn_d, off, chunk)
        ki_c = jax.lax.dynamic_slice_in_dim(knn_i, off, chunk)
        rv_c = jax.lax.dynamic_slice_in_dim(rev_i, off, chunk)
        fc = jax.lax.dynamic_slice_in_dim(fcols, loc, chunk)
        rc = jax.lax.dynamic_slice_in_dim(rcols, loc, chunk)
        top_f = jnp.take_along_axis(ki_c, fc, axis=1)
        top_r = jnp.take_along_axis(rv_c, rc, axis=1)
        heads = jnp.concatenate([top_f, top_r], axis=1)
        ext = jnp.take(knn_i, jnp.maximum(heads, 0), axis=0)
        if ext_k:  # cap the per-head join width (gather-bound stage)
            ext = ext[:, :, :ext_k]
        ext = jnp.where(heads[:, :, None] >= 0, ext, -1)
        cand = jnp.concatenate(
            [ki_c, rv_c, ext.reshape(chunk, -1)], axis=1
        )
        q = jnp.take(vectors, rows_c, axis=0).astype(jnp.float32)
        qn = jnp.take(norms_sq, rows_c)
        cv = jnp.take(vectors, jnp.maximum(cand, 0), axis=0)
        cn = jnp.take(norms_sq, jnp.maximum(cand, 0))
        ip = jnp.einsum(
            "cd,cwd->cw", q, cv.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dist = qn[:, None] - 2.0 * ip + cn
        bad = (cand < 0) | (cand == rows_c[:, None])
        bad = bad | ~jnp.take(valid, jnp.maximum(cand, 0))
        dist = jnp.where(bad, MASKED, dist)
        w = cand.shape[1]
        eq = cand[:, :, None] == cand[:, None, :]
        earlier = jnp.tril(jnp.ones((w, w), bool), k=-1)
        dup = jnp.any(eq & earlier & (cand[:, None, :] >= 0), axis=2)
        dist = jnp.where(dup, MASKED, dist)
        neg, pos = jax.lax.top_k(-dist, kk)
        nd = -neg
        ni = jnp.where(
            nd < MASKED, jnp.take_along_axis(cand, pos, axis=1), -1
        )
        return nd, ni

    nd, ni = jax.lax.map(one, jnp.arange(seg // chunk, dtype=jnp.int32))
    return nd.reshape(seg, kk), ni.reshape(seg, kk)


def _nn_descent_round(
    vectors, norms_sq, valid, knn_d, knn_i, n: int,
    rkey=None,
    expand: int = 4, rev_slots: int = 32, chunk: int = 1024,
    ext_k: int = 0,
):
    """One NN-descent round, segmented into <60s programs.

    rkey: when given, expansion heads are SAMPLED from the forward and
    reverse lists instead of always taking the best few — deterministic
    heads re-explore the same candidates every round and convergence
    stalls (measured: +1.5%/round deterministic vs the sampled join)."""
    global _reverse_lists_jit
    if _reverse_lists_jit is None:
        _reverse_lists_jit = jax.jit(
            _reverse_lists, static_argnames=("n_pad", "r_slots")
        )
    n_pad, kk = knn_d.shape
    # reverse join over the best 16 forward edges only: the full-kk
    # edge list is n*kk entries and its two argsorts (keys + payload
    # gathers + sort workspace) dominate the stage's HBM peak at 4M;
    # the influential reverse edges come from the TOP of the forward
    # lists, so capping costs no measurable recall
    kk_rev = min(kk, 16)
    rev_i = _reverse_lists_jit(
        knn_i[:, :kk_rev], knn_d[:, :kk_rev], n_pad=n_pad,
        r_slots=rev_slots,
    )
    if rkey is None:
        rkey = jax.random.PRNGKey(0)
        sampled = False
    else:
        sampled = True
    seg = min(n_pad, max(SEG_ROWS // 2, chunk))
    seg = (seg // chunk) * chunk or chunk
    out_d = out_i = None
    for s, off in enumerate(range(0, n_pad, seg)):
        this = min(seg, n_pad - off)
        this = -(-this // chunk) * chunk  # n_pad is chunk-aligned
        nd, ni = _nd_segment(
            vectors, norms_sq, valid, knn_d, knn_i, rev_i,
            jax.random.fold_in(rkey, 77_000 + s),
            jnp.int32(off), n,
            seg=this, expand=expand, chunk=chunk, ext_k=ext_k,
            sampled=sampled,
        )
        if off == 0 and this >= n_pad:
            return nd, ni  # single segment
        if out_d is None:
            # donated accumulation buffers (a list+concat of segment
            # outputs held 2x the full result transient at 4M rows)
            out_d = jnp.zeros_like(knn_d)
            out_i = jnp.zeros_like(knn_i)
        out_d, out_i = _nd_acc(out_d, out_i, nd, ni, jnp.int32(off))
    return out_d, out_i


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _nd_acc(out_d, out_i, nd, ni, off):
    return (
        jax.lax.dynamic_update_slice_in_dim(out_d, nd, off, 0),
        jax.lax.dynamic_update_slice_in_dim(out_i, ni, off, 0),
    )


def bulk_build_rp(
    state: GraphState,
    n: int,
    *,
    m: int,
    m_max: int,
    knn_k: int = 32,
    rounds: int = 8,
    block: int = 2048,
    nn_rounds: int = 2,
    prune_chunk: int = 1024,
    seed: int = 0,
    diversify: bool = False,
) -> GraphState:
    """Random-projection blocked kNN-graph build (the large-n default
    on TPU). O(N * block * D) flops per round vs the exact builder's
    O(N^2 * D); every stage device-resident."""
    if _is_quantized(state):
        return _reattach_codes(
            state,
            bulk_build_rp(
                _densified(state), n, m=m, m_max=m_max, knn_k=knn_k,
                rounds=rounds, block=block, nn_rounds=nn_rounds,
                prune_chunk=prune_chunk, seed=seed, diversify=diversify,
            ),
        )
    n_pad = -(-n // max(block, prune_chunk)) * max(block, prune_chunk)
    # the state's capacity is padded at MIN_CAPACITY (4096) granularity,
    # which can be SMALLER than n_pad at block granularity (8192) — pad
    # transient working views up to n_pad (dead rows are valid=False)
    vecs, norms, valid = state.vectors, state.norms_sq, state.valid
    cap = vecs.shape[0]
    if cap < n_pad:
        extra = n_pad - cap
        vecs = jnp.concatenate(
            [vecs, jnp.zeros((extra, vecs.shape[1]), vecs.dtype)]
        )
        norms = jnp.concatenate([norms, jnp.zeros((extra,), norms.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((extra,), bool)])
    kb = min(knn_k, 32)
    kd = jnp.full((n_pad, knn_k), MASKED, jnp.float32)
    ki = jnp.full((n_pad, knn_k), -1, jnp.int32)
    root = jax.random.PRNGKey(seed)

    _stage = build_stage_timer(n, tag="rp-build")

    for r in range(rounds):
        kd, ki = _rp_round(
            vecs, norms, valid, kd, ki,
            jax.random.fold_in(root, r), n, block, kb,
        )
        _stage(f"rp round {r}", kd)
    for r in range(nn_rounds):
        kd, ki = _nn_descent_round(
            vecs, norms, valid, kd, ki, n,
            jax.random.fold_in(root, 10_000 + r),
        )
        _stage(f"nn-descent round {r}", kd)
    fwd_rows, fwd_dists = _prune_forward_all(state, kd, ki, m, prune_chunk)
    _stage("prune", fwd_rows)
    # release the kNN working set before the symmetrize sorts — holding
    # the [n, K] pair (1.5GB at 4M) through them tips the HBM peak
    del kd, ki
    out = _symmetrize_and_store(
        state, fwd_rows, fwd_dists, n, m_max=m_max,
        diversify=diversify,
    )
    _stage("symmetrize", out.nbrs)
    return out
