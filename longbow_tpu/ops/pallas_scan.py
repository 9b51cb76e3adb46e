"""Fused flat-scan kernel: tiled MXU distances + streaming on-device top-k.

The TPU-native replacement for the reference's batch distance assembly +
heap select (reference: internal/simd/batch_operations.go:17-146,
simd_blocked.go:15-122, arrow_kernels.go `select_k`:230). One Pallas
kernel streams corpus tiles HBM->VMEM, computes a [B, TILE_N] distance
block on the MXU, and folds it into per-query candidate registers held
in VMEM — the [B, N] score matrix never touches HBM.

Candidate maintenance is LANE-LOCAL and branch-free (the v5e numbers
that killed the previous insert-round design, all measured with a
dependency-chained harness: one full VPU pass over a [128, 2048] f32
tile costs ~2us, a single argmin insert round ~6.4us, and a
data-dependent while-loop iteration adds ~1us of scalar sync — so any
per-tile work beyond ~1 pass dominates the matmul). Instead:

  - l2 scores are biased strictly positive (a data-derived bias folded
    into the corpus-norm row) so a raw bitcast to int32 is
    order-preserving; ip scores keep the full "sortable" transform
    (negative floats XOR 0x7FFFFFFF). Either way the group id packs
    into the value's low bits;
  - vertical min-reduces run over 128-lane column SLICES of the native
    [B, T] layout (a [B, g, 128] reshape + 3D iota forces a tiled
    relayout that cost ~25% at large B), split into two tile halves;
  - a depth-deep bubble merge keeps the best `depth` candidates per
    (query, lane) across all tiles in [B, depth*128] registers (pure
    vreg min/max). depth auto-selects 2 for k<=128 (256 candidates),
    4 beyond (512).

Candidates are top-k-EXACT unless >depth of a query's true top-k rows
collide in the same residue class mod 128 within a half-tile, which
for k<=64 over 1M rows is vanishingly rare even on clustered data
(consecutive similar rows land in *different* lanes); the recall gates
in bench.py hold the wrapper's pool->exact-rerank pipeline to the same
bar as the old exact kernel. The wrapper selects the requested pool/k
from the candidates with one jax.lax.top_k.

Batch scaling is the headline lever: the corpus read amortizes across
the query batch, so honest per-batch times at 1M x 128 bf16 are
B=128 -> 3.1 ms, B=512 -> 3.8 ms, B=2048 -> 5.9 ms (347k QPS/chip,
~45% of v5e bf16 MXU peak). Serving feeds big batches via the search
coalescer (serving/coalescer.py) and FlatIndex's {128, 512, 2048}
canonical dispatch shapes.

Supported metric modes:
  - "l2":  needs per-row corpus norms; dist = |q|^2 - 2 q.v + |v|^2
  - "ip":  dist = -q.v  (dot; cosine = pre-normalized rows + "ip")
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from longbow_tpu.ops.distance import MASKED, MASKED_GUARD, Metric, pad_to

# Python scalars (not traced arrays) so the kernel body has no captured
# constants — Pallas requires all array inputs to be explicit.
_MASKED = float(MASKED)  # single source of truth with distance.MASKED
# sortable-int image of _MASKED (init value of the candidate registers)
_MASKED_I32 = int(np.float32(_MASKED).view(np.int32))

LANES = 128
DEPTH = 4  # candidates kept per (query, lane): 512 total per query


def tile_for_dim(d: int) -> int:
    """Corpus-tile rows that fit the kernel's scoped-VMEM budget at
    this dimensionality. The lane-candidate kernel dropped the [B,T]
    scores scratch, so tiles doubled vs round 2 (measured on v5e:
    4096 @ D<=128 runs 2.4ms/128q at 1M — 1.65x over 2048 from halved
    grid overhead)."""
    if d <= 128:
        return 4096
    if d <= 512:
        return 2048
    return 1024


def _sortable_i32(x: jax.Array) -> jax.Array:
    """f32 -> int32 with the same total order (for >=0 the bitcast is
    order-preserving; negatives need their magnitude bits flipped)."""
    u = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(u < 0, u ^ 0x7FFFFFFF, u)


def _unsortable_f32(u: jax.Array) -> jax.Array:
    """Inverse of _sortable_i32 (the transform is an involution)."""
    return jax.lax.bitcast_convert_type(
        jnp.where(u < 0, u ^ 0x7FFFFFFF, u), jnp.float32
    )


def _tile_scores(q, qn, tile, vn, mode: str):
    """[B, TILE_N] distances on the MXU + epilogue. vn carries |v|^2
    (l2) or 0 (ip) for valid rows and MASKED for padding/tombstones so
    masking rides the epilogue add for free. NOTE: do NOT clamp
    negatives here — a jnp.maximum on this expression sends the Mosaic
    compiler into a minutes-long pathological compile on v5e (verified
    empirically); the wrapper clamps the final [B, k] output instead."""
    ip = jax.lax.dot_general(
        q,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if mode == "l2":
        return qn - 2.0 * ip + vn
    return vn - ip


def _scan_kernel(
    *refs,
    tile_n: int,
    mode: str,
    depth: int,
    has_gt: bool = False,
):
    """Refs (in order): q [B,D], qn [B,1], tile [TILE_N,D] (bf16 or i8
    codes), vn [1,TILE_N], [gt [B, 128] when has_gt — THIS TILE's
    per-column-group additive terms at columns [0, g), the sq8r
    cluster-center fold (f32)], out_vals [B,depth*LANES] i32,
    out_ids i32.

    The candidate registers ARE the output blocks (constant-index
    output blocks persist in VMEM across grid steps and write back
    once) — a separate scratch + final copy doubled the scoped-VMEM
    register footprint to 16MB at B=4096 and stack-OOMed the f32
    group-term variant (19M > 16M, measured round 5)."""
    if has_gt:
        (q_ref, qn_ref, tile_ref, vn_ref, gt_ref,
         rv_ref, ri_ref) = refs
    else:
        (q_ref, qn_ref, tile_ref, vn_ref, rv_ref, ri_ref) = refs
        gt_ref = None
    step = pl.program_id(0)
    g = tile_n // LANES  # column groups per tile

    @pl.when(step == 0)
    def _init():
        rv_ref[:] = jnp.full_like(rv_ref, _MASKED_I32)
        ri_ref[:] = jnp.full_like(ri_ref, -1)

    # pack the group id into the value's low bits (field width follows
    # g: 5 bits at tile 4096, 7 at the grouped path's 16384): the
    # vertical min then carries its own argmin (tie-break/truncation
    # noise is <= 2^-18 relative — the serving pipeline re-ranks the
    # pool exactly anyway)
    id_bits = max((g - 1).bit_length(), 1)
    id_mask = (1 << id_bits) - 1

    def merge(m_v, m_i):
        """Bubble one [B, LANES] candidate column into the per-lane
        depth registers — pure vreg min/max selects."""
        for d in range(depth):
            rv = rv_ref[:, d * LANES:(d + 1) * LANES]
            ri = ri_ref[:, d * LANES:(d + 1) * LANES]
            swap = m_v < rv
            nv = jnp.where(swap, m_v, rv)
            ni = jnp.where(swap, m_i, ri)
            m_v = jnp.where(swap, rv, m_v)
            m_i = jnp.where(swap, ri, m_i)
            rv_ref[:, d * LANES:(d + 1) * LANES] = nv
            ri_ref[:, d * LANES:(d + 1) * LANES] = ni

    # The tile is processed in SUB-TILES of <=4096 rows: each sub-tile
    # computes its [B, SUB] score block, packs, and min-reduces before
    # the next starts, so score liveness never exceeds the proven
    # 4096-tile footprint. The grouped (gt) path NEEDS tile_n=16384
    # (128 groups — the Mosaic gt-block lane constraint) and a
    # whole-tile [B, 16384] f32 score buffer stack-OOMed scoped VMEM
    # (47.7M > 16M, measured round 5); without gt there is exactly one
    # sub-tile and this is the original kernel unchanged.
    sub_n = min(tile_n, 4096)
    g_sub = sub_n // LANES
    for s in range(tile_n // sub_n):
        sub = tile_ref[s * sub_n:(s + 1) * sub_n, :]
        if sub.dtype != q_ref.dtype:
            # int8 codes stream: 1 byte/dim of HBM traffic, converted
            # to the query dtype in VMEM right before the MXU feed
            # (-128..127 is exact in bf16's 8-bit significand). Codes
            # are SIGNED (u8 - 128, shift folded into the affine):
            # Mosaic has no unsigned->float lowering, the signed chain
            # i8 -> i32 -> f32 -> bf16 is supported (measured on v5e).
            sub = sub.astype(q_ref.dtype)
        scores = _tile_scores(
            q_ref[:], qn_ref[:], sub,
            vn_ref[:, s * sub_n:(s + 1) * sub_n], mode,
        )
        if gt_ref is None:
            if mode == "l2":
                # the wrapper biased vn so every l2 score is strictly
                # positive: the raw bitcast is then order-preserving —
                # no negative-branch select on the [B, T] pass
                # (ablation: ~10% kernel time at B=2048)
                u = jax.lax.bitcast_convert_type(scores, jnp.int32)
            else:  # ip scores can be negative: full sortable transform
                u = _sortable_i32(scores)
        else:
            u = None

        def half_min(j0, j1):
            m = None
            for j in range(j0, j1):
                # round the score UP to the id-field boundary before
                # packing: clearing low bits used to perturb a MASKED
                # row's sentinel a few ulps BELOW _MASKED_I32, letting
                # tombstoned rows enter the registers (then surface
                # with "valid" scores when < ncand real rows exist).
                # Rounding up keeps masked >= the register init so
                # they never win a swap; real scores absorb <= id_mask
                # ulps of upward tie-break noise, orders below the
                # rerank's correction.
                if gt_ref is None:
                    uj = u[:, j * LANES:(j + 1) * LANES]
                else:
                    # per-group additive term (sq8r -2*q.center[cid]
                    # fold): one [B,1]->[B,LANES] broadcast add per
                    # column group on the f32 score slice BEFORE the
                    # bitcast. A MASKED row absorbs the add (3e38 +
                    # O(1e3) rounds back to 3e38), so masking still
                    # rides vn.
                    gj = s * g_sub + j
                    sj = (
                        scores[:, j * LANES:(j + 1) * LANES]
                        + gt_ref[:, gj:gj + 1]
                    )
                    uj = jax.lax.bitcast_convert_type(sj, jnp.int32)
                pj = jnp.bitwise_and(uj + id_mask, ~id_mask) | (
                    s * g_sub + j
                )
                m = pj if m is None else jnp.minimum(m, pj)
            return m

        halves = (
            ((0, g_sub // 2), (g_sub // 2, g_sub))
            if g_sub >= 2
            else ((0, g_sub),)
        )
        for (j0, j1) in halves:
            pm = half_min(j0, j1)
            merge(jnp.bitwise_and(pm, ~id_mask),
                  jnp.bitwise_and(pm, id_mask) + step * g)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "tile_n", "interpret", "normalize", "depth"
    ),
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
    depth: int = 0,   # candidates/lane; 0 = auto (2 if k<=128 else 4)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Flat k-NN with fused streaming candidate scan.

    queries:  [B, D] f32/bf16 (D should be 128-aligned; padded if not)
    corpus:   [N, D] same dtype; N padded internally to tile_n
    corpus_norms_sq: [N] f32 row norms (ignored for ip/dot but required
        shape-wise; pass zeros)
    valid:    [N] bool — False rows (padding/tombstones) never returned
    Returns (dist [B, k] f32, idx [B, k] i32), sorted ascending.

    Results come from the kernel's 512-candidate-per-query registers
    (see module docstring): top-k-exact unless >4 of the true top-k
    share a row-residue class mod 128 within the corpus.

    For cosine: pre-normalize corpus + queries and call with metric="dot".
    """
    metric = Metric.validate(metric)
    if metric == Metric.COSINE:
        raise ValueError(
            "fused_flat_search: pre-normalize and use dot for cosine"
        )
    mode = "l2" if metric == Metric.L2 else "ip"
    if corpus.dtype != jnp.bfloat16 and not interpret:
        # platform rule (CLAUDE.md): f32 variants of this kernel hit
        # pathological (minutes-long) Mosaic compiles on v5e and can
        # wedge the remote compile helper — the XLA scan serves f32.
        # Enforced here so every caller doesn't re-implement the guard.
        raise ValueError(
            "fused_flat_search requires a bfloat16 corpus on TPU "
            "(f32 is served by the XLA exact_search path)"
        )
    if tile_n and tile_n % LANES != 0:
        # g = tile_n // LANES truncates: tail columns would never be
        # reduced and the step*g id rebase would misattribute every
        # row after the first tile
        raise ValueError(
            f"tile_n must be a multiple of {LANES}, got {tile_n}"
        )
    # serving-path fusion: query normalization and filter-mask combine
    # happen inside this jit — each would otherwise be a separate eager
    # dispatch costing a ~30ms host round trip on this platform
    if normalize:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(
                queries.astype(jnp.float32), axis=1, keepdims=True
            ),
            1e-30,
        ).astype(queries.dtype)
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask)

    b, d = queries.shape
    n = corpus.shape[0]
    if depth <= 0:
        # depth 2 (256 candidates/query) halves the per-tile bubble
        # merge; collisions need >2 of the true top-k in one residue
        # class per half-tile — measured recall identical to depth 4
        # at k<=64 on 1M (0.9906 vs 0.9914, inside rerank headroom)
        depth = 2 if k <= LANES else DEPTH
    ncand = depth * LANES
    if k > ncand:
        raise ValueError(f"fused_flat_search supports k <= {ncand}")

    # pad shapes to hardware tiles (bf16 sublane tiling wants 16 rows)
    d_pad = pad_to(d, 128)
    tile_n = tile_n or tile_for_dim(d)
    n_pad = pad_to(n, tile_n)
    b_pad = pad_to(b, 16 if corpus.dtype == jnp.bfloat16 else 8)

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
    # add pushes the distance out of candidate range
    vn_base = (
        corpus_norms_sq.astype(jnp.float32)
        if mode == "l2"
        else jnp.zeros((n_pad,), jnp.float32)
    )
    if mode == "l2":
        # positivity bias: lets the kernel bitcast scores directly
        # (no negative-branch select on the [B,T] pass). Must dominate
        # bf16 matmul cancellation, which scales with the operand
        # norms, so derive it from the data per call — a fixed 1.0
        # would silently mis-order near-zero distances on large-norm
        # corpora. Subtracted on decode; resolution loss is
        # ~bias * 2^-18, orders below bf16 storage noise.
        bias = 1.0 + 0.25 * (
            jnp.max(qn)
            + jnp.max(jnp.where(valid.astype(bool), vn_base, 0.0))
        )
        vn = jnp.where(valid.astype(bool), vn_base + bias, MASKED)[None, :]
    else:
        bias = jnp.float32(0.0)
        vn = jnp.where(valid.astype(bool), vn_base, MASKED)[None, :]

    grid = (n_pad // tile_n,)
    kernel = functools.partial(
        _scan_kernel, tile_n=tile_n, mode=mode, depth=depth
    )
    out_vals, out_ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, ncand), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, ncand), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, ncand), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, ncand), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * corpus.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, qn, corpus, vn)

    # decode candidates -> rows, then select the k best (one top_k).
    # Ghost canonicalization (belt to the kernel's round-up braces):
    # any packed value at/above MASKED's id-field floor IS a masked/
    # unfilled slot — no real score comes within 2^id_bits ulps of
    # 3e38 (l2 scores are bias-bounded ~1e6; ip bounded by data norms).
    # Emit exactly (MASKED, -1) for those so callers' `d < MASKED`
    # checks never see a tombstoned row with a "real" score.
    g_total = tile_n // LANES
    id_bits_w = max((g_total - 1).bit_length(), 1)
    ghost = out_vals >= (_MASKED_I32 & ~((1 << id_bits_w) - 1))
    out_vals = jnp.where(ghost, _MASKED_I32, out_vals)
    out_ids = jnp.where(ghost, -1, out_ids)
    lane = jnp.arange(ncand, dtype=jnp.int32) % LANES
    rows = jnp.where(
        out_ids >= 0, out_ids * LANES + lane[None, :], -1
    )
    neg, pos = jax.lax.top_k(-out_vals, k)
    out_idx = jnp.take_along_axis(rows, pos, axis=1)
    out_vals = _unsortable_f32(-neg)

    out_vals = out_vals[:b, :k]
    if mode == "l2":
        # remove the positivity bias (MASKED entries are unaffected:
        # bias is far below one ulp at 3e38) and clamp bf16
        # cancellation — self-distance must not go negative
        out_vals = jnp.maximum(out_vals - bias, 0.0)
    return out_vals, out_idx[:b, :k]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "interpret", "depth", "clamp_zero"),
)
def fused_codes_search(
    qs: jax.Array,
    qn_eff: jax.Array,
    codes: jax.Array,
    vn_row: jax.Array,
    valid: jax.Array,
    k: int,
    *,
    group_term: jax.Array | None = None,
    extra_mask=None,
    neg_slack: float | jax.Array = 0.0,
    clamp_zero: bool = True,
    tile_n: int = 0,
    depth: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat scan over int8 QUANTIZED codes — the TPU-native
    equivalent of the reference's native SQ8/ADC kernels (reference:
    internal/simd/sq8.go:37 + sq8_amd64.s, batch_operations.go:119):
    1 byte/dim of HBM traffic instead of 2 (bf16), same lane-candidate
    register machinery as `fused_flat_search`.

    The caller folds its affine/residual dequantization into the
    QUERY side; the kernel scores the l2-form expression

        score[b, n] = qn_eff[b] - 2 * (qs[b] . codes[n]) + vn_row[n]
                      (+ group_term[b, n // 128] when given)

    Codes are RECENTERED SIGNED bytes (stored_u8_value - 128) because
    Mosaic cannot lower unsigned->float casts; fold the shift into the
    affine: lo_eff = lo + 128 * scale. The expression then covers:
      - SQ8 (global per-dim affine, index/sq8.py):
          qs = q * scale,  qn_eff = |q|^2 - 2 q.lo_eff,
          vn_row = |v_deq|^2
      - residual SQ8 (cluster-grouped layout): additionally
          group_term[b, g] = -2 * (q . centers[cid_of_group[g]])
        (valid because the physical layout keeps each 128-row lane
        group single-cluster — see index/sq8.py SQ8ResidualIndex)
      - dot/ip: qs = q * scale / 2, qn_eff = -(q.lo), vn_row = 0,
        negated center term halved likewise.

    codes:  [N, D] int8 (N should be a tile_n multiple — padded here
            otherwise, which materializes a padded copy per call)
    qs:     [B, D] f32/bf16 pre-scaled query side (cast to bf16)
    qn_eff: [B] f32;  vn_row: [N] f32;  valid: [N] bool
    group_term: [B, N // 128] f32 per-column-group additive term
    Returns (score [B, k] f32 incl. all terms, row [B, k] i32),
    ascending; masked/unfilled slots decode as (MASKED, -1).

    Scores are positivity-biased with a data-derived bias (same trap as
    the bf16 kernel: bf16 cancellation breaks raw-bitcast ordering) —
    the bias must dominate every additive term, so it is derived from
    qn_eff/vn_row/group_term maxima inside this jit. That covers
    l2-form scores (mathematically >= 0 up to rounding); a dot-style
    fold whose scores go genuinely negative MUST pass `neg_slack` >=
    max possible |negative score| (e.g. 2 * max|qs| * max|codes| from
    stats the index keeps) and `clamp_zero=False`.
    """
    if codes.dtype != jnp.int8:
        raise ValueError(
            "fused_codes_search: codes must be int8 (recentered u8-128"
            " — Mosaic has no unsigned->float cast)"
        )
    if tile_n and tile_n % LANES != 0:
        raise ValueError(f"tile_n must be a multiple of {LANES}")
    if group_term is not None and (
        codes.shape[0] % LANES != 0
        or group_term.shape[1] != codes.shape[0] // LANES
    ):
        raise ValueError(
            "group_term requires N % 128 == 0 and shape [B, N // 128] "
            f"(got N={codes.shape[0]}, gt={group_term.shape})"
        )
    if extra_mask is not None:
        valid = jnp.logical_and(valid, extra_mask)

    b, d = qs.shape
    n = codes.shape[0]
    if depth <= 0:
        depth = 2 if k <= LANES else DEPTH
    ncand = depth * LANES
    if k > ncand:
        raise ValueError(f"fused_codes_search supports k <= {ncand}")

    d_pad = pad_to(d, 128)
    tile_n = tile_n or tile_for_dim(d)
    if group_term is not None and tile_n > 16384:
        raise ValueError("group_term path supports tile_n <= 16384")
    n_pad = pad_to(n, tile_n)
    b_pad = pad_to(b, 16)

    qs = qs.astype(jnp.bfloat16)
    if d_pad != d:
        qs = jnp.pad(qs, ((0, 0), (0, d_pad - d)))
        codes = jnp.pad(codes, ((0, 0), (0, d_pad - d)))
    if b_pad != b:
        qs = jnp.pad(qs, ((0, b_pad - b), (0, 0)))
        qn_eff = jnp.pad(qn_eff, (0, b_pad - b))
        if group_term is not None:
            group_term = jnp.pad(group_term, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        codes = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
        vn_row = jnp.pad(vn_row, (0, n_pad - n))
        valid = jnp.pad(valid.astype(bool), (0, n_pad - n))
        if group_term is not None:
            group_term = jnp.pad(
                group_term, ((0, b_pad - group_term.shape[0]),
                             (0, n_pad // LANES - group_term.shape[1]))
            )
    if group_term is not None:
        # Kernel-feed layout: one 128-lane block per TILE, this tile's
        # g group values at columns [0, g) (zeros beyond). A direct
        # [B, G] feed is impossible — Mosaic requires block lane dims
        # divisible by 128, and the 16384-row tile that makes g == 128
        # stack-OOMs scoped VMEM (47-115M > 16M, measured round 5).
        ntiles = n_pad // tile_n
        g = tile_n // LANES
        group_term = jnp.pad(
            group_term.reshape(b_pad, ntiles, g),
            ((0, 0), (0, 0), (0, LANES - g)),
        ).reshape(b_pad, ntiles * LANES)
        # dtype is the CALLER's choice: f32 is the safe default (bf16
        # carries 2^-9 relative rounding into the coarse ranking);
        # a caller may pass bf16 group_term to halve the side-input
        # HBM read when its term magnitudes tolerate it
        if group_term.dtype not in (jnp.float32, jnp.bfloat16):
            group_term = group_term.astype(jnp.float32)

    valid = valid.astype(bool)
    # positivity bias (see module docstring): must dominate the bf16
    # matmul cancellation of EVERY additive term, including the
    # group term's magnitude when present
    m_q = jnp.max(jnp.abs(qn_eff))
    m_v = jnp.max(jnp.where(valid, jnp.abs(vn_row), 0.0))
    bias = 1.0 + 0.25 * (m_q + m_v) + jnp.abs(
        jnp.asarray(neg_slack, jnp.float32)
    )
    if group_term is not None:
        bias = bias + 0.25 * jnp.max(jnp.abs(group_term))
    vn = jnp.where(valid, vn_row.astype(jnp.float32) + bias, MASKED)[None, :]
    qn = qn_eff.astype(jnp.float32)[:, None]

    grid = (n_pad // tile_n,)
    g = tile_n // LANES
    has_gt = group_term is not None
    in_specs = [
        pl.BlockSpec((b_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [qs, qn, codes, vn]
    if has_gt:
        in_specs.append(
            pl.BlockSpec(
                (b_pad, LANES), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(group_term)
    kernel = functools.partial(
        _scan_kernel, tile_n=tile_n, mode="l2", depth=depth,
        has_gt=has_gt,
    )
    out_vals, out_ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b_pad, ncand), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, ncand), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, ncand), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, ncand), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)

    # decode (same ghost canonicalization as fused_flat_search)
    id_bits_w = max((g - 1).bit_length(), 1)
    ghost = out_vals >= (_MASKED_I32 & ~((1 << id_bits_w) - 1))
    out_vals = jnp.where(ghost, _MASKED_I32, out_vals)
    out_ids = jnp.where(ghost, -1, out_ids)
    lane = jnp.arange(ncand, dtype=jnp.int32) % LANES
    rows = jnp.where(out_ids >= 0, out_ids * LANES + lane[None, :], -1)
    neg, pos = jax.lax.top_k(-out_vals, k)
    out_idx = jnp.take_along_axis(rows, pos, axis=1)
    out_vals = _unsortable_f32(-neg)
    out_vals = out_vals[:b, :k] - bias
    if clamp_zero:  # l2-form: self-distance must not go negative
        out_vals = jnp.maximum(out_vals, 0.0)
    return out_vals, out_idx[:b, :k]


@functools.partial(
    jax.jit,
    static_argnames=("k", "pool", "metric", "tile_n", "normalize",
                     "interpret"),
)
def coarse_flat_search_rerank(
    queries: jax.Array,
    corpus: jax.Array,         # bf16 [N, D] — exact re-rank operand
    codes: jax.Array,          # int8 [N, D] — coarse scan operand
    lo: jax.Array,             # [D] f32 trained affine min
    hi: jax.Array,             # [D] f32 trained affine max
    coarse_norms_sq: jax.Array,  # [N] f32 |dequant(codes)|^2
    valid: jax.Array,
    k: int,
    metric: str = Metric.L2,
    *,
    pool: int = 64,
    extra_mask=None,
    normalize: bool = False,
    tile_n: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Coarse-quantized flat search: the int8 codes kernel ranks a
    candidate pool at HALF the bf16 kernel's HBM read (measured 1.24x
    faster at 1M x 128 on v5e), then the pool re-ranks EXACTLY against
    the bf16 storage in f32 HIGHEST — the same rerank stage as
    flat_search_rerank, so final recall matches bf16 ranking quality
    whenever the pool contains the true top-k (measured containment:
    0.9984 of true top-10 in pool-64 at 1M clustered).

    This is an ACCELERATOR for the flat tier (codes are derived data,
    +1 byte/dim HBM; 3 bytes/dim total still beats the reference's
    4-byte f32), not a compression tier — see index/sq8.py for those.
    l2/cosine only (cosine = normalize=True upstream of quantization).
    """
    metric = Metric.validate(metric)
    if metric == Metric.DOT:
        raise ValueError("coarse_flat_search_rerank: l2/cosine only")
    q = queries.astype(jnp.float32)
    if normalize:
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30
        )
    pool = max(pool, k)
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    lo_eff = lo + 128.0 * scale
    qs = q * scale[None, :]
    qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo_eff)
    d, i = fused_codes_search(
        qs, qn_eff, codes, coarse_norms_sq, valid, pool,
        extra_mask=extra_mask, tile_n=tile_n, interpret=interpret,
    )
    # exact re-rank against the bf16 storage (f32 HIGHEST arithmetic —
    # identical to flat_search_rerank's rerank stage)
    cand = jnp.take(corpus, jnp.maximum(i, 0), axis=0).astype(jnp.float32)
    ip = jnp.einsum(
        "bd,bkd->bk", q, cand, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    cn = jnp.sum(cand * cand, axis=2)
    ed = jnp.maximum(qn - 2.0 * ip + cn, 0.0)
    ed = jnp.where(d < MASKED_GUARD, ed, MASKED)
    neg, pos = jax.lax.top_k(-ed, k)
    idx = jnp.take_along_axis(i, pos, axis=1)
    idx = jnp.where(-neg < MASKED_GUARD, idx, -1)
    return -neg, idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "pool", "metric", "tile_n", "normalize", "exact_rerank"
    ),
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
    exact_rerank: bool | None = None,  # None = env/default policy
) -> tuple[jax.Array, jax.Array]:
    """Fused bf16 scan for a candidate pool + exact-f32-arithmetic
    re-rank of the pool (storage stays bf16).

    The scan cost is independent of pool size (candidates come from the
    kernel's 512-wide registers), so pool=64 costs the same as pool=10;
    the re-rank removes the bf16 matmul's cancellation noise (recall vs
    the f32 oracle: 0.944 -> 0.9895 on clustered 1M x 128). The
    residual ~1% is bf16 *storage* rounding.
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
    # At DEFAULT precision the TPU MXU rounds these f32 operands to
    # bf16, partially reinstating the cancellation noise the rerank
    # exists to remove. The [B, k, D] einsum is tiny next to the scan,
    # so HIGHEST costs ~nothing — it is the default; set
    # LONGBOW_RERANK_EXACT=0 to opt back out (or pass
    # exact_rerank=False). Trace-time read: the flag is baked into the
    # compiled program, callers A/B via the static arg.
    if exact_rerank is None:
        import os as _os

        exact_rerank = _os.environ.get("LONGBOW_RERANK_EXACT", "1") != "0"
    _prec = (
        jax.lax.Precision.HIGHEST
        if exact_rerank
        else jax.lax.Precision.DEFAULT
    )
    ip = jnp.einsum(
        "bd,bkd->bk", qf, cand,
        preferred_element_type=jnp.float32, precision=_prec,
    )
    if metric == Metric.L2:
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)
        cn = jnp.sum(cand * cand, axis=2)
        ed = jnp.maximum(qn - 2.0 * ip + cn, 0.0)
    else:  # ip/dot (cosine = normalized + dot)
        ed = -ip
    # MASKED_GUARD, not MASKED: a masked row's packed score can decode
    # a few ulps BELOW MASKED (group-id bits), and re-scoring it here
    # would rank a filtered-out row above real matches
    ed = jnp.where(d < MASKED_GUARD, ed, MASKED)
    neg, pos = jax.lax.top_k(-ed, k)
    return -neg, jnp.take_along_axis(i, pos, axis=1)
