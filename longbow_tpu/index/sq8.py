"""SQ8 scalar quantization: per-dim affine int8 storage.

Capability match for the reference's SQ8 path (reference:
scalar_quantization.go:15-229 per-dim min/max trainer, simd sq8
distance kernels sq8.go:37 + sq8_amd64.s, train-at-threshold semantics
arrow_hnsw.go:94). 4x memory reduction vs f32.

Round-5 redesign: the scan runs through the fused int8 Pallas kernel
(ops/pallas_scan.fused_codes_search) on TPU — 1 byte/dim of HBM
traffic, measured FASTER than the bf16 kernel at 1M x 128 (7.4 vs
9.3 ms/2048q same-session) — with an exact-f32 dequantized re-rank of
the candidate pool. The XLA chunked scan remains the CPU/fallback
path (k > 64, dot metric on sq8r).

Storage convention: codes are RECENTERED SIGNED bytes (u8 value-128)
because Mosaic has no unsigned->float lowering; the +128 shift is
folded into the affine (lo_eff = lo + 128*scale). Identity ingest of
int8 data stores the input bytes 1:1 (uint8 stores value-128).

SQ8ResidualIndex ("sq8r", k-means mean-centering) keeps a TWO-REGION
physical layout so its cluster term rides the kernel's per-lane-group
input: a MAIN region where rows are grouped by cluster (each 128-row
lane group single-cluster, groups padded), plus an append-order DELTA
region scanned by XLA and merged; a device-side relayout folds delta
into main when it grows past main/4. External row ids are stable
across relayouts via a slot indirection (the TPU analogue of the
reference's ChunkedLocationStore remapping, types/location_store.go).
"""
from __future__ import annotations

import functools
import os
import threading
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
GROUP = 128  # kernel lane-group width (pallas_scan.LANES)
# sq8r main-region capacity quantum. Must be a multiple of the kernel
# tile (4096 at D<=128) so the fused path never pads in-program; 16384
# also keeps the gt side-input's 4-tile lane blocks fully covered.
SQ8R_TILE = 16384


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _count_dispatch(implementation: str) -> None:
    try:
        from longbow_tpu.metrics import get_registry

        get_registry().inc(
            "longbow_simd_dispatch_total", implementation=implementation
        )
    except Exception:
        pass


def _bucket_batch(b: int) -> int:
    """Canonical kernel batch shapes (see FlatIndex.search)."""
    for cb in (128, 512, 2048, 4096):
        if b <= cb:
            return cb
    return -(-b // 4096) * 4096


@jax.jit
def _quantize(vecs: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """f32 -> recentered int8 codes (u8 grid minus 128)."""
    scale = jnp.maximum(hi - lo, 1e-12)
    q = jnp.round((vecs - lo) / scale * 255.0)
    return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)


def _affine(lo, hi):
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    return scale, lo + 128.0 * scale


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


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "normalize")
)
def _sq8_fused_packed(
    queries, codes, lo, hi, norms_sq, valid, k, metric, extra_mask,
    normalize,
):
    """Fused int8 scan (pool=64) + exact-f32 dequantized re-rank,
    packed [B, 2k] (distances bitcast to int32, then row ids) for a
    single fetch round trip (same pack convention as FlatIndex)."""
    from longbow_tpu.ops.pallas_scan import fused_codes_search

    scale, lo_eff = _affine(lo, hi)
    q = queries
    if normalize:
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30
        )
    pool = max(64, k)
    if metric == Metric.DOT:
        # dot rides the l2-form kernel with halved query side:
        # score = -(qs.codes + q.lo_eff) needs a negativity slack
        qs = q * scale[None, :] * 0.5
        qn_eff = -(q @ lo_eff)
        mq = jnp.sqrt(jnp.max(jnp.sum(q * q, axis=1)))
        mv = jnp.sqrt(jnp.max(jnp.where(valid, norms_sq, 0.0)))
        d, i = fused_codes_search(
            qs, qn_eff, codes, jnp.zeros_like(norms_sq), valid, pool,
            extra_mask=extra_mask, neg_slack=2.0 * mq * mv + 1.0,
            clamp_zero=False,
        )
    else:  # l2 (cosine rides l2 via normalize)
        qs = q * scale[None, :]
        qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo_eff)
        d, i = fused_codes_search(
            qs, qn_eff, codes, norms_sq, valid, pool,
            extra_mask=extra_mask,
        )
    # exact re-rank against the dequantized pool rows (removes the
    # coarse pass's bf16 query-rounding + id-packing noise; the
    # remaining gap to the f32 oracle is quantization itself)
    cand = (
        jnp.take(codes, jnp.maximum(i, 0), axis=0).astype(jnp.float32)
        * scale[None, None, :]
        + lo_eff[None, None, :]
    )
    qf = q.astype(jnp.float32)
    ip = jnp.einsum(
        "bd,bkd->bk", qf, cand, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == Metric.DOT:
        ed = -ip
    else:
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)
        cn = jnp.sum(cand * cand, axis=2)
        ed = jnp.maximum(qn - 2.0 * ip + cn, 0.0)
    ed = jnp.where(d < MASKED_GUARD, ed, MASKED)
    neg, pos = jax.lax.top_k(-ed, k)
    ids = jnp.take_along_axis(i, pos, axis=1)
    ids = jnp.where(-neg < MASKED_GUARD, ids, -1)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(-neg, jnp.int32), ids], axis=1
    )


class SQ8Index:
    """int8-quantized flat index with fused-kernel scan.

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
        self._mu = threading.RLock()

    @property
    def is_trained(self) -> bool:
        return self.lo is not None

    @property
    def capacity(self) -> int:
        return 0 if self.codes is None else self.codes.shape[0]

    def _prep(self, vecs) -> jax.Array:
        if isinstance(vecs, jax.Array):
            # device-input fast path: never bounce 10M rows through
            # host RAM (the np path re-uploads through the relay)
            v = vecs.astype(jnp.float32)
        else:
            v = jnp.asarray(np.ascontiguousarray(vecs, np.float32))
        if self.metric == Metric.COSINE:
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        return v

    def train(self, vecs: np.ndarray) -> None:
        """Per-dim min/max (reference: scalar_quantization.go:15).

        int8/uint8 input trains an IDENTITY affine (lo/hi = the dtype's
        full range): the stored codes are then the ingested bytes 1:1
        for int8 (uint8 recenters by -128, exactly invertible) — the
        reference's native int8 ingest path, no quantization loss."""
        if isinstance(vecs, jax.Array):  # device input: no host fetch
            v = self._prep(vecs)
            self.lo = jnp.min(v, axis=0)
            self.hi = jnp.max(v, axis=0)
            return
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
            self.codes = jnp.zeros((cap, self.dim), jnp.int8)
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
        with self._mu:
            self._grow_to(self.count + n)
            self.codes, self.norms_sq, self.valid = _sq8_append(
                self.codes, self.norms_sq, self.valid, codes, norms,
                self.count,
            )
            rows = np.arange(self.count, self.count + n, dtype=np.int64)
            self.count += n
        return rows

    def _dequant(self, codes: jax.Array) -> jax.Array:
        scale, lo_eff = _affine(self.lo, self.hi)
        return codes.astype(jnp.float32) * scale[None, :] + lo_eff[None, :]

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows):
            with self._mu:
                self.valid = tombstone_rows(self.valid, rows)

    def search(
        self, queries, k: int, *, filter_mask=None
    ) -> tuple[jax.Array, jax.Array]:
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        normalize = self.metric == Metric.COSINE
        metric = Metric.L2 if normalize else self.metric
        if (
            _on_tpu()
            and k <= 64
            and self.capacity > 0
            and os.environ.get("LONGBOW_SQ8_FUSED", "1") != "0"
        ):
            b = queries.shape[0]
            k_pad = 16 if k <= 16 else 64
            b_pad = _bucket_batch(b)
            if b_pad != b:
                queries = np.pad(queries, ((0, b_pad - b), (0, 0)))
            chunk = min(b_pad, 4096)
            with self._mu:
                packs = [
                    _sq8_fused_packed(
                        jnp.asarray(queries[off : off + chunk]),
                        self.codes, self.lo, self.hi, self.norms_sq,
                        self.valid, k_pad, metric, filter_mask,
                        normalize,
                    )
                    for off in range(0, b_pad, chunk)
                ]
            flat = np.concatenate([np.asarray(p) for p in packs])
            dd = np.ascontiguousarray(flat[:, :k_pad]).view(np.float32)
            ii = flat[:, k_pad:]
            _count_dispatch("pallas_sq8_fused")
            dd, ii = dd[:b, :k], ii[:b, :k]
            if normalize:
                dd = cosine_report(dd)
            return dd, ii
        _count_dispatch("xla")
        qj = jnp.asarray(queries)
        if normalize:
            qj = qj / jnp.maximum(
                jnp.linalg.norm(qj, axis=1, keepdims=True), 1e-30
            )
        with self._mu:
            valid = self.valid
            if filter_mask is not None:
                valid = jnp.logical_and(
                    valid, filter_mask[: valid.shape[0]]
                )
            d, i = _sq8_scan(
                self.codes, self.lo, self.hi, self.norms_sq, qj, valid,
                k, metric,
            )
        if normalize:
            d = cosine_report(d)
        return d, i

    def export_state(self) -> dict:
        return {
            "kind": "sq8",
            "dim": self.dim,
            "metric": self.metric,
            "count": self.count,
            "lo": np.asarray(self.lo),
            "hi": np.asarray(self.hi),
            "codes": np.asarray(self.codes[: self.count]),
            "codes_centered": True,
            "valid": np.asarray(self.valid[: self.count]),
        }

    @staticmethod
    def _import_codes(st: dict) -> np.ndarray:
        """Archive codes -> recentered int8 (legacy archives stored
        raw uint8; round-5 archives store int8 with codes_centered)."""
        codes = np.asarray(st["codes"])
        if st.get("codes_centered"):
            return codes.astype(np.int8)
        return (codes.astype(np.int16) - 128).astype(np.int8)

    @classmethod
    def import_state(cls, st: dict) -> "SQ8Index":
        idx = cls(st["dim"], st["metric"])
        idx.lo = jnp.asarray(st["lo"])
        idx.hi = jnp.asarray(st["hi"])
        idx.codes = jnp.asarray(cls._import_codes(st))
        idx.norms_sq = jnp.sum(idx._dequant(idx.codes) ** 2, axis=1)
        idx.valid = jnp.asarray(st["valid"])
        idx.count = st["count"]
        return idx


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _sq8_scan(codes, lo, hi, norms_sq, queries, valid, k, metric):
    """XLA fallback: affine-folded scan — q.v = (q*scale).codes +
    q.lo_eff keeps the int8 codes as the only big operand."""
    scale, lo_eff = _affine(lo, hi)
    qs = (queries * scale[None, :]).astype(jnp.bfloat16)
    ip_codes = jax.lax.dot_general(
        qs, codes.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q_lo = jnp.sum(queries * lo_eff[None, :], axis=1, keepdims=True)
    ip = ip_codes + q_lo
    if metric == Metric.DOT:
        dist = -ip
    else:  # l2 AND cosine: consistent dequant-norm term cancels the
        # quantized-storage norm wobble (see FlatIndex cosine note)
        qn = jnp.sum(queries * queries, axis=1, keepdims=True)
        dist = jnp.maximum(qn - 2.0 * ip + norms_sq[None, :], 0.0)
    dist = jnp.where(valid[None, :], dist, MASKED)
    neg, pos = jax.lax.top_k(-dist, k)
    return -neg, pos


# ---------------------------------------------------------------------------
# sq8r: residual (mean-centered) SQ8 with the cluster-grouped layout
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _cluster_padded_total(m_gcid, m_valid, d_cid, d_valid, n_clusters):
    """Exact GROUP-padded row total of a relayout (one scalar fetch —
    sizing by the worst-case bound wasted ~13% scan time at C=1024)."""
    m_cap = m_valid.shape[0]
    m_cid = jnp.take(m_gcid, jnp.arange(m_cap, dtype=jnp.int32) // GROUP)
    cid_all = jnp.concatenate([m_cid, d_cid])
    valid_all = jnp.concatenate([m_valid, d_valid])
    cid_s = jnp.where(valid_all, cid_all, n_clusters).astype(jnp.int32)
    counts = jnp.zeros((n_clusters + 1,), jnp.int32).at[cid_s].add(1)
    padded = -(-counts[:n_clusters] // GROUP) * GROUP
    return jnp.sum(padded)


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "new_cap", "ext_cap"),
    donate_argnums=(0, 5),  # old main + delta codes: at 10M these are
    # GBs and the relayout's concat/permute copies OOM HBM otherwise
)
def _relayout(
    m_codes, m_gcid, m_norms, m_valid, m_ext,
    d_codes, d_cid, d_norms, d_valid, d_ext,
    n_clusters: int, new_cap: int, ext_cap: int,
):
    """Device-side relayout: merge main+delta into a fresh main region
    grouped by cluster, each cluster padded to a GROUP multiple so
    every 128-row lane group is single-cluster (the fused kernel's
    group_term precondition). Invalid rows are dropped. Returns the
    new region plus an ext->slot inverse for the host map.

    One program, O(N log N) on-device (argsort + scatters) — never a
    host round trip of the codes (CLAUDE.md: big device->host
    transfers through the relay cost minutes)."""
    C = n_clusters
    m_cap = m_codes.shape[0]
    m_cid = jnp.take(m_gcid, jnp.arange(m_cap, dtype=jnp.int32) // GROUP)
    codes_all = jnp.concatenate([m_codes, d_codes])
    cid_all = jnp.concatenate([m_cid, d_cid])
    norms_all = jnp.concatenate([m_norms, d_norms])
    valid_all = jnp.concatenate([m_valid, d_valid])
    ext_all = jnp.concatenate([m_ext, d_ext])

    cid_s = jnp.where(valid_all, cid_all, C).astype(jnp.int32)
    perm = jnp.argsort(cid_s, stable=True)
    sc = jnp.take(cid_s, perm)
    counts = jnp.zeros((C + 1,), jnp.int32).at[cid_s].add(1)
    cvalid = counts[:C]
    padded = -(-cvalid // GROUP) * GROUP
    off_pad = jnp.cumsum(padded) - padded          # cluster start (padded)
    off_unpad = jnp.cumsum(cvalid) - cvalid        # rank offset (unpadded)
    pos = jnp.arange(sc.shape[0], dtype=jnp.int32)
    scc = jnp.minimum(sc, C - 1)
    within = pos - jnp.take(off_unpad, scc)
    dest = jnp.where(
        sc < C, jnp.take(off_pad, scc) + within, new_cap
    )
    # GROUP INTERLEAVE (round-5 on-chip finding): with clusters laid
    # out consecutively, a query's true top-k concentrates inside ONE
    # half-tile of the fused kernel, and its per-lane half-tile min
    # keeps only one candidate per lane — measured 1.4% recall@10 loss
    # at 1M clustered. A golden-stride permutation of GROUPS scatters
    # each cluster's groups ~0.62*G apart (different tiles), restoring
    # the random-layout collision odds. Pure layout — zero scan cost.
    g_total = new_cap // GROUP
    # OVERFLOW BOUND (round-5 10M bug): group_id * stride is int32 —
    # a golden-ratio stride overflowed at ~80k groups (80255 * 49599
    # = 3.98e9 > 2^31), wrapping products negative so groups COLLIDED
    # in the scatter and rows vanished (recall 0.96 -> 0.43 between
    # 5M and 10M rows; jax int64 is x64-gated so cap the stride
    # instead — any coprime stride >= a few tile-widths spreads fine).
    import math as _math

    max_stride = max((2**31 - 1) // max(g_total, 1) - 1, 1)
    stride = min(max(1, int(g_total * 0.6180339887)), max_stride) | 1
    while stride > 1 and _math.gcd(stride, g_total) != 1:
        stride -= 2
    g_new = (dest // GROUP * stride) % g_total
    dest = jnp.where(
        sc < C, g_new * GROUP + dest % GROUP, new_cap
    )

    def scat(init, vals):
        return init.at[dest].set(jnp.take(vals, perm, axis=0), mode="drop")

    new_codes = scat(
        jnp.zeros((new_cap, m_codes.shape[1]), jnp.int8), codes_all
    )
    new_norms = scat(jnp.zeros((new_cap,), jnp.float32), norms_all)
    new_valid = jnp.zeros((new_cap,), bool).at[dest].set(
        sc < C, mode="drop"
    )
    new_ext = jnp.full((new_cap,), -1, jnp.int32).at[dest].set(
        jnp.take(jnp.where(valid_all, ext_all, -1), perm), mode="drop"
    )
    new_cid_arr = scat(
        jnp.zeros((new_cap,), jnp.int32), jnp.minimum(cid_all, C - 1)
    )
    new_gcid = new_cid_arr[::GROUP]
    inv_idx = jnp.where(new_ext >= 0, new_ext, ext_cap)
    inv = jnp.full((ext_cap,), -1, jnp.int32).at[inv_idx].set(
        jnp.arange(new_cap, dtype=jnp.int32), mode="drop"
    )
    return new_codes, new_gcid, new_norms, new_valid, new_ext, inv


def _region_scores(codes, cid, norms, valid, qs_bf16, q_lo, qc, qn, metric, chunk):
    """[B, cap] sq8r distances for one region (chunked lax.map so the
    score block stays bounded at any N)."""
    cap = codes.shape[0]
    chunk = min(cap, chunk)
    nb = -(-cap // chunk)
    n_pad = nb * chunk
    if n_pad != cap:
        codes = jnp.pad(codes, ((0, n_pad - cap), (0, 0)))
        cid = jnp.pad(cid, (0, n_pad - cap))
        norms = jnp.pad(norms, (0, n_pad - cap))
        valid = jnp.pad(valid, (0, n_pad - cap))

    k_local = min(64, cap)

    def one(bidx):
        off = bidx * chunk
        cc = jax.lax.dynamic_slice_in_dim(codes, off, chunk)
        ci = jax.lax.dynamic_slice_in_dim(cid, off, chunk)
        nn = jax.lax.dynamic_slice_in_dim(norms, off, chunk)
        vv = jax.lax.dynamic_slice_in_dim(valid, off, chunk)
        ip = jax.lax.dot_general(
            qs_bf16, cc.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + q_lo + jnp.take(qc, ci, axis=1)
        if metric == Metric.DOT:
            dist = -ip
        else:
            dist = jnp.maximum(qn - 2.0 * ip + nn[None, :], 0.0)
        dist = jnp.where(vv[None, :], dist, MASKED)
        neg, pos = jax.lax.top_k(-dist, k_local)
        return -neg, pos.astype(jnp.int32) + off

    bd, bi = jax.lax.map(one, jnp.arange(nb, dtype=jnp.int32))
    b = qs_bf16.shape[0]
    all_d = jnp.moveaxis(bd, 0, 1).reshape(b, nb * k_local)
    all_i = jnp.moveaxis(bi, 0, 1).reshape(b, nb * k_local)
    return all_d, all_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "normalize", "fused", "has_delta", "gt_bf16"
    ),
)
def _sq8r_packed(
    q,
    m_codes, m_gcid, m_norms, m_valid, m_ext,
    d_codes, d_cid, d_norms, d_valid, d_ext,
    centers, lo, hi, ext_mask,
    k, metric, normalize, fused, has_delta=True,
    m_onehot=None, gt_bf16=False,
):
    """One program: main-region scan (fused kernel with per-group
    cluster term, or XLA fallback) + delta-region XLA scan + exact
    dequantized re-rank (per region — a merged-pool where() doubled
    the gather volume) + ext-id mapping. Packed [B, 2k] like
    _sq8_fused_packed. has_delta=False (the common post-relayout
    state) compiles the delta scan + its rerank out entirely."""
    from longbow_tpu.ops.pallas_scan import fused_codes_search

    scale, lo_eff = _affine(lo, hi)
    if normalize:
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30
        )
    qf = q.astype(jnp.float32)
    # HIGHEST: qc feeds the EXACT re-rank below (q.center[cid] via
    # element gather from this matrix) — DEFAULT precision would round
    # the operands to bf16 and reinstate the noise the rerank removes
    qc = jax.lax.dot_general(  # [B, C] center inner products
        qf, centers, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn = jnp.sum(qf * qf, axis=1, keepdims=True)
    q_lo = jnp.matmul(  # rerank term: f32-exact like qc
        qf, lo_eff[:, None], precision=jax.lax.Precision.HIGHEST
    )
    m_cap = m_codes.shape[0]
    d_cap = d_codes.shape[0]

    def region_mask(ext, valid):
        if ext_mask is None:
            return valid
        # bounds-checked gather: the mask is sized to the EXTERNAL
        # capacity; ext ids at/above its length (stale masks during
        # growth) are excluded rather than read out of range
        L = ext_mask.shape[0]
        m = jnp.take(ext_mask, jnp.clip(ext, 0, L - 1))
        return valid & m & (ext >= 0) & (ext < L)

    pool = max(64, k)

    def rerank(coarse_d, idx_in_region, codes, norms, cid_of, ext_of):
        """Exact sq8r re-scoring of ONE region's candidate pool ->
        (exact_d, ext_ids): row-gather codes + center rows, reconstruct
        [B, pool, D] in f32, one HIGHEST einsum — the same shape as
        _sq8_fused_packed's rerank, measured ~1.2 ms at B=2048/pool=64
        (an element-gather variant via take_along_axis(qc, ...)
        measured 6 ms SLOWER on v5e — batched axis-1 gathers lower
        poorly)."""
        i_safe = jnp.maximum(idx_in_region, 0)
        cc = jnp.take(codes, i_safe, axis=0)
        cid_c = cid_of(i_safe)
        ext_c = jnp.take(ext_of, i_safe)
        vec = (
            cc.astype(jnp.float32) * scale[None, None, :]
            + lo_eff[None, None, :]
            + jnp.take(centers, cid_c, axis=0)
        )
        ip = jnp.einsum(
            "bd,bkd->bk", qf, vec, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == Metric.DOT:
            ed = -ip
        else:
            nn = jnp.take(norms, i_safe)
            ed = jnp.maximum(qn - 2.0 * ip + nn, 0.0)
        ed = jnp.where(
            (coarse_d < MASKED_GUARD) & (ext_c >= 0), ed, MASKED
        )
        return ed, ext_c

    parts_d, parts_e = [], []
    if m_cap:
        mv = region_mask(m_ext, m_valid)
        if fused and metric != Metric.DOT:
            qs = qf * scale[None, :]
            qn_eff = jnp.sum(qf * qf, axis=1) - 2.0 * (qf @ lo_eff)
            if m_onehot is not None:
                # [B,C] @ [C,G] onehot beats the [B,G] axis-1 gather
                # (~2 ms at 1M, measured); HIGHEST keeps the term
                # f32-exact (qc would otherwise round to bf16 in the
                # MXU — the 1.4%-recall trap)
                gt = -2.0 * jax.lax.dot_general(
                    qc, m_onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                # f32 gather + post-cast: a bf16 PRE-gather variant
                # measured 14.2 ms vs 12.3 here (the bf16 gather
                # lowers worse than f32-gather+cast) — don't revisit
                gt = -2.0 * jnp.take(qc, m_gcid, axis=1)
            if gt_bf16:
                gt = gt.astype(jnp.bfloat16)
            dm, im = fused_codes_search(
                qs, qn_eff, m_codes, m_norms, mv, pool, group_term=gt,
            )
        else:
            qs16 = (qf * scale[None, :]).astype(jnp.bfloat16)
            m_cid = jnp.take(
                m_gcid, jnp.arange(m_cap, dtype=jnp.int32) // GROUP
            )
            ad, ai = _region_scores(
                m_codes, m_cid, m_norms, mv, qs16, q_lo, qc, qn,
                metric, 131072,
            )
            neg, pos = jax.lax.top_k(-ad, min(pool, ad.shape[1]))
            dm = -neg
            im = jnp.take_along_axis(ai, pos, axis=1)
        ed, ec = rerank(
            dm, im, m_codes, m_norms,
            lambda i: jnp.take(m_gcid, i // GROUP), m_ext,
        )
        parts_d.append(ed)
        parts_e.append(ec)
    if has_delta and d_cap:
        dv = region_mask(d_ext, d_valid)
        qs16 = (qf * scale[None, :]).astype(jnp.bfloat16)
        ad, ai = _region_scores(
            d_codes, d_cid, d_norms, dv, qs16, q_lo, qc, qn, metric,
            131072,
        )
        kd = min(pool, ad.shape[1])
        neg, pos = jax.lax.top_k(-ad, kd)
        ed, ec = rerank(
            -neg, jnp.take_along_axis(ai, pos, axis=1), d_codes,
            d_norms, lambda i: jnp.take(d_cid, i), d_ext,
        )
        parts_d.append(ed)
        parts_e.append(ec)

    ed = jnp.concatenate(parts_d, axis=1)
    ext_c = jnp.concatenate(parts_e, axis=1)
    neg, pos = jax.lax.top_k(-ed, k)
    ids = jnp.take_along_axis(ext_c, pos, axis=1)
    ids = jnp.where(-neg < MASKED_GUARD, ids, -1)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(-neg, jnp.int32), ids], axis=1
    )


@jax.jit
def _assign_chunked(v, centers):
    """Nearest-center assignment, chunked over rows: the one-shot
    [n, C] distance matrix hit 16 GB at 1M x 4096 clusters (OOMed the
    10M build — one jitted lax.map keeps the block bounded)."""
    cn = jnp.sum(centers * centers, axis=1)
    n = v.shape[0]
    chunk = min(n, 65536)
    nb = -(-n // chunk)
    n_pad = nb * chunk
    if n_pad != n:
        v = jnp.pad(v, ((0, n_pad - n), (0, 0)))

    def one(b):
        vv = jax.lax.dynamic_slice_in_dim(v, b * chunk, chunk)
        ip = jax.lax.dot_general(
            vv, centers, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.argmin(cn[None, :] - 2.0 * ip, axis=1).astype(
            jnp.int32
        )

    out = jax.lax.map(one, jnp.arange(nb, dtype=jnp.int32))
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
def _delta_append(codes, norms, valid, cids, exts, nc, nn, ncid, next_, row):
    n = nc.shape[0]
    codes = jax.lax.dynamic_update_slice(codes, nc, (row, 0))
    norms = jax.lax.dynamic_update_slice(norms, nn, (row,))
    valid = jax.lax.dynamic_update_slice(
        valid, jnp.ones((n,), bool), (row,)
    )
    cids = jax.lax.dynamic_update_slice(cids, ncid, (row,))
    exts = jax.lax.dynamic_update_slice(exts, next_, (row,))
    return codes, norms, valid, cids, exts


class SQ8ResidualIndex(SQ8Index):
    """SQ8 with k-means mean-centering (index kind "sq8r").

    Codes store `v - center(cluster(v))` under a GLOBAL per-dim affine
    over residuals, plus one cluster id per row. On clustered corpora
    the residual range is the intra-cluster noise, not the corpus
    spread — the quantization step shrinks by the spread ratio, which
    is the fix for the global-affine ceiling (recall@10 ~0.944 at 1M
    clustered, CLAUDE.md) at ~1 byte/dim-row.

    Physical layout (round 5): MAIN region cluster-grouped so every
    128-row lane group is single-cluster — the fused int8 kernel then
    takes the -2*q.center[cid] term as a per-group input — plus an
    append-order DELTA region merged by XLA scan; device-side relayout
    folds delta into main past main/4. External row ids stay stable
    via the slot map (reference counterpart: location remapping,
    types/location_store.go; quantized kernels sq8.go:37)."""

    N_CLUSTERS = 1024
    TRAIN_SAMPLE = 131_072
    DELTA_MIN = 4096

    def __init__(self, dim: int, metric: str = Metric.L2,
                 n_clusters: int = 0):
        super().__init__(dim, metric)
        self.n_clusters = n_clusters or self.N_CLUSTERS
        self.centers: Optional[jax.Array] = None  # [C, D] f32
        # main region (device)
        self.m_codes = jnp.zeros((0, dim), jnp.int8)
        self.m_gcid = jnp.zeros((0,), jnp.int32)
        self.m_norms = jnp.zeros((0,), jnp.float32)
        self.m_valid = jnp.zeros((0,), bool)
        self.m_ext = jnp.zeros((0,), jnp.int32)
        # delta region (device)
        self.d_codes: Optional[jax.Array] = None
        self.d_cid: Optional[jax.Array] = None
        self.d_norms: Optional[jax.Array] = None
        self.d_valid: Optional[jax.Array] = None
        self.d_ext: Optional[jax.Array] = None
        self.d_count = 0
        self.m_live = 0
        self.m_onehot: Optional[jax.Array] = None
        # delta folds into main past max(rebuild_min, m_live/4)
        # (tests lower rebuild_min to exercise relayouts at toy sizes)
        self.rebuild_min = SQ8R_TILE
        # host slot map: ext -> main slot (>=0) | delta (-2 - slot) | -1
        self._slot = np.empty(0, np.int64)

    # -- geometry -----------------------------------------------------

    @property
    def capacity(self) -> int:
        """EXTERNAL row capacity (Dataset sizes columns/masks by it)."""
        cap = MIN_CAPACITY
        while cap < self.count:
            cap *= 2
        return cap

    def _ext_grow(self, need: int) -> None:
        if len(self._slot) < need:
            cap = max(MIN_CAPACITY, len(self._slot))
            while cap < need:
                cap *= 2
            ns = np.full(cap, -1, np.int64)
            ns[: len(self._slot)] = self._slot
            self._slot = ns

    def _delta_grow(self, need: int) -> None:
        cap = self.DELTA_MIN if self.d_codes is None else self.d_codes.shape[0]
        while cap < need:
            cap *= 2
        if self.d_codes is None:
            self.d_codes = jnp.zeros((cap, self.dim), jnp.int8)
            self.d_cid = jnp.zeros((cap,), jnp.int32)
            self.d_norms = jnp.zeros((cap,), jnp.float32)
            self.d_valid = jnp.zeros((cap,), bool)
            self.d_ext = jnp.full((cap,), -1, jnp.int32)
        elif cap > self.d_codes.shape[0]:
            pad = cap - self.d_codes.shape[0]
            self.d_codes = jnp.pad(self.d_codes, ((0, pad), (0, 0)))
            self.d_cid = jnp.pad(self.d_cid, (0, pad))
            self.d_norms = jnp.pad(self.d_norms, (0, pad))
            self.d_valid = jnp.pad(self.d_valid, (0, pad))
            self.d_ext = jnp.pad(
                self.d_ext, (0, pad), constant_values=-1
            )

    # -- training -----------------------------------------------------

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
        res = sample - jnp.take(self.centers, self._assign(sample), axis=0)
        self.lo = jnp.min(res, axis=0)
        self.hi = jnp.max(res, axis=0)

    def _assign(self, v: jax.Array) -> jax.Array:
        return _assign_chunked(v, self.centers)

    # -- mutation -----------------------------------------------------

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
        with self._mu:
            ext = np.arange(self.count, self.count + n, dtype=np.int64)
            self._ext_grow(self.count + n)
            self._delta_grow(self.d_count + n)
            self.d_codes, self.d_norms, self.d_valid, self.d_cid, self.d_ext = (
                _delta_append(
                    self.d_codes, self.d_norms, self.d_valid,
                    self.d_cid, self.d_ext,
                    codes, norms, cid,
                    jnp.asarray(ext, jnp.int32), self.d_count,
                )
            )
            self._slot[ext] = -2 - (self.d_count + np.arange(n))
            self.d_count += n
            self.count += n
            if self.d_count >= max(self.rebuild_min, self.m_live // 4):
                self._rebuild_layout()
        return ext

    def _rebuild_layout(self) -> None:
        """Fold delta into a fresh cluster-grouped main region (one
        device program; see _relayout)."""
        ext_cap = len(self._slot) or MIN_CAPACITY
        if self.d_codes is None:
            self._delta_grow(1)
        new_cap = pad_to(
            max(
                int(_cluster_padded_total(
                    self.m_gcid, self.m_valid, self.d_cid,
                    self.d_valid, n_clusters=self.n_clusters,
                )),
                GROUP,
            ),
            SQ8R_TILE,
        )
        (self.m_codes, self.m_gcid, self.m_norms, self.m_valid,
         self.m_ext, inv) = _relayout(
            self.m_codes, self.m_gcid, self.m_norms, self.m_valid,
            self.m_ext,
            self.d_codes, self.d_cid, self.d_norms, self.d_valid,
            self.d_ext,
            n_clusters=self.n_clusters, new_cap=new_cap,
            ext_cap=ext_cap,
        )
        inv_np = np.asarray(inv).astype(np.int64)
        slot = np.full(len(self._slot), -1, np.int64)
        slot[: len(inv_np)] = inv_np
        self._slot = slot
        self.m_live = int((inv_np >= 0).sum())
        # group-term onehot [C, G] f32 for the search fold — measured
        # SLOWER than the [B,G] gather at 1M (18.0 vs 15.4 ms: the
        # HIGHEST 6-pass matmul costs more than the gather saves), so
        # opt-in only (LONGBOW_SQ8R_ONEHOT_MB=128 to enable)
        budget = int(
            os.environ.get("LONGBOW_SQ8R_ONEHOT_MB", "0")
        ) * (1 << 20)
        G = new_cap // GROUP
        if self.n_clusters * G * 4 <= budget:
            self.m_onehot = (
                self.m_gcid[None, :]
                == jnp.arange(self.n_clusters, dtype=jnp.int32)[:, None]
            ).astype(jnp.float32)
        else:
            self.m_onehot = None
        # reset delta
        self.d_codes = self.d_cid = None
        self.d_norms = self.d_valid = self.d_ext = None
        self.d_count = 0
        self._delta_grow(1)

    def delete_rows(self, rows: np.ndarray) -> None:
        if not len(rows):
            return
        rows = np.asarray(rows, np.int64)
        with self._mu:
            sl = self._slot[rows]
            main = sl[sl >= 0]
            delta = -2 - sl[sl <= -2]
            if len(main):
                self.m_valid = tombstone_rows(self.m_valid, main)
                self.m_live -= len(main)
            if len(delta):
                self.d_valid = tombstone_rows(self.d_valid, delta)
            self._slot[rows] = -1

    # -- search -------------------------------------------------------

    def search(
        self, queries, k: int, *, filter_mask=None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.m_codes.shape[0] == 0 and self.d_count == 0:
            b = q.shape[0]
            return (
                np.full((b, k), float(MASKED), np.float32),
                np.full((b, k), -1, np.int64),
            )
        normalize = self.metric == Metric.COSINE
        metric = Metric.L2 if normalize else self.metric
        fused = (
            _on_tpu()
            and metric != Metric.DOT
            and os.environ.get("LONGBOW_SQ8_FUSED", "1") != "0"
        )
        b = q.shape[0]
        k_pad = 16 if k <= 16 else pad_to(k, 64)
        if k_pad > 64:
            fused = False  # kernel pool caps at 64 with rerank
        b_pad = _bucket_batch(b) if fused else b
        if b_pad != b:
            q = np.pad(q, ((0, b_pad - b), (0, 0)))
        mask = None
        if filter_mask is not None:
            # indexed by EXTERNAL row; the packed jit bounds-checks its
            # gathers (no eager pad dispatches on the serving path)
            mask = jnp.asarray(filter_mask)
        chunk = min(b_pad, 4096)
        with self._mu:
            if self.d_codes is None:
                self._delta_grow(1)
            packs = [
                _sq8r_packed(
                    jnp.asarray(q[off : off + chunk]),
                    self.m_codes, self.m_gcid, self.m_norms,
                    self.m_valid, self.m_ext,
                    self.d_codes, self.d_cid, self.d_norms,
                    self.d_valid, self.d_ext,
                    self.centers, self.lo, self.hi, mask,
                    min(k_pad, 64) if fused else k_pad, metric,
                    normalize, fused, self.d_count > 0,
                    self.m_onehot,
                    # bf16 group term by default: halves the side-input
                    # HBM read; recall measured IDENTICAL to f32 once
                    # the group interleave landed (0.9592 vs 0.9594 at
                    # 1M — the earlier 1.4% loss was the layout
                    # collision, not gt precision). =0 opts back to f32.
                    os.environ.get("LONGBOW_SQ8R_GT_BF16", "1") != "0",
                )
                for off in range(0, b_pad, chunk)
            ]
        kk = min(k_pad, 64) if fused else k_pad
        flat = np.concatenate([np.asarray(p) for p in packs])
        dd = np.ascontiguousarray(flat[:, :kk]).view(np.float32)
        ii = flat[:, kk:]
        _count_dispatch("pallas_sq8r_fused" if fused else "xla")
        dd, ii = dd[:b, :k], ii[:b, :k]
        if normalize:
            dd = cosine_report(dd)
        return dd, ii

    # -- reads --------------------------------------------------------

    def _dequant_rows(self, codes: jax.Array, cid: jax.Array) -> jax.Array:
        scale, lo_eff = _affine(self.lo, self.hi)
        res = codes.astype(jnp.float32) * scale[None, :] + lo_eff[None, :]
        return res + jnp.take(self.centers, cid, axis=0)

    def _dequant(self, codes: jax.Array) -> jax.Array:
        raise NotImplementedError("use get_vectors")

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        r = np.asarray(rows, np.int64)
        sl = self._slot[r]
        out = np.zeros((len(r), self.dim), np.float32)
        main = sl >= 0
        delta = sl <= -2
        if main.any():
            s = jnp.asarray(sl[main])
            out[main] = np.asarray(
                self._dequant_rows(
                    jnp.take(self.m_codes, s, axis=0),
                    jnp.take(self.m_gcid, s // GROUP),
                )
            )
        if delta.any():
            s = jnp.asarray(-2 - sl[delta])
            out[delta] = np.asarray(
                self._dequant_rows(
                    jnp.take(self.d_codes, s, axis=0),
                    jnp.take(self.d_cid, s),
                )
            )
        return out

    # -- persistence --------------------------------------------------

    def export_state(self) -> dict:
        with self._mu:
            n = self.count
            codes = np.zeros((n, self.dim), np.int8)
            cids = np.zeros((n,), np.int32)
            valid = np.zeros((n,), bool)
            sl = self._slot[:n]
            main = sl >= 0
            delta = sl <= -2
            if main.any():
                s = jnp.asarray(sl[main])
                codes[main] = np.asarray(jnp.take(self.m_codes, s, axis=0))
                cids[main] = np.asarray(jnp.take(self.m_gcid, s // GROUP))
                valid[main] = True
            if delta.any():
                s = jnp.asarray(-2 - sl[delta])
                codes[delta] = np.asarray(jnp.take(self.d_codes, s, axis=0))
                cids[delta] = np.asarray(jnp.take(self.d_cid, s))
                valid[delta] = True
            return {
                "kind": "sq8r",
                "dim": self.dim,
                "metric": self.metric,
                "count": n,
                "lo": np.asarray(self.lo),
                "hi": np.asarray(self.hi),
                "centers": np.asarray(self.centers),
                "codes": codes,
                "codes_centered": True,
                "cluster_ids": cids,
                "valid": valid,
            }

    @classmethod
    def import_state(cls, st: dict) -> "SQ8ResidualIndex":
        idx = cls(st["dim"], st["metric"])
        idx.centers = jnp.asarray(st["centers"])
        idx.n_clusters = idx.centers.shape[0]
        idx.lo = jnp.asarray(st["lo"])
        idx.hi = jnp.asarray(st["hi"])
        n = st["count"]
        if n:
            codes = jnp.asarray(cls._import_codes(st))
            cid = jnp.asarray(np.asarray(st["cluster_ids"], np.int32))
            deq = idx._dequant_rows(codes, cid)
            norms = jnp.sum(deq * deq, axis=1)
            valid_np = np.asarray(st["valid"], bool)
            ext = np.arange(n, dtype=np.int64)
            idx._ext_grow(n)
            idx._delta_grow(n)
            idx.d_codes, idx.d_norms, idx.d_valid, idx.d_cid, idx.d_ext = (
                _delta_append(
                    idx.d_codes, idx.d_norms, idx.d_valid, idx.d_cid,
                    idx.d_ext,
                    codes, norms, cid, jnp.asarray(ext, jnp.int32), 0,
                )
            )
            idx._slot[ext] = -2 - ext
            idx.d_count = n
            idx.count = n
            dead = ext[~valid_np]
            if len(dead):
                idx.delete_rows(dead)
            idx._rebuild_layout()
        return idx
