"""Flat (brute-force exact) index over device-resident vector blocks.

The TPU equivalent of the reference's `BruteForceIndex` inside
`AdaptiveIndex` (reference: adaptive_index.go:59,161-227): instead of a
max-heap over batch distances on CPU threads, the whole corpus lives in
HBM as one padded [cap, D] array and every query batch is a fused
MXU scan (ops/pallas_scan.py) with streaming top-k.

Growth strategy: capacity doubles; append is a jitted
dynamic_update_slice with buffer donation so no 2x HBM spike occurs
(the reference has the same concern during migration,
docs/autoshard.md:30-33).
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
    MASKED_GUARD,
    Metric,
    exact_search,
    pad_to,
    tombstone_rows,
)
from longbow_tpu.ops.pallas_scan import (
    coarse_flat_search_rerank,
    flat_search_rerank,
    fused_flat_search,
)

MIN_CAPACITY = 4096


@functools.partial(
    jax.jit, donate_argnums=(0, 1), static_argnames=("block_rows",)
)
def _coarse_update(codes, cnorms, lo, hi, vectors, row, block_rows):
    """Quantize a freshly-ingested block (read back from the stored
    corpus, so codes approximate exactly what the re-rank reads) into
    the coarse int8 shadow — donated in-place updates."""
    stored_f32 = jax.lax.dynamic_slice_in_dim(
        vectors, row, block_rows
    ).astype(jnp.float32)
    scale = jnp.maximum(hi - lo, 1e-12)
    qv = jnp.round((stored_f32 - lo) / scale * 255.0)
    s8 = (jnp.clip(qv, 0.0, 255.0) - 128.0).astype(jnp.int8)
    s255 = scale / 255.0
    deq = s8.astype(jnp.float32) * s255[None, :] + (
        lo + 128.0 * s255
    )[None, :]
    nn = jnp.sum(deq * deq, axis=1)
    codes = jax.lax.dynamic_update_slice(codes, s8, (row, 0))
    cnorms = jax.lax.dynamic_update_slice(cnorms, nn, (row,))
    return codes, cnorms


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _coarse_train(vectors, row, block_rows):
    """Per-dim affine from the first ingested block, widened 10% for
    drift headroom (later rows outside the range clip — coarse-pass
    noise only, the exact re-rank corrects ranking)."""
    v = jax.lax.dynamic_slice_in_dim(
        vectors, row, block_rows
    ).astype(jnp.float32)
    lo = jnp.min(v, axis=0)
    hi = jnp.max(v, axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    return lo - 0.05 * span, hi + 0.05 * span


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "normalize")
)
def _coarse_packed(
    queries, corpus, codes, lo, hi, cnorms, valid, k, metric,
    extra_mask, normalize,
):
    """Coarse int8 scan + exact bf16 re-rank, packed [B, 2k] (one
    fetch round trip — same convention as _fused_packed)."""
    d, i = coarse_flat_search_rerank(
        queries, corpus, codes, lo, hi, cnorms, valid, k, metric,
        pool=64, extra_mask=extra_mask, normalize=normalize,
    )
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(d, jnp.int32), i], axis=1
    )


def _count_dispatch(implementation: str) -> None:
    """Which scan backend served the query (reference:
    longbow_simd_dispatch_total{implementation} — the trace-time jit
    analogue of the reference's SIMD dispatch registry)."""
    try:
        from longbow_tpu.metrics import get_registry

        get_registry().inc(
            "longbow_simd_dispatch_total", implementation=implementation
        )
    except Exception:
        pass


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


@functools.partial(
    jax.jit, donate_argnums=(0, 1, 2), static_argnames=("normalize",)
)
def _ingest_block(vectors, norms, valid, new_f32, row, n, normalize):
    """One fused append: normalize (cosine) + round to storage dtype +
    |v|^2 of the ROUNDED rows + in-place writes (donated buffers).

    ONE dispatch per batch — the previous eager chain (device_put,
    normalize, astype x2, norms, update) cost ~6 host round trips
    (~30ms each through the axon relay; ~23ms/batch even on CPU).

    `row`/`n` are traced scalars; new_f32 may be PADDED past n (batch
    shapes are bucketed to limit recompiles) — padding rows get
    written but their valid bits stay False, and the next append
    overwrites them (capacity is pre-grown past row + padded length).
    """
    if normalize:
        new_f32 = new_f32 / jnp.maximum(
            jnp.linalg.norm(new_f32, axis=1, keepdims=True), 1e-30
        )
    stored = new_f32.astype(vectors.dtype)
    # norms of the STORED (rounded) dtype: exact-f32 norms paired
    # with bf16 inner products bias distances by 2*v.dv per row
    # (~5% recall@10 at 1M, measured on-chip)
    sf = stored.astype(jnp.float32)
    new_norms = jnp.sum(sf * sf, axis=-1)
    vectors = jax.lax.dynamic_update_slice(vectors, stored, (row, 0))
    norms = jax.lax.dynamic_update_slice(norms, new_norms, (row,))
    nv = jnp.arange(new_f32.shape[0]) < n
    valid = jax.lax.dynamic_update_slice(valid, nv, (row,))
    return vectors, norms, valid


def _native_lib():
    from longbow_tpu.storage.native import get_lib

    return get_lib()


def _bucket_rows(n: int) -> int:
    """Pad append shapes to powers of two (min 256; multiples of 256k
    past 256k) so flushes share compiled programs. NEVER let a jitted
    program's input shapes track the row count exactly (CLAUDE.md: the
    n//16 entry sample recompiled insert_batch per add — 214 vs 3462
    inserts/s; exact-shape stage flushes put 1s compiles on the p99)."""
    if n > 262144:
        return -(-n // 262144) * 262144
    b = 256
    while b < n:
        b *= 2
    return b


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "normalize")
)
def _fused_packed(queries, vectors, norms, valid, k, metric, extra_mask, normalize):
    """Fused scan + exact re-rank returning ONE packed array [B, 2k]
    (distances then bitcast row ids): a single fetch round trip.

    pool is pinned to 64: the streaming-top-k kernel's scoped-VMEM
    footprint grows with its k and 128 exceeds the 16MB limit on v5e
    (measured: k=64 compiles, k=128 OOMs at any tile size).

    The pack is int32 with the distances bitcast INTO it — never the
    other way around: int rows bitcast to f32 are denormals and get
    flushed to zero on TPU (measured: every returned row id was 0)."""
    d, i = flat_search_rerank(
        queries, vectors, norms, valid, k, metric,
        pool=64,
        extra_mask=extra_mask, normalize=normalize,
    )
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(d, jnp.int32), i], axis=1
    )


class FlatIndex:
    """Exact k-NN index: one padded device block + validity mask.

    dtype: storage dtype (jnp.float32 or jnp.bfloat16). bf16 halves HBM
    traffic for ~0.99 recall@10 (the reference's fp16 mode,
    docs/vectorsearch.md:137-145).
    """

    # add() takes a list of [n, dim] np blocks without an up-front
    # concatenate (the staging-buffer fill is the merge point)
    accepts_blocks = True

    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        dtype=jnp.float32,
        capacity: int = MIN_CAPACITY,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        self.dtype = dtype
        self.count = 0
        # capacity rides the SAME doubling series organic growth
        # produces (MIN_CAPACITY * 2^k): the fused kernel compiles per
        # corpus shape, and an arbitrary pre-size creates a fresh
        # Mosaic shape per dataset — measured 990s compiling for a
        # 300k pre-size (303104 rows) while the power-of-two shapes
        # are one compile ever, shared across datasets and restarts
        # via the persistent cache
        cap = MIN_CAPACITY
        while cap < capacity:
            cap *= 2
        self.vectors = jnp.zeros((cap, dim), dtype=dtype)
        self.norms_sq = jnp.zeros((cap,), dtype=jnp.float32)
        self.valid = jnp.zeros((cap,), dtype=bool)
        # host staging: np appends accumulate here and flush to device
        # in large amortized blocks (one jit per ~count/8 rows) — a
        # per-put device write rewrites the whole corpus buffer on
        # backends without donation and costs a dispatch everywhere
        # (reference analogue: applyBatchToMemory + async index jobs,
        # store_actions.go:813 — memtable first, index work deferred)
        self._device_count = 0
        self._stage_buf: Optional[np.ndarray] = None
        self._stage_rows = 0
        self._stage_dead: list[int] = []
        # host scan mirror: DoGet table scans read host RAM instead of
        # a device->host gather (measured ~6 MB/s through the device
        # relay vs GB/s np fancy-indexing; the reference serves scans
        # from its host-resident Arrow memtable). Stored as bf16 bits
        # in uint16 via a vectorized round-to-nearest-even add+shift —
        # numpy's f32->f16 cast is a SCALAR loop that profiled at 28%
        # of the ingest apply thread, and bf16 makes mirror reads
        # bit-identical to the device's bf16 storage. Maintained from
        # the host-side bytes ingest already holds (one memcpy, no
        # device IO); device-array appends can't feed it without a
        # fetch, so they disable it and scans fall back to the device
        # path. LONGBOW_SCAN_MIRROR=0 opts out (halves host RAM use).
        self._mirror_enabled = (
            os.environ.get("LONGBOW_SCAN_MIRROR", "1") != "0"
        )
        # mirror representation tracks the device storage dtype so
        # mirror reads never change scan precision: bf16 bits for bf16
        # storage, f16 for f16-preserving datasets, f32 otherwise
        if dtype == jnp.bfloat16:
            self._mirror_np_dtype = np.dtype(np.uint16)
        elif dtype == jnp.float16:
            self._mirror_np_dtype = np.dtype(np.float16)
        else:
            self._mirror_np_dtype = np.dtype(np.float32)
        self._host_mirror: Optional[np.ndarray] = None  # [cap, dim]
        # staging presize hint: the stage buffer is handed off to jax
        # after every flush, so without the hint each cycle re-grows
        # 16k->262k, re-copying the staged prefix at every doubling
        # (profiled at ~19% of the apply thread)
        self._stage_hint = 0
        # coarse int8 shadow (round 5): sq8-style codes beside the
        # bf16 storage halve the scan's HBM read; the pool re-ranks
        # exactly against bf16 (recall measured identical, 0.9852 at
        # 1M; tombstones/filters leak-free). OPT-IN
        # (LONGBOW_FLAT_COARSE=1): measured end-to-end it is 0.96x
        # the bf16 path at 1M x 128 — the lane-candidate kernel is
        # COMPUTE-bound on v5e, so the halved read doesn't pay for the
        # in-kernel i8->bf16 convert + the extra rerank gather
        # (benchmarks/coarse_flat_1M.json). Kept for configs that go
        # HBM-bound and as the int8-MXU stepping stone.
        self._coarse_enabled = (
            dtype == jnp.bfloat16
            and os.environ.get("LONGBOW_FLAT_COARSE", "0") == "1"
            and _on_tpu()
        )
        self._coarse_codes: Optional[jax.Array] = None
        self._coarse_norms: Optional[jax.Array] = None
        self._coarse_lo: Optional[jax.Array] = None
        self._coarse_hi: Optional[jax.Array] = None
        # Dispatch lock: appends DONATE the corpus buffers, and a
        # concurrent search that grabbed the old reference dispatches
        # against a deleted buffer ("Buffer has been deleted or
        # donated"). Serializing DISPATCH (not the device compute or
        # the result fetch) is sufficient: executions on a device run
        # in dispatch order, and a read execution dispatched before
        # the donating one holds its own buffer reference.
        self._mu = threading.RLock()

    # -- properties ---------------------------------------------------

    @property
    def capacity(self) -> int:
        """Row capacity AFTER the pending stage flushes — masks and
        metadata columns sized against this stay consistent across the
        flush that the next search triggers."""
        needed = self._device_count + (
            _bucket_rows(self._stage_rows) if self._stage_rows else 0
        )
        cap = self.vectors.shape[0]
        while cap < needed:
            cap *= 2
        return cap

    def __len__(self) -> int:
        return self.count

    # -- mutation -----------------------------------------------------

    def _grow_to(self, need: int) -> None:
        cur = self.vectors.shape[0]
        new_cap = cur
        while new_cap < need:
            new_cap *= 2
        if new_cap == cur:
            return
        pad = new_cap - cur
        self.vectors = jnp.pad(self.vectors, ((0, pad), (0, 0)))
        self.norms_sq = jnp.pad(self.norms_sq, (0, pad))
        self.valid = jnp.pad(self.valid, (0, pad))

    def add(self, vecs) -> np.ndarray:
        """Append vectors; returns the assigned internal row ids.

        np input: rows land in the host stage (a memcpy) and flush to
        device in amortized blocks — ONE jitted program (normalize +
        round + norms + update fused) per ~count/8 rows. jax-array
        input: device fast path, exact shape (bulk loads — no
        re-upload, one compile per distinct shape).
        """
        with self._mu:
            return self._add_locked(vecs)

    def _add_locked(self, vecs) -> np.ndarray:
        if isinstance(vecs, jax.Array):
            if vecs.ndim != 2 or vecs.shape[1] != self.dim:
                raise ValueError(
                    f"expected [n, {self.dim}] vectors, got {vecs.shape}"
                )
            self.flush()
            # device-origin rows never pass through host RAM; feeding
            # the mirror would cost the very fetch it exists to avoid
            self._mirror_enabled = False
            self._host_mirror = None
            n = vecs.shape[0]
            self._grow_to(self.count + n)
            self.vectors, self.norms_sq, self.valid = _ingest_block(
                self.vectors, self.norms_sq, self.valid,
                vecs.astype(jnp.float32), self.count, n,
                self.metric == Metric.COSINE,
            )
            self._coarse_after(self.count, n)
            rows = np.arange(self.count, self.count + n, dtype=np.int64)
            self.count += n
            self._device_count = self.count
            return rows
        # list-of-blocks input: the coalescing ingest queue hands the
        # merged group's blocks straight through so the ONLY host copy
        # of the payload is the staging-buffer fill below (profiled:
        # the queue-side np.concatenate re-copied every ingested byte,
        # ~18% of apply-thread wall under sustained DoPut load)
        blocks = vecs if isinstance(vecs, list) else [vecs]
        blocks = [
            np.ascontiguousarray(b, dtype=np.float32) for b in blocks
        ]
        for b in blocks:
            if b.ndim != 2 or b.shape[1] != self.dim:
                raise ValueError(
                    f"expected [n, {self.dim}] vectors, got {b.shape}"
                )
        n = sum(b.shape[0] for b in blocks)
        rows = np.arange(self.count, self.count + n, dtype=np.int64)
        # stage straight into a bucketed-size buffer: flush then slices
        # it with the pad region already zero — the old list-of-blocks
        # staging paid an np.concatenate + np.pad (a full extra copy of
        # every staged block, 1.5s of a 5.2s 300k-row apply)
        need = self._stage_rows + n
        buf = self._stage_buf
        if buf is None or buf.shape[0] < need:
            # geometric growth (and always >= the flush-slice bucket):
            # _bucket_rows alone grows linearly past 256k, re-copying
            # the whole staged prefix on every boundary — quadratic
            old_rows = buf.shape[0] if buf is not None else 0
            new_rows = _bucket_rows(
                max(need, 2 * old_rows, self._stage_hint, 16384)
            )
            new = np.zeros((new_rows, self.dim), np.float32)
            if self._stage_rows:
                new[: self._stage_rows] = buf[: self._stage_rows]
            self._stage_buf = buf = new
        off = self._stage_rows
        for b in blocks:
            buf[off : off + b.shape[0]] = b
            off += b.shape[0]
        self._stage_rows = need
        self.count += n
        # flush interval scales with the corpus: on backends without
        # buffer donation (CPU) a flush copies the WHOLE device block,
        # so count/4 bounds the amortized copy cost at 4 copies/row.
        # On TPU donation makes the flush a true in-place update, so
        # CAP the interval there: an uncapped count/4 threshold let the
        # stage grow to 1M+ rows at a 5M corpus and its doubling-growth
        # prefix copies (512MB+ host memcpy) dominated the apply thread
        # (profiled at 67% under sustained ingest)
        limit = max(16384, self._device_count // 4)
        if _on_tpu():
            limit = min(limit, 262144)  # one _bucket_rows granule
        if self._stage_rows >= limit:
            self.flush()
        return rows

    def _coarse_after(self, row: int, block_rows: int) -> None:
        """Maintain the coarse int8 shadow for rows [row, row+block)
        just written into self.vectors (train-on-first-block affine)."""
        if not self._coarse_enabled or block_rows <= 0:
            return
        try:
            cap = self.vectors.shape[0]
            if self._coarse_lo is None:
                self._coarse_lo, self._coarse_hi = _coarse_train(
                    self.vectors, row, block_rows
                )
            if self._coarse_codes is None:
                self._coarse_codes = jnp.zeros((cap, self.dim), jnp.int8)
                self._coarse_norms = jnp.zeros((cap,), jnp.float32)
            elif self._coarse_codes.shape[0] < cap:
                pad = cap - self._coarse_codes.shape[0]
                self._coarse_codes = jnp.pad(
                    self._coarse_codes, ((0, pad), (0, 0))
                )
                self._coarse_norms = jnp.pad(self._coarse_norms, (0, pad))
            self._coarse_codes, self._coarse_norms = _coarse_update(
                self._coarse_codes, self._coarse_norms,
                self._coarse_lo, self._coarse_hi, self.vectors, row,
                block_rows,
            )
        except Exception:
            # the shadow is an accelerator: any failure disables it
            # rather than failing the write path
            self._coarse_enabled = False
            self._coarse_codes = self._coarse_norms = None

    def flush(self) -> None:
        """Apply staged host rows to the device block (one fused jit;
        tombstones recorded while staged apply after)."""
        with self._mu:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._stage_rows:
            return
        n = self._stage_rows
        n_pad = _bucket_rows(n)
        block = self._stage_buf[:n_pad]
        self._grow_to(self._device_count + n_pad)
        self.vectors, self.norms_sq, self.valid = _ingest_block(
            self.vectors, self.norms_sq, self.valid,
            block, self._device_count, n,
            self.metric == Metric.COSINE,
        )
        self._coarse_after(self._device_count, n_pad)
        # HAND THE BUFFER OFF only AFTER a successful dispatch: jax
        # zero-copy-aliases host f32 arrays on CPU and executes
        # asynchronously, so reusing this buffer for the next fill
        # overwrites data an in-flight ingest still reads (measured:
        # every chunk stored the NEXT chunk's vectors at 1M x 128).
        # Nulling BEFORE the dispatch poisoned the index forever if
        # _grow_to/_ingest_block raised (wedged relay, device OOM) —
        # staged rows must stay retryable. Fresh zeros() per cycle is
        # lazy kernel pages, far cheaper than the old concat+pad.
        if self._mirror_enabled:
            rows_f = block[:n]
            if self.metric == Metric.COSINE:
                nr = np.linalg.norm(rows_f, axis=1, keepdims=True)
                rows_f = rows_f / np.maximum(nr, 1e-30)
            self._mirror_put(self._device_count, rows_f)
        self._stage_hint = self._stage_buf.shape[0]
        self._stage_buf = None
        self._device_count += n
        self._stage_rows = 0
        if self._stage_dead:
            self.valid = tombstone_rows(
                self.valid, np.asarray(self._stage_dead), donate=True
            )
            self._stage_dead = []

    def _mirror_put(self, row: int, rows_f32: np.ndarray) -> None:
        cap = self.vectors.shape[0]
        md = self._mirror_np_dtype
        m = self._host_mirror
        if m is None or m.shape[0] < cap:
            nm = np.zeros((cap, self.dim), md)
            if m is not None:
                nm[: m.shape[0]] = m
            self._host_mirror = m = nm
        if md == np.uint16:
            # f32 -> bf16 bits, round-to-nearest-even (same rounding
            # XLA applies storing the device block, so mirror reads
            # are bit-identical to device reads). Single C pass
            # releasing the GIL: the numpy expression for this
            # allocated ~5 block-sized temporaries and profiled at 45%
            # of the apply thread; numpy's f32->f16 cast is worse (a
            # scalar loop, 28% before the bf16 switch).
            src = np.ascontiguousarray(rows_f32, np.float32)
            dst = m[row : row + len(src)]
            lib = _native_lib()
            if lib is not None:
                lib.lb_f32_to_bf16(
                    src.ctypes.data, dst.ctypes.data, src.size
                )
            else:
                u = src.view(np.uint32)
                t = u >> np.uint32(16)
                t &= np.uint32(1)
                t += np.uint32(0x7FFF)
                t += u
                t >>= np.uint32(16)
                # NaN stays NaN (bare RNE carries a small-payload NaN
                # into Inf); canonical sign|0x7FC0 like XLA/Eigen
                nan = ((u & np.uint32(0x7F800000)) == np.uint32(0x7F800000)) \
                    & ((u & np.uint32(0x007FFFFF)) != 0)
                if nan.any():
                    t = np.where(
                        nan,
                        ((u >> np.uint32(16)) & np.uint32(0x8000))
                        | np.uint32(0x7FC0),
                        t,
                    )
                dst[:] = t.astype(np.uint16)
        else:
            m[row : row + len(rows_f32)] = rows_f32

    def adopt_mirror(self, rows_m: np.ndarray) -> None:
        """Install a prebuilt mirror block for rows [0, n) — same
        representation as mirror_rows returns (compaction carries the
        old index's mirror over with one np gather so the rebuilt
        dataset keeps host-RAM scans)."""
        if os.environ.get("LONGBOW_SCAN_MIRROR", "1") == "0":
            return  # operator opted out of host mirrors entirely
        if rows_m.dtype != self._mirror_np_dtype:
            return  # dtype changed across the rebuild: let scans
            # fall back to the device path rather than mix precisions
        if not self._mirror_enabled:
            self._mirror_enabled = True
        cap = self.vectors.shape[0]
        nm = np.zeros((cap, self.dim), self._mirror_np_dtype)
        nm[: len(rows_m)] = rows_m
        self._host_mirror = nm

    def mirror_rows(self, rows: np.ndarray) -> Optional[np.ndarray]:
        """Host-mirror gather (bf16 bits in uint16 / f16 / f32 per the
        storage dtype), or None when the mirror is unavailable
        (device-origin rows / opted out)."""
        with self._mu:
            self._flush_locked()
            if not self._mirror_enabled or (
                self._host_mirror is None and self._device_count
            ):
                return None
            if self._host_mirror is None:  # empty index
                return np.zeros(
                    (len(rows), self.dim), self._mirror_np_dtype
                )
            r = np.asarray(rows)
            # contiguous-prefix fast path: a full unfiltered scan asks
            # for rows [off, off+n) in order — serve a zero-copy VIEW
            # instead of a fancy-index copy (the copy was the scan
            # producer's biggest cost: 614MB/scan at 400k x 384).
            # Mirror rows are append-only within an index generation
            # (upserts append + tombstone; compaction swaps the whole
            # index), so a read-only view stays valid.
            if r.size > 1024 and r[0] + r.size - 1 == r[-1]:
                base = int(r[0])
                if np.array_equal(
                    r, np.arange(base, base + r.size, dtype=r.dtype)
                ):
                    return self._host_mirror[base : base + r.size]
            return self._host_mirror[r]

    @staticmethod
    def mirror_to_f32(m: np.ndarray) -> np.ndarray:
        """Decode a mirror block to float32."""
        if m.dtype == np.uint16:  # bf16 bits
            lib = _native_lib()
            if lib is not None:
                src = np.ascontiguousarray(m)
                out = np.empty(m.shape, np.float32)
                # one pass, GIL released (the numpy chain allocated two
                # block-sized temporaries per scan superchunk)
                lib.lb_bf16_to_f32(
                    src.ctypes.data, out.ctypes.data, src.size
                )
                return out
            return (m.astype(np.uint32) << 16).view(np.float32)
        if m.dtype == np.float32:
            return m
        return m.astype(np.float32)

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        """f32 vectors for internal rows — host mirror when available
        (scan hot path), device gather otherwise."""
        m = self.mirror_rows(rows)
        if m is not None:
            return self.mirror_to_f32(m)
        return np.asarray(self.get_vectors_device(rows))

    def get_vectors_device(self, rows) -> jax.Array:
        """Device-resident f32 gather (compaction fast path: the host
        round trip through the relay cost minutes at 2.7M rows and
        held the dataset lock the whole time)."""
        with self._mu:
            self.flush()
            return jnp.take(
                self.vectors, jnp.asarray(rows), axis=0
            ).astype(jnp.float32)

    def delete_rows(self, rows: np.ndarray) -> None:
        """Tombstone internal rows (reference: tombstone bitsets,
        dataset.go:35-102). Rows stay allocated until compaction.
        Rows still in the host stage are tombstoned at flush."""
        if len(rows) == 0:
            return
        rows = np.asarray(rows)
        with self._mu:
            if self._stage_rows:
                staged = rows >= self._device_count
                if staged.any():
                    self._stage_dead.extend(rows[staged].tolist())
                    rows = rows[~staged]
                if len(rows) == 0:
                    return
            self.valid = tombstone_rows(self.valid, rows, donate=True)

    # -- search -------------------------------------------------------

    def search(
        self,
        queries,
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched k-NN -> (dist [B,k] f32, rows [B,k] i32) as numpy.

        filter_mask: optional [capacity] bool of rows allowed by
        metadata predicates; combined with validity/tombstones.

        Serving-latency note: every eager jnp op costs a ~30ms host
        round trip on this platform, so all shaping happens in numpy on
        the host and everything else runs inside ONE jitted program.
        """
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        normalize = self.metric == Metric.COSINE
        # cosine rides the L2 kernel path, NOT dot-on-normalized:
        # ranking by -q.v against normalized-but-ROUNDED storage injects
        # the |v_hat| wobble (+-2^-9 bf16) UN-attenuated into every
        # score, while the l2 form cancels it through the consistent
        # stored-norm term (the same mechanism as the round-2 norms
        # rule). Measured on chip at 1M x 128 bf16 clustered cosine:
        # 0.9389 recall@10 as dot vs 0.9824 as l2 — identical exact-math
        # rankings, so the entire gap is recovered rounding noise.
        # Values are converted to the declared cosine distance
        # (1 - cos = l2^2 / 2 on unit vectors) before returning.
        metric = Metric.L2 if normalize else self.metric

        # Pallas fused path: bf16 corpora only — f32 variants of the
        # fold kernel hit pathological (minutes-long) Mosaic compiles
        # on v5e, and bf16 is the perf-right storage default anyway;
        # f32 serves through the XLA chunked scan (~20% slower).
        # k caps at 64: the kernel's scoped VMEM grows with its k and
        # k=128 exceeds the 16MB limit (k>64 uses the XLA scan).
        if _on_tpu() and k <= 64 and self.dtype == jnp.bfloat16:
            # Fixed kernel shapes: k bucketed to {16, 64} and B to
            # {128, 512, 2048, 4096} (small/odd shapes trigger
            # pathological Mosaic compiles — minutes). Large batches
            # matter: the scan's corpus read amortizes across the
            # batch, so one B=2048 dispatch runs ~6.6x the QPS of 16
            # B=128 ones (round-3 honest timing: 3.8ms/128q vs
            # 5.9ms/2048q at 1M x 128), and B=4096 measures a further
            # +30% over two B=2048 dispatches (round-4 interleaved
            # timing: 17.1ms vs 2x11.2ms, recall unchanged 0.9895).
            # The search coalescer feeds this path batches.
            b = q.shape[0]
            k_pad = 16 if k <= 16 else 64
            for cb in (128, 512, 2048, 4096):
                if b <= cb:
                    b_pad = cb
                    break
            else:
                b_pad = -(-b // 4096) * 4096
            if b_pad != b:
                q = np.pad(q, ((0, b_pad - b), (0, 0)))
            chunk = min(b_pad, 4096)
            with self._mu:  # dispatch under the lock, fetch outside
                self._flush_locked()
                coarse = self._coarse_codes is not None
                if coarse:
                    # int8 coarse scan + exact bf16 re-rank: half the
                    # corpus HBM read (measured 1.24x kernel QPS at
                    # 1M x 128; pool-64 holds 0.9984 of true top-10)
                    packs = [
                        _coarse_packed(
                            jnp.asarray(q[off : off + chunk]),
                            self.vectors, self._coarse_codes,
                            self._coarse_lo, self._coarse_hi,
                            self._coarse_norms, self.valid, k_pad,
                            metric, filter_mask, normalize,
                        )
                        for off in range(0, b_pad, chunk)
                    ]
                else:
                    packs = [
                        _fused_packed(
                            jnp.asarray(q[off : off + chunk]),
                            self.vectors,
                            self.norms_sq,
                            self.valid,
                            k_pad,
                            metric,
                            filter_mask,
                            normalize,
                        )
                        for off in range(0, b_pad, chunk)
                    ]
            flat = np.concatenate([np.asarray(p) for p in packs])
            dd = np.ascontiguousarray(flat[:, :k_pad]).view(np.float32)
            ii = flat[:, k_pad:]
            _count_dispatch(
                "pallas_coarse_i8" if coarse else "pallas_fused"
            )
            dd = dd[:b, :k]
            if normalize:  # l2^2 on unit vectors -> 1 - cos
                dd = cosine_report(dd)
            return dd, ii[:b, :k]
        _count_dispatch("xla")
        with self._mu:  # dispatch under the lock, fetch outside
            self._flush_locked()
            d, i = exact_search(
                jnp.asarray(q),
                self.vectors,
                k,
                metric,
                corpus_norms_sq=self.norms_sq,
                valid=self.valid,
                extra_mask=filter_mask,
                normalize=normalize,
                exact_precision=False,
            )
        d = np.asarray(d)
        if normalize:
            d = cosine_report(d)
        return d, np.asarray(i)

    def warm(self) -> None:
        """Compile the serving search program for the current capacity
        bucket WITHOUT holding the dispatch lock across the compile.

        search() dispatches under ``self._mu`` (appends donate the
        corpus buffers, see the lock's comment), so a cold-shape
        compile inside search blocks every concurrent flush for the
        compile's duration — profiled on the 1-core CPU server as the
        warmup thread pinning the ingest apply path behind the lock
        for whole seconds, and on TPU a remote compile holds it for
        ~30s. Warming instead snapshots the (immutable) array refs
        under the lock and dispatches outside it: a concurrent flush
        that donates the snapshot away just fails this best-effort
        pass (the shape-keyed compile is already cached by then; the
        warmer loop retries on its next tick)."""
        normalize = self.metric == Metric.COSINE
        metric = Metric.L2 if normalize else self.metric
        with self._mu:
            vectors, norms, valid = self.vectors, self.norms_sq, self.valid
        try:
            if _on_tpu() and self.dtype == jnp.bfloat16:
                # the single-query serving shape: B buckets to 128,
                # k=10 buckets to 16 (mirrors search()'s padding)
                qp = jnp.asarray(np.zeros((128, self.dim), np.float32))
                p = _fused_packed(
                    qp, vectors, norms, valid, 16, metric, None,
                    normalize,
                )
                np.asarray(p)
            else:
                d, _ = exact_search(
                    jnp.asarray(np.zeros((1, self.dim), np.float32)),
                    vectors, 10, metric, corpus_norms_sq=norms,
                    valid=valid, normalize=normalize,
                    exact_precision=False,
                )
                np.asarray(d)
        except Exception:  # donated-away snapshot: compile still cached
            pass

    # -- state export (persistence hooks) -----------------------------

    def export_state(self) -> dict:
        with self._mu:
            return self._export_locked()

    def _export_locked(self) -> dict:
        self._flush_locked()
        return {
            "kind": "flat",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(jnp.dtype(self.dtype)),
            "count": self.count,
            # f32 in the archive: bf16 ndarrays don't survive np.save
            "vectors": np.asarray(self.vectors[: self.count]).astype(
                np.float32
            ),
            "valid": np.asarray(self.valid[: self.count]),
        }

    @classmethod
    def import_state(cls, state: dict) -> "FlatIndex":
        idx = cls(
            state["dim"],
            state["metric"],
            jnp.dtype(state["dtype"]),
            capacity=max(MIN_CAPACITY, state["count"]),
        )
        if state["count"]:
            idx.add(np.asarray(state["vectors"], dtype=np.float32))
            dead = np.nonzero(~np.asarray(state["valid"]))[0]
            idx.delete_rows(dead)
        return idx
