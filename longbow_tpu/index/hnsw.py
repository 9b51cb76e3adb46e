"""HNSW-capability graph index, TPU-native.

Public semantics match the reference's ArrowHNSW / hnsw2
(reference: arrow_hnsw.go:77-99 defaults M=32, MMax=64, efC=400,
efS=50; SearchVectorsWithBitmap :754; adaptive ef retry :920-947), but
the machinery is the flat fixed-fanout graph of index/graph.py built
with batched functional inserts (index/graph_build.py) — no hierarchy,
no locks, no per-query heaps. See graph.py's module docstring for why.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.graph import (
    GraphState,
    beam_search,
    graph_init,
    pq_decode,
)
from longbow_tpu.index.graph_build import bulk_build_edges, insert_batch
from longbow_tpu.ops.distance import (
    cosine_report,
    MASKED,
    MASKED_GUARD,
    Metric,
    pad_to,
    squared_norms,
    tombstone_rows,
)

# capacity granularity must be a multiple of the bulk builder's block
# (8192): otherwise bulk_build_rp's n_pad lands past the capacity and
# it must materialize a padded COPY of vectors/norms/valid (+1GB HBM
# at 4M x 128 — part of the 4M build's OOM budget)
MIN_CAPACITY = 8192
PQ_TRAIN_SAMPLE = 65_536  # codebook k-means training sample cap


def _pq_encode_chunked(
    jv: jax.Array, books: jax.Array, chunk: int = 65_536
) -> jax.Array:
    """Encode [n, D] f32 -> [n, M] u8 codes in one jitted program
    (lax.map over row chunks: the [M, chunk, 256] assignment tensor
    stays ~2GB instead of n/chunk times that)."""
    import functools as _ft

    from longbow_tpu.index.pq import _encode

    n, d = jv.shape
    m = books.shape[0]
    dsub = d // m
    n_pad = -(-n // chunk) * chunk
    jvp = jnp.pad(jv, ((0, n_pad - n), (0, 0)))

    @_ft.partial(jax.jit, static_argnames=("chunk",))
    def run(jvp, books, chunk):
        blocks = jvp.reshape(-1, chunk, d)

        def one(vb):
            return _encode(
                vb.reshape(chunk, m, dsub).transpose(1, 0, 2), books
            )

        return jax.lax.map(one, blocks).reshape(n_pad, m)

    return run(jvp, books, chunk)[:n]


class HNSWConfig:
    """Mirrors ArrowHNSWConfig knobs (reference: arrow_hnsw.go:33-75)."""

    def __init__(
        self,
        m: int = 32,
        m_max: int = 64,
        ef_construction: int = 100,
        ef_search: int = 50,
        insert_batch_size: int = 1024,
        entry_sample_size: int = 2048,
        adaptive_ef_retries: int = 2,
        insert_expand: int = 4,
        reverse_passes: int = 4,
        search_m_max: int = 0,
        search_expand: int = 4,
    ):
        self.m = m
        self.m_max = m_max
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self.insert_batch_size = insert_batch_size
        self.entry_sample_size = entry_sample_size
        # construction beam width per iteration + reverse-edge passes:
        # live-insert throughput levers. Defaults from the on-chip
        # sweep at 500k: ex=4/rp=4 runs 1.9x the quality-first ex=1/
        # rp=8 at IDENTICAL recall (3.5k vs 1.8k inserts/s); raise
        # reverse_passes for heavy same-target contention workloads
        self.insert_expand = insert_expand
        self.reverse_passes = reverse_passes
        # reference retries with ef*5 up to 3 attempts when under-full
        # (arrow_hnsw.go:920-947); we keep the same escape hatch
        self.adaptive_ef_retries = adaptive_ef_retries
        # search-time QPS levers (on-chip 1M sweep, round 3): the loop
        # is gathered-row-bound, so traversing only the best
        # `search_m_max` edges per node (adjacency rows are distance-
        # sorted) and expanding `search_expand` beam nodes per
        # iteration trades recall for throughput WITHOUT a rebuild:
        # m=32/ex=8 at efS=100 ran 6.4k QPS @ 0.9695 vs the default
        # 5.0k @ 0.9742 (recall headline at efS=150 stays 0.984 with
        # the defaults). 0 = use every stored edge.
        self.search_m_max = search_m_max
        self.search_expand = search_expand


class HNSWIndex:
    """Approximate k-NN graph index with tombstones and filtered search.

    storage="sq8" stores per-dim affine uint8 codes as the graph's
    vector payload — the equal-memory quantized-graph config (reference:
    SQ8 inside HNSW, arrow_hnsw.go:94, quantization_integration.go).
    Traversal gathers 1-byte codes (4x less HBM traffic than f32) and
    folds the dequant affine into the query; the quantizer trains on
    the first add batch (reference trains at threshold 5000 on data
    that arrived earlier — here the first batch is the training set).
    """

    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        config: Optional[HNSWConfig] = None,
        dtype=jnp.float32,
        capacity: int = MIN_CAPACITY,
        mips_bound: Optional[float] = None,
        storage: str = "dense",
        edge_dtype=jnp.float32,
        pq_m: Optional[int] = None,
        pq_rerank: bool = True,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        # MIPS via norm augmentation: for dot metric, rows become
        # [x, sqrt(M^2 - |x|^2)] and queries [q, 0]; argmax q.x ==
        # argmin L2 on the augmented space (standard MIPS-to-NN
        # reduction), so the L2 graph machinery serves dot unchanged.
        # mips_bound pre-sets the M^2 bound so several sub-indexes can
        # share one global bound (distances stay comparable across
        # shards in a collective merge).
        self._mips = self.metric == Metric.DOT
        self._mips_msq = float(mips_bound or 0.0)  # max |x|^2 bound
        self.config = config or HNSWConfig()
        self.dtype = dtype
        if storage not in ("dense", "sq8", "pq"):
            raise ValueError("storage must be dense|sq8|pq")
        self.storage = storage
        self.edge_dtype = edge_dtype
        self.pq_m = 0
        if storage == "pq":
            # PQ codes as the traversal payload (reference: PQ/ADC in
            # HNSW traversal, quantization_integration.go). Dot metric
            # would need PQ over the MIPS-augmented space — use the
            # standalone 'pq' index kind for MIPS instead.
            if self._mips:
                raise ValueError(
                    "storage='pq' serves L2/cosine; use index kind "
                    "'pq' for the dot metric (native MIPS LUTs)"
                )
            self.pq_m = int(pq_m or max(dim // 4, 1))
            if dim % self.pq_m != 0:
                raise ValueError(
                    f"dim {dim} not divisible by pq_m {self.pq_m}"
                )
        # PQ traversal ranks by ADC (codebook residual error is real);
        # a host-RAM f16 copy re-ranks an oversampled pool exactly —
        # the tier split the reference gets from re-ranking against its
        # Arrow-resident originals (quantization_integration.go) and
        # our 'disk' kind's HBM-codes + host-rerank design. HBM then
        # holds only codes + adjacency.
        self.pq_rerank = bool(pq_rerank) and storage == "pq"
        self._rerank_host: Optional[np.ndarray] = None  # [cap, dim] f16
        self.count = 0
        self._dead = 0  # tombstoned rows (gates deferred extraction)
        # fast-profile adjacency cache: a search_m_max-wide slice of
        # the (distance-sorted) adjacency, rebuilt lazily whenever the
        # state object changes (functional updates make identity a
        # correct dirty bit). XLA does NOT fuse a slice into the row
        # gather — passing m_used into the jit re-materialized 192MB
        # per call at 1M (measured 989 vs 6432 QPS) — so slice once.
        self._speed_src = None
        self._speed_cached = None
        cap = pad_to(capacity, MIN_CAPACITY)
        store_dim = dim + 1 if self._mips else dim
        if storage == "pq":
            store_dim = self.pq_m  # vectors array holds M-byte codes
        self.state = graph_init(
            cap, store_dim, self.config.m_max,
            jnp.uint8 if storage in ("sq8", "pq") else dtype,
            edge_dtype=edge_dtype,
        )
        self._sample_dirty = True
        self._sample_rows = jnp.zeros((1,), jnp.int32)

    # ------------------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.state.vectors.shape[0]

    def __len__(self) -> int:
        return self.count

    def _grow_to(self, need: int) -> None:
        new_cap = self.capacity
        while new_cap < need:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        pad = new_cap - self.capacity
        s = self.state
        self.state = s._replace(
            vectors=jnp.pad(s.vectors, ((0, pad), (0, 0))),
            norms_sq=jnp.pad(s.norms_sq, (0, pad)),
            valid=jnp.pad(s.valid, (0, pad)),
            nbrs=jnp.pad(s.nbrs, ((0, pad), (0, 0)), constant_values=-1),
            nbr_dists=jnp.pad(
                s.nbr_dists, ((0, pad), (0, 0)), constant_values=float(MASKED)
            ),
            nbr_count=jnp.pad(s.nbr_count, (0, pad)),
        )
        self._sample_dirty = True

    def _refresh_sample(self) -> None:
        """Strided sample of stored rows for the entry scan (the role of
        HNSW's upper layers). Refreshed lazily as the index grows.

        The sample scales with the corpus (n/16, capped at 32k): on
        clustered data the kNN graph can lack inter-cluster edges, so
        recall depends on *starting* near the right cluster — a bigger
        entry scan is one cheap matmul and buys exactly that."""
        if not self._sample_dirty and self._sample_rows.shape[0] > 1:
            return
        n = max(self.count, 1)
        # BUCKETED size: a sample shaped exactly n//16 changes on every
        # add, recompiling beam_search/insert_batch per batch (measured:
        # 214 inserts/s at 500k vs 1684/s at the 32k cap where the
        # shape is stable). Rounding up to 2048 multiples bounds the
        # distinct shapes at ~15 between 2048 and the 32k cap; oversized
        # samples just repeat rows (harmless scan dupes)
        if n <= self.config.entry_sample_size:
            s = n  # tiny index: every row (no duplicate entries)
        else:
            s = min(
                32768,
                -(-max(self.config.entry_sample_size, n // 16) // 2048)
                * 2048,
            )
        rows = np.linspace(0, n - 1, s, dtype=np.int32)
        self._sample_rows = jnp.asarray(rows)
        self._sample_dirty = False

    # ------------------------------------------------------------------

    def _pq_host_rerank(
        self, q_np: np.ndarray, d, r, k: int, normalize: bool
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact re-rank of the ADC-ranked pool against the host f16
        copy; returns ([B, k] f32, [B, k] i32) numpy. One device->host
        fetch (the serving edge fetches results anyway); the numpy
        einsum over [B, pool, dim] is microseconds at serving shapes."""
        d_np = np.asarray(d)
        r_np = np.asarray(r)
        q = q_np
        if normalize:
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-30
            )
        safe = np.maximum(r_np, 0)
        vec = self._rerank_host[safe].astype(np.float32)  # [B, P, dim]
        ip = np.einsum("bd,bpd->bp", q, vec, dtype=np.float32)
        vn = np.sum(vec * vec, axis=2)
        qn = np.sum(q * q, axis=1, keepdims=True)
        dist = np.maximum(qn - 2.0 * ip + vn, 0.0)
        bad = (r_np < 0) | (d_np >= MASKED)
        dist[bad] = np.float32(MASKED)
        order = np.argsort(dist, axis=1)[:, :k]
        d2 = np.take_along_axis(dist, order, axis=1).astype(np.float32)
        r2 = np.take_along_axis(r_np, order, axis=1)
        r2 = np.where(d2 >= MASKED, -1, r2).astype(np.int32)
        return d2, r2

    def _host_store(self, vecs16: np.ndarray, start: int) -> None:
        """Append rows to the host-RAM re-rank copy (f16; HBM never
        sees it — the tier split of the 'disk' kind / reference
        disk_vector_store.go)."""
        cap = self.capacity
        if self._rerank_host is None:
            self._rerank_host = np.zeros((cap, self.dim), np.float16)
        elif self._rerank_host.shape[0] < cap:
            new = np.zeros((cap, self.dim), np.float16)
            new[: self._rerank_host.shape[0]] = self._rerank_host
            self._rerank_host = new
        self._rerank_host[start : start + len(vecs16)] = vecs16

    def add(self, vecs: np.ndarray) -> np.ndarray:
        """Store + link vectors; returns assigned internal row ids.

        Device-resident input (a jax.Array) takes a fast path for
        plain-L2 dense storage: no host round trip, no re-upload — the
        production shape, since Dataset/VectorStore already hold
        vectors on device when an index (re)build starts."""
        if (
            isinstance(vecs, jax.Array)
            and self.storage == "dense"
            and not self._mips
            and self.metric == Metric.L2
            and vecs.ndim == 2
            and vecs.shape[1] == self.dim
        ):
            return self._add_arrays(
                vecs.astype(self.dtype), None
            )
        vecs = np.ascontiguousarray(np.atleast_2d(vecs), dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != self.dim:
            raise ValueError(f"expected [n, {self.dim}], got {vecs.shape}")
        n = vecs.shape[0]
        self._grow_to(self.count + n)

        jv = jnp.asarray(vecs)
        if self.metric == Metric.COSINE:
            jv = jv / jnp.maximum(
                jnp.linalg.norm(jv, axis=1, keepdims=True), 1e-30
            )
        if self._mips:
            nsq = np.sum(vecs.astype(np.float64) ** 2, axis=1)
            mx = float(nsq.max())
            if self.count == 0 and self._mips_msq == 0.0:
                self._mips_msq = mx * 1.5  # headroom for later adds
            elif mx > self._mips_msq:
                raise ValueError(
                    "MIPS augmentation bound exceeded: new vector norm "
                    f"{mx:.3g} > bound {self._mips_msq:.3g}; rebuild the "
                    "index (bound fixed at first add with 1.5x headroom)"
                )
            aug = np.sqrt(np.maximum(self._mips_msq - nsq, 0.0))
            jv = jnp.concatenate(
                [jv, jnp.asarray(aug, jnp.float32)[:, None]], axis=1
            )
        if self.storage == "sq8":
            if self.state.scale is None:
                lo = jnp.min(jv, axis=0)
                hi = jnp.max(jv, axis=0)
                self.state = self.state._replace(
                    scale=jnp.maximum(hi - lo, 1e-12) / 255.0, offset=lo
                )
            store = jnp.clip(
                jnp.round(
                    (jv - self.state.offset) / self.state.scale
                ), 0, 255,
            ).astype(jnp.uint8)
            # norms of the *dequantized* vectors: distances computed
            # from codes must see consistent |v|^2
            deq = (
                store.astype(jnp.float32) * self.state.scale
                + self.state.offset
            )
            norms = squared_norms(deq)
        elif self.storage == "pq":
            if self.state.pq_books is None:
                # codebooks train on a sample of the first batch
                # (reference trains PQ on data arriving before the
                # threshold, pq_training.go; k-means on the MXU)
                import time as _time

                from longbow_tpu.ops.kmeans import kmeans_init, lloyd

                _t0 = _time.perf_counter()
                tr = jv[:PQ_TRAIN_SAMPLE]
                dsub = self.dim // self.pq_m
                sub = tr.reshape(-1, self.pq_m, dsub).transpose(1, 0, 2)
                books, _ = lloyd(sub, kmeans_init(sub, 256, 0), 12)
                books.block_until_ready()
                self.state = self.state._replace(pq_books=books)
                try:
                    from longbow_tpu.metrics import get_registry

                    get_registry().observe(
                        "longbow_hnsw_pq_training_duration_seconds",
                        _time.perf_counter() - _t0,
                        dataset="",  # index layer has no dataset name
                    )
                except Exception:
                    pass
            store = _pq_encode_chunked(jv, self.state.pq_books)
            # |v_hat|^2 of the decoded vectors: ADC distances from the
            # LUT must see consistent norms
            norms = squared_norms(pq_decode(store, self.state.pq_books))
            if self.pq_rerank:
                hv = vecs
                if self.metric == Metric.COSINE:
                    hv = vecs / np.maximum(
                        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30
                    )
                self._host_store(hv.astype(np.float16), self.count)
        else:
            store = jv.astype(self.dtype)
            # norms of the STORED (rounded) vectors, not the f32
            # originals: with bf16 storage, exact-f32 norms paired with
            # rounded inner products add a per-row bias 2*v.dv that
            # costs ~5% recall@10 at 1M (measured on-chip); consistent
            # norms make the metric |q - v_hat|^2 exactly
            norms = squared_norms(store)
        return self._add_arrays(store, norms)

    def _add_arrays(self, store: jax.Array, norms) -> np.ndarray:
        """Scatter already-prepared storage rows + link (shared tail
        of add(); the device fast path enters here directly)."""
        n = store.shape[0]
        self._grow_to(self.count + n)
        if norms is None:
            norms = squared_norms(store)
        s = self.state
        start = self.count
        self.state = s._replace(
            vectors=jax.lax.dynamic_update_slice(
                s.vectors, store, (start, 0)
            ),
            norms_sq=jax.lax.dynamic_update_slice(s.norms_sq, norms, (start,)),
            valid=jax.lax.dynamic_update_slice(
                s.valid, jnp.ones((n,), bool), (start,)
            ),
        )
        rows = np.arange(start, start + n, dtype=np.int64)
        was_empty = self.count == 0
        self.count += n
        self._sample_dirty = True
        try:
            from longbow_tpu.metrics import get_registry

            # each functional state swap is one "epoch" in the
            # reference's RCU sense (hnsw epoch tracker)
            get_registry().inc("longbow_hnsw_epoch_transitions_total")
        except Exception:
            pass
        from longbow_tpu.index.graph_build import build_stage_timer

        build_stage_timer(n, tag="add")(
            "store/norms/scatter flush", self.state.vectors
        )

        if was_empty and n >= 2 * self.config.insert_batch_size:
            # bulk path: kNN graph on the MXU + symmetrize — orders of
            # magnitude faster than insertion and a higher-quality graph
            # (no reference equivalent; its build is inherently
            # sequential, insertion_core.go:16). Exact O(N^2) kNN below
            # 150k rows; cluster-blocked kNN above.
            # 63: the fused self-kNN scans for kk+1 (self included) and
            # the kernel's k caps at 64 on v5e (scoped-VMEM limit)
            kk = min(63, max(self.config.m * 2, 16))
            import jax as _jax

            on_tpu = _jax.default_backend() in ("tpu", "axon")
            exact_limit = 150_000
            if n >= exact_limit and on_tpu:
                # sub-quadratic device-resident build: random-projection
                # blocked rounds + NN-descent polish (the exact O(N^2)
                # build is flop-bound past ~150k rows)
                from longbow_tpu.index.graph_build import bulk_build_rp

                # tuned on-chip (see docs/ARCHITECTURE.md): with
                # consistent stored-dtype norms, 3 rp rounds at block
                # 8192 + 1 sampled-descent round already saturate the
                # post-prune graph quality at 1M (recall@10 0.984 @
                # efS=100, identical to 4rp+3nd, measured) — 23.6k
                # vec/s core build. Keep a second descent round below
                # 500k rows where it costs ~3s and buys robustness on
                # harder (uniform) distributions.
                self.state = bulk_build_rp(
                    self.state, n, m=self.config.m,
                    m_max=self.config.m_max,
                    knn_k=max(self.config.m, 48),
                    rounds=3, block=8192,
                    nn_rounds=1 if n >= 500_000 else 2,
                )
            elif n >= exact_limit:
                from longbow_tpu.index.graph_build import (
                    bulk_build_clustered,
                )

                self.state = bulk_build_clustered(
                    self.state, n, m=self.config.m,
                    m_max=self.config.m_max, knn_k=kk,
                )
            else:
                self.state = bulk_build_edges(
                    self.state, n, m=self.config.m,
                    m_max=self.config.m_max, knn_k=kk,
                )
            return rows

        # incremental path: link in fixed-size batches (padding the
        # tail batch by repeating its last row keeps shapes stable)
        bs = self.config.insert_batch_size
        self._refresh_sample()
        for off in range(0, n, bs):
            chunk = rows[off : off + bs].astype(np.int32)
            if len(chunk) < bs:
                chunk = np.pad(chunk, (0, bs - len(chunk)), mode="edge")
            self.state = insert_batch(
                self.state,
                jnp.asarray(chunk),
                self._sample_rows,
                ef_construction=self.config.ef_construction,
                m=self.config.m,
                cand_cap=min(64, max(self.config.m * 2, 16)),
                reverse_passes=self.config.reverse_passes,
                expand_per_iter=self.config.insert_expand,
            )
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        """Tombstone rows: they stop appearing in results but remain
        routable (reference: tombstoned deletes + RepairAgent,
        hnsw_repair_agent.go:31; repair/compaction comes separately)."""
        if len(rows) == 0:
            return
        self._dead += len(rows)
        self.state = self.state._replace(
            valid=tombstone_rows(self.state.valid, rows)
        )

    # ------------------------------------------------------------------

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        ef_search: Optional[int] = None,
        filter_mask: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Batched ANN search -> (dist [B,k] f32, rows [B,k] i32).

        Implements the reference's adaptive retry: if any query comes
        back under-filled, retry with ef*5 (arrow_hnsw.go:920-947).
        """
        import numpy as _np

        from longbow_tpu.ops.distance import bucket_queries

        q_np = _np.atleast_2d(_np.asarray(queries, dtype=_np.float32))
        # bucket B to powers of two: beam_search compiles per batch
        # shape, and the coalescer produces arbitrary sizes — each
        # fresh B cost a ~30s remote compile that timed out every
        # in-flight client (results sliced back to b_orig at return)
        q_np, b_orig = bucket_queries(q_np)
        if self._mips:
            q_np = _np.concatenate(
                [q_np, _np.zeros((q_np.shape[0], 1), _np.float32)], axis=1
            )
        queries = jnp.asarray(q_np)
        normalize = self.metric == Metric.COSINE
        self._refresh_sample()
        ef = max(ef_search or self.config.ef_search, k)
        # PQ+rerank: oversample the ADC-ranked pool, exact host re-rank
        rerank = self.pq_rerank and self._rerank_host is not None
        pool_k = min(max(4 * k, 32), ef) if rerank else k

        eligible = filter_mask
        # deferred result extraction (top-k of the final beam) removes
        # (see _speed_state for the fast-profile adjacency slice)
        # one res_mask row-gather + one wide top_k + the O(w^2) dedup
        # per loop iteration; exact whenever the beam holds >= k valid
        # rows, so gate on light tombstoning (beam=ef wide)
        track = eligible is not None or (
            self._dead * 10 > 3 * max(self.count, 1)
        )
        speed = dict(
            track_results=track,
            expand_per_iter=self.config.search_expand,
        )
        st = self._speed_state()
        d, r = beam_search(
            st, queries, self._sample_rows, pool_k, ef,
            eligible=eligible, normalize=normalize, **speed,
        )
        # adaptive-ef retry needs a device fetch to see fill-ness —
        # skip it when under-fill is implausible (no filters and the
        # corpus dwarfs ef: the entry scan alone yields >= k valid
        # rows), so the common unfiltered search never host-syncs
        # mid-call (review finding: ~30ms/search behind the relay)
        check_fill = (
            self.config.adaptive_ef_retries > 0
            and (eligible is not None or self.count < 8 * ef)
        )
        if check_fill:
            for _ in range(self.config.adaptive_ef_retries):
                filled = bool(np.asarray(d)[:, k - 1].max() < MASKED)
                if filled or ef >= self.count:
                    break
                ef = ef * 5
                d, r = beam_search(
                    st, queries, self._sample_rows, pool_k, ef,
                    eligible=eligible, normalize=normalize, **speed,
                )
        if rerank:
            d, r = self._pq_host_rerank(q_np, d, r, k, normalize)
        if self._mips:
            # convert augmented-L2 distance back to raw inner product:
            # dist = |q|^2 + M^2 - 2 q.x  =>  q.x = (|q|^2 + M^2 - dist)/2
            qn = np.sum(q_np.astype(np.float64) ** 2, axis=1)[:, None]
            d_np = np.asarray(d)
            ip = (qn + self._mips_msq - d_np) / 2.0
            masked = d_np >= MASKED
            # report as distance = -ip (smaller better) like FlatIndex
            d = np.where(masked, d_np, -ip).astype(np.float32)
        elif self.metric == Metric.COSINE:
            # beam distances are l2^2 on unit vectors; report the
            # declared cosine distance 1 - cos = l2^2 / 2 (uniform
            # across index kinds, matching exact_search(COSINE))
            d = cosine_report(np.asarray(d, np.float32))
        if b_orig != q_np.shape[0]:
            d, r = d[:b_orig], r[:b_orig]
        return d, r

    def _speed_state(self) -> "GraphState":
        """State to traverse: the full graph, or — fast profile — a
        cached search_m_max-wide slice of the distance-sorted adjacency
        (see __init__ comment; rebuilt when the state object changes,
        which also re-captures valid/vector updates)."""
        mu = self.config.search_m_max
        st = self.state
        if not (0 < mu < st.nbrs.shape[1]):
            return st
        if self._speed_src is not st:
            self._speed_cached = st._replace(
                nbrs=st.nbrs[:, :mu],
                nbr_dists=st.nbr_dists[:, :mu],
                nbr_count=jnp.minimum(st.nbr_count, mu),
            )
            self._speed_src = st
        return self._speed_cached

    # ------------------------------------------------------------------

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        """Original-dimension vectors (strips the MIPS augmentation;
        dequantized for SQ8 storage)."""
        from longbow_tpu.index.graph import gather_vectors_f32

        out = np.asarray(gather_vectors_f32(self.state, jnp.asarray(rows)))
        return out[:, : self.dim]

    def get_vectors_device(self, rows) -> jax.Array:
        """Device-resident variant of get_vectors (compaction passes
        this straight into the new index's device add fast path)."""
        from longbow_tpu.index.graph import gather_vectors_f32

        out = gather_vectors_f32(self.state, jnp.asarray(rows))
        return out[:, : self.dim]

    def exact_search(self, queries, k: int, *, filter_mask=None):
        """Exact scan over the stored block (post-migration exact
        mode); handles cosine/MIPS transforms like search()."""
        from longbow_tpu.ops.distance import exact_search as _ex

        q_np = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if self._mips:
            q_np = np.concatenate(
                [q_np, np.zeros((q_np.shape[0], 1), np.float32)], axis=1
            )
        corpus = self.state.vectors
        if self.state.scale is not None:  # sq8: transient dequant
            corpus = (
                corpus.astype(jnp.float32) * self.state.scale
                + self.state.offset
            ).astype(jnp.bfloat16)
        elif self.state.pq_books is not None:  # pq: transient decode
            corpus = pq_decode(corpus, self.state.pq_books).astype(
                jnp.bfloat16
            )
        valid = self.state.valid
        d, r = _ex(
            jnp.asarray(q_np),
            corpus,
            k,
            Metric.L2 if (self._mips or self.metric == Metric.COSINE)
            else self.metric,
            corpus_norms_sq=self.state.norms_sq,
            valid=valid,
            extra_mask=filter_mask,
            normalize=self.metric == Metric.COSINE,
            exact_precision=False,
        )
        if self._mips:
            qn = np.sum(q_np.astype(np.float64) ** 2, axis=1)[:, None]
            d_np = np.asarray(d)
            ip = (qn + self._mips_msq - d_np) / 2.0
            d = np.where(d_np >= MASKED, d_np, -ip).astype(np.float32)
        elif self.metric == Metric.COSINE:
            d = cosine_report(np.asarray(d, np.float32))
        return d, r

    def export_state(self) -> dict:
        n = self.count
        s = self.state
        st = {
            "kind": "hnsw",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(jnp.dtype(self.dtype)),
            "storage": self.storage,
            "count": n,
            "m": self.config.m,
            "m_max": self.config.m_max,
            "ef_construction": self.config.ef_construction,
            "ef_search": self.config.ef_search,
            "search_m_max": self.config.search_m_max,
            "search_expand": self.config.search_expand,
            "mips_msq": self._mips_msq,
            "pq_m": self.pq_m,
            "vectors": (
                np.asarray(s.vectors[:n])
                if self.storage in ("sq8", "pq")
                # f32 in the archive: bf16 doesn't survive np.save
                else np.asarray(s.vectors[:n]).astype(np.float32)
            ),
            "edge_dtype": str(jnp.dtype(self.edge_dtype)),
            "norms_sq": np.asarray(s.norms_sq[:n]),
            "valid": np.asarray(s.valid[:n]),
            "nbrs": np.asarray(s.nbrs[:n]),
            # f32 in the archive: bf16 doesn't survive np.save
            "nbr_dists": np.asarray(s.nbr_dists[:n]).astype(np.float32),
            "nbr_count": np.asarray(s.nbr_count[:n]),
        }
        if s.scale is not None:
            st["sq8_scale"] = np.asarray(s.scale)
            st["sq8_offset"] = np.asarray(s.offset)
        if s.pq_books is not None:
            st["pq_books"] = np.asarray(s.pq_books)
        if self._rerank_host is not None:
            st["pq_rerank_host"] = self._rerank_host[:n]
        return st

    @classmethod
    def import_state(cls, st: dict) -> "HNSWIndex":
        cfg = HNSWConfig(
            m=st["m"], m_max=st["m_max"],
            ef_construction=st["ef_construction"],
            ef_search=st["ef_search"],
            search_m_max=int(st.get("search_m_max", 0)),
            search_expand=int(st.get("search_expand", 4)),
        )
        storage = st.get("storage", "dense")
        edge_dtype = jnp.dtype(str(st.get("edge_dtype", "float32")))
        idx = cls(
            st["dim"], st["metric"], cfg, jnp.dtype(st["dtype"]),
            capacity=max(MIN_CAPACITY, st["count"]),
            storage=storage,
            edge_dtype=edge_dtype,
            pq_m=int(st.get("pq_m", 0)) or None,
        )
        if "pq_books" in st:
            # set before the state rebuild below AND carried into it
            # (trained books must survive an empty-count import too)
            idx.state = idx.state._replace(
                pq_books=jnp.asarray(st["pq_books"])
            )
        # restore the MIPS augmentation bound: without it a dot-metric
        # index reports wrong inner products and rejects all later adds
        idx._mips_msq = float(st.get("mips_msq", 0.0))
        n = st["count"]
        if n:
            cap = idx.capacity
            m2 = cfg.m_max

            def place(arr, fill, dt):
                out = np.full(
                    (cap,) + arr.shape[1:], fill, dtype=dt
                )
                out[:n] = arr
                return jnp.asarray(out)

            idx.state = GraphState(
                vectors=place(
                    st["vectors"], 0,
                    np.uint8 if storage in ("sq8", "pq")
                    else jnp.dtype(st["dtype"]),
                ),
                norms_sq=place(st["norms_sq"], 0, np.float32),
                valid=place(st["valid"], False, bool),
                nbrs=place(st["nbrs"], -1, np.int32),
                nbr_dists=place(st["nbr_dists"], float(MASKED), edge_dtype),
                nbr_count=place(st["nbr_count"], 0, np.int32),
                scale=(
                    jnp.asarray(st["sq8_scale"])
                    if "sq8_scale" in st else None
                ),
                offset=(
                    jnp.asarray(st["sq8_offset"])
                    if "sq8_offset" in st else None
                ),
                pq_books=(
                    jnp.asarray(st["pq_books"])
                    if "pq_books" in st else None
                ),
            )
            idx.count = n
            idx._sample_dirty = True
            if "pq_rerank_host" in st:
                idx._host_store(st["pq_rerank_host"], 0)
        return idx
