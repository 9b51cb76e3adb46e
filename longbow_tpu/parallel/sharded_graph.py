"""Shard-parallel graph (HNSW-capability) index on a device mesh.

ShardedHNSW parity (reference: sharded_hnsw.go:129-470 — NumCPU
lock-striped sub-indexes, errgroup fan-out with k*2 oversample, local
to global id merge). The TPU shape: each mesh device owns an
independent sub-graph over its row slice; one `shard_map` program runs
the batched beam search on every shard simultaneously, converts local
rows to global rows with the shard offset, `all_gather`s the per-shard
top-k over ICI and merges. The reference's k*2 oversample is
unnecessary — every shard returns a full top-k.

Graphs are built per shard with the same bulk builders as the
single-device index, then assembled into globally-sharded arrays.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from longbow_tpu.index.graph import GraphState, beam_search
from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.ops.distance import MASKED, Metric, cosine_report
from longbow_tpu.parallel.mesh import SHARD_AXIS


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "mesh", "shard_rows", "sample_len", "normalize",
        "track_results", "expand_per_iter",
    ),
)
def _sharded_graph_search(
    vectors, norms, valid, nbrs, nbr_dists, nbr_count,  # sharded on rows
    samples,   # [S, sample_len] per-shard entry samples (local rows)
    queries,   # [B, D] replicated
    k: int,
    ef: int,
    mesh: Mesh,
    shard_rows: int,
    sample_len: int,
    normalize: bool,
    track_results: bool = True,
    expand_per_iter: int = 4,
):
    def local(v, nrm, vld, nb, nd, nc, smp, q):
        st = GraphState(v, nrm, vld, nb, nd, nc)
        d, i = beam_search(
            st, q, smp[0], k, ef, normalize=normalize,
            track_results=track_results,
            expand_per_iter=expand_per_iter,
        )
        off = jax.lax.axis_index(SHARD_AXIS) * shard_rows
        gi = jnp.where(d < MASKED, i + off, -1)
        ds = jax.lax.all_gather(d, SHARD_AXIS)
        gs = jax.lax.all_gather(gi, SHARD_AXIS)
        b = q.shape[0]
        dall = jnp.moveaxis(ds, 0, 1).reshape(b, -1)
        iall = jnp.moveaxis(gs, 0, 1).reshape(b, -1)
        neg, pos = jax.lax.top_k(-dall, k)
        return -neg, jnp.take_along_axis(iall, pos, axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
            P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS),
            P(SHARD_AXIS, None), P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(vectors, norms, valid, nbrs, nbr_dists, nbr_count, samples, queries)


class ShardedGraphIndex:
    """Graph ANN over a row-sharded corpus: per-shard sub-graphs,
    collective top-k merge.

    Live ingest after build() is O(batch): new vectors land in an
    interim exact segment (a FlatIndex) that every search merges with
    the graph results — the reference's interim-sharding dual-read
    (docs/autoshard.md:16-36, hnsw_autoshard.go:49). The interim folds
    into the sharded graphs on the next build()/fold_interim() call, or
    automatically when it outgrows `fold_ratio` of the corpus."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        metric: str = Metric.L2,
        config: Optional[HNSWConfig] = None,
        dtype=jnp.float32,
        fold_ratio: float = 0.25,
    ):
        self.dim = dim
        self.mesh = mesh
        self.n_shards = mesh.size
        self.metric = Metric.validate(metric)
        self.config = config or HNSWConfig()
        self.dtype = dtype
        self.fold_ratio = fold_ratio
        self._built = False
        self._vectors_host: list[np.ndarray] = []
        self.shard_rows = 0
        self.count = 0
        self.built_count = 0  # rows covered by the sharded graphs
        self._interim: Optional[object] = None  # FlatIndex over the tail
        # dot metric: ONE global MIPS augmentation bound shared by all
        # shards — per-shard bounds would make augmented-L2 distances
        # incomparable in the all_gather merge
        self._mips_msq = 0.0

    def __len__(self) -> int:
        return self.count

    def add(self, vecs: np.ndarray) -> np.ndarray:
        """Stage vectors; returns global corpus rows. Before the first
        build, rows become valid on build(); after it, rows serve
        immediately from the interim segment (O(batch), no rebuild)."""
        from longbow_tpu.index.flat import FlatIndex

        vecs = np.ascontiguousarray(np.atleast_2d(vecs), np.float32)
        start = self.count
        self._vectors_host.append(vecs)
        self.count += len(vecs)
        if self._built:
            if self._interim is None:
                self._interim = FlatIndex(self.dim, self.metric, jnp.float32)
            self._interim.add(vecs)
            if (
                self.count - self.built_count
                > max(self.fold_ratio * self.built_count, 4096)
            ):
                self.build()  # fold the interim into the shard graphs
        return np.arange(start, start + len(vecs), dtype=np.int64)

    def fold_interim(self) -> None:
        """Fold interim rows into the sharded graphs (full rebuild —
        callers run this in the background, like the reference's
        autoshard migration)."""
        if self.count > self.built_count:
            self.build()

    def build(self) -> None:
        """Build per-shard sub-graphs and assemble sharded arrays."""
        try:
            from longbow_tpu.metrics import get_registry

            # every (re)build redistributes rows over the shard mesh
            # (reference: hnsw_sharding migration counter)
            get_registry().inc("longbow_hnsw_sharding_migrations_total")
        except Exception:
            pass
        allv = self._host_all()
        if len(allv) == 0:
            return  # nothing to build; search answers empty-masked
        s = self.n_shards
        subs = [allv[j::s] for j in range(s)]
        per = max(len(x) for x in subs)

        mips_bound = None
        if self.metric == Metric.DOT:
            nsq = np.sum(allv.astype(np.float64) ** 2, axis=1)
            mips_bound = float(nsq.max()) * 1.5
            self._mips_msq = mips_bound

        shards = []
        for j in range(s):
            idx = HNSWIndex(
                self.dim, self.metric, self.config, self.dtype,
                capacity=max(4096, per), mips_bound=mips_bound,
            )
            idx.add(subs[j])
            shards.append(idx)
        cap = shards[0].capacity
        self.shard_rows = cap

        def stack(get, fill, dt):
            out = np.full((s * cap,) + get(shards[0]).shape[1:], fill, dt)
            for j, sh in enumerate(shards):
                a = np.asarray(get(sh))
                out[j * cap : j * cap + a.shape[0]] = a
            return out

        sh2 = NamedSharding(self.mesh, P(SHARD_AXIS, None))
        sh1 = NamedSharding(self.mesh, P(SHARD_AXIS))
        # build EVERY array first, then swap the attributes back-to-
        # back: a search racing the rebuild must not assemble a
        # mixed-epoch state (old vectors + re-striped neighbors) —
        # interleaving assignments with multi-second device_puts left
        # that window wide open
        new_vectors = jax.device_put(
            jnp.asarray(stack(lambda x: x.state.vectors, 0,
                              np.asarray(shards[0].state.vectors).dtype)), sh2
        )
        new_norms = jax.device_put(
            jnp.asarray(stack(lambda x: x.state.norms_sq, 0, np.float32)), sh1
        )
        new_valid = jax.device_put(
            jnp.asarray(stack(lambda x: x.state.valid, False, bool)), sh1
        )
        new_nbrs = jax.device_put(
            jnp.asarray(stack(lambda x: x.state.nbrs, -1, np.int32)), sh2
        )
        new_nbr_dists = jax.device_put(
            jnp.asarray(
                stack(lambda x: x.state.nbr_dists, float(MASKED), np.float32)
            ),
            sh2,
        )
        new_nbr_count = jax.device_put(
            jnp.asarray(stack(lambda x: x.state.nbr_count, 0, np.int32)), sh1
        )
        self.vectors = new_vectors
        self.norms_sq = new_norms
        self.valid = new_valid
        self.nbrs = new_nbrs
        self.nbr_dists = new_nbr_dists
        self.nbr_count = new_nbr_count
        # per-shard entry samples (local row space), equal length
        slen = min(
            max(self.config.entry_sample_size, per // 16, 1), 32768, per
        )
        # bucket the sample length: an exact per//16 shape recompiles
        # the sharded search on EVERY fold (CLAUDE.md shape rule; the
        # single-device index buckets its entry sample the same way)
        if slen > 2048:
            slen = -(-slen // 2048) * 2048
        samples = np.zeros((s, slen), np.int32)
        for j, sh in enumerate(shards):
            samples[j] = np.linspace(
                0, max(len(subs[j]) - 1, 0), slen, dtype=np.int32
            )
        self.samples = jax.device_put(jnp.asarray(samples), sh2)
        self._built = True
        self.built_count = self.count
        self._interim = None  # folded in
        # re-apply tombstones (the rebuild resurrects deleted rows)
        dead = sorted(getattr(self, "_deleted", ()))
        if dead:
            g = self.corpus_to_global(np.asarray(dead, np.int64))
            self.valid = self.valid.at[jnp.asarray(g)].set(False)

    def global_to_corpus(self, rows: np.ndarray) -> np.ndarray:
        """Sharded global rows -> original corpus row ids (stripe)."""
        shard = rows // self.shard_rows
        local = rows % self.shard_rows
        return local * self.n_shards + shard

    def corpus_to_global(self, rows: np.ndarray) -> np.ndarray:
        """Original corpus rows -> sharded global rows (stripe)."""
        shard = rows % self.n_shards
        local = rows // self.n_shards
        return shard * self.shard_rows + local

    def delete_rows(self, rows: np.ndarray) -> None:
        """Tombstone corpus rows — in the shard graphs and/or the
        interim segment; re-applied after every fold/rebuild."""
        rows = np.asarray(rows, np.int64).reshape(-1)
        if not hasattr(self, "_deleted"):
            self._deleted = set()
        self._deleted.update(int(r) for r in rows)
        if self._built:
            in_graph = rows[rows < self.built_count]
            if len(in_graph):
                g = self.corpus_to_global(in_graph)
                self.valid = self.valid.at[jnp.asarray(g)].set(False)
            in_interim = rows[rows >= self.built_count]
            if len(in_interim) and self._interim is not None:
                self._interim.delete_rows(in_interim - self.built_count)

    def _speed_adjacency(self):
        """Sharded analogue of HNSWIndex._speed_state: a cached
        search_m_max-wide slice of the adjacency (slicing inside the
        jit re-materializes the copy every call — measured 6.5x QPS
        loss at 1M — so slice once per write-epoch, keyed on array
        identity)."""
        mu = self.config.search_m_max
        if not (0 < mu < self.nbrs.shape[-1]):
            return self.nbrs, self.nbr_dists, self.nbr_count
        if getattr(self, "_speed_src", None) is not self.nbrs:
            self._speed_cached = (
                self.nbrs[..., :mu],
                self.nbr_dists[..., :mu],
                jnp.minimum(self.nbr_count, mu),
            )
            self._speed_src = self.nbrs
        return self._speed_cached

    def search(self, queries, k: int, *, ef_search: Optional[int] = None):
        if not self._built:
            self.build()
        if not self._built:  # still empty: masked results, not a crash
            from longbow_tpu.ops.distance import MASKED as _MASK

            b = np.atleast_2d(np.asarray(queries)).shape[0]
            return (
                np.full((b, k), np.float32(_MASK)),
                np.full((b, k), -1, np.int32),
            )
        q = np.atleast_2d(np.asarray(queries, np.float32))
        q_orig = q
        if self.metric == Metric.DOT:
            # augment queries with the zero column so they match the
            # [x, sqrt(M^2 - |x|^2)] rows stored in every shard
            q = np.concatenate(
                [q, np.zeros((q.shape[0], 1), np.float32)], axis=1
            )
        normalize = self.metric == Metric.COSINE
        ef = max(ef_search or self.config.ef_search, k)
        # deferred per-shard result extraction unless tombstone-heavy
        # (same gate as HNSWIndex.search; exact while beams stay >= k
        # valid rows)
        track = (
            len(getattr(self, "_deleted", ())) * 10
            > 3 * max(self.count, 1)
        )
        nbrs, nbr_dists, nbr_count = self._speed_adjacency()
        d, r = _sharded_graph_search(
            self.vectors, self.norms_sq, self.valid, nbrs,
            nbr_dists, nbr_count, self.samples,
            jnp.asarray(q), k, ef,
            mesh=self.mesh, shard_rows=self.shard_rows,
            sample_len=self.samples.shape[1], normalize=normalize,
            track_results=track,
            expand_per_iter=self.config.search_expand,
        )
        d = np.asarray(d)
        if self.metric == Metric.DOT:
            # augmented-L2 -> raw inner product, reported as -ip
            # (smaller-is-better convention), matching HNSWIndex.search
            qn = np.sum(q.astype(np.float64) ** 2, axis=1)[:, None]
            ip = (qn + self._mips_msq - d) / 2.0
            d = np.where(d >= MASKED, d, -ip).astype(np.float32)
        r_np = np.asarray(r)
        ok = r_np >= 0
        corpus_rows = np.where(ok, self.global_to_corpus(np.maximum(r_np, 0)), -1)

        # merge the interim exact segment (rows added after build):
        # dual-read like the reference's interim sharding
        # (docs/autoshard.md:23-36)
        if self._interim is not None and len(self._interim):
            di, ri = self._interim.search(q_orig, min(k, len(self._interim)))
            di = np.asarray(di, np.float32)
            ri = np.asarray(ri)
            if self.metric == Metric.COSINE:
                # FlatIndex cosine reports 1 - cos; merge in the
                # graph-internal L2^2-on-unit-vectors space (= 2 - 2cos)
                di = np.where(di >= MASKED, di, 2.0 * di)
            ci = np.where(
                (ri >= 0) & (di < MASKED), ri + self.built_count, -1
            )
            d_all = np.concatenate([d, di], axis=1)
            r_all = np.concatenate([corpus_rows, ci], axis=1)
            order = np.argsort(d_all, axis=1)[:, :k]
            d = np.take_along_axis(d_all, order, axis=1)
            corpus_rows = np.take_along_axis(r_all, order, axis=1)
        if self.metric == Metric.COSINE:
            # report the declared cosine distance (uniform across kinds)
            d = cosine_report(np.asarray(d, np.float32))
        return d, corpus_rows

    # -- uniform index surface (factory adapter) ------------------------

    @property
    def capacity(self) -> int:
        return max(self.count, 1)

    def _host_all(self) -> np.ndarray:
        if len(self._vectors_host) > 1:
            self._vectors_host = [np.concatenate(self._vectors_host)]
        return (
            self._vectors_host[0]
            if self._vectors_host
            else np.zeros((0, self.dim), np.float32)
        )

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        return self._host_all()[np.asarray(rows, np.int64)]

    def export_state(self) -> dict:
        """Snapshot payload. add() rows are corpus-linear (mesh-size
        independent), so the import may rebuild on ANY device count —
        per-shard sub-graphs are reconstructed (bulk builds are fast;
        the single-device HNSWIndex path imports adjacency verbatim)."""
        return {
            "kind": "mesh_graph",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(jnp.dtype(self.dtype)),
            "count": self.count,
            "fold_ratio": self.fold_ratio,
            "m": self.config.m,
            "m_max": self.config.m_max,
            "ef_construction": self.config.ef_construction,
            "ef_search": self.config.ef_search,
            "vectors": self._host_all(),
            "deleted": np.asarray(
                sorted(getattr(self, "_deleted", ())), np.int64
            ),
        }

    @classmethod
    def import_state(cls, st: dict) -> "ShardedGraphIndex":
        from longbow_tpu.index.hnsw import HNSWConfig
        from longbow_tpu.parallel.mesh import make_mesh

        cfg = HNSWConfig(
            m=int(st["m"]), m_max=int(st["m_max"]),
            ef_construction=int(st["ef_construction"]),
            ef_search=int(st["ef_search"]),
        )
        idx = cls(
            int(st["dim"]), make_mesh(), st["metric"], config=cfg,
            dtype=jnp.dtype(str(st["dtype"])),
            fold_ratio=float(st.get("fold_ratio", 0.25)),
        )
        v = np.asarray(st["vectors"], np.float32)
        if len(v):
            idx.add(v)
            dead = np.asarray(st.get("deleted", []), np.int64)
            if len(dead):
                idx.delete_rows(dead)
            idx.build()
        return idx
