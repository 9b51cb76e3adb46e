"""AdaptiveIndex: exact scan for small datasets, graph ANN after a
threshold — the reference's adaptive/auto-sharding migration semantics
(reference: adaptive_index.go:59,357,539 migrateToHNSW at threshold;
docs/autoshard.md interim-index dual-read).

Below the threshold everything is a FlatIndex (on TPU the exact scan
is so fast the threshold can be much higher than the reference's 10k).
On crossing it, a graph index is bulk-built from the flat corpus
(bulk_build_edges — seconds, not minutes) and subsequent adds use the
graph's incremental insert. During the build the flat index keeps
serving: "interim sharding" collapses to a plain atomic swap because
index state is functional.
"""
from __future__ import annotations

import logging
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.index.hardness import (
    DEFAULT_MIN_CONTRAST,
    relative_contrast,  # noqa: F401 (kept as a patchable module hook)
    relative_contrast_from_sample,
    sample_for_contrast,
)
from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
from longbow_tpu.ops.distance import Metric

log = logging.getLogger("longbow.adaptive")

DEFAULT_MIGRATION_THRESHOLD = 200_000


class AdaptiveIndex:
    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        *,
        dtype=jnp.float32,
        migration_threshold: int = DEFAULT_MIGRATION_THRESHOLD,
        hnsw_config: Optional[HNSWConfig] = None,
        storage: str = "dense",
        pq_m: Optional[int] = None,
        min_contrast: float = DEFAULT_MIN_CONTRAST,
        capacity: int = 0,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        self.dtype = dtype
        self.migration_threshold = migration_threshold
        self.hnsw_config = hnsw_config or HNSWConfig()
        # graph vector payload: "dense" (dtype), "sq8" codes, or "pq"
        # codes — the equal-memory quantized-graph configs
        # (arrow_hnsw.go:94, quantization_integration.go)
        self.storage = storage
        self.pq_m = pq_m
        # capacity pre-sizing skips every growth step (each doubling
        # recompiles pad+ingest programs — seconds apiece through the
        # device relay; profiled as the cold-ingest bottleneck)
        self._flat = FlatIndex(
            dim, metric, dtype, capacity=max(int(capacity), 0) or 4096
        )
        self._graph: Optional[HNSWIndex] = None
        # background migration (reference: AutoShardingIndex migrates
        # in background with interim dual-read, hnsw_autoshard.go:49,
        # docs/autoshard.md:16-36): the flat index keeps serving ALL
        # rows while the builder thread catches up, so puts/searches
        # never stall behind the bulk build. _mlock guards mutations +
        # the final swap; searches stay lock-free (functional arrays).
        self.background_migration = True
        self._mlock = threading.RLock()
        self._builder: Optional[threading.Thread] = None
        # hardness-aware routing (index/hardness.py): distance-
        # concentrated corpora never migrate — the exact fused scan
        # beats any graph config on them in both recall AND QPS.
        # 0 disables the probe (always migrate at threshold).
        self.min_contrast = min_contrast
        self.last_contrast: Optional[float] = None
        self._contrast_checked_at = 0

    # ------------------------------------------------------------------

    @property
    def kind(self) -> str:
        return "hnsw" if self._graph is not None else "flat"

    @property
    def capacity(self) -> int:
        return (self._graph or self._flat).capacity

    def __len__(self) -> int:
        return len(self._graph or self._flat)

    # ------------------------------------------------------------------

    def _graph_chunk(self, g: HNSWIndex, a: int, b: int) -> None:
        """Feed flat rows [a, b) to the graph, preserving row ids
        (graph insertion order == flat row order)."""
        if (
            self.metric == Metric.L2
            and self.storage == "dense"
            and self._flat.vectors.dtype == g.dtype
        ):
            # device-to-device: no host round trip (the vectors are
            # already on device in the flat block)
            g.add(self._flat.vectors[a:b])
        else:
            g.add(np.asarray(self._flat.vectors[a:b]).astype(np.float32))

    def _build_graph(self) -> None:
        """Builder-thread body: bulk-build from a snapshot, then catch
        up on rows added meanwhile, then swap under the mutation lock.
        The flat index serves every row until the swap, so there is no
        read gap and no blocked put."""
        try:
            with self._mlock:
                self._flat.flush()
                built = self._flat.count
                cap = self._flat.capacity
            g = HNSWIndex(
                self.dim,
                self.metric,
                self.hnsw_config,
                self.dtype,
                capacity=cap,
                storage=self.storage,
                pq_m=self.pq_m,
            )
            self._graph_chunk(g, 0, built)  # the long part, lock-free
            while True:
                with self._mlock:
                    self._flat.flush()
                    count = self._flat.count
                    if count - built <= 4096:
                        # final small delta: fold in + swap atomically
                        if count > built:
                            self._graph_chunk(g, built, count)
                        dead = np.nonzero(
                            ~np.asarray(self._flat.valid[:count])
                        )[0]
                        if len(dead):
                            g.delete_rows(dead)
                        self._graph = g
                        self._flat = FlatIndex(
                            self.dim, self.metric, self.dtype, capacity=1
                        )
                        try:
                            from longbow_tpu.metrics import get_registry

                            get_registry().inc(
                                "longbow_adaptive_index_migrations_total"
                            )
                        except Exception:
                            pass
                        break
                # large backlog: catch up outside the lock (adds only
                # append past `count`, so [built, count) is stable)
                self._graph_chunk(g, built, count)
                built = count
            # pre-compile the common serving search shape on this
            # (builder) thread, outside every lock — the first
            # post-migration search otherwise pays the full compile
            # on a user query
            self._warm_graph(g)
        except Exception:
            log.exception("background migration failed; staying flat")
        finally:
            self._builder = None

    def _warm_graph(self, g) -> None:
        """Pre-compile the common serving search shape (B buckets to 1,
        k=10) off the query path: the first post-migration search
        otherwise pays the full XLA/Mosaic compile (~30s through the
        remote compiler) on a user query — measured on a live server
        timing out every in-flight client during the window.
        LONGBOW_WARMUP_AFTER_BUILD=0 opts out (tests do: their search
        shapes rarely match the warmed one)."""
        import os

        if os.environ.get("LONGBOW_WARMUP_AFTER_BUILD", "1") == "0":
            return
        try:
            k = min(10, max(1, len(g)))
            g.search(np.zeros((1, self.dim), np.float32), k)
        except Exception:
            log.exception("graph warmup search failed (serving unaffected)")

    def _probe_contrast(self, count: int) -> bool:
        """Hardness probe: True = hard-enough structure to migrate.
        Runs an exact 64k-sample self-search — seconds of device work,
        so callers must NOT hold a put on it (see _maybe_migrate)."""
        with self._mlock:
            self._flat.flush()
            fl = self._flat
        # sample under the flat index's DISPATCH lock and sync it:
        # flushes DONATE the corpus buffer, and a take dispatched after
        # a donating execution dies with "buffer deleted or donated"
        # (TPU-only — CPU tests can't see it). The sample arrays are
        # fresh buffers, so the expensive self-search kernel then runs
        # OUTSIDE every lock (holding one stalls puts for seconds).
        with fl._mu:
            sampled = sample_for_contrast(fl.vectors, count)
            if sampled is not None:
                sampled[0].block_until_ready()
        if sampled is None:
            return True  # too small to judge; graphs are fine small
        rc = relative_contrast_from_sample(*sampled)
        self.last_contrast = rc
        try:
            from longbow_tpu.metrics import get_registry

            reg = get_registry()
            # relative contrast IS the intrinsic-hardness signal
            # this index adapts on (reference gauges adaptive m /
            # intrinsic dimensionality per index, hnsw_adaptive.go)
            reg.set(
                "longbow_hnsw_intrinsic_dimensionality", rc,
                index_name="adaptive",
            )
            reg.set(
                "longbow_hnsw_adaptive_m_value",
                self.hnsw_config.m, index_name="adaptive",
            )
            reg.inc(
                "longbow_hnsw_adaptive_adjustments_total",
                index_name="adaptive",
            )
        except Exception:
            pass
        if rc < self.min_contrast:
            log.warning(
                "corpus relative contrast %.2f < %.2f at n=%d: "
                "distance-concentrated data — staying on the exact "
                "scan (graph search cannot beat it here; "
                "index/hardness.py)",
                rc, self.min_contrast, count,
            )
            return False
        return True

    def _maybe_migrate(self) -> None:
        # decision under _mlock: two concurrent adds at the threshold
        # could both see _builder None and spawn two builders, whose
        # second swap discards rows acked into the first graph
        with self._mlock:
            if self._graph is not None or self._builder is not None:
                return
            if len(self._flat) < self.migration_threshold:
                return
            probe = (
                self.min_contrast > 0 and self.migration_threshold > 0
            )
            count = len(self._flat)
            if probe:
                # probe once per count-doubling: low-contrast data
                # stays on the exact scan (see index/hardness.py for
                # the measured rationale); a distribution that gains
                # structure as it grows still migrates at the next
                # doubling
                if count < 2 * self._contrast_checked_at:
                    return
                self._contrast_checked_at = count
            if self.background_migration and self.migration_threshold > 0:
                t = threading.Thread(
                    target=self._probe_then_build_body,
                    args=(probe, count),
                    daemon=True,
                    name="longbow-migrate",
                )
                self._builder = t
                t.start()
                return
        # threshold 0 = the explicit "hnsw" kind: the graph IS the
        # index, so the first batch builds synchronously (outside the
        # lock — _build_graph re-acquires it)
        if probe and not self._probe_contrast(count):
            return
        self._build_graph()

    def _probe_then_build_body(self, probe: bool, count: int) -> None:
        # the probe's exact self-search costs seconds — it must not
        # stall the put that crossed the threshold (the round-2
        # review flagged exactly this class of synchronous work)
        try:
            if probe and not self._probe_contrast(count):
                self._builder = None  # free the slot for next try
                return
        except Exception:
            log.exception("hardness probe failed; staying flat")
            self._builder = None
            return
        self._build_graph()  # its finally clears _builder

    def wait_migration(self, timeout_s: Optional[float] = None) -> bool:
        """Block until any in-flight migration finishes (tests/ops)."""
        t = self._builder
        if t is not None:
            t.join(timeout_s)
        return self._graph is not None

    # list-of-blocks puts pass through to the flat tier's staging
    # buffer; resolved under _mlock in add() (a migration between the
    # caller's capability check and the add must not hand a list to
    # the graph tier)
    accepts_blocks = True

    def add(self, vecs) -> np.ndarray:
        with self._mlock:
            if self._graph is not None:
                if isinstance(vecs, list):
                    vecs = np.concatenate(vecs)
                return self._graph.add(vecs)
            rows = self._flat.add(vecs)
        self._maybe_migrate()
        return rows

    def warm(self) -> None:
        """Pre-compile the active tier's serving search program (the
        flat tier warms lock-free — FlatIndex.warm; a migrated graph
        compiles through a plain 1-query search, which is rare: kind
        swaps happen once per dataset lifetime)."""
        g = self._graph
        if g is None:
            return self._flat.warm()
        import numpy as _np

        g.search(_np.zeros((1, self._flat.dim), _np.float32), 10)

    def delete_rows(self, rows: np.ndarray) -> None:
        with self._mlock:
            (self._graph or self._flat).delete_rows(rows)

    def search(
        self,
        queries: jax.Array,
        k: int,
        *,
        filter_mask: Optional[jax.Array] = None,
        ef_search: Optional[int] = None,
        exact: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        if self._graph is not None and not exact:
            return self._graph.search(
                queries, k, filter_mask=filter_mask, ef_search=ef_search
            )
        if self._graph is not None and exact:
            return self._graph.exact_search(
                queries, k, filter_mask=filter_mask
            )
        return self._flat.search(queries, k, filter_mask=filter_mask)

    # ------------------------------------------------------------------

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        if self._graph is not None:
            return self._graph.get_vectors(rows)
        return self._flat.get_vectors(rows)

    def get_vectors_device(self, rows) -> "jax.Array":
        """Device-resident f32 gather (compaction stays on device)."""
        if self._graph is not None:
            return self._graph.get_vectors_device(rows)
        return self._flat.get_vectors_device(rows)

    def mirror_rows(self, rows: np.ndarray):
        """Host scan-mirror gather (None when unavailable — graph tier,
        device-origin rows, or opted out)."""
        if self._graph is not None:
            return None
        return self._flat.mirror_rows(rows)

    def export_state(self) -> dict:
        st = (self._graph or self._flat).export_state()
        st["migration_threshold"] = self.migration_threshold
        st.setdefault("storage", self.storage)
        return st

    @classmethod
    def import_state(cls, st: dict) -> "AdaptiveIndex":
        idx = cls(
            st["dim"],
            st["metric"],
            dtype=jnp.dtype(st["dtype"]),
            migration_threshold=st.get(
                "migration_threshold", DEFAULT_MIGRATION_THRESHOLD
            ),
            storage=st.get("storage", "dense"),
            pq_m=int(st.get("pq_m", 0)) or None,
        )
        if st["kind"] == "hnsw":
            idx._graph = HNSWIndex.import_state(st)
            idx.hnsw_config = idx._graph.config
            idx._flat = FlatIndex(st["dim"], st["metric"], idx.dtype,
                                  capacity=1)
        else:
            idx._flat = FlatIndex.import_state(st)
        return idx
