"""IVF (inverted-file) index: k-means cells + multi-probe scan.

The classic coarse-quantizer ANN structure, TPU-shaped: cells are rows
of ONE padded [C, cap, D] bucket tensor, so a probe is a gather of
whole cell blocks followed by one batched MXU matmul — no pointer
chasing, no per-cell host work. (The reference reaches the same
latency regime with HNSW; IVF is the natural alternative on hardware
that prefers dense blocks over graphs, and the candidate-generation
shape its GPU path uses: brute-force candidates + refine,
gpu/faiss_gpu.go:35, docs/gpu.md:50-58.)

Search: queries x centroids matmul -> top-`n_probe` cells per query ->
gather those cells' blocks -> one [B, n_probe*cap] distance matmul ->
masked top-k. Adds go to the assigned cell's first free slot (device
scatter); cells can overflow into a spill flat segment that every
search also scans (bounded by `spill` growth, folded in on rebuild).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.ops.distance import MASKED, MASKED_GUARD, Metric, cosine_report
from longbow_tpu.ops.kmeans import kmeans_init, lloyd


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _ivf_scatter(cells, cell_norms, cell_rows, cell_of, slots, v, norms,
                 rows):
    """One program for the 3 placement scatters (each eager .at[].set
    costs a ~30ms relay round trip on this platform)."""
    cells = cells.at[cell_of, slots].set(v.astype(cells.dtype))
    cell_norms = cell_norms.at[cell_of, slots].set(norms)
    cell_rows = cell_rows.at[cell_of, slots].set(rows)
    return cells, cell_norms, cell_rows


@functools.partial(jax.jit, static_argnames=("k", "n_probe"))
def _ivf_search(
    cells,        # [C, cap, D] storage (bf16)
    cell_norms,   # [C, cap] f32
    cell_rows,    # [C, cap] i32 global row ids (-1 empty)
    valid,        # [N_cap] bool by global row
    centroids,    # [C, D] f32
    cent_norms,   # [C] f32
    queries,      # [B, D] f32
    k: int,
    n_probe: int,
):
    b, d = queries.shape
    c, cap, _ = cells.shape
    qn = jnp.sum(queries * queries, axis=1, keepdims=True)
    ipc = jax.lax.dot_general(
        queries, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cd = qn - 2.0 * ipc + cent_norms[None, :]
    _, probes = jax.lax.top_k(-cd, n_probe)  # [B, P]

    # gather probed cells: [B, P*cap, D]
    pc = jnp.take(cells, probes, axis=0).reshape(b, n_probe * cap, d)
    pn = jnp.take(cell_norms, probes, axis=0).reshape(b, n_probe * cap)
    pr = jnp.take(cell_rows, probes, axis=0).reshape(b, n_probe * cap)
    ip = jnp.einsum(
        "bd,bnd->bn", queries, pc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dist = jnp.maximum(qn - 2.0 * ip + pn, 0.0)
    ok = (pr >= 0) & jnp.take(valid, jnp.maximum(pr, 0))
    dist = jnp.where(ok, dist, MASKED)
    neg, pos = jax.lax.top_k(-dist, k)
    dd = -neg
    rows = jnp.where(dd < MASKED, jnp.take_along_axis(pr, pos, axis=1), -1)
    return dd, rows


class IVFIndex:
    """Multi-probe IVF over k-means cells.

    n_cells=0 picks ~sqrt-scaled cells at train time; n_probe controls
    the recall/latency trade (reference GPU path's candidate
    oversampling plays the same role)."""

    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        *,
        n_cells: int = 0,
        n_probe: int = 8,
        dtype=jnp.bfloat16,
        train_iters: int = 8,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        if self.metric == Metric.DOT:
            raise ValueError(
                "IVF serves l2/cosine; use flat/pq for dot (MIPS)"
            )
        self.n_cells = n_cells
        self.n_probe = n_probe
        self.dtype = dtype
        self.train_iters = train_iters
        self.centroids: Optional[jax.Array] = None
        self.cells = None        # [C, cap, D]
        self.cell_norms = None   # [C, cap]
        self.cell_rows = None    # [C, cap]
        self.cell_fill: Optional[np.ndarray] = None  # host fill counts
        self.valid = None        # [N_cap] by global row
        # overflow residual: exact flat segment merged at search
        self._spill = None
        self._spill_rows = np.zeros((0,), np.int64)
        self._spill_rows_j = None  # device cache of the row map
        self.count = 0
        self._host_vecs: list[np.ndarray] = []  # staged until train

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    @property
    def capacity(self) -> int:
        return 0 if self.valid is None else self.valid.shape[0]

    def __len__(self) -> int:
        return self.count

    def _prep(self, vecs) -> np.ndarray:
        v = np.ascontiguousarray(np.atleast_2d(vecs), np.float32)
        if self.metric == Metric.COSINE:
            v = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-30
            )
        return v

    def train(self, vecs: np.ndarray) -> None:
        v = self._prep(vecs)
        n = len(v)
        if self.n_cells <= 0:
            self.n_cells = max(16, min(4096, int(np.sqrt(n) * 2)))
        sample = v[np.linspace(0, n - 1, min(n, 131072), dtype=np.int64)]
        init = kmeans_init(jnp.asarray(sample)[None], self.n_cells, 0)
        cent, _ = lloyd(jnp.asarray(sample)[None], init, self.train_iters)
        self.centroids = cent[0].astype(jnp.float32)
        self.cent_norms = jnp.sum(self.centroids**2, axis=1)

    def _assign(self, v: np.ndarray) -> np.ndarray:
        ip = np.asarray(
            jnp.asarray(v) @ self.centroids.T, np.float32
        )
        cn = np.asarray(self.cent_norms)
        return np.argmin(-2.0 * ip + cn[None, :], axis=1)

    def add(self, vecs: np.ndarray) -> np.ndarray:
        v = self._prep(vecs)
        n = len(v)
        if not self.is_trained:
            self.train(v)
        asn = self._assign(v)
        rows = np.arange(self.count, self.count + n, dtype=np.int64)

        # size cells on first fill: cap = 2x MEAN occupancy — bounding
        # by the largest cell let one hot cell balloon the padded
        # tensor (measured: 5.8GB at 1M clustered, probes gathering
        # ~90% padding). Rows beyond a cell's cap spill to a flat
        # residual segment that every query matmul-scans and merges —
        # dense scans ride the MXU, so a spilled row costs far less
        # than the padding it would otherwise force.
        if self.cells is None:
            cap = max(16, int(2 * (n // self.n_cells + 1)))
            self.cells = jnp.zeros(
                (self.n_cells, cap, self.dim), self.dtype
            )
            self.cell_norms = jnp.full(
                (self.n_cells, cap), MASKED, jnp.float32
            )
            self.cell_rows = jnp.full((self.n_cells, cap), -1, jnp.int32)
            self.cell_fill = np.zeros(self.n_cells, np.int64)

        cap = self.cells.shape[1]
        # vectorized slot assignment (a per-row Python loop cost ~2min
        # of the 1M build): stable-sort by cell, position-in-run gives
        # each row its slot relative to the cell's current fill
        order = np.argsort(asn, kind="stable")
        asn_sorted = asn[order]
        run_start = np.searchsorted(asn_sorted, asn_sorted)
        pos_in_run = np.arange(n) - run_start[np.arange(n)]
        # map back to input order
        pos = np.empty(n, np.int64)
        pos[order] = pos_in_run
        slots = self.cell_fill[asn] + pos
        cell_of = asn.astype(np.int64)
        spill = slots >= cap
        self.cell_fill += np.bincount(
            asn[~spill], minlength=self.n_cells
        )
        # norms of the STORED (rounded) cell dtype — exact norms with
        # rounded inner products bias distances (~5% recall@10 at 1M)
        vr = np.asarray(v, dtype=self.dtype).astype(np.float64)
        norms = np.sum(vr ** 2, axis=1).astype(np.float32)
        keep = ~spill
        if keep.any():
            self.cells, self.cell_norms, self.cell_rows = _ivf_scatter(
                self.cells, self.cell_norms, self.cell_rows,
                jnp.asarray(cell_of[keep]), jnp.asarray(slots[keep]),
                jnp.asarray(np.asarray(v)[keep]),
                jnp.asarray(norms[keep]),
                jnp.asarray(rows[keep], dtype=jnp.int32),
            )
        if spill.any():
            from longbow_tpu.index.flat import FlatIndex

            if self._spill is None:
                self._spill = FlatIndex(self.dim, Metric.L2, self.dtype)
            self._spill.add(np.asarray(v)[spill])
            self._spill_rows = np.concatenate(
                [self._spill_rows, rows[spill]]
            )
            self._spill_rows_j = None  # invalidate the device cache

        need = self.count + n
        if self.valid is None or self.valid.shape[0] < need:
            new_cap = max(4096, 1 << int(np.ceil(np.log2(need))))
            old = self.valid
            self.valid = jnp.zeros((new_cap,), bool)
            if old is not None:
                self.valid = self.valid.at[: old.shape[0]].set(old)
        self.valid = self.valid.at[jnp.asarray(rows)].set(True)
        self.count += n
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        if len(rows):
            self.valid = self.valid.at[jnp.asarray(rows)].set(False)

    def search(self, queries, k: int, *, filter_mask=None):
        q_np = np.atleast_2d(np.asarray(queries, np.float32))
        if self.cells is None or self.count == 0:
            # empty/untrained index: an empty result set, not a crash
            # (searches can race dataset creation at startup)
            b = q_np.shape[0]
            return (
                np.full((b, k), float(MASKED), np.float32),
                np.full((b, k), -1, np.int32),
            )
        q = jnp.asarray(q_np)
        if self.metric == Metric.COSINE:
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30
            )
        valid = self.valid
        if filter_mask is not None:
            valid = jnp.logical_and(
                valid, filter_mask[: valid.shape[0]]
            )
        d, r = _ivf_search(
            self.cells, self.cell_norms, self.cell_rows, valid,
            self.centroids, self.cent_norms, q, k,
            min(self.n_probe, self.n_cells),
        )
        if self._spill is not None and len(self._spill):
            # merge the exact spill-segment scan — all on device (a
            # host-side merge would force a sync per call and break
            # queued-dispatch pipelining on the serving path). The
            # global valid mask maps onto spill-local rows via one
            # device gather of the cached row map.
            if self._spill_rows_j is None:
                rj = np.zeros(self._spill.capacity, np.int32)
                rj[: len(self._spill_rows)] = self._spill_rows
                self._spill_rows_j = jnp.asarray(rj)
            sp_mask = jnp.take(
                valid, self._spill_rows_j, axis=0
            )
            sd, sr = self._spill.search(
                q, min(k, len(self._spill)), filter_mask=sp_mask
            )
            sg = jnp.where(
                sr >= 0,
                jnp.take(self._spill_rows_j, jnp.maximum(sr, 0)),
                -1,
            )
            d_all = jnp.concatenate([jnp.asarray(d), sd], axis=1)
            r_all = jnp.concatenate([jnp.asarray(r), sg], axis=1)
            neg, pos = jax.lax.top_k(-d_all, k)
            d = -neg
            r = jnp.where(
                d < MASKED, jnp.take_along_axis(r_all, pos, axis=1), -1
            )
        if self.metric == Metric.COSINE:
            # cells hold normalized rows scanned with l2: report the
            # declared cosine distance 1 - cos = l2^2 / 2
            d = cosine_report(np.asarray(d, np.float32))
        return d, r

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        # invert the cell placement (host bookkeeping is per-add; for
        # reads we scan cell_rows — fine for snapshot/compaction paths)
        rows = np.asarray(rows)
        cr = np.asarray(self.cell_rows)
        flat_rows = cr.reshape(-1)
        order = {int(r): i for i, r in enumerate(flat_rows) if r >= 0}
        cellsf = np.asarray(
            self.cells.reshape(-1, self.dim), dtype=np.float32
        )
        spillf = None
        spill_pos = {
            int(r): i for i, r in enumerate(self._spill_rows)
        }
        out = []
        for r in rows:
            r = int(r)
            if r in order:
                out.append(cellsf[order[r]])
            else:
                if spillf is None:
                    self._spill.flush()
                    spillf = np.asarray(
                        self._spill.vectors[: len(self._spill)],
                        dtype=np.float32,
                    )
                out.append(spillf[spill_pos[r]])
        return np.stack(out)

    # -- persistence hooks --

    def export_state(self) -> dict:
        return {
            "kind": "ivf",
            "dim": self.dim,
            "metric": self.metric,
            "n_cells": self.n_cells,
            "n_probe": self.n_probe,
            "count": self.count,
            "centroids": np.asarray(self.centroids),
            "cells": np.asarray(self.cells.astype(jnp.float32)),
            "cell_norms": np.asarray(self.cell_norms),
            "cell_rows": np.asarray(self.cell_rows),
            "cell_fill": self.cell_fill,
            "valid": np.asarray(self.valid[: max(self.count, 1)]),
            "spill_rows": self._spill_rows,
            "spill_vectors": (
                (self._spill.flush() or np.asarray(
                    self._spill.vectors[: len(self._spill)],
                    dtype=np.float32,
                ))
                if self._spill is not None
                else np.zeros((0, self.dim), np.float32)
            ),
        }

    @classmethod
    def import_state(cls, st: dict) -> "IVFIndex":
        idx = cls(
            st["dim"], st["metric"], n_cells=st["n_cells"],
            n_probe=st["n_probe"],
        )
        idx.centroids = jnp.asarray(st["centroids"])
        idx.cent_norms = jnp.sum(idx.centroids**2, axis=1)
        idx.cells = jnp.asarray(st["cells"]).astype(idx.dtype)
        idx.cell_norms = jnp.asarray(st["cell_norms"])
        idx.cell_rows = jnp.asarray(st["cell_rows"])
        idx.cell_fill = np.asarray(st["cell_fill"])
        n = int(st["count"])
        cap = max(4096, 1 << int(np.ceil(np.log2(max(n, 1)))))
        v = np.zeros((cap,), bool)
        v[: len(st["valid"])] = st["valid"]
        idx.valid = jnp.asarray(v)
        idx.count = n
        sp = np.asarray(st.get("spill_vectors", np.zeros((0, 1))))
        if len(sp):
            from longbow_tpu.index.flat import FlatIndex

            idx._spill = FlatIndex(idx.dim, Metric.L2, idx.dtype)
            idx._spill.add(sp.astype(np.float32))
            idx._spill_rows = np.asarray(st["spill_rows"], np.int64)
        return idx
