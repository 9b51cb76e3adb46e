"""Tiered index: HBM-resident quantized scan + host-RAM/disk
full-precision re-rank vectors.

reference: DiskVectorStore/DiskGraph offload vectors to SSD mmap for a
"up to 90% RAM reduction" (disk_vector_store.go:3, disk_graph.go:19,
docs/vectorsearch.md:354). On TPU the scarce memory is HBM, so the
TPU-native tiering is: the *search* operand (SQ8 codes, 1 byte/dim)
stays in HBM; the *re-rank* operand (full-precision vectors) lives on
the host — plain RAM or an np.memmap-backed file on disk. A query does
one device scan for k*factor candidates, then a host gather + exact
f32 re-rank of only those rows (a few hundred rows of numpy math —
microseconds, the same shape as the reference's per-query disk reads).

HBM cost: N*D bytes vs 4*N*D for f32 storage (75% less; 87.5% less
than f32+bf16-rerank configs), with recall restored by the exact
re-rank.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from longbow_tpu.index.sq8 import SQ8Index
from longbow_tpu.ops.distance import MASKED, Metric

MIN_CAPACITY = 4096


class HostVectorStore:
    """Append-only [N, D] f32 store in host RAM or an mmap-backed file
    (reference: the mmap'd vector file of disk_vector_store.go)."""

    def __init__(self, dim: int, path: Optional[str] = None,
                 capacity: int = MIN_CAPACITY):
        self.dim = dim
        self.path = Path(path) if path else None
        self.count = 0
        self._buf = self._alloc(capacity)

    def _alloc(self, rows: int) -> np.ndarray:
        if self.path is None:
            return np.zeros((rows, self.dim), np.float32)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a+b") as f:
            f.truncate(rows * self.dim * 4)
        return np.memmap(self.path, dtype=np.float32, mode="r+",
                         shape=(rows, self.dim))

    @property
    def capacity(self) -> int:
        return self._buf.shape[0]

    def _grow_to(self, need: int) -> None:
        cap = self.capacity
        while cap < need:
            cap *= 2
        if cap == self.capacity:
            return
        if self.path is None:
            new = np.zeros((cap, self.dim), np.float32)
            new[: self.count] = self._buf[: self.count]
            self._buf = new
        else:
            del self._buf  # release the mmap before resizing the file
            self._buf = self._alloc(cap)

    def append(self, vecs: np.ndarray) -> None:
        n = len(vecs)
        self._grow_to(self.count + n)
        self._buf[self.count : self.count + n] = vecs
        self.count += n

    def get(self, rows: np.ndarray) -> np.ndarray:
        return np.asarray(self._buf[rows], np.float32)

    def flush(self) -> None:
        if self.path is not None:
            self._buf.flush()


class TieredIndex:
    """SQ8 device scan + host/disk exact re-rank.

    kind 'disk' in the factory; path=None keeps the cold tier in host
    RAM (the TPU analogue of the reference's RAM-vs-SSD distinction is
    HBM-vs-host; the file mode gives the true disk tier)."""

    def __init__(
        self,
        dim: int,
        metric: str = Metric.L2,
        *,
        path: Optional[str] = None,
        rerank_factor: int = 8,
    ):
        self.dim = dim
        self.metric = Metric.validate(metric)
        self.rerank_factor = rerank_factor
        self._scan = SQ8Index(dim, metric)
        self.host = HostVectorStore(dim, path)
        self.count = 0

    @property
    def capacity(self) -> int:
        return max(self._scan.capacity, 1)

    @property
    def valid(self):
        return self._scan.valid

    def __len__(self) -> int:
        return self.count

    def add(self, vecs: np.ndarray) -> np.ndarray:
        vecs = np.ascontiguousarray(np.atleast_2d(vecs), np.float32)
        rows = self._scan.add(vecs)
        if self.metric == Metric.COSINE:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-30)
        self.host.append(vecs)
        self.count = self._scan.count
        return rows

    def delete_rows(self, rows: np.ndarray) -> None:
        self._scan.delete_rows(rows)

    def search(self, queries, k: int, *, filter_mask=None):
        import jax.numpy as jnp

        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == Metric.COSINE:
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-30
            )
        # clamp the candidate pool at 64: SQ8Index's fused int8 kernel
        # path (12x the XLA scan, round 5) serves k <= 64; beyond that
        # the scan falls back to XLA. 64 exact-reranked candidates for
        # k=10 keeps the tier's recall within noise of the old 80.
        kk = min(max(k * self.rerank_factor, k), 64, self.count)
        kk = max(kk, k)
        d, i = self._scan.search(q, kk, filter_mask=filter_mask)
        d = np.asarray(d)
        i = np.asarray(i)
        # host-side exact re-rank of the candidate rows only
        b = q.shape[0]
        out_d = np.full((b, k), float(MASKED), np.float32)
        out_i = np.full((b, k), -1, np.int32)
        for row in range(b):
            ok = d[row] < float(MASKED)
            cand = i[row][ok]
            if len(cand) == 0:
                continue
            vecs = self.host.get(cand)
            if self.metric == Metric.L2:
                ed = np.sum((vecs - q[row][None, :]) ** 2, axis=1)
            elif self.metric == Metric.COSINE:
                # host pool rows are exact normalized f32: report the
                # declared cosine distance 1 - cos
                ed = 1.0 - vecs @ q[row]
            else:  # dot: smaller-better = -ip
                ed = -(vecs @ q[row])
            top = np.argsort(ed)[:k]
            out_d[row, : len(top)] = ed[top]
            out_i[row, : len(top)] = cand[top]
        return out_d, out_i

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        return self.host.get(np.asarray(rows))

    def hbm_bytes(self) -> int:
        s = self._scan
        total = 0
        for a in (s.codes, s.norms_sq, s.valid):
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    # -- persistence hooks --

    def export_state(self) -> dict:
        st = self._scan.export_state()
        st["kind"] = "disk"
        st["host_vectors"] = self.host.get(np.arange(self.count))
        st["rerank_factor"] = self.rerank_factor
        return st

    @classmethod
    def import_state(cls, st: dict, path: Optional[str] = None) -> "TieredIndex":
        idx = cls(
            st["dim"], st["metric"], path=path,
            rerank_factor=st.get("rerank_factor", 8),
        )
        inner = dict(st)
        inner["kind"] = "sq8"
        idx._scan = SQ8Index.import_state(inner)
        idx.host.append(np.asarray(st["host_vectors"], np.float32))
        idx.count = idx._scan.count
        return idx
