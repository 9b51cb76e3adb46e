"""Snapshots: Parquet data + npz index state, atomic swap.

reference: storage/parquet.go:24-273 (RecordBatch<->Parquet, snappy),
engine.go:298-430 (write to tmp dir then swap), PQ codebook
serialization with snapshots (pq/persistence.go:15).
"""
from __future__ import annotations

import io
import json
import shutil
import time
from pathlib import Path
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_snapshot(root: str | Path, datasets: dict) -> Path:
    """datasets: {name: {"table": pa.Table|None, "index_state": dict,
    "aux": dict[str, np.ndarray]|None, "json": dict|None,
    "bm25": dict|None, "graph": dict|None, "meta": dict}}.

    index_state/aux ndarrays land in npz archives; scalar values in
    index_state plus the "json" dict land in JSON sidecars. Writes to
    <root>/snapshot.tmp.<ts> then atomically swaps to <root>/snapshot
    (reference: engine.go:298-430).
    """
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / f"snapshot.tmp.{int(time.time() * 1e6)}"
    tmp.mkdir()
    manifest = {"version": 2, "ts": time.time(), "datasets": []}
    for name, blob in datasets.items():
        safe = name.replace("/", "__")
        ddir = tmp / safe
        ddir.mkdir()
        if blob.get("table") is not None:
            pq.write_table(
                blob["table"], ddir / "data.parquet", compression="snappy"
            )
        arrays = {}
        scalars = {}
        for k, v in (blob.get("index_state") or {}).items():
            if isinstance(v, np.ndarray):
                arrays[k] = v
            elif v is not None:
                scalars[k] = v
        # UNCOMPRESSED npz (round-5 profiled finding): vector/code
        # arrays are high-entropy — zlib bought ~0-5% size for 10-20x
        # CPU and the single-core apply thread spent its life inside
        # write_array during WAL-triggered snapshots
        np.savez(ddir / "index.npz", **arrays)
        (ddir / "index_meta.json").write_text(json.dumps(scalars))
        if blob.get("aux"):
            np.savez(ddir / "aux.npz", **blob["aux"])
        if blob.get("json"):
            (ddir / "state.json").write_text(json.dumps(blob["json"]))
        if blob.get("bm25"):
            (ddir / "bm25.json").write_text(json.dumps(blob["bm25"]))
        if blob.get("graph"):
            (ddir / "graph.json").write_text(json.dumps(blob["graph"]))
        (ddir / "meta.json").write_text(json.dumps(blob.get("meta", {})))
        manifest["datasets"].append({"name": name, "dir": safe})
    (tmp / "MANIFEST.json").write_text(json.dumps(manifest))

    final = root / "snapshot"
    old = root / f"snapshot.old.{int(time.time() * 1e6)}"
    if final.exists():
        final.rename(old)
    tmp.rename(final)
    if old.exists():
        shutil.rmtree(old, ignore_errors=True)
    return final


def read_snapshot(root: str | Path) -> Optional[dict]:
    """-> {name: {"table", "index_state", "bm25", "graph", "meta"}} or
    None when no snapshot exists. A crash between write_snapshot's two
    renames leaves only snapshot.old.*/snapshot.tmp.* — recovery falls
    back to the newest complete one (MANIFEST present) instead of
    coming up empty and letting the next snapshot+truncate make the
    loss permanent."""
    root = Path(root)
    final = root / "snapshot"
    mf = final / "MANIFEST.json"
    if not mf.exists():
        candidates = sorted(
            (
                d
                for pat in ("snapshot.old.*", "snapshot.tmp.*")
                for d in root.glob(pat)
                if (d / "MANIFEST.json").exists()
            ),
            key=lambda d: d.name.rsplit(".", 1)[-1],
            reverse=True,
        )
        if not candidates:
            return None
        import logging

        logging.getLogger("longbow.storage").warning(
            "snapshot dir missing; recovering from %s (crash mid-swap)",
            candidates[0],
        )
        candidates[0].rename(final)
    manifest = json.loads(mf.read_text())
    out = {}
    for entry in manifest["datasets"]:
        ddir = final / entry["dir"]
        state = dict(np.load(ddir / "index.npz", allow_pickle=False))
        state.update(json.loads((ddir / "index_meta.json").read_text()))
        blob = {
            "table": (
                pq.read_table(ddir / "data.parquet")
                if (ddir / "data.parquet").exists()
                else None
            ),
            "index_state": state,
            "meta": json.loads((ddir / "meta.json").read_text()),
            "aux": None,
            "json": None,
            "bm25": None,
            "graph": None,
        }
        if (ddir / "aux.npz").exists():
            blob["aux"] = dict(np.load(ddir / "aux.npz", allow_pickle=False))
        if (ddir / "state.json").exists():
            blob["json"] = json.loads((ddir / "state.json").read_text())
        if (ddir / "bm25.json").exists():
            blob["bm25"] = json.loads((ddir / "bm25.json").read_text())
        if (ddir / "graph.json").exists():
            blob["graph"] = json.loads((ddir / "graph.json").read_text())
        out[entry["name"]] = blob
    return out
