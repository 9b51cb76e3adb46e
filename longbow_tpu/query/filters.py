"""Predicate filtering: metadata columns -> device row bitmask.

The reference evaluates typed filter ops with SIMD compare kernels into
byte masks, AND-combined, cached by filter hash
(reference: query/filter_evaluator.go:18-540, simd compare_amd64.s,
dataset.go:226-297 GenerateFilterBitset + LRU cache). The TPU design
keeps filterable columns as device arrays and evaluates the whole
predicate as a handful of fused VPU compares producing one bool mask
that feeds straight into the search kernels as `eligible`.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from longbow_tpu.query.parser import Filter
from longbow_tpu.query.prefilter import ColumnPrefilter


class ColumnStore:
    """Filterable metadata columns for one dataset.

    Numeric columns live on device (padded to the index capacity);
    string columns are dictionary-encoded: host dict str->code plus a
    device int32 code column, so string equality filters run on device
    too (the reference's ColumnInvertedIndex serves the same purpose,
    column_inverted_index.go:47).
    """

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.count = 0
        self._numeric: dict[str, jax.Array] = {}   # f32/i32 device cols
        self._str_codes: dict[str, jax.Array] = {}  # i32 device cols
        self._str_dicts: dict[str, dict] = {}       # value -> code
        # int64 columns whose values exceed int32 range: kept on the
        # host at full precision (device int64 needs x64 mode); the
        # predicate evaluates in numpy and ships ONE bool mask down —
        # snowflake-style ids filter exactly (reference keeps true
        # int64 columns, filter_evaluator.go)
        self._host_numeric: dict[str, np.ndarray] = {}
        # O(1) equality pre-filters: bloom + inverted row index per
        # string/int column (reference: column_inverted_index.go:47,
        # bloom_filter.go:23) — answers eq/in predicates host-side
        # with one mask upload instead of a device compare per value
        self._prefilters: dict[str, ColumnPrefilter] = {}

    def _grow(self, new_cap: int) -> None:
        if new_cap <= self.capacity:
            return
        pad = new_cap - self.capacity
        self._numeric = {
            k: jnp.pad(v, (0, pad)) for k, v in self._numeric.items()
        }
        self._str_codes = {
            k: jnp.pad(v, (0, pad), constant_values=-1)
            for k, v in self._str_codes.items()
        }
        self._host_numeric = {
            k: np.pad(v, (0, pad)) for k, v in self._host_numeric.items()
        }
        self.capacity = new_cap

    def append(
        self, columns: dict, n: int, capacity: int, rows=None
    ) -> None:
        """Append n rows of column data ({name: list/ndarray}).

        Columns absent from this batch get defaults (0 / NaN-free 0 /
        code -1) so row alignment holds across batches with different
        schemas (the reference's additive schema evolution,
        schema_evolution.go:29).

        rows: optional explicit row positions — mesh-sharded indexes
        assign shard-strided (non-contiguous) rows; values scatter to
        them instead of appending at count.
        """
        self._grow(capacity)
        start = self.count
        rows_np = None if rows is None else np.asarray(rows, np.int64)
        rows_j = (
            None if rows_np is None
            else jnp.asarray(rows_np.astype(np.int32))
        )
        # columns absent from this batch keep the zero/-1 default fill
        # that padding provides; the prefilter treats default values as
        # scan-path territory (see _prefilter_mask)
        for name, vals in columns.items():
            arr = np.asarray(vals)
            if len(arr) != n:
                raise ValueError(
                    f"column {name!r} has {len(arr)} rows, expected {n}"
                )
            pos = (
                rows_np
                if rows_np is not None
                else np.arange(start, start + n, dtype=np.int64)
            )
            if arr.dtype.kind in "OUS":  # strings
                d = self._str_dicts.setdefault(name, {})
                keys = np.array([str(v) for v in arr], dtype=object)
                codes = np.array(
                    [d.setdefault(k, len(d)) for k in keys], np.int32
                )
                self._prefilters.setdefault(
                    name, ColumnPrefilter()
                ).add_batch(keys, pos)
                col = self._str_codes.get(name)
                if col is None:
                    col = jnp.full((self.capacity,), -1, jnp.int32)
                if rows_j is None:
                    col = jax.lax.dynamic_update_slice(
                        col, jnp.asarray(codes), (start,)
                    )
                else:
                    col = col.at[rows_j].set(jnp.asarray(codes))
                self._str_codes[name] = col
            else:
                vals_f = arr.astype(
                    np.int64 if arr.dtype.kind in "iu" else np.float32
                )
                dt = jnp.int64 if vals_f.dtype == np.int64 else jnp.float32
                if vals_f.dtype == np.int64:
                    # integer columns get the eq/in pre-filter (floats
                    # don't: equality on floats is scan-path territory)
                    self._prefilters.setdefault(
                        name, ColumnPrefilter()
                    ).add_batch(vals_f.astype("U"), pos)
                if dt == jnp.int64:
                    if (
                        name not in self._host_numeric
                        and (np.abs(vals_f) < 2**31).all()
                    ):
                        vals_f = vals_f.astype(np.int32)
                        dt = jnp.int32
                    else:
                        # exact int64 semantics via the host column
                        col_h = self._host_numeric.get(name)
                        if col_h is None:
                            col_h = np.zeros((self.capacity,), np.int64)
                            # values previously stored as int32 move over
                            old = self._numeric.pop(name, None)
                            if old is not None:
                                col_h[: old.shape[0]] = np.asarray(
                                    old, np.int64
                                )[: self.capacity]
                        if rows_np is None:
                            col_h[start : start + n] = vals_f
                        else:
                            col_h[rows_np] = vals_f
                        self._host_numeric[name] = col_h
                        continue
                col = self._numeric.get(name)
                if col is not None and col.dtype != dt:
                    # keep the EXISTING column dtype: an int batch
                    # upcasts losslessly to the float column (float
                    # batches onto int columns are rejected by
                    # check_types); retyping the column truncated it
                    vals_f = vals_f.astype(np.float32)
                    dt = jnp.float32
                    # a mixed int/float column is scan territory — the
                    # int prefilter no longer covers every row
                    self._prefilters.pop(name, None)
                if col is None:
                    col = jnp.zeros((self.capacity,), dt)
                if rows_j is None:
                    col = jax.lax.dynamic_update_slice(
                        col, jnp.asarray(vals_f), (start,)
                    )
                else:
                    col = col.at[rows_j].set(jnp.asarray(vals_f))
                self._numeric[name] = col
        if rows_np is None:
            self.count = start + n
        elif len(rows_np):
            self.count = max(start, int(rows_np.max()) + 1)

    def check_types(self, columns: dict) -> None:
        """Reject type flips BEFORE any mutation so a bad write never
        half-applies (vectors landed, columns rejected)."""
        for name, vals in (columns or {}).items():
            is_str = np.asarray(vals).dtype.kind in "OUS"
            if is_str and (
                name in self._numeric or name in self._host_numeric
            ):
                raise ValueError(
                    f"schema mismatch: column {name!r} is numeric, "
                    "got string values"
                )
            if not is_str and name in self._str_codes:
                raise ValueError(
                    f"schema mismatch: column {name!r} is string, "
                    "got numeric values"
                )
            if not is_str and np.asarray(vals).dtype.kind == "f":
                col = self._numeric.get(name)
                if name in self._host_numeric or (
                    col is not None
                    and col.dtype in (jnp.int32, jnp.int64)
                ):
                    raise ValueError(
                        f"schema mismatch: column {name!r} is integer, "
                        "got float values (lossy cast rejected)"
                    )

    def fields(self) -> list[str]:
        return sorted(
            set(self._numeric)
            | set(self._str_codes)
            | set(self._host_numeric)
        )

    def host_view(self, rows: np.ndarray | None = None) -> dict:
        """name -> host array for streaming scans (one device fetch per
        column per scan). With `rows`, arrays come back gathered to
        those rows — a small limited scan does a device-side take and
        fetches len(rows) values instead of the whole column. String
        columns decode via a vocab-indexed object array (O(vocab)
        setup, vectorized decode)."""
        if rows is not None:
            rows = np.asarray(rows, np.int64)

        def _dev(col) -> np.ndarray:
            if rows is None:
                return np.asarray(col)
            if len(rows) * 4 >= int(col.shape[0]):
                return np.asarray(col)[rows]  # full fetch, host gather
            return np.asarray(jnp.take(col, jnp.asarray(rows), axis=0))

        out: dict[str, np.ndarray] = {}
        for k, v in self._numeric.items():
            out[k] = _dev(v)
        for k, v in self._host_numeric.items():
            out[k] = v if rows is None else v[rows]
        for k, codes in self._str_codes.items():
            vocab = self._str_dicts[k]
            inv = np.empty(
                max(vocab.values(), default=-1) + 2, dtype=object
            )
            inv[:] = ""
            for s, c in vocab.items():
                inv[c] = s
            out[k] = inv[_dev(codes)]
        return out

    # -- persistence hooks (reference snapshots full RecordBatches
    #    including metadata columns; these carry the column state so
    #    snapshots do too) ----------------------------------------------

    def export_state(self) -> dict:
        c = self.count
        num = {k: np.asarray(v[:c]) for k, v in self._numeric.items()}
        num.update({k: v[:c] for k, v in self._host_numeric.items()})
        return {
            "count": c,
            "numeric": num,
            "str_codes": {
                k: np.asarray(v[:c]) for k, v in self._str_codes.items()
            },
            "str_dicts": {k: dict(v) for k, v in self._str_dicts.items()},
        }

    @classmethod
    def import_state(cls, st: dict, capacity: int) -> "ColumnStore":
        cs = cls(max(capacity, st["count"], 1))
        cs.count = st["count"]
        for k, arr in st["numeric"].items():
            arr = np.asarray(arr)
            if arr.dtype == np.int64:  # host-resident big-int columns
                cs._host_numeric[k] = np.pad(
                    arr, (0, cs.capacity - len(arr))
                )
                continue
            pad = np.zeros((cs.capacity - len(arr),), arr.dtype)
            cs._numeric[k] = jnp.asarray(np.concatenate([arr, pad]))
        for k, arr in st["str_codes"].items():
            arr = np.asarray(arr, np.int32)
            pad = np.full((cs.capacity - len(arr),), -1, np.int32)
            cs._str_codes[k] = jnp.asarray(np.concatenate([arr, pad]))
        for k, d in st["str_dicts"].items():
            cs._str_dicts[k] = {str(v): int(c) for v, c in d.items()}
        cs._rebuild_prefilters(st)
        return cs

    def _rebuild_prefilters(self, st: dict) -> None:
        """Snapshots carry only the columns; the bloom/inverted
        structures are derived state, rebuilt on import (the reference
        re-indexes on recovery the same way, column_inverted_index.go
        IndexRecord called from the load path)."""
        from longbow_tpu.query.prefilter import ColumnPrefilter

        n = st["count"]
        rows = np.arange(n, dtype=np.int64)
        for k, arr in st["numeric"].items():
            arr = np.asarray(arr)[:n]
            if arr.dtype.kind in "iu":
                self._prefilters.setdefault(
                    k, ColumnPrefilter()
                ).add_batch(arr.astype(np.int64).astype("U"), rows)
        for k, codes in st["str_codes"].items():
            d = self._str_dicts.get(k, {})
            if not d:
                continue
            inv = np.empty(max(d.values()) + 1, dtype=object)
            for v, c in d.items():
                inv[c] = v
            codes = np.asarray(codes, np.int64)[:n]
            ok = codes >= 0
            self._prefilters.setdefault(k, ColumnPrefilter()).add_batch(
                inv[codes[ok]], rows[ok]
            )

    # ------------------------------------------------------------------

    def _prefilter_mask(self, f: Filter) -> Optional[jax.Array]:
        """eq/in via the host inverted index: O(values) dict lookups +
        one bool-mask upload. None = not answerable here (no index,
        bloom-only column, or non-integer value) -> scan path."""
        if f.operator not in ("eq", "in"):
            return None
        pf = self._prefilters.get(f.field)
        if pf is None:
            return None
        vals = (
            f.value
            if isinstance(f.value, (list, tuple))
            else [f.value]
        )
        is_str = f.field in self._str_dicts
        mask = np.zeros((self.capacity,), bool)
        for v in vals:
            if is_str:
                key = str(v)
                if key == "":
                    return None  # default fill is unindexed: scan
            else:
                try:
                    key = str(int(v))
                except (TypeError, ValueError):
                    return None  # scan path raises the canonical error
                if key == "0":
                    # rows default-filled by absent-column appends hold
                    # 0 but were never indexed — the scan path is the
                    # authority for the default value
                    return None
            r = pf.rows_for(key)
            if r is None:
                return None  # cardinality-capped column: bloom only
            if len(r):
                mask[r[r < self.capacity]] = True
        return jnp.asarray(mask)

    def _eval_one(self, f: Filter) -> jax.Array:
        op = f.operator
        pm = self._prefilter_mask(f)
        if pm is not None:
            return pm
        in_vals = (
            list(f.value)
            if op == "in" and isinstance(f.value, (list, tuple))
            else [f.value] if op == "in" else None
        )
        if f.field in self._host_numeric:
            col = self._host_numeric[f.field]
            if op == "in":
                return jnp.asarray(
                    np.isin(col, np.array([int(v) for v in in_vals]))
                )
            val = int(f.value)
            m = {
                "eq": col == val,
                "neq": col != val,
                "gt": col > val,
                "lt": col < val,
                "ge": col >= val,
                "le": col <= val,
            }[op]
            return jnp.asarray(m)
        if f.field in self._str_codes:
            if op not in ("eq", "neq", "in"):
                raise ValueError(
                    f"operator {op!r} unsupported for string column "
                    f"{f.field!r} (eq/neq/in only)"
                )
            d = self._str_dicts[f.field]
            col = self._str_codes[f.field]
            if op == "in":
                codes = [d.get(str(v), -2) for v in in_vals]
                return jnp.isin(col, jnp.asarray(codes, jnp.int32))
            code = d.get(str(f.value), -2)  # -2: no match
            m = col == code
            return m if op == "eq" else (col >= 0) & ~m
        if f.field in self._numeric:
            col = self._numeric[f.field]
            is_int = col.dtype in (jnp.int32, jnp.int64)
            if op == "in":
                vv = [int(v) if is_int else float(v) for v in in_vals]
                return jnp.isin(
                    col, jnp.asarray(vv, dtype=col.dtype)
                )
            try:
                val = int(f.value) if is_int else float(f.value)
            except ValueError as e:
                raise ValueError(
                    f"filter value {f.value!r} not numeric for column "
                    f"{f.field!r}"
                ) from e
            if op == "eq":
                return col == val
            if op == "neq":
                return col != val
            if op == "gt":
                return col > val
            if op == "lt":
                return col < val
            if op == "ge":
                return col >= val
            return col <= val
        raise KeyError(f"unknown filter field {f.field!r}")

    def evaluate(self, filters: list[Filter]) -> Optional[jax.Array]:
        """Filters -> [capacity] bool mask; AND by default, a filter
        with logic=="or" ORs into the running mask (reference combines
        per-filter bitmaps the same way, dataset.go:226-297)."""
        if not filters:
            return None
        mask = None
        for f in filters:
            m = self._eval_one(f)
            if mask is None:
                mask = m
            elif f.logic.lower() == "or":
                mask = mask | m
            else:
                mask = mask & m
        return mask


class FilterCache:
    """LRU cache of evaluated filter masks keyed by the filters' hash
    AND the store version (reference: dataset.go filter cache,
    ~100-entry LRU). The version in the key makes a mask computed from
    a pre-invalidation column snapshot unstorable after invalidate()
    ran — without it, a search racing a compaction could poison the
    cache with a stale-row-numbering mask for every later query."""

    def __init__(self, max_entries: int = 100):
        import json as _json
        import threading as _threading

        self._json = _json
        self.max_entries = max_entries
        self._d: OrderedDict[tuple, jax.Array] = OrderedDict()
        self._counts: OrderedDict[tuple, int] = OrderedDict()
        self._version = 0  # bumped on every append/delete/compaction
        self._lock = _threading.Lock()  # vs concurrent invalidate()

    def invalidate(self) -> None:
        with self._lock:
            self._version += 1
            self._d.clear()
            self._counts.clear()

    def selectivity_count(
        self, filters: list[Filter], mask: jax.Array
    ) -> Optional[int]:
        """Eligible-row count for a cached mask — computed ONCE per
        (mask, store version) and cached (the device reduction +
        scalar fetch costs a host round trip; amortized across the
        mask's cache lifetime). Used to route highly-selective
        predicates to the exact scan (reference's goal in
        adaptive_search.go:7 oversampling)."""
        import jax.numpy as _jnp

        with self._lock:
            ver = self._version
            key = (
                ver,
                self._json.dumps(
                    [
                        [f.field, f.operator, f.value, f.logic]
                        for f in filters
                    ]
                ),
            )
            hit = self._counts.get(key)
            if hit is not None:
                return hit
        try:
            cnt = int(_jnp.sum(mask))
        except Exception:
            return None
        with self._lock:
            if self._version == ver:
                self._counts[key] = cnt
                if len(self._counts) > self.max_entries:
                    self._counts.popitem(last=False)
        return cnt

    def get_or_eval(
        self, store: ColumnStore, filters: list[Filter]
    ) -> Optional[jax.Array]:
        if not filters:
            return None
        with self._lock:
            ver = self._version
            # structured key: joining raw field/value strings with
            # unescaped separators let distinct filter lists collide
            # and serve each other's masks
            key = (
                ver,
                self._json.dumps(
                    [
                        [f.field, f.operator, f.value, f.logic]
                        for f in filters
                    ]
                ),
            )
            hit = self._d.get(key)
            if hit is not None:
                self._d.move_to_end(key)
                return hit
        mask = store.evaluate(filters)
        with self._lock:
            if self._version == ver:  # don't store a stale snapshot
                self._d[key] = mask
                if len(self._d) > self.max_entries:
                    self._d.popitem(last=False)
        return mask
