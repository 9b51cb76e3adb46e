"""Arrow Flight server: the reference-compatible serving edge.

Protocol surface (reference: servers.go:28-190):
- DoPut:   descriptor path = dataset; batch schema `id` + `vector`
           (+ metadata columns); fixed/variable list<float32> vectors;
           `longbow.metric` schema metadata selects the metric
- DoGet:   ticket JSON {"name"|"dataset", "limit", "search": {...}} —
           search streams {id, score[, vector]}; no search = table scan
- DoAction: VectorSearch, VectorSearchByID, HybridSearch, delete,
           delete-dataset, CreateNamespace, check_readiness,
           cluster-status, list-datasets, GetGraphStats, add-edge,
           traverse-graph (reference action names, store_actions.go)
- ListFlights / GetFlightInfo / GetSchema for discovery

The reference runs separate data (:3000) and meta (:3001) gRPC servers
to isolate heavy transfers from metadata (README.md:73-82); `serve()`
spawns both against one shared VectorStore.
"""
from __future__ import annotations

import json
import os
import threading
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.flight as flight

from longbow_tpu.ops.distance import Metric
from longbow_tpu.query.parser import (
    Filter,
    parse_search_request,
    parse_ticket,
)
from longbow_tpu.serving.security import (
    AuditLogger,
    SanitizationError,
    sanitize_dataset_name,
    sanitize_search_request,
)
from longbow_tpu.store.dataset import METRIC_METADATA_KEY
from longbow_tpu.wire_types import NATIVE_VECTOR_DTYPES
from longbow_tpu.store.vector_store import VectorStore
from longbow_tpu.utils.query_cache import QueryCache


# vector dtypes accepted natively on the wire (canonical matrix:
# wire_types.NATIVE_VECTOR_DTYPES); the storage tier picks a
# dtype-appropriate index at dataset creation (int8/uint8 ->
# identity-affine SQ8 codes, f16 -> float16 storage)
_NATIVE_VEC_DTYPES = NATIVE_VECTOR_DTYPES


def _jnp_dtype_is_f16(dt) -> bool:
    """True when a dataset's storage dtype is float16 (np.dtype handles
    jnp dtype objects; bf16 maps to its own ml_dtypes dtype, not f16)."""
    if dt is None:
        return False
    try:
        return np.dtype(dt) == np.float16
    except TypeError:
        return False


def _vector_column_to_numpy(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<T> / fixed_size_list<T> column -> [n, d], dtype preserved
    for the reference's ingest matrix (f32/f16/i8/u8/i32), f32
    otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        vals = np.asarray(col.values)
        if vals.dtype not in _NATIVE_VEC_DTYPES:
            vals = vals.astype(np.float32)
        return vals.reshape(-1, d)
    arrs = col.to_pylist()
    return np.asarray(arrs, dtype=np.float32)


def _ids_column_to_numpy(col) -> np.ndarray:
    """Arrow column -> numpy without the per-row to_pylist walk
    (to_pylist on ids/metadata columns was the DoPut edge bottleneck:
    35 MB/s served vs the reference's 763-1663,
    /root/reference/docs/performance.md:20-25). Numeric columns come
    back zero-copy when there are no nulls; strings as one object
    array built in C."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = np.asarray(col.to_numpy(zero_copy_only=False))
    # an int column with nulls comes back float64 (1 -> 1.0), silently
    # changing id identity vs existing int keys; reject nulls up front
    if col.null_count:
        raise flight.FlightServerError(
            "null values are not allowed in id/metadata columns"
        )
    return out


def _meta_columns_to_numpy(tbl: pa.Table, names) -> dict:
    return {
        n: _ids_column_to_numpy(tbl.column(n))
        for n in names
        if n not in _RESERVED
    }


_RESERVED = {"id", "vector", "timestamp"}


def _peer(context) -> str:
    """Client address from a Flight call context ('' when the binding
    doesn't expose one) — feeds the per-IP rate limiter."""
    try:
        return context.peer() or ""
    except Exception:
        return ""


class LongbowFlightServer(flight.FlightServerBase):
    def __init__(
        self,
        store: VectorStore,
        location: str = "grpc://0.0.0.0:3000",
        *,
        metrics_registry=None,
        middleware_chain=None,
        audit_logger=None,
        cluster=None,
        ingest_queue=None,
        coalescer=None,
        auth_token=None,
        tls_cert_file=None,
        tls_key_file=None,
        **kw,
    ):
        # transport security (reference: SDK bearer headers
        # client.py:63-70, docs/security.md TLS): every call must carry
        # `authorization: Bearer <token>` when a token is configured;
        # TLS flips the listener to grpc+tls with the given cert/key
        if auth_token:
            from longbow_tpu.serving.security import bearer_middleware

            tokens = (
                [auth_token] if isinstance(auth_token, str) else auth_token
            )
            mw = dict(kw.pop("middleware", None) or {})
            mw.update(bearer_middleware(tokens))
            kw["middleware"] = mw
        if tls_cert_file or tls_key_file:
            from longbow_tpu.serving.security import load_tls_certificates

            if not (tls_cert_file and tls_key_file):
                missing = (
                    "LONGBOW_TLS_KEY_FILE" if tls_cert_file
                    else "LONGBOW_TLS_CERT_FILE"
                )
                raise ValueError(
                    f"TLS needs both cert and key: {missing} is not set"
                )
            kw["tls_certificates"] = load_tls_certificates(
                tls_cert_file, tls_key_file
            )
            location = location.replace("grpc://", "grpc+tls://", 1)
        # auth middleware carries over to a unix-socket mirror; TLS
        # does not (AF_UNIX is filesystem-permission protected)
        self._mirror_kw = (
            {"middleware": kw["middleware"]} if "middleware" in kw else {}
        )
        super().__init__(location, **kw)
        self.store = store
        self.location = location
        # cluster coordinator (membership + replication + global
        # search); None = single-node (reference wires the mesh into
        # the servers the same way, cmd/longbow/main.go:370-458)
        self.cluster = cluster
        # natural request batching (serving/coalescer.py):
        # concurrent plain searches share one kernel dispatch
        self.coalescer = coalescer
        # async ingest queue: DoPut acks on enqueue, index linking
        # happens off the gRPC thread; check_readiness reports BUSY
        # while it drains (reference: store_actions.go:57-101,426-708)
        self.ingest = ingest_queue
        if metrics_registry is None:
            from longbow_tpu.metrics import get_registry

            metrics_registry = get_registry()
        self.metrics = metrics_registry
        # admission control (reference: interceptor chain
        # cmd/longbow/main.go:448-458): rate limiter + circuit breaker
        self.middleware = middleware_chain
        self.audit = audit_logger or AuditLogger()  # no-op without path
        # namespaces created WITHOUT a dim are "declared": the dataset
        # materializes lazily on first DoPut, but the name must already
        # show in ListFlights/ListNamespaces (the reference creates
        # eagerly — its own ops_test.py asserts the round trip).
        # Guarded by a lock (mutated from action threads while listing
        # threads iterate) and persisted next to the WAL so a restart
        # keeps the declared names.
        self._declared_mu = threading.Lock()
        self._declared_ns: set = set()
        self._declared_path = None
        eng = getattr(store, "engine", None)
        if eng is not None and getattr(eng, "dir", None) is not None:
            self._declared_path = os.path.join(
                str(eng.dir), "declared_namespaces.json"
            )
            try:
                with open(self._declared_path) as f:
                    self._declared_ns = set(json.load(f))
            except (OSError, ValueError):
                pass

    # -- ingestion (reference: servers.go:44 DoPut -> store_actions.go:426) --

    def do_put(self, context, descriptor, reader, writer):
        if not descriptor.path:
            raise flight.FlightServerError("DoPut requires a path descriptor")
        dataset = descriptor.path[0].decode()
        try:
            sanitize_dataset_name(dataset)
        except SanitizationError as e:
            raise flight.FlightServerError(f"bad request: {e}") from e
        metric = None
        schema_meta = reader.schema.metadata or {}
        mkey = METRIC_METADATA_KEY.encode()
        if mkey in schema_meta:
            metric = schema_meta[mkey].decode()
        # replica writes carry the origin timestamp (LWW) and a marker
        # that stops re-replication loops
        is_replication = schema_meta.get(b"longbow.replication") == b"1"
        origin_ts = None
        if b"longbow.ts" in schema_meta:
            origin_ts = float(schema_meta[b"longbow.ts"].decode())
        if (
            is_replication
            and self.cluster is not None
            and b"longbow.vclock" in schema_meta
        ):
            # merge the origin's causality clock; concurrent writes are
            # counted as LWW-resolved conflicts (vector_clock.go:23)
            try:
                self.cluster.observe_remote_clock(
                    dataset,
                    json.loads(schema_meta[b"longbow.vclock"].decode()),
                )
            except Exception:
                pass
        if self.middleware:
            self.middleware.admit("DoPut", peer=_peer(context))
        try:
            with self.metrics.time_op("DoPut"):
                self._do_put_stream(
                    reader, dataset, metric, is_replication, origin_ts
                )
            self.audit.record(
                "put", dataset, {"replication": is_replication}
            )
            if (
                self.ingest is not None
                and self.ingest.pressure > 0.8
                and writer is not None
            ):
                # reference backpressure contract (docs/admin_api.md):
                # ack metadata tells writers to back off before hard
                # BUSY rejections kick in
                self.metrics.inc("longbow_wal_pressure_signals_total")
                try:
                    writer.write(
                        pa.py_buffer(
                            json.dumps(
                                {
                                    "status": "slow_down",
                                    "reason": "wal_pressure",
                                }
                            ).encode()
                        )
                    )
                except Exception:
                    pass
        finally:
            if self.middleware:
                self.middleware.release("DoPut")

    def _do_put_stream(
        self, reader, dataset, metric, is_replication, origin_ts
    ):
        auto_base = None  # running id base for id-less streams
        for chunk in reader:
            batch = chunk.data
            if batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            names = tbl.column_names
            if "vector" not in names:
                raise flight.FlightServerError(
                    "DoPut batch needs a 'vector' column"
                )
            vecs = _vector_column_to_numpy(tbl.column("vector"))
            if "id" in names:
                ids = _ids_column_to_numpy(tbl.column("id"))
            else:
                if auto_base is None:
                    auto_base = len(
                        self.store.get_or_create(dataset, vecs.shape[1], metric)
                    )
                ids = np.arange(auto_base, auto_base + len(vecs))
                auto_base += len(vecs)
            columns = _meta_columns_to_numpy(tbl, names)
            ts = origin_ts
            if ts is None and (
                self.cluster is not None or self.ingest is not None
            ):
                ts = time.time()  # stamp once so replicas agree on LWW
            if (
                self.cluster is not None
                and not is_replication
                and self.cluster.placement == "partitioned"
            ):
                # route rows to their ring owners; keep only ours
                # (reference: partition proxy sharding/proxy.go:21-145)
                keep = self.cluster.partition_put(
                    dataset, ids, vecs, columns or None, metric, ts
                )
                if not keep.any():
                    continue
                ids, vecs = ids[keep], vecs[keep]
                if columns:
                    columns = {
                        k: np.asarray(v)[keep] for k, v in columns.items()
                    }
            try:
                if self.ingest is not None:
                    self.ingest.submit(
                        dataset, ids, vecs, columns or None, metric, ts
                    )
                else:
                    self.store.put(
                        dataset, ids, vecs, columns or None, metric=metric,
                        timestamp=ts,
                    )
            except Exception as e:
                from longbow_tpu.store.compaction import (
                    MemoryPressureError,
                )

                if isinstance(e, MemoryPressureError):
                    raise flight.FlightServerError(
                        f"resource exhausted: {e}"
                    ) from e
                self.metrics.counter(
                    "longbow_ipc_decode_errors_total"
                ).inc()
                raise
            if (
                self.cluster is not None
                and not is_replication
                and self.cluster.placement != "partitioned"
            ):
                self.cluster.on_put(
                    dataset, ids, vecs, columns or None, metric, ts
                )
            # count rows APPLIED LOCALLY (post-partition slice):
            # forwarded rows are counted by their owners, so the
            # cluster-wide sum equals rows ingested exactly once
            self.metrics.inc(
                "longbow_flight_rows_processed_total", len(ids),
                method="DoPut", status="ok",
            )
            self.metrics.inc(
                "longbow_flight_bytes_processed_total", batch.nbytes,
                method="DoPut",
            )

    # -- queries (reference: servers.go:28 DoGet -> store_query.go:126) --

    def _search(self, dataset, qv, k, *, filters=None):
        """Plain vector search, through the coalescer when enabled —
        concurrent requests ride one fused-kernel dispatch (the scan
        is ~4x cheaper per query at B=512 than B=128; see
        serving/coalescer.py)."""
        if self.coalescer is not None:
            return self.coalescer.search(dataset, qv, k, filters=filters)
        return self.store.search(dataset, qv, k, filters=filters)

    def do_get(self, context, ticket):
        if self.middleware:
            self.middleware.admit("DoGet", peer=_peer(context))
        try:
            with self.metrics.time_op("DoGet"):
                with self.metrics.timer(
                    "longbow_flight_ticket_parse_duration_seconds"
                ):
                    tq = parse_ticket(ticket.ticket)
                # single host-edge parser = the primary parse path
                # (reference splits zero-alloc vs encoding/json
                # fallback, query/zero_alloc_parser.go; the fallback
                # counter stays 0 here by construction)
                self.metrics.inc(
                    "longbow_zero_alloc_vector_search_parse_total"
                )
                self.metrics.inc(
                    "longbow_doget_pipeline_steps_total",
                    method="parse",
                )
                if tq.search is not None:
                    out = self._do_search(tq)
                else:
                    out = self._do_scan(tq)
                # breaker accounting: successes reset the consecutive-
                # failure count (without this, 10 client typos EVER
                # opened the breaker permanently — record_success had
                # no serving-edge callers)
                if self.middleware:
                    self.middleware.record_success("DoGet")
                return out
        except KeyError as e:
            # client error (unknown dataset/filter field): counted in
            # error metrics but NOT in the breaker — breakers protect
            # against server failure, and a client polling a missing
            # dataset must not take the node down for everyone
            self.metrics.inc("longbow_vector_search_action_errors_total")
            raise flight.FlightServerError(f"not found: {e}") from e
        except (ValueError, SanitizationError) as e:
            self.metrics.inc("longbow_vector_search_action_errors_total")
            raise flight.FlightServerError(f"bad request: {e}") from e
        except TimeoutError as e:
            # coalesced dispatch still running (first-shape XLA compile
            # or a huge batch): the server is healthy and making
            # progress, so this must NOT count toward the breaker —
            # observed on-chip: one ~30s kernel compile produced 10
            # consecutive timeouts, opened the breaker, and turned a
            # warmup window into a full-node outage
            self.metrics.inc("longbow_vector_search_action_errors_total")
            raise flight.FlightUnavailableError(str(e)) from e
        except Exception:
            if self.middleware:
                self.middleware.record_failure("DoGet")
            raise
        finally:
            if self.middleware:
                self.middleware.release("DoGet")

    def _do_search(self, tq):
        req = tq.search
        sanitize_search_request(req)
        dsname = req.dataset or tq.name
        fan_out = (
            self.cluster is not None
            and not req.local_only
            and self.cluster.has_peers()
        )
        try:
            ds = self.store.get(dsname)
        except KeyError:
            if not fan_out:
                raise
            ds = None  # dataset lives only on peers: global-only read
        qv = np.asarray(req.query_vectors(), dtype=np.float32)
        if qv.size == 0:
            raise flight.FlightServerError("search needs vector or vectors")
        _check_query_dim(ds, qv)

        # graceful degradation: under health pressure shed optional
        # work, then fall back to stale cached answers (reference:
        # resilience/graceful_degradation.go Execute + FallbackCache)
        policy = None
        fb = self.middleware.fallback if self.middleware else None
        if self.middleware and self.middleware.degradation is not None:
            policy = self.middleware.degradation.search_policy()
        fb_key = None
        if fb is not None:
            fb_key = QueryCache.hash_query(
                dsname, qv.tobytes(), req.k, req.text_query, req.alpha,
                req.graph_alpha, req.fusion, req.include_vectors,
                _filters_to_wire(req.filters), req.local_only,
            )
            if policy is not None and policy["serve_stale"]:
                cached_tbl, found = fb.get(fb_key)
                if found:
                    self.metrics.counter(
                        "longbow_degraded_fallback_served_total"
                    ).inc()
                    return flight.RecordBatchStream(cached_tbl)
                if policy["cached_only"]:
                    raise flight.FlightUnavailableError(
                        "degraded (critical): only cached results served"
                    )
        allow_hybrid = policy is None or policy["allow_hybrid"]
        allow_graph = policy is None or policy["allow_graph_rerank"]

        t_search = time.perf_counter()
        if ds is None:
            b = qv.shape[0] if qv.ndim == 2 else 1
            ids = np.empty((b, req.k), dtype=object)
            scores = np.zeros((b, req.k), np.float32)
            ok = np.zeros((b, req.k), bool)
        elif req.text_query and 0.0 <= req.alpha < 1.0 and allow_hybrid:
            ids, scores, ok = self.store.hybrid_search(
                ds.name, qv, req.k,
                text_query=req.text_query, alpha=req.alpha,
                filters=req.filters,
                graph_alpha=req.graph_alpha if allow_graph else 0.0,
                graph_depth=req.graph_depth,
                fusion=req.fusion,
            )
        else:
            ids, scores, ok = self._search(
                ds.name, qv, req.k, filters=req.filters
            )
            if req.graph_alpha > 0.0 and allow_graph:
                ids, scores, ok = self.store.graph_rerank(
                    ds.name, ids, scores, ok, req.graph_alpha,
                    graph_depth=req.graph_depth,
                )
        if fan_out:
            # cross-process global search: merge alive peers' local
            # top-k (reference: store_query.go:696-717 -> global_search.go)
            from longbow_tpu.distributed.cluster import ConsistencyError

            hy = None
            if req.text_query and 0.0 <= req.alpha < 1.0 and allow_hybrid:
                hy = {
                    "text_query": req.text_query, "alpha": req.alpha,
                    "fusion": req.fusion,
                    "graph_alpha": req.graph_alpha if allow_graph else 0.0,
                    "graph_depth": req.graph_depth,
                }
            try:
                ids, scores, ok = self.cluster.global_search(
                    dsname, qv, req.k,
                    raw_filters=_filters_to_wire(req.filters),
                    local=(ids, scores, ok),
                    metric=ds.metric if ds is not None else None,
                    consistency=req.consistency,
                    hybrid=hy,
                )
            except ConsistencyError as e:
                raise flight.FlightUnavailableError(str(e)) from e
        # action-level metrics (reference: vector_search_action_* in
        # docs/metrics.md Vector Search; per-dataset latency is observed
        # inside VectorStore.search with the dataset label)
        self.metrics.inc("longbow_vector_search_action_requests_total")
        self.metrics.observe(
            "longbow_vector_search_action_duration_seconds",
            time.perf_counter() - t_search,
        )
        self.metrics.inc(
            "longbow_flight_operations_total",
            method="VectorSearch", status="ok",
        )

        # vectorized response assembly (the per-row python loop here
        # showed up in serving profiles)
        okm = np.asarray(ok)
        bi, ji = np.nonzero(okm)
        out_ids = ids[bi, ji].tolist()
        fields = [
            ("id", _ids_arrow_array(out_ids)),
            ("score", pa.array(np.asarray(scores)[bi, ji], pa.float32())),
            ("query_index", pa.array(bi.astype(np.int32), pa.int32())),
        ]
        if req.include_vectors and out_ids:
            # fan-out results can contain ids that live only on peers
            # (or the whole dataset may be peer-only): include local
            # vectors where we have them, zeros elsewhere — never a
            # None-deref or KeyError mislabeled as 'not found'
            local_rows = []
            have_local = []
            for i in out_ids:
                row = (
                    ds._id_to_row.get(Dataset_key(i))
                    if ds is not None
                    else None
                )
                have_local.append(row is not None)
                local_rows.append(row if row is not None else 0)
            if ds is not None and any(have_local):
                vecs = ds.get_vectors_by_rows(np.asarray(local_rows))
                mask = np.asarray(have_local)[:, None]
                vecs = np.where(mask, vecs, 0.0).astype(np.float32)
            else:
                dim = ds.dim if ds is not None else qv.shape[-1]
                vecs = np.zeros((len(out_ids), dim), np.float32)
            # vector_format: result payload encoding (reference:
            # requests.go:19,34 — "f32" | "f16" | "quantized")
            if req.vector_format == "f16":
                fields.append(
                    (
                        "vector",
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(
                                vecs.astype(np.float16).reshape(-1),
                                pa.float16(),
                            ),
                            vecs.shape[1],
                        ),
                    )
                )
            elif req.vector_format == "quantized":
                # per-row symmetric int8: scale = max|v|/127 rides in a
                # sibling column so clients can dequantize exactly
                scale = np.maximum(
                    np.abs(vecs).max(axis=1), 1e-30
                ) / 127.0
                codes = np.clip(
                    np.round(vecs / scale[:, None]), -127, 127
                ).astype(np.int8)
                fields.append(
                    (
                        "vector",
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(codes.reshape(-1), pa.int8()),
                            vecs.shape[1],
                        ),
                    )
                )
                fields.append(
                    (
                        "vector_scale",
                        pa.array(scale.astype(np.float32), pa.float32()),
                    )
                )
            else:
                fields.append(
                    (
                        "vector",
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(vecs.reshape(-1), pa.float32()),
                            vecs.shape[1],
                        ),
                    )
                )
        tbl = pa.table(dict(fields))
        self.metrics.inc(
            "longbow_flight_rows_processed_total", len(out_ids),
            method="DoGet", status="ok",
        )
        self.metrics.inc(
            "longbow_flight_bytes_processed_total", tbl.nbytes,
            method="DoGet",
        )
        if fb is not None and fb_key is not None:
            fb.put(fb_key, tbl)  # last-good answer for degraded serving
        return flight.RecordBatchStream(tbl)

    # ~2MB record batches: the reference's adaptive chunk target
    # (flight/adaptive_chunk_strategy.go:10, doget_pipeline.go:33);
    # LONGBOW_SCAN_CHUNK_BYTES overrides (bigger chunks = fewer Python
    # round-trips per GB on fat pipes)
    SCAN_CHUNK_BYTES = int(
        os.environ.get("LONGBOW_SCAN_CHUNK_BYTES", 2 * 1024 * 1024)
    )

    def _do_scan(self, tq):
        """Streaming table scan: the dataset is materialized in ~2MB
        record batches, never as one host-side table — bounded host
        memory at any corpus size (reference: DoGetPipeline
        doget_pipeline.go:33). Supports the reference SDK's filtered
        download (client.py:259-291 sends {"name", "filters"}) and
        streams metadata columns alongside id+vector."""
        ds = self.store.get(tq.name)
        ds.touch()  # scans count as access for dataset TTL
        n = ds.live_count
        limit = tq.limit if tq.limit > 0 else n
        items = ds._id_to_row
        str_ids = bool(items) and isinstance(next(iter(items)), str)
        # one vectorized pass builds the (ids, rows) arrays — never a
        # per-row python loop over the corpus (a 430k-row list pass
        # measured 0.42s of a 1.1s scan). Built under the dataset lock:
        # concurrent ingest mutates the dict mid-fromiter otherwise
        # ("dictionary changed size during iteration")
        with ds._lock:
            if tq.filters or limit >= n:
                nitems = len(items)
                rows_all = np.fromiter(items.values(), np.int64, nitems)
                id_all_np = np.fromiter(
                    items.keys(),
                    object if str_ids else np.int64,
                    nitems,
                )
            else:
                # don't materialize the full id map for a limited scan
                import itertools

                take = min(limit, len(items))
                rows_all = np.fromiter(
                    itertools.islice(items.values(), take),
                    np.int64, take,
                )
                id_all_np = np.fromiter(
                    itertools.islice(items.keys(), take),
                    object if str_ids else np.int64,
                    take,
                )
            # snapshot index + columns in the SAME critical section as
            # the (ids, rows) arrays: a compaction between them swaps in
            # renumbered rows and the captured old row ids would gather
            # the wrong vectors/metadata (same stale-trio race
            # Dataset.search guards against)
            idx = ds.index
            columns_snap = ds.columns
        if tq.filters:
            mask = ds.filter_mask(
                tq.filters, _columns=columns_snap, _index=idx
            )
            if mask is not None:
                keep = np.asarray(mask)[rows_all]
                rows_all = rows_all[keep]
                id_all_np = id_all_np[keep]
            rows_all = rows_all[:limit]
            id_all_np = id_all_np[:limit]
        npairs = len(rows_all)
        # metadata columns: gathered to the scanned rows in one pass
        # (small limited scans fetch len(rows), not the whole column)
        cols = (
            columns_snap.host_view(rows_all)
            if columns_snap.fields()
            else {}
        )
        col_names = sorted(cols)

        def _col_type(a: np.ndarray):
            if a.dtype == object:
                return pa.string()
            return pa.from_numpy_dtype(a.dtype)

        # stored-dtype downloads (reference parity: scans return the
        # dtype the dataset stores, docs/performance.md:27-53). f16
        # datasets stream halffloat — half the wire bytes, and the f16
        # host mirror serves the block without any cast. Other dtypes
        # stream f32 (bf16 has no Arrow type; int8 codes of a TRAINED
        # sq8 dataset are meaningless without the affine).
        wire_f16 = _jnp_dtype_is_f16(getattr(ds, "dtype", None))
        vec_pa_type = pa.float16() if wire_f16 else pa.float32()
        vec_bytes = 2 if wire_f16 else 4
        schema = pa.schema(
            [
                ("id", pa.string() if str_ids else pa.int64()),
                ("vector", pa.list_(vec_pa_type, ds.dim)),
            ]
            + [(c, _col_type(cols[c])) for c in col_names]
        )
        rows_per = max(
            1, self.SCAN_CHUNK_BYTES // max(ds.dim * vec_bytes, 1)
        )
        if npairs == 0:
            return flight.RecordBatchStream(schema.empty_table())

        # per-chunk work is zero-copy Arrow slices. Vectors stay
        # bounded: one device gather per ~32-chunk block (~64MB),
        # sliced into ~2MB wire batches — scan memory never tracks
        # corpus size
        id_all = (
            pa.array(id_all_np, pa.string())
            if str_ids
            else pa.array(id_all_np)
        )
        col_all = [
            pa.array(cols[c], pa.string())
            if cols[c].dtype == object
            else pa.array(cols[c])
            for c in col_names
        ]
        superchunk = rows_per * 32
        # idx was snapshotted with the row ids above; the old object's
        # functional arrays stay valid for the whole stream even if a
        # compaction swaps ds.index mid-scan.
        #
        # Prefetch pipeline (reference: DoGetPipeline
        # doget_pipeline.go:33): a producer thread runs the device
        # gather + Arrow wrapping for superchunk i+1 while gRPC
        # serializes superchunk i — the gather/cast no longer serializes
        # with the wire. Bounded queue keeps scan memory flat.
        import queue as _queue

        stop = threading.Event()

        def _put(q, item) -> bool:
            # stop-aware put: a client abort sets `stop` and no consumer
            # will ever drain the bounded queue again — a bare q.put
            # would park this thread (plus ~2 superchunks of batches)
            # forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=1.0)
                    return True
                except _queue.Full:
                    continue
            return False

        def produce(q):
            try:
                for soff in range(0, npairs, superchunk):
                    if stop.is_set():
                        return
                    block_rows = rows_all[soff : soff + superchunk]
                    if wire_f16:
                        # f16 dataset: the host mirror IS f16 — slice
                        # it straight onto the wire, no cast anywhere
                        mr = getattr(idx, "mirror_rows", None)
                        vec_block = mr(block_rows) if mr else None
                        if (
                            vec_block is None
                            or vec_block.dtype != np.float16
                        ):  # device-origin rows: gather then narrow
                            # (lossless — storage is f16)
                            vec_block = idx.get_vectors(
                                block_rows
                            ).astype(np.float16)
                    else:
                        vec_block = idx.get_vectors(block_rows)
                    batches = []
                    for off in range(0, len(block_rows), rows_per):
                        m = min(rows_per, len(block_rows) - off)
                        # pa.array over the contiguous numpy view wraps
                        # the buffer without copying (reference counts
                        # the same, doget_zero_copy_total)
                        arrays = [
                            id_all.slice(soff + off, m),
                            pa.FixedSizeListArray.from_arrays(
                                pa.array(
                                    vec_block[off : off + m].reshape(-1),
                                    vec_pa_type,
                                ),
                                ds.dim,
                            ),
                        ] + [c.slice(soff + off, m) for c in col_all]
                        batches.append(
                            pa.record_batch(arrays, schema=schema)
                        )
                    if not _put(q, batches):
                        return
                _put(q, None)
            except Exception as e:  # surfaced to the client
                _put(q, e)

        def gen():
            q: _queue.Queue = _queue.Queue(maxsize=2)
            t = threading.Thread(target=produce, args=(q,), daemon=True)
            t.start()
            n_batches = 0
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, Exception):
                        raise item
                    for b in item:
                        yield b
                        n_batches += 1
            finally:
                stop.set()  # aborted stream: unblock the producer
                self.metrics.inc(
                    "longbow_doget_pipeline_steps_total", n_batches,
                    method="scan",
                )
                self.metrics.inc(
                    "longbow_doget_zero_copy_total", n_batches,
                    type="vector",
                )

        return flight.GeneratorStream(schema, gen())

    # -- bidirectional streaming (reference: do_exchange.go:47-284 —
    #    ingest path + VectorSearch exchange) --------------------------

    def _exchange_legacy_ack(self, reader, writer) -> None:
        """Reference DoExchange fallback: unknown commands get one ack
        per received message — the 'verification echo' its ops_test.py
        exercises (do_exchange.go:186-260 sends DataBody "ack")."""
        writer.begin(pa.schema([]))
        n = 0
        for chunk in reader:
            if chunk.data is None and chunk.app_metadata is None:
                continue
            writer.write_metadata(b"ack")
            n += 1
        self.metrics.inc("longbow_do_exchange_batches_sent_total", n)

    def do_exchange(self, context, descriptor, reader, writer):
        if self.middleware:
            self.middleware.admit("DoExchange", peer=_peer(context))
        self.metrics.inc("longbow_do_exchange_calls_total")
        _t0 = time.perf_counter()
        try:
            cmd = {}
            if descriptor.descriptor_type == flight.DescriptorType.CMD:
                try:
                    cmd = json.loads(descriptor.command or b"{}")
                except ValueError:
                    cmd = None
                if not isinstance(cmd, dict):
                    # reference fallback: any unrecognized command —
                    # non-JSON (ops_test.py sends b"fetch"), or valid
                    # JSON that isn't an object — acks each received
                    # message (do_exchange.go:186-260)
                    return self._exchange_legacy_ack(reader, writer)
            elif descriptor.path:
                cmd = {
                    "protocol": "ingest",
                    "dataset": descriptor.path[0].decode(),
                }
            proto = cmd.get("protocol", "ingest")
            if proto == "ingest":
                return self._exchange_ingest(cmd, reader, writer)
            if proto in ("search", "VectorSearch"):
                return self._exchange_search(cmd, reader, writer)
            # unrecognized protocol: reference acks each message
            # rather than erroring (do_exchange.go:186-260)
            return self._exchange_legacy_ack(reader, writer)
        finally:
            self.metrics.observe(
                "longbow_do_exchange_duration_seconds",
                time.perf_counter() - _t0,
            )
            if self.middleware:
                self.middleware.release("DoExchange")

    def _exchange_ingest(self, cmd, reader, writer):
        """Client streams put-batches; server acks each with the count
        (reference: ingest exchange, do_exchange.go). Same invariants
        as DoPut: sanitized name, LWW timestamps, auto-ids based at
        the dataset's current length, cluster replication."""
        dataset = sanitize_dataset_name(cmd["dataset"])
        ack_schema = pa.schema([("rows_ingested", pa.int64())])
        writer.begin(ack_schema)
        total = 0
        auto_base = None
        for chunk in reader:
            batch = chunk.data
            if batch is None or batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            vecs = _vector_column_to_numpy(tbl.column("vector"))
            if "id" in tbl.column_names:
                ids = _ids_column_to_numpy(tbl.column("id"))
            else:
                if auto_base is None:
                    # base at the CURRENT dataset length like DoPut —
                    # starting at 0 LWW-overwrote existing rows
                    auto_base = len(
                        self.store.get_or_create(
                            dataset, vecs.shape[1], None
                        )
                    )
                ids = np.arange(auto_base, auto_base + len(vecs))
                auto_base += len(vecs)
            columns = _meta_columns_to_numpy(tbl, tbl.column_names)
            n_in = batch.num_rows
            ts = time.time() if self.cluster is not None else None
            if (
                self.cluster is not None
                and self.cluster.placement == "partitioned"
            ):
                keep = self.cluster.partition_put(
                    dataset, ids, vecs, columns or None, None, ts
                )
                ids, vecs = ids[keep], vecs[keep]
                columns = {
                    k: np.asarray(v)[keep] for k, v in columns.items()
                }
            if len(ids):
                self.store.put(
                    dataset, ids, vecs, columns or None, timestamp=ts
                )
                if (
                    self.cluster is not None
                    and self.cluster.placement != "partitioned"
                ):
                    # replicated placement: exchange-ingested rows get
                    # the same durability as DoPut rows
                    self.cluster.on_put(
                        dataset, ids, vecs, columns or None, None, ts
                    )
            total += n_in
            writer.write_batch(
                pa.record_batch({"rows_ingested": pa.array([total], pa.int64())})
            )

    def _exchange_search(self, cmd, reader, writer):
        """Client streams query batches; server streams result batches
        tagged with the incoming batch index (reference:
        vector_search_exchange.go). Accepts optional "filters" (wire
        filter objects) and "local_only" in the command; the schema
        metadata carries the dataset metric so fan-out coordinators
        merge scores in the right direction (the peer global-search
        hop uses this path — Arrow both ways, replacing the JSON
        action transport that the reference's StreamAggregator also
        avoids, stream_aggregator.go:17)."""
        dataset = cmd["dataset"]
        k = int(cmd.get("k", 10))
        filters = None
        if cmd.get("filters"):
            from longbow_tpu.query.parser import _parse_filters

            filters = _parse_filters(cmd["filters"])
        # hybrid fields forwarded by a fan-out coordinator (reference
        # forwards the full VectorSearchRequest, global_search.go:48):
        # a peer hop runs its LOCAL hybrid pipeline over its own BM25
        # stats and returns the fused ranking
        text_query = cmd.get("text_query", "") or ""
        hy_alpha = float(cmd.get("alpha", 0.0))
        hy_fusion = cmd.get("fusion", "linear") or "linear"
        hy_galpha = float(cmd.get("graph_alpha", 0.0))
        hy_gdepth = int(cmd.get("graph_depth", 2))
        try:
            metric = self.store.get(dataset).metric
        except KeyError:
            metric = ""
        str_ids = False
        ds_metric = None
        try:
            ds = self.store.get(dataset)
            ds_metric = ds.metric
            rid = next(iter(ds._id_to_row), None)
            str_ids = isinstance(rid, str)
        except KeyError:
            pass
        # same fan-out rule as the DoGet ticket path: peers' hops set
        # local_only, client batches merge alive peers' top-k (without
        # this, a >=256 SDK batch auto-routed here silently returned
        # only the contacted node's local matches)
        fan_out = (
            self.cluster is not None
            and not bool(cmd.get("local_only"))
            and self.cluster.has_peers()
        )
        id_type = pa.string() if str_ids else pa.int64()
        out_schema = pa.schema(
            [
                ("batch_index", pa.int32()),
                ("query_index", pa.int32()),
                ("id", id_type),
                ("score", pa.float32()),
            ],
            metadata={METRIC_METADATA_KEY: metric},
        )
        writer.begin(out_schema)
        bi = 0
        for chunk in reader:
            batch = chunk.data
            if batch is None or batch.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([batch])
            qv = _vector_column_to_numpy(tbl.column("vector"))
            try:
                if text_query and 0.0 <= hy_alpha < 1.0:
                    ids, scores, ok = self.store.hybrid_search(
                        dataset, qv, k,
                        text_query=text_query, alpha=hy_alpha,
                        filters=filters, fusion=hy_fusion,
                        graph_alpha=hy_galpha, graph_depth=hy_gdepth,
                    )
                else:
                    ids, scores, ok = self._search(
                        dataset, qv, k, filters=filters
                    )
            except KeyError:
                if not fan_out:
                    raise flight.FlightServerError(
                        f"not found: {dataset!r}"
                    )
                # dataset lives only on peers: global-only read
                b = qv.shape[0]
                ids = np.empty((b, k), dtype=object)
                scores = np.zeros((b, k), np.float32)
                ok = np.zeros((b, k), bool)
            if fan_out:
                from longbow_tpu.distributed.cluster import (
                    ConsistencyError,
                )

                hy = None
                if text_query and 0.0 <= hy_alpha < 1.0:
                    hy = {
                        "text_query": text_query, "alpha": hy_alpha,
                        "fusion": hy_fusion, "graph_alpha": hy_galpha,
                        "graph_depth": hy_gdepth,
                    }
                try:
                    ids, scores, ok = self.cluster.global_search(
                        dataset, qv, k,
                        raw_filters=cmd.get("filters"),
                        local=(ids, scores, ok),
                        metric=ds_metric,
                        consistency=cmd.get("consistency"),
                        hybrid=hy,
                    )
                except ConsistencyError as e:
                    raise flight.FlightUnavailableError(str(e)) from e
            okm = np.asarray(ok)
            qi, ji = np.nonzero(okm)
            id_vals = ids[qi, ji]
            id_arr = (
                pa.array([str(v) for v in id_vals], pa.string())
                if str_ids
                else pa.array([int(v) for v in id_vals], pa.int64())
            )
            score_arr = pa.array(
                np.asarray(scores)[qi, ji], pa.float32()
            )
            writer.write_batch(
                pa.record_batch(
                    {
                        "batch_index": pa.array(
                            np.full(len(qi), bi, np.int32), pa.int32()
                        ),
                        "query_index": pa.array(
                            qi.astype(np.int32), pa.int32()
                        ),
                        "id": id_arr,
                        "score": score_arr,
                    },
                    schema=out_schema,
                )
            )
            bi += 1

    # -- actions (reference: store_actions.go:29, servers.go:157) --

    def do_action(self, context, action):
        if self.middleware:
            self.middleware.admit(action.type, peer=_peer(context))
        try:
            with self.metrics.time_op(action.type):
                return self._do_action(action)
        except KeyError as e:
            raise flight.FlightServerError(f"not found: {e}") from e
        except (ValueError, json.JSONDecodeError) as e:
            raise flight.FlightServerError(f"bad request: {e}") from e
        finally:
            if self.middleware:
                self.middleware.release(action.type)

    def _do_action(self, action):
        name = action.type
        body = bytes(action.body.to_pybytes()) if action.body else b"{}"

        def ok(obj) -> list:
            return [json.dumps(obj).encode()]

        if name == "check_readiness":
            r = self.store.readiness()
            if self.ingest is not None:
                depth = self.ingest.depth
                if depth > 0:
                    r["status"] = "BUSY"
                r["index_queue_depth"] = depth
            return ok(r)
        if name in ("health", "Health"):
            from longbow_tpu.utils.health import (
                HealthManager,
                device_checker,
                storage_checker,
                store_checker,
            )

            hm = HealthManager()
            hm.register("store", store_checker(self.store))
            hm.register("storage", storage_checker(self.store))
            hm.register("device", device_checker())
            out = hm.check()
            if self.middleware is not None:
                if self.middleware.degradation is not None:
                    out["degradation"] = (
                        self.middleware.degradation.stats()
                    )
                if self.middleware.bulkhead.max_concurrent > 0:
                    out["bulkhead"] = self.middleware.bulkhead.stats()
            return ok(out)
        if name == "cluster-status":
            st = self.store.cluster_status()
            if self.cluster is not None:
                st.update(self.cluster.status())
            return ok(st)
        if name == "gossip-probe":
            # SWIM relay endpoint (reference: mesh/gossip.go:235
            # ping-req + :493-559 piggyback): optionally probe a target
            # on the asker's behalf, and always exchange membership
            # digests so rumors spread on existing probe traffic.
            req = json.loads(body or b"{}")
            resp = {"ok": True}
            target = req.get("target")
            if target and self.cluster is not None:
                host, _, port = str(target).rpartition(":")
                try:
                    import socket as _socket

                    with _socket.create_connection(
                        (host, int(port)),
                        timeout=self.cluster.membership.probe_timeout_s,
                    ):
                        resp["ok"] = True
                except (OSError, ValueError):
                    resp["ok"] = False
            if self.cluster is not None:
                self.cluster.membership.merge_digest(req.get("digest"))
                resp["digest"] = self.cluster.membership.digest()
            return ok(resp)
        if name == "region-summary":
            # spatial routing table entries: per-dataset centroid +
            # radius (reference: mesh/region.go Region advertised per
            # owner; peers pull these on the sync timer and feed
            # RegionRouter)
            from longbow_tpu.distributed.spatial import dataset_region

            req = json.loads(body or b"{}")
            names = req.get("datasets") or self.store.list_datasets()
            out = {}
            for nm in names:
                try:
                    out[nm] = dataset_region(self.store.get(nm))
                except KeyError:
                    continue
            return ok({"regions": out})
        if name == "MeshStatus":
            # reference: admin_api.md MeshStatus — membership view as
            # a member list (ID, Addr, Status)
            if self.cluster is not None:
                st = self.cluster.status()
                return ok(
                    {
                        "self": st.get("self"),
                        "members": st.get("members", []),
                    }
                )
            return ok({"self": None, "members": []})
        if name == "MeshIdentity":
            # reference: servers.go:192 — this node's own Member record
            if self.cluster is not None:
                st = self.cluster.status()
                me = st.get("self")
                if isinstance(me, dict):
                    return ok(me)
                return ok({"id": me, "status": "alive"})
            return ok({"id": "", "status": "alive"})
        if name == "DiscoveryStatus":
            # reference: servers.go:238 — active discovery provider +
            # the peer list it currently yields
            if self.cluster is not None:
                mem = self.cluster.membership
                provider = (
                    "dns" if mem.dns_name
                    else "kubernetes" if mem.k8s_service
                    else "multicast" if getattr(mem, "lan_group", None)
                    else "static"
                )
                return ok({
                    "provider": provider,
                    "peers": [m.id for m in mem.members.values()],
                })
            return ok({"provider": "none", "peers": []})
        if name in ("list-datasets", "ListDatasets"):
            return ok(self.store.list_datasets())
        if name == "ListNamespaces":
            # reference response shape (docs/namespaces.md:29-38)
            ns = sorted(self._all_namespaces())
            return ok({"namespaces": ns, "count": len(ns)})
        if name == "GetTotalNamespaceCount":
            # reference: servers.go:299 — must agree with ListNamespaces
            return ok({"count": len(self._all_namespaces())})
        if name == "GetNamespaceDatasetCount":
            # reference: servers.go:311 — 404s on unknown namespace
            req = json.loads(body or b"{}")
            nsname = req.get("name", "")
            counts = self.store.namespace_dataset_counts()
            if nsname not in counts:
                raise flight.FlightServerError(
                    f"namespace {nsname!r} not found"
                )
            return ok({"namespace": nsname, "count": counts[nsname]})
        if name in ("CreateNamespace",):
            req = json.loads(body or b"{}")
            dsname = sanitize_dataset_name(req.get("name", ""))
            if "dim" in req:
                # eager creation with an explicit index type
                # (reference: pluggable index selection)
                self.store.get_or_create(
                    dsname,
                    int(req["dim"]),
                    req.get("metric"),
                    index_kind=req.get("index"),
                    index_params={
                        k: v
                        for k, v in req.items()
                        if k in ("pq_m", "rerank", "rerank_factor",
                                 "path", "storage", "n_cells",
                                 "n_probe", "mesh_shards",
                                 "graph_disk", "capacity",
                                 "n_clusters")
                    },
                )
            else:
                with self._declared_mu:
                    self._declared_ns.add(dsname)
                self._persist_declared()
            self.audit.record("create_namespace", dsname)
            return ok({"created": dsname})
        if name in ("delete-dataset", "DeleteNamespace"):
            req = json.loads(body or b"{}")
            # reference SDK sends {"dataset": ...} (client.py:314-347);
            # "name" is this repo's original key — accept both
            target = req.get("name") or req.get("dataset") or ""
            with self._declared_mu:
                was_declared = target in self._declared_ns
                self._declared_ns.discard(target)
            if was_declared:
                self._persist_declared()
            dropped = self.store.drop(target)
            self.audit.record("drop_dataset", target, {"dropped": dropped})
            return ok({"dropped": dropped})
        if name in ("delete", "Delete", "delete-vector"):
            req = json.loads(body or b"{}")
            ids = req.get("ids")
            if ids is None and "id" in req:
                # reference SDK shape: one stringified id per call
                # (client.py:314-338). Try as-sent first (string-id
                # datasets), then coerced to int (the common case the
                # SDK stringified)
                raw = req["id"]
                ids = [raw]
                n = self.store.delete(req["dataset"], ids)
                if (
                    n == 0
                    and isinstance(raw, str)
                    and raw.lstrip("-").isdigit()
                ):
                    ids = [int(raw)]
                    n = self.store.delete(req["dataset"], ids)
            else:
                ids = ids or []
                n = self.store.delete(req["dataset"], ids)
            self.audit.record("delete", req["dataset"], {"n": n})
            if self.cluster is not None and not req.get("replicated"):
                self.cluster.on_delete(req["dataset"], ids)
            return ok({"deleted": n})
        if name == "VectorSearch":
            req = parse_search_request(json.loads(body))
            sanitize_search_request(req)  # same k/batch/filter caps as DoGet
            qv = np.asarray(req.query_vectors(), dtype=np.float32)
            _check_query_dim(self.store._datasets.get(req.dataset), qv)
            fan_out = (
                self.cluster is not None
                and not req.local_only
                and self.cluster.has_peers()
            )
            try:
                ids, scores, okm = self._search(
                    req.dataset, qv, req.k, filters=req.filters
                )
            except KeyError:
                if not fan_out:
                    raise
                b = qv.shape[0] if qv.ndim == 2 else 1
                ids = np.empty((b, req.k), dtype=object)
                scores = np.zeros((b, req.k), np.float32)
                okm = np.zeros((b, req.k), bool)
            if fan_out:
                from longbow_tpu.distributed.cluster import (
                    ConsistencyError,
                )

                try:
                    metric = self.store.get(req.dataset).metric
                except KeyError:
                    metric = None  # resolved from the owning peers
                try:
                    ids, scores, okm = self.cluster.global_search(
                        req.dataset, qv, req.k,
                        raw_filters=_filters_to_wire(req.filters),
                        local=(ids, scores, okm), metric=metric,
                        consistency=req.consistency,
                    )
                except ConsistencyError as e:
                    raise flight.FlightUnavailableError(str(e)) from e
            resp = _response_ids_scores(ids, scores, okm)
            try:
                # responses carry the metric so a coordinator that
                # doesn't hold the dataset merges in the right
                # direction (dot = bigger-is-better)
                resp["metric"] = self.store.get(req.dataset).metric
            except KeyError:
                pass
            return ok(resp)
        if name == "VectorSearchByID":
            req = json.loads(body)
            ds = self.store.get(req["dataset"])
            ids, scores, okm = ds.search_by_id(req["id"], int(req.get("k", 10)))
            return ok(_response_ids_scores(ids, scores, okm))
        if name == "HybridSearch":
            req = parse_search_request(json.loads(body))
            sanitize_search_request(req)  # same k/batch/filter caps as DoGet
            qv = np.asarray(req.query_vectors(), dtype=np.float32)
            if qv.size:
                _check_query_dim(
                    self.store._datasets.get(req.dataset), qv
                )
            ids, scores, okm = self.store.hybrid_search(
                req.dataset, qv if qv.size else None, req.k,
                text_query=req.text_query, alpha=req.alpha,
                filters=req.filters, graph_alpha=req.graph_alpha,
                graph_depth=req.graph_depth, fusion=req.fusion,
            )
            return ok(_response_ids_scores(ids, scores, okm))
        if name == "add-edge":
            req = json.loads(body)
            # reference SDK sends subject/predicate/object
            # (client.py:370-386); from/to/type is this repo's original
            # shape — accept both
            src = req["from"] if "from" in req else req["subject"]
            dst = req["to"] if "to" in req else req["object"]
            etype = req.get("type", req.get("predicate", ""))
            self.store.add_edge(
                req["dataset"], src, dst, etype,
                float(req.get("weight", 1.0)),
            )
            return ok({"added": True})
        if name == "traverse-graph":
            req = json.loads(body)
            if "start" in req and "from" not in req:
                # reference wire shape (SDK client.py:388-409 /
                # graph_api.go:60): enumerate simple paths from a
                # start node; response = JSON list of Path objects
                ds = self.store.get(req["dataset"])
                paths = ds.graph.traverse_paths(
                    req["start"],
                    max_hops=int(req.get("max_hops", 2) or 2),
                    incoming=bool(req.get("incoming", False)),
                    weighted=bool(req.get("weighted", True)),
                    decay=float(req.get("decay", 0.0) or 0.0),
                )
                return ok(paths)
            path = self.store.traverse_graph(
                req["dataset"], req["from"], req.get("to"),
                int(req.get("max_hops", 3)),
                strategy=req.get("strategy", "bfs"),
            )
            return ok({"path": path})
        if name == "GetGraphStats":
            req = json.loads(body)
            return ok(self.store.graph_stats(req.get("dataset", "")))
        if name == "graph-analytics":
            req = json.loads(body)
            return ok(self.store.graph_analytics(req.get("dataset", "")))
        if name == "checkpoint-prepare":
            # barrier phase 1 (reference: checkpoint_coordinator.go:67
            # InitiateCheckpoint): drain in-flight ingest so the
            # upcoming snapshot covers every acked write
            req = json.loads(body or b"{}")
            ready = True
            if self.ingest is not None:
                ready = self.ingest.drain(
                    timeout_s=float(req.get("timeout_s", 30.0))
                )
            return ok({"ready": ready, "epoch": req.get("epoch")})
        if name == "checkpoint-commit":
            # barrier phase 2: snapshot + WAL truncate
            req = json.loads(body or b"{}")
            if self.store.engine is None:
                return ok({"committed": False, "error": "no persist_dir"})
            self.store.snapshot()
            self.audit.record(
                "checkpoint_commit", "*", {"epoch": req.get("epoch")}
            )
            return ok({"committed": True, "epoch": req.get("epoch")})
        if name == "ForceSnapshot":
            # reference SDK snapshot(): immediate local snapshot, no
            # cluster barrier (longbowclientsdk client.py:349-355)
            drained = True
            if self.ingest is not None:
                drained = self.ingest.drain(timeout_s=30.0)
            if self.store.engine is None:
                return ok({"ok": False, "error": "no persist_dir"})
            self.store.snapshot()
            self.audit.record("snapshot", "*", {"drained": drained})
            if not drained:
                # acked-but-queued rows are NOT in this snapshot —
                # don't let a reference-style "snapshot = durable"
                # client believe they are
                return ok({"ok": False, "drained": False,
                           "error": "ingest queue did not drain"})
            return ok({"ok": True})
        if name == "checkpoint":
            # coordinator entry point: barrier alive peers on an epoch,
            # then commit everywhere (single-node: local snapshot)
            req = json.loads(body or b"{}")
            if self.ingest is not None:
                self.ingest.drain(
                    timeout_s=float(req.get("timeout_s", 30.0))
                )
            if self.cluster is not None and self.cluster.has_peers():
                result = self.cluster.coordinated_checkpoint(
                    timeout_s=float(req.get("timeout_s", 30.0))
                )
                if result["ok"] and self.store.engine is not None:
                    self.store.snapshot()
                    result["local"] = True
                return ok(result)
            if self.store.engine is None:
                return ok({"ok": False, "error": "no persist_dir"})
            self.store.snapshot()
            self.audit.record("checkpoint", "*")
            return ok({"ok": True, "local": True})
        if name == "merkle-state":
            req = json.loads(body)
            return ok(self.store.get(req["dataset"]).merkle_state())
        if name == "export-delta":
            req = json.loads(body)
            ds = self.store.get(req["dataset"])
            if "buckets" in req:
                # batched form: one RPC for many buckets — per-bucket
                # round trips against a write-busy donor measured
                # ~75ms each (256 buckets ≈ 19s/sync round)
                haves = req.get("haves") or {}
                rows: list = []
                for b in req["buckets"]:
                    rows.extend(
                        ds.export_delta(
                            int(b), have=haves.get(str(b))
                        )["rows"]
                    )
                return ok(
                    {"dataset": req["dataset"], "rows": rows}
                )
            return ok(
                ds.export_delta(int(req["bucket"]), have=req.get("have"))
            )
        raise flight.FlightServerError(f"unknown action {name!r}")

    def list_actions(self, context):
        return [
            ("VectorSearch", "batched vector search"),
            ("VectorSearchByID", "search by stored id"),
            ("HybridSearch", "dense+sparse fusion search"),
            ("delete", "delete ids from a dataset"),
            ("delete-dataset", "drop a dataset"),
            ("CreateNamespace", "create a namespace"),
            ("check_readiness", "readiness probe"),
            ("cluster-status", "cluster membership + dataset stats"),
            ("MeshStatus", "membership member list"),
            ("MeshIdentity", "this node's own member record"),
            ("DiscoveryStatus", "discovery provider + current peers"),
            ("GetTotalNamespaceCount", "number of namespaces"),
            ("GetNamespaceDatasetCount", "datasets in one namespace"),
            ("region-summary", "spatial routing: dataset centroid+radius"),
            ("list-datasets", "list dataset names"),
            ("add-edge", "GraphRAG: add an edge"),
            ("traverse-graph", "GraphRAG: BFS traverse"),
            ("GetGraphStats", "GraphRAG: edge-store stats"),
            ("graph-analytics", "GraphRAG: degree/component analytics"),
            ("ForceSnapshot", "immediate local snapshot"),
            ("merkle-state", "anti-entropy: merkle root + leaves"),
            ("export-delta", "anti-entropy: rows of one merkle bucket"),
            ("checkpoint", "coordinated cluster snapshot (epoch barrier)"),
            ("checkpoint-prepare", "checkpoint barrier phase 1"),
            ("checkpoint-commit", "checkpoint barrier phase 2"),
        ]

    # -- discovery --

    def _all_namespaces(self) -> set:
        with self._declared_mu:
            declared = {d.split("/", 1)[0] for d in self._declared_ns}
        return set(self.store.list_namespaces()) | declared

    def _persist_declared(self) -> None:
        if not self._declared_path:
            return
        try:
            with self._declared_mu:
                data = sorted(self._declared_ns)
            tmp = self._declared_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self._declared_path)
        except OSError:
            pass  # best-effort: in-memory state still serves

    def list_flights(self, context, criteria):
        existing = self.store.list_datasets()
        for name in existing:
            ds = self.store.get(name)
            descriptor = flight.FlightDescriptor.for_path(name.encode())
            yield flight.FlightInfo(
                self._dataset_schema(ds), descriptor, [], ds.live_count, -1
            )
        # declared-but-not-yet-materialized namespaces (no dim at
        # create time): empty schema, zero records
        with self._declared_mu:
            declared = set(self._declared_ns)
        for name in sorted(declared - set(existing)):
            descriptor = flight.FlightDescriptor.for_path(name.encode())
            yield flight.FlightInfo(pa.schema([]), descriptor, [], 0, -1)

    def get_flight_info(self, context, descriptor):
        name = descriptor.path[0].decode()
        try:
            ds = self.store.get(name)
        except KeyError:
            with self._declared_mu:
                declared = name in self._declared_ns
            if declared:  # declared, not materialized
                return flight.FlightInfo(
                    pa.schema([]), descriptor, [], 0, -1
                )
            raise
        return flight.FlightInfo(
            self._dataset_schema(ds), descriptor, [], ds.live_count, -1
        )

    def get_schema(self, context, descriptor):
        name = descriptor.path[0].decode()
        return flight.SchemaResult(self._dataset_schema(self.store.get(name)))

    @staticmethod
    def _dataset_schema(ds) -> pa.Schema:
        return pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field(
                    "vector", pa.list_(pa.float32(), ds.dim)
                ),
            ],
            metadata={METRIC_METADATA_KEY: ds.metric},
        )

    def spawn_unix_mirror(self, path: str) -> "UnixSocketMirror":
        """Companion listener on an AF_UNIX socket sharing this
        server's store and handlers. Loopback TCP on the target hosts
        tops out at ~0.5-0.9 GB/s while the same Flight stream over a
        unix socket measures 1.3-1.6 GB/s (tools/flight_floor_probe.py)
        — co-located clients (ETL sidecars, rerankers) get the fast
        path via LONGBOW_UNIX_SOCKET. (The reference binds TCP only,
        cmd/longbow/main.go:448; this is a host-local addition.)"""
        return UnixSocketMirror(self, path, **self._mirror_kw)


class UnixSocketMirror(flight.FlightServerBase):
    """Thin delegating listener: every RPC is handled by the primary
    LongbowFlightServer instance, so state, metrics, middleware and
    ingest queues are shared — only the transport differs."""

    def __init__(self, primary: LongbowFlightServer, path: str, **kw):
        if os.path.exists(path):
            os.unlink(path)  # stale socket from a previous run
        super().__init__(f"grpc+unix://{path}", **kw)
        self._primary = primary
        self.path = path
        try:
            os.chmod(path, 0o600)  # local-root only; no TLS on AF_UNIX
        except OSError:
            pass

    def do_put(self, context, descriptor, reader, writer):
        return self._primary.do_put(context, descriptor, reader, writer)

    def do_get(self, context, ticket):
        return self._primary.do_get(context, ticket)

    def do_exchange(self, context, descriptor, reader, writer):
        return self._primary.do_exchange(context, descriptor, reader, writer)

    def do_action(self, context, action):
        return self._primary.do_action(context, action)

    def list_actions(self, context):
        return self._primary.list_actions(context)

    def list_flights(self, context, criteria):
        return self._primary.list_flights(context, criteria)

    def get_flight_info(self, context, descriptor):
        return self._primary.get_flight_info(context, descriptor)

    def get_schema(self, context, descriptor):
        return self._primary.get_schema(context, descriptor)


def Dataset_key(uid):
    return uid.item() if hasattr(uid, "item") else uid


def _check_query_dim(ds, qv: np.ndarray) -> None:
    """Clear bad-request on mismatched query dimensionality instead of
    an opaque dot_general shape error from inside the kernel.
    ValueError so the do_get/do_action wrappers count the error and
    record the middleware failure like every other bad request."""
    if ds is None:
        return
    if qv.ndim == 2 and qv.shape[1] != ds.dim:
        raise ValueError(
            f"query dimension {qv.shape[1]} != dataset "
            f"{ds.name!r} dimension {ds.dim}"
        )


def _ids_arrow_array(ids: list) -> pa.Array:
    if ids and isinstance(ids[0], str):
        return pa.array(ids, pa.string())
    return pa.array([int(i) for i in ids], pa.int64())


def _filters_to_wire(filters) -> list:
    """Filter objects -> the reference's wire shape, for peer fan-out."""
    return [
        {
            "field": f.field,
            "operator": f.operator,
            "value": f.value,
            "logic": f.logic,
        }
        for f in (filters or [])
    ]


def _response_ids_scores(ids, scores, ok) -> dict:
    """reference: VectorSearchResponse {ids: [], scores: []}
    (requests.go:24-27); flattened across the query batch, with a
    query_index column (wire-compatible superset) so batched fan-out
    responses merge per query."""
    okm = np.asarray(ok)
    bi, ji = np.nonzero(okm)
    out_i = [
        v.item() if hasattr(v, "item") else v for v in ids[bi, ji]
    ]
    out_s = np.asarray(scores)[bi, ji].astype(float).tolist()
    return {"ids": out_i, "scores": out_s, "query_index": bi.tolist()}


class ServerHandle:
    def __init__(self, data_server, meta_server, threads, mirrors=()):
        self.data_server = data_server
        self.meta_server = meta_server
        self.mirrors = list(mirrors)
        self._threads = threads

    def shutdown(self):
        for m in self.mirrors:
            m.shutdown()
        self.data_server.shutdown()
        self.meta_server.shutdown()
        for t in self._threads:
            t.join(timeout=5)


def serve(
    store: Optional[VectorStore] = None,
    data_port: int = 3000,
    meta_port: int = 3001,
    host: str = "0.0.0.0",
    block: bool = False,
    middleware_chain=None,
    unix_socket_dir: Optional[str] = None,
) -> ServerHandle:
    """Start data (:3000) + meta (:3001) Flight servers sharing one
    store (reference: cmd/longbow/main.go:476-521). unix_socket_dir:
    also listen on <dir>/data.sock + <dir>/meta.sock AF_UNIX mirrors
    (the host-local fast path)."""
    store = store or VectorStore()
    data = LongbowFlightServer(
        store, f"grpc://{host}:{data_port}", middleware_chain=middleware_chain
    )
    meta = LongbowFlightServer(
        store, f"grpc://{host}:{meta_port}", middleware_chain=middleware_chain
    )
    threads = []
    mirrors = []
    if unix_socket_dir:
        os.makedirs(unix_socket_dir, exist_ok=True)
        for srv, sock in ((data, "data.sock"), (meta, "meta.sock")):
            m = srv.spawn_unix_mirror(os.path.join(unix_socket_dir, sock))
            t = threading.Thread(target=m.serve, daemon=True)
            t.start()
            threads.append(t)
            mirrors.append(m)
    if block:
        t = threading.Thread(target=meta.serve, daemon=True)
        t.start()
        threads.append(t)
        data.serve()
    else:
        for srv in (data, meta):
            t = threading.Thread(target=srv.serve, daemon=True)
            t.start()
            threads.append(t)
    return ServerHandle(data, meta, threads, mirrors)
