"""Prometheus metrics with reference-compatible names.

reference: internal/metrics/ (479 collector registrations), key names
in README.md:96-110 and docs/metrics.md; served on :9090
(cmd/longbow/main.go:291-356). Built on prometheus_client (baked into
this image); the registry pre-declares the reference's key metrics so
dashboards built for the reference keep working, and exposes
counter()/gauge()/histogram() for ad-hoc ones.
"""
from __future__ import annotations

import threading
import time
from typing import Optional

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    start_http_server,
)

_LATENCY_BUCKETS = (
    0.0001, 0.00025, 0.0005, 0.001, 0.0025, 0.005, 0.01, 0.025,
    0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0,
)


class MetricsRegistry:
    def __init__(self):
        self.registry = CollectorRegistry()
        self._metrics: dict[str, object] = {}
        self._lock = threading.Lock()
        # reference key metrics (README.md:96-110)
        self.counter("longbow_flight_operations_total", ("op",))
        self.histogram("longbow_flight_duration_seconds", ("op",))
        self.counter("longbow_flight_rows_processed_total")
        self.histogram("longbow_vector_search_latency_seconds")
        self.gauge("longbow_vector_index_size", ("dataset",))
        self.gauge("longbow_tombstones_total", ("dataset",))
        self.gauge("longbow_index_queue_depth")
        self.gauge("longbow_memory_fragmentation_ratio")
        self.counter("longbow_wal_bytes_written_total")
        self.histogram("longbow_snapshot_duration_seconds")
        self.counter("longbow_evictions_total")
        self.counter("longbow_ipc_decode_errors_total")
        # TPU-native additions
        self.histogram("longbow_tpu_kernel_compile_seconds")
        self.gauge("longbow_tpu_hbm_bytes_in_use", ("dataset",))
        self.counter("longbow_query_cache_hits_total")
        self.counter("longbow_query_cache_misses_total")

    def _get_or_make(self, cls, name: str, labels=(), **kw):
        with self._lock:
            m = self._metrics.get(name)
            if m is None:
                m = cls(
                    name, name.replace("_", " "), list(labels),
                    registry=self.registry, **kw,
                )
                self._metrics[name] = m
            return m

    def counter(self, name: str, labels=()) -> Counter:
        return self._get_or_make(Counter, name, labels)

    def gauge(self, name: str, labels=()) -> Gauge:
        return self._get_or_make(Gauge, name, labels)

    def histogram(self, name: str, labels=()) -> Histogram:
        return self._get_or_make(
            Histogram, name, labels, buckets=_LATENCY_BUCKETS
        )

    def time_op(self, op: str):
        """Context manager timing a flight op into the reference's
        duration histogram + ops counter."""
        return _OpTimer(self, op)

    def serve(self, port: int = 9090) -> None:
        """Expose /metrics (reference serves :9090,
        cmd/longbow/main.go:291)."""
        start_http_server(port, registry=self.registry)


class _OpTimer:
    def __init__(self, reg: MetricsRegistry, op: str):
        self.reg = reg
        self.op = op

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.reg.counter(
            "longbow_flight_operations_total", ("op",)
        ).labels(op=self.op).inc()
        self.reg.histogram(
            "longbow_flight_duration_seconds", ("op",)
        ).labels(op=self.op).observe(time.perf_counter() - self.t0)
        return False


_global: Optional[MetricsRegistry] = None
_glock = threading.Lock()


def get_registry() -> MetricsRegistry:
    global _global
    with _glock:
        if _global is None:
            _global = MetricsRegistry()
        return _global
