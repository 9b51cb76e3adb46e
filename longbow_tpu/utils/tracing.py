"""Tracing/profiling hooks.

reference: OTel TracerProvider + otelgrpc + pprof on the metrics port
(cmd/longbow/main.go:291-356,570-588; tracing/opentelemetry.go). The
TPU-native story (SURVEY.md §5): `jax.profiler` traces viewable in
Perfetto/TensorBoard replace pprof for device time; host spans are a
light contextmanager that logs into the metrics histograms.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional


@contextlib.contextmanager
def device_trace(out_dir: str | Path):
    """Capture a jax.profiler trace (open in Perfetto / TensorBoard)."""
    import jax

    out = str(out_dir)
    jax.profiler.start_trace(out)
    try:
        yield out
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def span(name: str, registry=None):
    """Host-side span: counts into longbow_trace_spans_total{name}
    (reference: docs/metrics.md Observability) and times the block
    into a span-duration histogram when a registry is provided."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if registry is not None:
            registry.inc("longbow_trace_spans_total", name=name)
            registry.observe(
                "longbow_tpu_span_duration_seconds",
                time.perf_counter() - t0,
                name=name,
            )


def annotate(name: str):
    """Named region visible in device traces (jax.named_scope)."""
    import jax

    return jax.named_scope(name)
