"""Metrics, middleware, config, logging."""
import os

import numpy as np
import pytest

from longbow_tpu.config import Config, load_config
from longbow_tpu.metrics.registry import MetricsRegistry
from longbow_tpu.serving.middleware import (
    CircuitBreaker,
    MiddlewareChain,
    RateLimiter,
)


def test_metrics_registry_reference_names():
    reg = MetricsRegistry()
    reg.counter("longbow_flight_rows_processed_total").inc(5)
    reg.gauge("longbow_vector_index_size", ("dataset",)).labels(
        dataset="d"
    ).set(42)
    with reg.time_op("DoGet"):
        pass
    from prometheus_client import generate_latest

    text = generate_latest(reg.registry).decode()
    assert "longbow_flight_rows_processed_total 5.0" in text
    assert 'longbow_vector_index_size{dataset="d"} 42.0' in text
    assert 'longbow_flight_operations_total{op="DoGet"} 1.0' in text
    assert "longbow_flight_duration_seconds_bucket" in text


def test_rate_limiter():
    rl = RateLimiter(rps=100.0, burst=2)
    assert rl.allow() and rl.allow()
    assert not rl.allow()  # burst exhausted
    assert RateLimiter(rps=0).allow()  # disabled


def test_circuit_breaker_trips_and_recovers():
    cb = CircuitBreaker(threshold=3, cooldown_s=0.05)
    assert cb.allow()
    for _ in range(3):
        cb.record_failure()
    assert cb.state == "open" and not cb.allow()
    import time

    time.sleep(0.06)
    assert cb.state == "half-open" and cb.allow()
    cb.record_success()
    assert cb.state == "closed"


def test_middleware_chain_raises_flight_errors():
    import pyarrow.flight as flight

    mw = MiddlewareChain(rate_limit_rps=1000, breaker_threshold=2)
    mw.admit("DoGet")
    mw.record_failure("DoGet")
    mw.record_failure("DoGet")
    with pytest.raises(flight.FlightUnavailableError):
        mw.admit("DoGet")


def test_config_env_vars(monkeypatch):
    monkeypatch.setenv("LONGBOW_HNSW_M", "48")
    monkeypatch.setenv("LONGBOW_RATE_LIMIT_RPS", "100.5")
    monkeypatch.setenv("LONGBOW_WAL_SYNC", "always")
    cfg = load_config()
    assert cfg.hnsw_m == 48
    assert cfg.rate_limit_rps == 100.5
    assert cfg.wal_sync == "always"


def test_config_validation(monkeypatch):
    monkeypatch.setenv("LONGBOW_META_PORT", "3000")  # clashes with data
    with pytest.raises(ValueError):
        load_config()


def test_json_logging(capsys):
    import json
    import logging

    from longbow_tpu.utils.logging import setup_logging

    log = setup_logging("testlog")
    log.error("boom", extra={"fields": {"dataset": "x"}})
    err = capsys.readouterr().err
    rec = json.loads(err.strip().splitlines()[-1])
    assert rec["level"] == "error" and rec["dataset"] == "x"
