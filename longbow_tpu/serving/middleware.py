"""Admission control: token-bucket rate limiting + circuit breaker.

reference: limiter/limiter.go:15-21 (RATE_LIMIT_RPS/BURST token
bucket), middleware/circuit_breaker.go:15 (trips after 10 consecutive
failures, 30s cooldown), resilience/circuit_breaker.go.
"""
from __future__ import annotations

import threading
import time

import pyarrow.flight as flight


class RateLimiter:
    """Token bucket; rps<=0 disables (reference default)."""

    def __init__(self, rps: float = 0.0, burst: int = 0):
        self.rps = rps
        if rps > 0:
            self.burst = burst if burst > 0 else max(int(rps), 1)
        else:
            self.burst = 0
        self._tokens = float(self.burst)
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def allow(self) -> bool:
        if self.rps <= 0:
            return True
        with self._lock:
            now = time.monotonic()
            self._tokens = min(
                self.burst, self._tokens + (now - self._last) * self.rps
            )
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return True
            return False


class CircuitBreaker:
    """CLOSED -> OPEN after `threshold` consecutive failures; half-open
    retry after `cooldown_s` (reference: middleware/circuit_breaker.go:15
    — 10 failures, 30s cooldown)."""

    def __init__(self, threshold: int = 10, cooldown_s: float = 30.0):
        self.threshold = threshold
        self.cooldown_s = cooldown_s
        self._failures = 0
        self._opened_at = 0.0
        self._lock = threading.Lock()

    @property
    def state(self) -> str:
        with self._lock:
            if self._failures < self.threshold:
                return "closed"
            if time.monotonic() - self._opened_at >= self.cooldown_s:
                return "half-open"
            return "open"

    def allow(self) -> bool:
        return self.state != "open"

    def record_success(self) -> None:
        with self._lock:
            self._failures = 0

    def record_failure(self) -> None:
        with self._lock:
            self._failures += 1
            if self._failures == self.threshold:
                self._opened_at = time.monotonic()


class MiddlewareChain:
    """The serving edge's interceptor chain
    (reference: cmd/longbow/main.go:448-458 CircuitBreaker -> RateLimit
    -> PartitionProxy; partition proxying is obsolete here — sharding
    lives inside the device mesh)."""

    def __init__(
        self,
        rate_limit_rps: float = 0.0,
        rate_limit_burst: int = 0,
        breaker_threshold: int = 10,
        breaker_cooldown_s: float = 30.0,
    ):
        self.limiter = RateLimiter(rate_limit_rps, rate_limit_burst)
        self.breaker = CircuitBreaker(breaker_threshold, breaker_cooldown_s)

    def admit(self, op: str) -> None:
        if not self.breaker.allow():
            raise flight.FlightUnavailableError(
                f"circuit breaker open for {op}"
            )
        if not self.limiter.allow():
            raise flight.FlightUnavailableError("rate limit exceeded")

    def record_failure(self, op: str) -> None:
        self.breaker.record_failure()

    def record_success(self, op: str) -> None:
        self.breaker.record_success()
