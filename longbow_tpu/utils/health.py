"""Health manager + checkers (reference: health/health_manager.go,
checkers.go:13-140; the check_readiness action reports READY/BUSY from
queue depths, store_actions.go:57-101)."""
from __future__ import annotations

import time
from typing import Callable


class HealthManager:
    def __init__(self):
        self._checkers: dict[str, Callable[[], dict]] = {}

    def register(self, name: str, fn: Callable[[], dict]) -> None:
        self._checkers[name] = fn

    def check(self) -> dict:
        out = {"status": "healthy", "checks": {}, "ts": time.time()}
        for name, fn in self._checkers.items():
            try:
                r = fn()
            except Exception as e:
                r = {"healthy": False, "error": str(e)}
            out["checks"][name] = r
            if not r.get("healthy", False):
                out["status"] = "unhealthy"
        return out


def store_checker(store) -> Callable[[], dict]:
    def check() -> dict:
        r = store.readiness()
        return {"healthy": r["status"] == "READY", **r}

    return check


def storage_checker(store) -> Callable[[], dict]:
    def check() -> dict:
        if store.engine is None:
            return {"healthy": True, "persistence": "disabled"}
        return {
            "healthy": True,
            "wal_bytes": store.engine.wal.size_bytes,
        }

    return check


def device_checker() -> Callable[[], dict]:
    def check() -> dict:
        import jax

        devs = jax.devices()
        return {
            "healthy": len(devs) > 0,
            "devices": [str(d) for d in devs],
            "backend": jax.default_backend(),
        }

    return check
