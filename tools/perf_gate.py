"""Perf regression gate: compare two bench JSON files, warn/fail on
regressions beyond a threshold.

reference: the benchstat PR-vs-main gate (.github/workflows/
benchmark.yml:33-60 — warn on >10% slowdown). Usage:

    python tools/perf_gate.py baseline.json current.json --warn-pct 10
    python tools/perf_gate.py baseline.json current.json --fail-pct 25

Metrics are higher-is-better unless their name ends in _ms/_s/_seconds.
Exit code 0 = ok/warn, 1 = hard regression beyond --fail-pct.
"""
from __future__ import annotations

import argparse
import json
import sys


def lower_is_better(name: str) -> bool:
    if name.endswith("_per_s"):  # rates are higher-is-better
        return False
    return name.endswith(("_ms", "_s", "_seconds", "_latency"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--warn-pct", type=float, default=10.0)
    ap.add_argument("--fail-pct", type=float, default=0.0,
                    help="0 = never hard-fail")
    args = ap.parse_args()

    base = json.load(open(args.baseline))
    cur = json.load(open(args.current))

    worst = 0.0
    rows = []
    for k, b in base.items():
        if not isinstance(b, (int, float)) or b == 0 or k not in cur:
            continue
        c = cur[k]
        if not isinstance(c, (int, float)):
            continue
        delta = (b - c) / b if not lower_is_better(k) else (c - b) / b
        rows.append((k, b, c, delta * 100))
        worst = max(worst, delta * 100)

    for k, b, c, d in rows:
        flag = " <-- REGRESSION" if d > args.warn_pct else ""
        print(f"{k:30s} base={b:<12g} cur={c:<12g} delta={d:+.1f}%{flag}")

    if args.fail_pct and worst > args.fail_pct:
        print(f"FAIL: worst regression {worst:.1f}% > {args.fail_pct}%")
        return 1
    if worst > args.warn_pct:
        print(f"WARN: worst regression {worst:.1f}% > {args.warn_pct}%")
    else:
        print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
