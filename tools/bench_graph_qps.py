"""Graph-search QPS probe: expand_per_iter and storage sweep.

Round-1 finding: lockstep beam search is gather-bound (~1.6k QPS at
B=128). Levers measured here: wider per-iteration expansion (fewer
while_loop trips for the same ef budget) and SQ8 storage (half the
gather bytes of bf16).

Usage: python tools/bench_graph_qps.py [n_rows]
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d, b, k, ef = 128, 128, 10, 100

    import jax
    import jax.numpy as jnp

    from longbow_tpu.index.graph import beam_search
    from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
    from longbow_tpu.ops.distance import exact_search, Metric

    rng = np.random.default_rng(0)
    cents = rng.standard_normal((max(1000, n // 200), d)).astype(np.float32) * 4
    v = (cents[rng.integers(0, len(cents), n)]
         + rng.standard_normal((n, d)).astype(np.float32))
    q = (cents[rng.integers(0, len(cents), 2 * b)]
         + rng.standard_normal((2 * b, d)).astype(np.float32))[:b]
    ed, er = exact_search(
        jnp.asarray(q), jnp.asarray(v), k, Metric.L2,
        exact_precision=True, chunk_rows=131072,
    )
    want = np.asarray(er)

    for storage in ("dense", "sq8"):
        idx = HNSWIndex(
            d, storage=storage, dtype=jnp.bfloat16,
            config=HNSWConfig(m=32, m_max=64), capacity=n,
        )
        t0 = time.time()
        idx.add(v)
        print(f"[{storage}] build {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)
        idx._refresh_sample()
        for ex in (2, 4, 8):
            qj = jnp.asarray(q)
            dd, rr = beam_search(
                idx.state, qj, idx._sample_rows, k, ef,
                expand_per_iter=ex,
            )
            got = np.asarray(rr)
            rec = np.mean(
                [len(set(got[i]) & set(want[i])) / k for i in range(b)]
            )
            # queued distinct-input dispatches, one fetch
            iters = 30
            qs = [jnp.asarray(q + 1e-6 * i) for i in range(iters)]
            beam_search(
                idx.state, qs[0], idx._sample_rows, k, ef,
                expand_per_iter=ex,
            )[0].block_until_ready()
            t0 = time.perf_counter()
            outs = [
                beam_search(
                    idx.state, x, idx._sample_rows, k, ef,
                    expand_per_iter=ex,
                )[0]
                for x in qs
            ]
            float(outs[-1][0, 0])
            dt = (time.perf_counter() - t0) / iters
            print(
                f"storage={storage} ex={ex} ef={ef}: "
                f"{b/dt:.0f} QPS  recall@10={rec:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
