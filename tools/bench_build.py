"""Graph-build throughput probe (VERDICT r2 work: win the index-build
metric). Measures bulk builders at several corpus sizes on the real
chip, with recall checks against the exact oracle.

Usage: python tools/bench_build.py [n_rows ...] [--mode exact|clustered]
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [200_000]
    mode = "clustered" if "--clustered" in sys.argv else (
        "exact" if "--exact" in sys.argv else
        "rp" if "--rp" in sys.argv else "auto"
    )
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=")[1])

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} mode={mode}", file=sys.stderr)
    from longbow_tpu.index.graph import beam_search
    from longbow_tpu.index.graph_build import (
        bulk_build_clustered,
        bulk_build_edges,
        bulk_build_rp,
    )
    from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
    from longbow_tpu.ops.distance import exact_search, Metric

    for n in sizes:
        d = 128
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((n, d), dtype=np.float32)
        idx = HNSWIndex(
            d, config=HNSWConfig(m=32, m_max=64), dtype=jnp.bfloat16,
            capacity=n,
        )
        # store rows without linking (mimic add()'s storage phase)
        jv = jnp.asarray(vecs)
        from longbow_tpu.ops.distance import squared_norms

        s = idx.state
        idx.state = s._replace(
            vectors=jax.lax.dynamic_update_slice(
                s.vectors, jv.astype(idx.dtype), (0, 0)
            ),
            norms_sq=jax.lax.dynamic_update_slice(
                s.norms_sq, squared_norms(jv), (0,)
            ),
            valid=jax.lax.dynamic_update_slice(
                s.valid, jnp.ones((n,), bool), (0,)
            ),
        )
        idx.count = n
        idx.state.vectors.block_until_ready()

        t0 = time.time()
        if mode == "rp" or (mode == "auto" and n >= 150_000):
            idx.state = bulk_build_rp(
                idx.state, n, m=32, m_max=64, knn_k=48,
                rounds=8, block=4096, nn_rounds=rounds,
            )
        elif mode == "clustered":
            idx.state = bulk_build_clustered(
                idx.state, n, m=32, m_max=64, knn_k=64,
                nn_descent_rounds=rounds,
            )
        else:
            idx.state = bulk_build_edges(idx.state, n, m=32, m_max=64, knn_k=63)
        idx.state.nbrs.block_until_ready()
        dt = time.time() - t0
        print(
            f"n={n} build={dt:.1f}s vps={n/dt:.0f}",
            file=sys.stderr, flush=True,
        )

        # recall@10 on 256 queries
        q = rng.standard_normal((256, d), dtype=np.float32)
        idx._refresh_sample()
        dd, rr = idx.search(jnp.asarray(q), 10, ef_search=128)
        ed, er = exact_search(
            jnp.asarray(q), jnp.asarray(vecs), 10, Metric.L2,
            exact_precision=True,
        )
        got, want = np.asarray(rr), np.asarray(er)
        rec = np.mean(
            [len(set(got[i]) & set(want[i])) / 10 for i in range(256)]
        )
        print(
            f"n={n} recall@10(ef=128)={rec:.4f} vps={n/dt:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
