"""On-chip: SQ8 vs residual-SQ8 recall/QPS at 1M x 128 clustered.

VERDICT r3 #5 second half: attack the 1M global-affine SQ8 ceiling
(~0.944 recall@10, CLAUDE.md) with the residual quantizer (index kind
"sq8r", index/sq8.py) and record the numbers. Reference bar:
recall_validation_test.go:42-46 (>=0.95 @ 10k x 384); this runs the
same methodology at 100x the reference's gate scale.

Usage: python tools/onchip_sq8_1m.py [n_rows]
"""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m): print(f"[sq8 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
cache_dir = os.path.join(cache_dir, machine_cache_tag())
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.index.sq8 import SQ8Index, SQ8ResidualIndex

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, K, NEV = 128, 10, 512
rng = np.random.default_rng(0)
n_clusters = 1024
centers = rng.standard_normal((n_clusters, D)).astype(np.float32) * 4.0
assign = rng.integers(0, n_clusters, N + 2048)
allv = (centers[assign] + rng.standard_normal((N + 2048, D)).astype(np.float32))
corpus, queries = allv[:N], allv[N:]

cj = jnp.asarray(corpus)
norms = squared_norms(cj); valid = jnp.ones((N,), bool)
log("oracle...")
t0 = time.time()
gt_d, gt_i = exact_search(jnp.asarray(queries[:NEV]), cj, K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True,
    chunk_rows=131072)
gt = np.asarray(gt_i); log(f"oracle {time.time()-t0:.0f}s")
del cj, norms, valid

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

def eval_index(idx, name):
    log(f"{name}: add {N} rows...")
    t0 = time.time()
    for off in range(0, N, 131_072):
        idx.add(corpus[off:off + 131_072])
    # force completion for honest build time
    float(np.asarray(_force(idx.codes[:1].astype(jnp.float32))))
    build_s = time.time() - t0
    log(f"{name}: build {build_s:.1f}s ({N/build_s/1e3:.1f}k rows/s)")
    got = []
    for off in range(0, NEV, 128):
        _, i = idx.search(queries[off:off + 128], K)
        got.append(np.asarray(i))
    got = np.concatenate(got)
    rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K
                         for i in range(NEV)]))
    # honest timing: all outputs into one jitted reduction
    B, iters = 2048, 4
    qb = [jnp.asarray(queries[:B] + 1e-6 * i) for i in range(iters)]
    d, _ = idx.search(qb[0], K)
    float(np.asarray(_force(*([d] * iters))))  # pre-compile reducer
    outs = []
    t0 = time.perf_counter()
    for q in qb:
        d, _ = idx.search(q, K)
        outs.append(d)
    float(np.asarray(_force(*outs)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    qps = B / ms * 1e3
    log(f"{name}: recall@10 {rec:.4f}  {ms:.2f} ms/batch@{B}  {qps:.0f} QPS")
    return {"recall_at_10": round(rec, 4), "build_s": round(build_s, 1),
            "ms_b2048": round(ms, 2), "qps_b2048": round(qps, 1)}

out = {"n": N, "d": D, "k": K, "n_eval": NEV, "corpus": "clustered_1024c"}
out["sq8"] = eval_index(SQ8Index(D), "sq8")
out["sq8r"] = eval_index(SQ8ResidualIndex(D), "sq8r")
print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        f"sq8_scale_{N//1000}k.json"), "w") as f:
    json.dump(out, f, indent=1)
