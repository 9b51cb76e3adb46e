"""High-D graph-vs-scan on one chip: does the graph's claimed high-D
regime exist?

ARCHITECTURE.md lists "high-D corpora" as a remaining single-chip graph
regime (scan cost scales with D, beam gather is per-row). But measured
graph QPS is row-gather-bound (~93M rows/s) and roughly N- and
D-invariant, while the scan's QPS falls with N*D — so the crossover
sits at N*D ~ 9e9, past what 16GB HBM can hold. This measures the
claim directly at D=768 (the common embedding width).

Usage: python tools/onchip_highdim.py [n_rows] [dim]
"""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import gc, json, threading, time
import numpy as np

def log(m): print(f"[hd {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def _probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=_probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

import jax, jax.numpy as jnp
from longbow_tpu.config import machine_cache_tag
cache_dir = _o.path.join(_o.path.expanduser("~"), ".cache", "longbow_tpu",
                         "xla", machine_cache_tag())
_o.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import flat_search_rerank

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
K, NEV, B_HEAD = 10, 256, 2048

log(f"corpus {N}x{D} (clustered)")
rng = np.random.default_rng(0)
ncl = 2048
centers = rng.standard_normal((ncl, D)).astype(np.float32) * 4.0
CH = 125_000
parts = []
for off in range(0, N, CH):
    m = min(CH, N - off)
    a = rng.integers(0, ncl, m)
    parts.append(jnp.asarray(
        centers[a] + rng.standard_normal((m, D)).astype(np.float32)
    ).astype(jnp.bfloat16))
c16 = jnp.concatenate(parts); del parts; gc.collect()
queries = (centers[rng.integers(0, ncl, NEV + B_HEAD)]
           + rng.standard_normal((NEV + B_HEAD, D)).astype(np.float32))

@jax.jit
def _force_i(x): return jnp.sum(x.astype(jnp.float32))
@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex

results = {"n": N, "d": D}
log("graph build (cold incl compiles)...")
gidx = HNSWIndex(
    D, dtype=jnp.bfloat16, storage="dense", edge_dtype=jnp.bfloat16,
    config=HNSWConfig(m=32, m_max=48, ef_search=100), capacity=N,
)
t0 = time.time()
gidx.add(c16)
float(np.asarray(_force_i(gidx.state.nbrs)))
t_build = time.time() - t0
log(f"build {t_build:.1f}s = {N/t_build:.0f} vec/s")
s = gidx.state
hbm = sum(a.size * a.dtype.itemsize
          for a in s if a is not None and hasattr(a, "size"))
results.update(graph_build_s=round(t_build, 1),
               graph_build_vps=round(N / t_build, 1),
               graph_hbm_mb=round(hbm / 2**20, 1))

norms = squared_norms(c16.astype(jnp.float32))
valid = jnp.ones((N,), bool)
log("oracle...")
t0 = time.time()
_, gt_i = exact_search(
    jnp.asarray(queries[:NEV]), c16.astype(jnp.float32), K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True,
    chunk_rows=65536,
)
gt = np.asarray(gt_i); gc.collect()
log(f"oracle {time.time()-t0:.0f}s")

def measure(fn, nb, iters):
    qb = [jnp.asarray(queries[:nb] + 1e-6 * i) for i in range(iters)]
    d, _ = fn(qb[0])
    float(np.asarray(_force(*([d] * iters))))
    t0 = time.perf_counter()
    outs = [fn(q)[0] for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

def recall_of(fn, nq=NEV, bs=128):
    got = []
    for off in range(0, nq, bs):
        _, i = fn(jnp.asarray(queries[off:off + bs]))
        got.append(np.asarray(i))
    got = np.concatenate(got)
    return float(np.mean(
        [len(set(got[i]) & set(gt[i])) / K for i in range(nq)]
    ))

from longbow_tpu.index.graph import beam_search as _beam

gidx._refresh_sample()
for tag, ef in (("efs100", 100), ("efs150", 150)):
    fn = lambda q, _e=ef: _beam(
        gidx.state, q, gidx._sample_rows, K, _e,
        expand_per_iter=4, track_results=False,
    )
    rec = recall_of(fn)
    ms = measure(fn, 128, 10) * 1000
    results[f"graph_{tag}"] = {"recall": round(rec, 4),
                               "ms_b128": round(ms, 2),
                               "qps": round(128 / ms * 1000, 1)}
    log(f"graph {tag}: recall {rec:.4f}, {ms:.2f}ms/128q = "
        f"{128/ms*1000:.0f} QPS")

log("fused scan (fresh D kernel compile)...")
scan = lambda q: flat_search_rerank(
    q, c16, norms, valid, K, Metric.L2, pool=64
)
r_scan = recall_of(scan)
ms2048 = measure(scan, B_HEAD, 10) * 1000
ms128 = measure(scan, 128, 20) * 1000
results.update(
    scan_recall=round(r_scan, 4),
    scan_ms_b2048=round(ms2048, 3),
    scan_qps_b2048=round(B_HEAD / ms2048 * 1000, 1),
    scan_ms_b128=round(ms128, 3),
    scan_qps_b128=round(128 / ms128 * 1000, 1),
)
log(f"scan: recall {r_scan:.4f}, B=2048 {ms2048:.2f}ms "
    f"({B_HEAD/ms2048*1000:.0f} QPS), B=128 {ms128:.2f}ms")

print(json.dumps(results))
with open(_o.path.join(_o.path.dirname(_o.path.dirname(
        _o.path.abspath(__file__))), "benchmarks",
        f"highdim_{N//1000}k_{D}d.json"), "w") as f:
    json.dump(results, f, indent=1)
