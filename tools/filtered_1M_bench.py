"""On-chip BASELINE config 3: filtered + tombstoned recall@10 at 1M.

Sweep: predicate masks at 50% / 10% / 1% selectivity, each combined
with 10% tombstone churn, on BOTH the flat fused kernel and the graph
tier (reference machinery: bitset prefilter dataset.go:226-297 +
adaptive oversampling adaptive_search.go:7). Records recall@10 vs the
filtered exact oracle and honest reduction-forced QPS per point into
benchmarks/filtered_1M.json.

Honest methodology per CLAUDE.md (all outputs into one pre-compiled
reduction; fetch its scalar). One remote compile at a time.
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[filt {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "3000"))):
        log("DEADLINE EXCEEDED"); _o._exit(4)
threading.Thread(target=_deadline, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
cache_dir = os.path.join(cache_dir, machine_cache_tag())
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import flat_search_rerank

N, D, K, NEV = 1_000_000, 128, 10, 512
B_FLAT = 2048
SELECTIVITIES = (0.5, 0.1, 0.01)
TOMBSTONE = 0.10

log("on-device corpus gen (seed 0, gmm1024 recipe)...")

@jax.jit
def gen():
    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B_FLAT,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + B_FLAT, D), jnp.float32)
    return allv[:N], allv[N:]

t0 = time.time()
cj, qj = gen()
c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj)

@jax.jit
def masks():
    kt, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 4)
    alive = jax.random.uniform(kt, (N,)) >= TOMBSTONE  # 10% tombstones
    sels = {}
    for s, kk in zip(SELECTIVITIES, (k1, k2, k3)):
        sels[s] = jax.random.uniform(kk, (N,)) < s
    return alive, sels

alive, sels = masks()
float(jnp.sum(norms))
log(f"gen+masks {time.time()-t0:.0f}s")

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i): return q + 1e-6 * (i + 1)

def recall_vs(gt, idx_np):
    return float(np.mean([
        len(set(idx_np[j].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))

def measure(fn, iters=10):
    qb = [_perturb(qj, i) for i in range(iters)]
    d = fn(qb[0]); float(np.asarray(_force(*([d] * iters))))
    t0 = time.perf_counter()
    outs = [fn(q) for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

results = {"corpus": f"{N}x{D}", "tombstone_frac": TOMBSTONE,
           "recipe": "dev-gmm1024-key0-masks-key7", "points": []}

# ---- graph build once (tombstones applied via delete_rows) ----
graph_ok = True
try:
    from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex

    log("graph build 1M (m=32/m_max=48)...")
    t0 = time.time()
    gidx = HNSWIndex(
        D, dtype=jnp.bfloat16, storage="dense",
        edge_dtype=jnp.bfloat16,
        config=HNSWConfig(m=32, m_max=48, ef_search=100),
        capacity=N,
    )
    gidx.add(c16)
    gidx.state.nbrs.block_until_ready()
    log(f"graph build {time.time()-t0:.0f}s")
    dead = np.nonzero(~np.asarray(alive))[0]
    t0 = time.time()
    gidx.delete_rows(dead)
    log(f"tombstoned {len(dead)} rows in {time.time()-t0:.0f}s")
except Exception as e:
    log(f"graph build failed: {e}")
    graph_ok = False

for s in SELECTIVITIES:
    fmask = sels[s]
    eff = jnp.logical_and(alive, fmask)
    n_eff = int(jnp.sum(eff))
    log(f"--- selectivity {s} ({n_eff} eligible rows) ---")
    t0 = time.time()
    _, gt_i = exact_search(
        qj[:NEV], cj, K, Metric.L2, corpus_norms_sq=norms,
        valid=eff, exact_precision=True, chunk_rows=131072,
    )
    gt = np.asarray(gt_i)
    log(f"filtered oracle {time.time()-t0:.0f}s")

    # flat fused kernel with extra_mask
    def flat_fn(q):
        return flat_search_rerank(
            q, c16, norms, alive, K, Metric.L2, pool=64,
            extra_mask=fmask,
        )
    d, i = flat_fn(qj)
    rec_flat = recall_vs(gt, np.asarray(i)[:NEV])
    dt_flat = measure(lambda q: flat_fn(q)[0])
    log(f"flat: recall {rec_flat:.4f}  {dt_flat*1000:.2f} ms/{B_FLAT}q "
        f"= {B_FLAT/dt_flat:.0f} QPS")
    point = {
        "selectivity": s, "eligible_rows": n_eff,
        "flat_recall_at_10": round(rec_flat, 4),
        "flat_qps_b2048": round(B_FLAT / dt_flat, 1),
        "flat_ms_per_batch": round(dt_flat * 1000, 3),
    }

    if graph_ok:
        try:
            gq = qj[:128]
            cap_g = gidx.state.vectors.shape[0]
            fmask_g = jnp.pad(fmask, (0, cap_g - N))
            gd, gr = gidx.search(gq, K, filter_mask=fmask_g)
            g_got = np.asarray(gr)
            rec_g = float(np.mean([
                len(set(g_got[j].tolist()) & set(gt[j].tolist())) / K
                for j in range(128)
            ]))
            def g_fn(q):
                return gidx.search(q[:128], K, filter_mask=fmask_g)[0]
            dt_g = measure(g_fn, iters=10)
            log(f"graph: recall {rec_g:.4f}  {dt_g*1000:.2f} ms/128q "
                f"= {128/dt_g:.0f} QPS")
            point.update({
                "graph_recall_at_10": round(rec_g, 4),
                "graph_qps_b128": round(128 / dt_g, 1),
                "graph_ms_per_batch": round(dt_g * 1000, 3),
            })
        except Exception as e:
            log(f"graph point failed: {e}")
            point["graph_error"] = str(e)[:200]
    results["points"].append(point)

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "filtered_1M.json")
results["captured_at_utc"] = time.strftime(
    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
with open(out, "w") as f:
    json.dump(results, f, indent=1)
log(f"wrote {out}")
log("SUMMARY " + json.dumps(results["points"]))
_done.set()
