"""On-chip: the fused quantized tier end-to-end at 1M x 128 (VERDICT
r4 task #1 'done' artifact). Builds REAL SQ8ResidualIndex + SQ8Index
instances (train, chunked adds, device relayout), then measures
recall@10 vs the f32 exact oracle and honest reduction-forced QPS
through the fused int8 kernel. Writes benchmarks/sq8_fused_1M.json.

Targets: sq8r recall >= 0.95 at QPS within 1.5x of the bf16 kernel
(same-session bf16 number recorded alongside for a fair ratio).
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[sq8f {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "2700"))):
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

N, D, K, NEV, B = 1_000_000, 128, 10, 512, 2048

log("on-device corpus gen (dev-gmm1024-key0)...")
t0 = time.time()

@jax.jit
def gen():
    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

cj, qj = gen()
c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj)
valid = jnp.ones((N,), bool)
float(jnp.sum(norms))
log(f"gen {time.time()-t0:.0f}s")

log("oracle...")
t0 = time.time()
_, gt_i = exact_search(
    qj[:NEV], cj, K, Metric.L2, corpus_norms_sq=norms, valid=valid,
    exact_precision=True, chunk_rows=131072,
)
gt = np.asarray(gt_i)
log(f"oracle {time.time()-t0:.0f}s")

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i): return q + 1e-6 * (i + 1)

def recall_of(i_np):
    return float(np.mean([
        len(set(i_np[j].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))

def measure(fn, iters=10):
    qb = [_perturb(qj, i) for i in range(iters)]
    d = fn(qb[0]); float(np.asarray(_force(*([d] * iters))))
    t0 = time.perf_counter()
    outs = [fn(q) for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

results = {"corpus": f"{N}x{D}", "recipe": "dev-gmm1024-key0",
           "batch": B}

# ---- same-session bf16 kernel reference ----
bf = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64)[0]
d0 = bf(qj)  # compile (cached)
dt_bf = measure(bf)
log(f"bf16 kernel: {dt_bf*1000:.2f} ms = {B/dt_bf:.0f} QPS (reference)")
results["bf16_qps_b2048"] = round(B / dt_bf, 1)
results["bf16_ms"] = round(dt_bf * 1000, 3)

# ---- sq8r end-to-end ----
from longbow_tpu.index.sq8 import SQ8Index, SQ8ResidualIndex, _sq8_fused_packed, _sq8r_packed

log("sq8r build (train + add + relayout)...")
t0 = time.time()
idx = SQ8ResidualIndex(D, n_clusters=1024)
idx.rebuild_min = 1 << 62
idx.train(cj[:131072])
for off in range(0, N, 250_000):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, off, 250_000))
idx._rebuild_layout()
build_r = time.time() - t0
log(f"sq8r build {build_r:.0f}s  main_cap={idx.m_codes.shape[0]} "
    f"live={idx.m_live}")

d, i = idx.search(np.asarray(qj[:NEV]), K)
rec_r = recall_of(np.asarray(i))
fn_r = lambda q: _sq8r_packed(
    q, idx.m_codes, idx.m_gcid, idx.m_norms, idx.m_valid, idx.m_ext,
    idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
    idx.centers, idx.lo, idx.hi, None, 16, Metric.L2, False, True,
    idx.d_count > 0, None, True,
)
dt_r = measure(fn_r)
log(f"sq8r fused: recall@10 {rec_r:.4f}  {dt_r*1000:.2f} ms = "
    f"{B/dt_r:.0f} QPS  ({dt_r/dt_bf:.2f}x bf16 time)")
results["sq8r"] = {
    "recall_at_10": round(rec_r, 4),
    "qps_b2048": round(B / dt_r, 1),
    "ms_per_batch": round(dt_r * 1000, 3),
    "vs_bf16_time": round(dt_r / dt_bf, 3),
    "build_s": round(build_r, 1),
    "hbm_codes_bytes": int(idx.m_codes.size),
    "bytes_per_dim": 1,
}

# ---- plain sq8 end-to-end ----
log("sq8 build...")
t0 = time.time()
idx2 = SQ8Index(D)
idx2.train(cj[:131072])
for off in range(0, N, 250_000):
    idx2.add(jax.lax.dynamic_slice_in_dim(cj, off, 250_000))
float(jnp.sum(idx2.norms_sq))  # force: adds dispatch async
build_p = time.time() - t0
d, i = idx2.search(np.asarray(qj[:NEV]), K)
rec_p = recall_of(np.asarray(i))
fn_p = lambda q: _sq8_fused_packed(
    q, idx2.codes, idx2.lo, idx2.hi, idx2.norms_sq, idx2.valid,
    16, Metric.L2, None, False,
)
dt_p = measure(fn_p)
log(f"sq8 fused: recall@10 {rec_p:.4f}  {dt_p*1000:.2f} ms = "
    f"{B/dt_p:.0f} QPS  ({dt_p/dt_bf:.2f}x bf16 time)")
results["sq8"] = {
    "recall_at_10": round(rec_p, 4),
    "qps_b2048": round(B / dt_p, 1),
    "ms_per_batch": round(dt_p * 1000, 3),
    "vs_bf16_time": round(dt_p / dt_bf, 3),
    "build_s": round(build_p, 1),
    "bytes_per_dim": 1,
}
results["xla_path_r4_qps"] = {"sq8": 21300, "sq8r": 12300,
                              "note": "round-4 XLA-path numbers (benchmarks/sq8_scale_1000k.json) for the speedup ratio"}

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "sq8_fused_1M.json")
results["captured_at_utc"] = time.strftime(
    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
with open(out, "w") as f:
    json.dump(results, f, indent=1)
log(f"wrote {out}")
log("SUMMARY " + json.dumps({k: results[k] for k in ("sq8r", "sq8")}))
_done.set()
