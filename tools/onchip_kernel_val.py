"""On-chip validation: round-4 kernel MASKED fix + exact-rerank default.
Serial compiles, honest reduction-forced timing."""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import sys, time, threading
import numpy as np

def log(m): print(f"[val {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

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

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms, MASKED
from longbow_tpu.ops.pallas_scan import flat_search_rerank, fused_flat_search

N, D, K, NEV = 1_000_000, 128, 10, 512
rng = np.random.default_rng(0)
n_clusters = 1024
centers = rng.standard_normal((n_clusters, D)).astype(np.float32) * 4.0
assign = rng.integers(0, n_clusters, N + 2048)
allv = (centers[assign] + rng.standard_normal((N + 2048, D)).astype(np.float32))
corpus, queries = allv[:N], allv[N:]

cj = jnp.asarray(corpus); c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj); valid = jnp.ones((N,), bool)
log("oracle...")
t0=time.time()
gt_d, gt_i = exact_search(jnp.asarray(queries[:NEV]), cj, K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True, chunk_rows=131072)
gt = np.asarray(gt_i); log(f"oracle {time.time()-t0:.0f}s")

def recall_of(fn):
    got = []
    for off in range(0, NEV, 128):
        _, i = fn(jnp.asarray(queries[off:off+128]))
        got.append(np.asarray(i))
    got = np.concatenate(got)
    return float(np.mean([len(set(got[i]) & set(gt[i]))/K for i in range(NEV)]))

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

def measure(fn, nb, iters):
    qb = [jnp.asarray(queries[:nb] + 1e-6*i) for i in range(iters)]
    d,_ = fn(qb[0]); float(np.asarray(_force(*([d]*iters))))
    t0=time.perf_counter()
    outs=[fn(q)[0] for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter()-t0)/iters

# 1) new-kernel recall + ghost semantics, DEFAULT rerank precision
log("compile fused B=128 (new kernel)...")
t0=time.time()
f_def = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64, exact_rerank=False)
r_def = recall_of(f_def)
log(f"recall default-prec rerank: {r_def:.4f} (compile+run {time.time()-t0:.0f}s)")

log("compile exact-rerank variant...")
t0=time.time()
f_ex = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64, exact_rerank=True)
r_ex = recall_of(f_ex)
log(f"recall HIGHEST-prec rerank: {r_ex:.4f} (compile+run {time.time()-t0:.0f}s)")

# 2) ghost test on chip: only 4 valid rows (reuses compiled shapes)
vg = np.zeros(N, bool); vg[:4] = True
d,i = f_ex(jnp.asarray(queries[:128]))
d,i = flat_search_rerank(jnp.asarray(queries[:128]), c16, norms, jnp.asarray(vg), K, Metric.L2, pool=64, exact_rerank=True)
d,i = np.asarray(d), np.asarray(i)
ok_ids = set(i[i>=0].tolist()) <= {0,1,2,3}
n_real = int((i>=0).sum(axis=1).max())
ghost_ok = ok_ids and n_real==4 and (d[i<0]==np.float32(MASKED)).all() and (d[i>=0]<1e37).all()
log(f"ghost-on-chip ok={ghost_ok} (ids<=4: {ok_ids}, masked exact: {(d[i<0]==np.float32(MASKED)).all()})")

# 3) perf: B=2048 exact (serving headline path) + B=128
log("compile B=2048 exact...")
t0=time.time()
f2_ex = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64, exact_rerank=True)
dt = measure(f2_ex, 2048, 20)
log(f"B=2048 exact-rerank: {dt*1000:.3f} ms/batch = {2048/dt:.0f} QPS (compile {time.time()-t0:.0f}s)")
dt128 = measure(f2_ex, 128, 50)
log(f"B=128 exact-rerank: {dt128*1000:.3f} ms/batch = {128/dt128:.0f} QPS")
log("compile B=2048 default-prec (A/B)...")
dt_d = measure(f_def, 2048, 20)
log(f"B=2048 default-rerank: {dt_d*1000:.3f} ms/batch = {2048/dt_d:.0f} QPS")
print(f"RESULT recall_default={r_def:.4f} recall_exact={r_ex:.4f} ghost_ok={ghost_ok} ms2048_exact={dt*1000:.3f} ms2048_default={dt_d*1000:.3f} ms128_exact={dt128*1000:.3f}")
