"""On-chip BASELINE config 4 at its named scale: compressed index at
10M x 128 on ONE v5e chip (sq8r 1.28 GB codes + plain sq8), plus the
reference's 64x-compression config (1536d -> PQ96,
/root/reference/docs/vectorsearch.md:97-102) at 200k.

Writes benchmarks/pq_scale_10M.json. Honest reduction-forced timing;
the exact oracle is SEGMENTED into per-1M programs (the relay kills
any single >60s program — CLAUDE.md).
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[10M {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "3600"))):
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

N, D, K, NEV, B = 10_000_000, 128, 10, 256, 2048
SLICE = 1_000_000

results = {}

log("on-device 10M corpus gen...")
t0 = time.time()

@jax.jit
def gen():
    kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(0), 4)
    centers = jax.random.normal(kc, (4096, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 4096)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

cj, qj = gen()
float(jnp.sum(qj))
log(f"gen {time.time()-t0:.0f}s")

# ---- segmented exact oracle (10 x 1M programs, host top-k merge) ----
log(f"segmented oracle ({NEV} queries x {N//SLICE} slices)...")
t0 = time.time()
qe = qj[:NEV]
best_d = np.full((NEV, K), np.inf, np.float32)
best_i = np.full((NEV, K), -1, np.int64)
for s in range(N // SLICE):
    sl = jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE)
    d, i = exact_search(
        qe, sl, K, Metric.L2, exact_precision=True, chunk_rows=131072,
    )
    d = np.asarray(d); i = np.asarray(i) + s * SLICE
    md = np.concatenate([best_d, d], axis=1)
    mi = np.concatenate([best_i, i], axis=1)
    order = np.argsort(md, axis=1)[:, :K]
    best_d = np.take_along_axis(md, order, axis=1)
    best_i = np.take_along_axis(mi, order, axis=1)
    log(f"  slice {s}: {time.time()-t0:.0f}s cumulative")
gt = best_i
log(f"oracle {time.time()-t0:.0f}s")

# HBM headroom: keep the corpus in bf16 from here on (the f32 copy is
# 5.1 GB; with the delta region + relayout copies the build OOMed).
# Quantizing from the bf16-rounded rows adds noise far below the int8
# step; the oracle above used the f32 originals.
cj = cj.astype(jnp.bfloat16)
float(jnp.sum(qj[0]))

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i): return q + 1e-6 * (i + 1)

def recall_of(idx_np, nev=NEV):
    return float(np.mean([
        len(set(idx_np[j].tolist()) & set(gt[j].tolist())) / K
        for j in range(nev)
    ]))

def measure(fn, iters=8):
    qb = [_perturb(qj, i) for i in range(iters)]
    d = fn(qb[0]); float(np.asarray(_force(*([jnp.asarray(d)] * iters))))
    t0 = time.perf_counter()
    outs = [jnp.asarray(fn(q)) for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

# ---- sq8r at 10M ----
from longbow_tpu.index.sq8 import SQ8ResidualIndex, SQ8Index

log("sq8r build (train + 10 x 1M adds + one relayout)...")
t0 = time.time()
# C=8192 + f32 group term clear the 0.95 gate at 10M density
# (bisect: 0.9535 vs 0.9438 at C=4096/bf16); bf16-gt default is tuned
# for 1M-scale
os.environ["LONGBOW_SQ8R_GT_BF16"] = "0"
idx = SQ8ResidualIndex(D, n_clusters=8192)
idx.rebuild_min = 1 << 62  # defer relayout to one final pass
idx.train(cj[:131072])
for s in range(N // SLICE):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE))
    log(f"  add slice {s}: {time.time()-t0:.0f}s cumulative")
t_r = time.time()
idx._rebuild_layout()
build_s = time.time() - t0
log(f"sq8r build {build_s:.0f}s (relayout {time.time()-t_r:.0f}s), "
    f"main_cap {idx.m_codes.shape[0]}")

# QPS via the packed program directly with device-resident queries
# (index.search()'s np interface would time host round trips, not the
# kernel — CLAUDE.md honest-benchmark rules)
from longbow_tpu.index.sq8 import _sq8r_packed


def sq8r_fn(q):
    return _sq8r_packed(
        q, idx.m_codes, idx.m_gcid, idx.m_norms, idx.m_valid, idx.m_ext,
        idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
        idx.centers, idx.lo, idx.hi, None,
        16, Metric.L2, False, True, idx.d_count > 0, None, False,
    )

d, i = idx.search(np.asarray(qj[:NEV]), K)
rec = recall_of(np.asarray(i))
dt = measure(sq8r_fn)
log(f"sq8r 10M: recall@10 {rec:.4f}  {dt*1000:.2f} ms/{B}q = {B/dt:.0f} QPS")
results["sq8r_10M"] = {
    "n": N, "d": D, "bytes_per_dim": 1,
    "build_s": round(build_s, 1),
    "build_vps": round(N / build_s, 1),
    "recall_at_10": round(rec, 4),
    "qps_b2048": round(B / dt, 1),
    "ms_per_batch": round(dt * 1000, 3),
    "hbm_codes_bytes": int(idx.m_codes.size),
    "n_clusters": 8192, "gt_dtype": "f32",
}

# ---- plain sq8 at 10M ----
log("sq8 build...")
t0 = time.time()
idx2 = SQ8Index(D)
idx2.train(cj[:131072])
for s in range(N // SLICE):
    idx2.add(jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE))
float(jnp.sum(idx2.norms_sq))  # force: adds are async dispatches
build2 = time.time() - t0
from longbow_tpu.index.sq8 import _sq8_fused_packed


def sq8_fn(q):
    return _sq8_fused_packed(
        q, idx2.codes, idx2.lo, idx2.hi, idx2.norms_sq, idx2.valid,
        16, Metric.L2, None, False,
    )

d, i = idx2.search(np.asarray(qj[:NEV]), K)
rec2 = recall_of(np.asarray(i))
dt2 = measure(sq8_fn)
log(f"sq8 10M: recall@10 {rec2:.4f}  {dt2*1000:.2f} ms/{B}q = {B/dt2:.0f} QPS")
results["sq8_10M"] = {
    "n": N, "d": D, "bytes_per_dim": 1,
    "build_s": round(build2, 1),
    "recall_at_10": round(rec2, 4),
    "qps_b2048": round(B / dt2, 1),
    "ms_per_batch": round(dt2 * 1000, 3),
}

# free 10M state before the PQ section
del idx, idx2, cj
import gc; gc.collect()

# 64x compression point (1536d -> PQ96): separate tool
# tools/pq64_1536d_bench.py -> benchmarks/pq64_1536d.json (this file
# once reused the 128-dim query set for the 1536d index — own tool,
# own queries).

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "pq_scale_10M.json")
results["captured_at_utc"] = time.strftime(
    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
with open(out, "w") as f:
    json.dump(results, f, indent=1)
log(f"wrote {out}")
log("SUMMARY " + json.dumps({k: v for k, v in results.items()
                             if isinstance(v, dict)}))
_done.set()
