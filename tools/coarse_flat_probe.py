"""On-chip: FlatIndex's coarse int8 shadow serving path (round 5).

Builds a REAL FlatIndex at 1M x 128 bf16 (host-staged ingest so the
shadow maintenance runs), then measures the serving search() path
with the coarse scan ON vs OFF: recall@10 vs the f32 oracle and
honest reduction-forced timing of the packed programs. Also validates
tombstones + filter masks through the coarse path.
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[coarse {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _dl():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "2400"))):
        log("DEADLINE"); _o._exit(4)
threading.Thread(target=_dl, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(cache_dir, machine_cache_tag()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.index.flat import FlatIndex, _coarse_packed, _fused_packed

N, D, K, NEV, B = 1_000_000, 128, 10, 512, 2048

log("gen + oracle...")

@jax.jit
def gen():
    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

cj, qj = gen()
norms = squared_norms(cj)
_, gt_i = exact_search(
    qj[:NEV], cj, K, Metric.L2, corpus_norms_sq=norms,
    valid=jnp.ones((N,), bool), exact_precision=True, chunk_rows=131072,
)
gt = np.asarray(gt_i)

log("building FlatIndex (device ingest, coarse shadow on)...")
t0 = time.time()
idx = FlatIndex(D, dtype=jnp.bfloat16, capacity=N)
idx._coarse_enabled = True  # independent of backend gating
for off in range(0, N, 250_000):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, off, 250_000))
assert idx._coarse_codes is not None, "shadow never built"
log(f"build {time.time()-t0:.0f}s  coarse cap={idx._coarse_codes.shape[0]}")

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i): return q + 1e-6 * (i + 1)

def measure(fn, iters=10):
    qb = [_perturb(qj, i) for i in range(iters)]
    d = fn(qb[0]); float(np.asarray(_force(*([d] * iters))))
    t0 = time.perf_counter()
    outs = [fn(q) for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

def recall_of(i_np):
    return float(np.mean([
        len(set(i_np[j, :K].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))

# serving-path recall through index.search (coarse dispatch)
d, i = idx.search(np.asarray(qj[:NEV]), K)
rec_c = recall_of(np.asarray(i))
log(f"coarse serving recall@10: {rec_c:.4f}")

# honest program timing: coarse vs bf16 packed at B=2048, k=16
fn_c = lambda q: _coarse_packed(
    q, idx.vectors, idx._coarse_codes, idx._coarse_lo, idx._coarse_hi,
    idx._coarse_norms, idx.valid, 16, Metric.L2, None, False,
)
fn_b = lambda q: _fused_packed(
    q, idx.vectors, idx.norms_sq, idx.valid, 16, Metric.L2, None, False,
)
dt_c = measure(fn_c)
dt_b = measure(fn_b)
log(f"coarse packed: {dt_c*1000:.2f} ms = {B/dt_c:.0f} QPS")
log(f"bf16  packed: {dt_b*1000:.2f} ms = {B/dt_b:.0f} QPS "
    f"(coarse = {dt_b/dt_c:.2f}x)")

# tombstones + filters through the coarse path
dead = np.asarray(gt[:64, 0])
idx.delete_rows(dead)
fmask = np.ones(idx.vectors.shape[0], bool)
fmask[np.asarray(gt[64:128, 0])] = False
d2, i2 = idx.search(
    np.asarray(qj[:128]), K, filter_mask=jnp.asarray(fmask)
)
i2 = np.asarray(i2)
leak_dead = sum(int(dead[j]) in i2[j].tolist() for j in range(64))
leak_filt = sum(
    int(gt[64 + j, 0]) in i2[64 + j].tolist() for j in range(64)
)
log(f"tombstone leaks: {leak_dead}/64  filter leaks: {leak_filt}/64")

out = {
    "recall_at_10": round(rec_c, 4),
    "coarse_ms_b2048": round(dt_c * 1000, 3),
    "coarse_qps_b2048": round(B / dt_c, 1),
    "bf16_ms_b2048": round(dt_b * 1000, 3),
    "speedup_x": round(dt_b / dt_c, 3),
    "tombstone_leaks": leak_dead, "filter_leaks": leak_filt,
    "captured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "coarse_flat_1M.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
log("SUMMARY " + json.dumps(out))
_done.set()
