"""On-chip probe (round 5): the fused uint8-codes kernel.

Validates, on ONE real v5e chip at 1M x 128:
  1. the refactored _scan_kernel still serves the bf16 headline path
     (recall + honest B=2048 timing vs round-4 numbers);
  2. the NEW u8 path (fused_codes_search) compiles (fresh Mosaic
     shape — watchdog-guarded), ranks sanely vs the dequant oracle,
     and its honest timing vs the bf16 kernel (HBM read is halved);
  3. the group_term variant (sq8r cluster fold) compiles and runs.

Honest methodology per CLAUDE.md: all outputs feed one pre-compiled
jitted reduction; fetch its scalar. One compile at a time.
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import time, threading
import numpy as np

def log(m):
    print(f"[codes {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "2400"))):
        log("DEADLINE EXCEEDED (relay wedge mid-run?)"); _o._exit(4)
threading.Thread(target=_deadline, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
cache_dir = os.path.join(cache_dir, machine_cache_tag())
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import (
    LANES, flat_search_rerank, fused_codes_search,
)

N, D, K, NEV, B = 1_000_000, 128, 10, 512, 2048

log("on-device corpus gen...")

@jax.jit
def gen():
    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

t0 = time.time()
cj, qj = gen()
c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj)
valid = jnp.ones((N,), bool)
float(jnp.sum(norms))
log(f"gen {time.time()-t0:.0f}s")

log(f"oracle ({NEV} queries)...")
t0 = time.time()
_, gt_i = exact_search(qj[:NEV], cj, K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True,
    chunk_rows=131072)
gt = np.asarray(gt_i)
log(f"oracle {time.time()-t0:.0f}s")

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i): return q + 1e-6 * (i + 1)

def recall_of(idx_np):
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

# ---- 1. bf16 path after the refactor ----
log("bf16 flat_search_rerank compile...")
t0 = time.time()
d, i = flat_search_rerank(qj, c16, norms, valid, K, Metric.L2, pool=64)
got = np.asarray(i)[:NEV]
log(f"bf16 compile+run {time.time()-t0:.0f}s  recall@10 {recall_of(got):.4f}")
dt = measure(lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64)[0])
log(f"bf16 B={B}: {dt*1000:.2f} ms/batch = {B/dt:.0f} QPS  (r4 ref: 7.9ms/260k)")

# ---- 2. u8 sq8 fold ----
log("sq8 quantize on device...")

@jax.jit
def quantize(c):
    """Recentered-int8 convention: codes = u8 - 128, lo_eff = lo +
    128*scale (Mosaic has no unsigned->float cast)."""
    lo = jnp.min(c, axis=0); hi = jnp.max(c, axis=0)
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    codes = (
        jnp.clip(jnp.round((c - lo) / scale), 0, 255) - 128.0
    ).astype(jnp.int8)
    lo_eff = lo + 128.0 * scale
    deq = codes.astype(jnp.float32) * scale[None, :] + lo_eff[None, :]
    vn = jnp.sum(deq * deq, axis=1)
    return codes, lo_eff, scale, vn

codes, lo, scale, vn = quantize(cj)
float(jnp.sum(vn))
log("sq8 artifacts ready")

@jax.jit
def fold(q):
    qs = q * scale[None, :]
    qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo)
    return qs, qn_eff

def sq8_search(q):
    qs, qn_eff = fold(q)
    return fused_codes_search(qs, qn_eff, codes, vn, valid, 64)

log("u8 kernel compile (fresh Mosaic shape — may take minutes)...")
t0 = time.time()
d8, i8 = sq8_search(qj)
got8 = np.asarray(i8)[:NEV, :K]
log(f"u8 compile+run {time.time()-t0:.0f}s  coarse-recall@10(k=64 head) {recall_of(got8):.4f}")
# recall of true top-10 inside the 64-pool (what the rerank sees)
pool_hit = float(np.mean([
    len(set(np.asarray(i8)[j].tolist()) & set(gt[j].tolist())) / K
    for j in range(NEV)
]))
log(f"u8 pool-64 contains {pool_hit:.4f} of true top-10")
dt8 = measure(lambda q: sq8_search(q)[0])
log(f"u8 B={B}: {dt8*1000:.2f} ms/batch = {B/dt8:.0f} QPS  ({dt/dt8:.2f}x vs bf16)")

# ---- 3. group_term variant (sq8r fold shape) ----
# pad to the grouped path's native 16384-aligned capacity (128 groups
# per tile — the Mosaic gt-block constraint; real sq8r indexes keep
# 16384-multiple capacities)
N_PAD = -(-N // 16384) * 16384
C = 1024
G = N_PAD // LANES

@jax.jit
def padded():
    cp = jnp.zeros((N_PAD, D), jnp.int8).at[:N].set(codes)
    vp = jnp.zeros((N_PAD,), jnp.float32).at[:N].set(vn)
    valp = jnp.zeros((N_PAD,), bool).at[:N].set(True)
    return cp, vp, valp

codes_p, vn_p, valid_p = padded()
float(jnp.sum(vn_p))
kg = jax.random.PRNGKey(1)
centers_g = jax.random.normal(kg, (C, D), jnp.float32)
gcid = jax.random.randint(jax.random.PRNGKey(2), (G,), 0, C)

@jax.jit
def fold_g(q):
    qs = q * scale[None, :]
    qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo)
    qc = q @ centers_g.T
    gt_term = -2.0 * jnp.take(qc, gcid, axis=1)
    return qs, qn_eff, gt_term

def sq8r_search(q):
    qs, qn_eff, gt_term = fold_g(q)
    return fused_codes_search(
        qs, qn_eff, codes_p, vn_p, valid_p, 64, group_term=gt_term
    )

log("u8+group_term kernel compile...")
t0 = time.time()
dg, ig = sq8r_search(qj)
float(np.asarray(jnp.sum(dg)))
log(f"u8+gt compile+run {time.time()-t0:.0f}s")
dtg = measure(lambda q: sq8r_search(q)[0])
log(f"u8+gt B={B}: {dtg*1000:.2f} ms/batch = {B/dtg:.0f} QPS  ({dt/dtg:.2f}x vs bf16)")

# onehot-matmul group-term build (vs the [B, G] gather above): one
# [C, G] bf16 constant, term = qc @ onehot rides the MXU
onehot = (
    (gcid[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None])
    .astype(jnp.bfloat16)
)

@jax.jit
def fold_g2(q):
    qs = q * scale[None, :]
    qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo)
    qc = (q @ centers_g.T).astype(jnp.bfloat16)
    gt_term = -2.0 * jax.lax.dot_general(
        qc, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return qs, qn_eff, gt_term

def sq8r_search2(q):
    qs, qn_eff, gt_term = fold_g2(q)
    return fused_codes_search(
        qs, qn_eff, codes_p, vn_p, valid_p, 64, group_term=gt_term
    )

log("onehot-fold variant compile...")
t0 = time.time()
d2, _ = sq8r_search2(qj)
float(np.asarray(jnp.sum(d2)))
log(f"onehot-fold compile+run {time.time()-t0:.0f}s")
dtg2 = measure(lambda q: sq8r_search2(q)[0])
log(f"u8+gt(onehot) B={B}: {dtg2*1000:.2f} ms/batch = {B/dtg2:.0f} QPS")

log(f"SUMMARY bf16={dt*1000:.2f}ms u8={dt8*1000:.2f}ms u8gt={dtg*1000:.2f}ms "
    f"u8gt_onehot={dtg2*1000:.2f}ms pool64_hit={pool_hit:.4f}")
_done.set()
