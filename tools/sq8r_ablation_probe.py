"""On-chip ablation of the sq8r fused search program: where do the
25.4 ms go (kernel-only probe measured 9.7 ms at the same shapes)?

Stages timed separately (honest reduction-forced):
  A. fold only: qc matmul + [B, G] group-term gather
  B. fold + fused kernel (main region)
  C. B + delta-region XLA scan
  D. full _sq8r_packed (adds pool gather + dequant rerank + ext map)
Also re-checks recall after the round-5 fixes (f32 group term +
group interleave): expect >= 0.956 (the XLA path's number).
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[abl {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "2400"))):
        log("DEADLINE EXCEEDED"); _o._exit(4)
threading.Thread(target=_deadline, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
cache_dir = os.path.join(cache_dir, machine_cache_tag())
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import fused_codes_search
from longbow_tpu.index.sq8 import (
    GROUP, SQ8ResidualIndex, _affine, _sq8r_packed,
)

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
    valid=jnp.ones((N,), bool), exact_precision=True,
    chunk_rows=131072,
)
gt = np.asarray(gt_i)
log("building sq8r...")
t0 = time.time()
idx = SQ8ResidualIndex(D, n_clusters=1024)
idx.rebuild_min = 1 << 62
idx.train(cj[:131072])
for off in range(0, N, 250_000):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, off, 250_000))
idx._rebuild_layout()
log(f"build {time.time()-t0:.0f}s main_cap={idx.m_codes.shape[0]}")

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

m_codes, m_gcid, m_norms, m_valid = (
    idx.m_codes, idx.m_gcid, idx.m_norms, idx.m_valid)
centers, lo, hi = idx.centers, idx.lo, idx.hi

@jax.jit
def fold(q):
    scale, lo_eff = _affine(lo, hi)
    qs = q * scale[None, :]
    qn_eff = jnp.sum(q * q, axis=1) - 2.0 * (q @ lo_eff)
    qc = q @ centers.T
    gt_t = -2.0 * jnp.take(qc, m_gcid, axis=1)
    return qs, qn_eff, gt_t

dtA = measure(lambda q: fold(q)[2])
log(f"A fold-only: {dtA*1000:.2f} ms")

def stage_b(q):
    qs, qn_eff, gt_t = fold(q)
    return fused_codes_search(
        qs, qn_eff, m_codes, m_norms, m_valid, 64, group_term=gt_t
    )[0]

dtB = measure(stage_b)
log(f"B fold+kernel: {dtB*1000:.2f} ms")

def stage_d(q):
    return _sq8r_packed(
        q, m_codes, m_gcid, m_norms, m_valid, idx.m_ext,
        idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
        centers, lo, hi, None, 16, Metric.L2, False, True,
    )

dtD = measure(stage_d)
log(f"D full packed (has_delta=True): {dtD*1000:.2f} ms")

def stage_e(q):
    return _sq8r_packed(
        q, m_codes, m_gcid, m_norms, m_valid, idx.m_ext,
        idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
        centers, lo, hi, None, 16, Metric.L2, False, True, False,
    )

dtE = measure(stage_e)
log(f"E packed has_delta=False: {dtE*1000:.2f} ms = {B/dtE:.0f} QPS")

# F: onehot group-term fold (f32 HIGHEST matmul instead of gather)
def stage_f(q):
    return _sq8r_packed(
        q, m_codes, m_gcid, m_norms, m_valid, idx.m_ext,
        idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
        centers, lo, hi, None, 16, Metric.L2, False, True, False,
        idx.m_onehot, False,
    )

if idx.m_onehot is not None:
    dtF = measure(stage_f)
    log(f"F onehot fold: {dtF*1000:.2f} ms = {B/dtF:.0f} QPS")
    pf = np.asarray(stage_f(qj[:NEV]))
    i_f = pf[:, 16:]
    rec_f = float(np.mean([
        len(set(i_f[j].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))
    log(f"F recall: {rec_f:.4f}")

# G: bf16 group-term (halved side-input read) — does recall hold with
# the interleave in place?
def stage_g(q):
    return _sq8r_packed(
        q, m_codes, m_gcid, m_norms, m_valid, idx.m_ext,
        idx.d_codes, idx.d_cid, idx.d_norms, idx.d_valid, idx.d_ext,
        centers, lo, hi, None, 16, Metric.L2, False, True, False,
        idx.m_onehot, True,
    )

dtG = measure(stage_g)
pg = np.asarray(stage_g(qj[:NEV]))
i_g = pg[:, 16:]
rec_g = float(np.mean([
    len(set(i_g[j].tolist()) & set(gt[j].tolist())) / K
    for j in range(NEV)
]))
log(f"G bf16-gt: {dtG*1000:.2f} ms = {B/dtG:.0f} QPS  recall {rec_g:.4f}")

d, i = idx.search(np.asarray(qj[:NEV]), K)
rec = float(np.mean([
    len(set(np.asarray(i)[j].tolist()) & set(gt[j].tolist())) / K
    for j in range(NEV)
]))
log(f"recall@10 after fixes: {rec:.4f} (XLA path was 0.9564)")
log(f"SUMMARY A={dtA*1000:.2f} B={dtB*1000:.2f} D={dtD*1000:.2f} "
    f"recall={rec:.4f}")
_done.set()
