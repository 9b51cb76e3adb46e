"""Diagnose the 10M sq8r recall collapse: is the QUANTIZATION of the
lost rows broken (saturated codes / wrong centers), or the scan?

For failing queries: reconstruct the true top-1 row from its codes and
compare its distance against the returned top-1. Global stats: code
saturation fraction, per-row reconstruction error distribution,
kmeans center coverage (fraction of rows whose residual norm exceeds
k standard deviations).
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import time, threading
import numpy as np

def log(m):
    print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _dl():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "3000"))):
        log("DEADLINE"); _o._exit(4)
threading.Thread(target=_dl, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(cache_dir, machine_cache_tag()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search
from longbow_tpu.index.sq8 import SQ8ResidualIndex

N, D, K, NEV = 10_000_000, 128, 10, 64
SLICE = 1_000_000
C = int(os.environ.get("BISECT_C", "4096"))

@jax.jit
def gen():
    kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(0), 4)
    centers = jax.random.normal(kc, (4096, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + 2048,), 0, 4096)
    allv = centers[assign] + jax.random.normal(kn, (N + 2048, D), jnp.float32)
    return allv[:N], allv[N:]

log("gen + small oracle...")
cj, qj = gen()
qe = qj[:NEV]
best_d = np.full((NEV, K), np.inf, np.float32)
best_i = np.full((NEV, K), -1, np.int64)
for s in range(N // SLICE):
    sl = jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE)
    d, i = exact_search(qe, sl, K, Metric.L2, exact_precision=True,
                        chunk_rows=131072)
    d = np.asarray(d); i = np.asarray(i) + s * SLICE
    md = np.concatenate([best_d, d], axis=1)
    mi = np.concatenate([best_i, i], axis=1)
    order = np.argsort(md, axis=1)[:, :K]
    best_d = np.take_along_axis(md, order, axis=1)
    best_i = np.take_along_axis(mi, order, axis=1)
gt, gt_d = best_i, best_d
q_np = np.asarray(qe)
# keep ORIGINALS of the true top-1 rows before any bf16 cast
orig_top1 = np.asarray(jnp.take(cj, jnp.asarray(gt[:, 0]), axis=0))
cj = cj.astype(jnp.bfloat16)
log("building...")
t0 = time.time()
idx = SQ8ResidualIndex(D, n_clusters=C)
idx.rebuild_min = 1 << 62
idx.train(cj[:131072])
for s in range(N // SLICE):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE))
idx._rebuild_layout()
log(f"built {time.time()-t0:.0f}s")

# --- global stats ---
codes = idx.m_codes
sat = jnp.mean(
    ((codes == 127) | (codes == -128)).astype(jnp.float32)
)
log(f"code saturation fraction: {float(sat):.4f}")
# residual norms by reconstruction error on a 65536-row sample of the
# ORIGINAL corpus vs its dequantized self
sample_ext = np.random.default_rng(0).integers(0, N, 4096)
deq = idx.get_vectors(sample_ext)
orig = np.asarray(jnp.take(cj, jnp.asarray(sample_ext), axis=0)).astype(np.float32)
err = np.linalg.norm(deq - orig, axis=1)
log(f"reconstruction |err| percentiles: p50={np.percentile(err,50):.2f} "
    f"p90={np.percentile(err,90):.2f} p99={np.percentile(err,99):.2f} "
    f"max={err.max():.2f}  (|row| ~ {np.linalg.norm(orig,axis=1).mean():.1f})")

# --- per-query: true top-1 reconstruction distance vs returned ---
d_ret, i_ret = idx.search(q_np, K)
d_ret = np.asarray(d_ret); i_ret = np.asarray(i_ret)
fails = [j for j in range(NEV)
         if gt[j, 0] not in set(i_ret[j].tolist())]
log(f"queries missing true top-1: {len(fails)}/{NEV}")
for j in fails[:6]:
    e = int(gt[j, 0])
    deq1 = idx.get_vectors(np.asarray([e]))[0]
    dd_deq = float(np.sum((q_np[j] - deq1) ** 2))
    dd_orig = float(np.sum((q_np[j] - orig_top1[j]) ** 2))
    sl = idx._slot[e]
    log(f"  q{j}: true_top1 ext={e} slot={sl} "
        f"d_orig={dd_orig:.1f} d_deq={dd_deq:.1f} "
        f"d_returned_top1={d_ret[j,0]:.1f}")
_done.set()
