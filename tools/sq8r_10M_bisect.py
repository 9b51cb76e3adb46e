"""Bisect the 10M sq8r recall collapse (0.43 vs 0.96 at 1M):
build ONE 10M index (C=4096), then evaluate
  a. fused path, bf16 gt   (the failing config)
  b. fused path, f32 gt    (gt precision at 10x density?)
  c. XLA fallback path     (kernel-path vs index/layout/training)
  d. coarse pool-64 containment of true top-10
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import time, threading
import numpy as np

def log(m):
    print(f"[bisect {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

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
from longbow_tpu.index.sq8 import SQ8ResidualIndex, _sq8r_packed

N, D, K, NEV, B = 10_000_000, 128, 10, 256, 2048
SLICE = 1_000_000
C = int(os.environ.get("BISECT_C", "4096"))

@jax.jit
def gen():
    kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(0), 4)
    centers = jax.random.normal(kc, (4096, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 4096)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

log("gen + oracle...")
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
gt = best_i
cj = cj.astype(jnp.bfloat16)
float(jnp.sum(qj[0]))
log("oracle done; building...")

t0 = time.time()
idx = SQ8ResidualIndex(D, n_clusters=C)
idx.rebuild_min = 1 << 62
idx.train(cj[:131072])
for s in range(N // SLICE):
    idx.add(jax.lax.dynamic_slice_in_dim(cj, s * SLICE, SLICE))
idx._rebuild_layout()
log(f"built {time.time()-t0:.0f}s main_cap={idx.m_codes.shape[0]} C={idx.n_clusters}")

def run(tag, fused, gt_bf16, kk=16):
    outs = []
    for off in range(0, NEV, B):
        q = jnp.asarray(np.asarray(qe[off:off + B]))
        qpad = jnp.pad(q, ((0, B - q.shape[0]), (0, 0)))
        p = np.asarray(_sq8r_packed(
            qpad, idx.m_codes, idx.m_gcid, idx.m_norms, idx.m_valid,
            idx.m_ext, idx.d_codes, idx.d_cid, idx.d_norms,
            idx.d_valid, idx.d_ext, idx.centers, idx.lo, idx.hi, None,
            kk, Metric.L2, False, fused, False, None, gt_bf16,
        ))
        outs.append(p[:q.shape[0], kk:])
    ids = np.concatenate(outs)[:NEV]
    rec = float(np.mean([
        len(set(ids[j, :K].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))
    cont = float(np.mean([
        len(set(ids[j].tolist()) & set(gt[j].tolist())) / K
        for j in range(NEV)
    ]))
    log(f"{tag}: recall@10 {rec:.4f}  top10-in-{kk} {cont:.4f}")
    return rec

run("a fused bf16-gt", True, True)
run("b fused f32-gt", True, False)
run("c XLA path", False, False)
run("d fused pool64", True, True, kk=64)
_done.set()
