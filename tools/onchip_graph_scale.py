"""Round-4 VERDICT #3: the graph tier's claimed regime (>1M rows/chip).

Builds an N x 128 bf16 corpus + HNSW graph on ONE v5e chip, records
HONEST build time (reduction-forced fetch — block_until_ready lies
through the relay, CLAUDE.md), recall/QPS for the graph and the fused
scan at the same corpus size, so ARCHITECTURE.md can document the
measured scan-vs-graph crossover.

Phase order matters: build FIRST in a clean HBM (the round-4 first
attempt ran oracle+scan before the build and their residue crashed the
TPU worker at 4M), oracle + QPS after.

Run from the repo root: python tools/onchip_graph_scale.py [N_million]
"""
import os as _o
import sys

sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))

import gc
import json
import threading
import time

import numpy as np


def log(m):
    print(f"[gscale {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


up = threading.Event()


def _probe():
    import jax

    jax.devices()
    up.set()


threading.Thread(target=_probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN")
    sys.exit(3)

import jax
import jax.numpy as jnp

from longbow_tpu.config import machine_cache_tag

cache_dir = _o.path.join(
    _o.path.expanduser("~"), ".cache", "longbow_tpu", "xla",
    machine_cache_tag(),
)
_o.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, exact_search, squared_norms
from longbow_tpu.ops.pallas_scan import flat_search_rerank

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_000_000
D, K, NEV, B_HEAD = 128, 10, 256, 2048

log(f"corpus {N}x{D} (clustered)")
rng = np.random.default_rng(0)
ncl = 4096
centers = rng.standard_normal((ncl, D)).astype(np.float32) * 4.0

CH = 500_000
parts = []
for off in range(0, N, CH):
    m = min(CH, N - off)
    a = rng.integers(0, ncl, m)
    parts.append(
        jnp.asarray(
            centers[a] + rng.standard_normal((m, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
    )
c16 = jnp.concatenate(parts)
del parts
gc.collect()
queries = (
    centers[rng.integers(0, ncl, NEV + B_HEAD)]
    + rng.standard_normal((NEV + B_HEAD, D)).astype(np.float32)
)


@jax.jit
def _force_i(x):
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def _force(*ds):
    return sum(jnp.sum(x) for x in ds)


# ---- phase 1: graph build in clean HBM, honest-timed ----
from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex

results = {"n": N, "d": D}
log(f"graph build {N} (cold incl compiles)...")
gidx = HNSWIndex(
    D, dtype=jnp.bfloat16, storage="dense", edge_dtype=jnp.bfloat16,
    config=HNSWConfig(m=32, m_max=48, ef_search=100), capacity=N,
)
t0 = time.time()
gidx.add(c16)
# force the full build pipeline: fetch a scalar that depends on the
# final adjacency (block_until_ready alone reports fake times here)
float(np.asarray(_force_i(gidx.state.nbrs)))
t_cold = time.time() - t0
log(f"build cold {t_cold:.1f}s = {N/t_cold:.0f} vec/s")
# warm rebuild (the production rebuild/compaction shape) — release
# the cold index FIRST: two live indexes at 4M are +2.2GB of HBM
gidx = None
gc.collect()
gidx2 = HNSWIndex(
    D, dtype=jnp.bfloat16, storage="dense", edge_dtype=jnp.bfloat16,
    config=HNSWConfig(m=32, m_max=48, ef_search=100), capacity=N,
)
t0 = time.time()
gidx2.add(c16)
float(np.asarray(_force_i(gidx2.state.nbrs)))
t_build = time.time() - t0
log(f"build warm {t_build:.1f}s = {N/t_build:.0f} vec/s")
gidx = gidx2
s = gidx.state
hbm = sum(
    a.size * a.dtype.itemsize
    for a in s if a is not None and hasattr(a, "size")
)
results.update(
    graph_build_s_cold=round(t_cold, 1),
    graph_build_s=round(t_build, 1),
    graph_build_vps=round(N / t_build, 1),
    graph_hbm_mb=round(hbm / 2**20, 1),
)
log(f"graph HBM {hbm/2**20:.0f} MB")

# ---- phase 2: oracle over the stored bf16 corpus (exact f32) ----
norms = squared_norms(c16.astype(jnp.float32))
valid = jnp.ones((N,), bool)
log("oracle...")
t0 = time.time()
gt_d, gt_i = exact_search(
    jnp.asarray(queries[:NEV]), c16.astype(jnp.float32), K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True,
    chunk_rows=131072,
)
gt = np.asarray(gt_i)
del gt_d
gc.collect()
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


# ---- phase 3: graph QPS/recall ----
from longbow_tpu.index.graph import beam_search as _beam

gidx._refresh_sample()
gidx.config.search_m_max = 32
gidx.config.search_expand = 8
st_fast = gidx._speed_state()
variants = {
    "efs100": (gidx.state, 100, dict(expand_per_iter=4)),
    "efs150": (gidx.state, 150, dict(expand_per_iter=4)),
    "fast100": (st_fast, 100, dict(expand_per_iter=8)),
}
for tag, (g_st, g_ef, g_kw) in variants.items():
    g_kw = dict(track_results=False, **g_kw)
    fn = lambda q, _s=g_st, _e=g_ef, _k=g_kw: _beam(
        _s, q, gidx._sample_rows, K, _e, **_k
    )
    rec = recall_of(fn)
    ms = measure(fn, 128, 10) * 1000
    results[f"graph_{tag}"] = {
        "recall": round(rec, 4), "ms_b128": round(ms, 2),
        "qps": round(128 / ms * 1000, 1),
    }
    log(f"graph {tag}: recall {rec:.4f}, {ms:.2f}ms/128q = "
        f"{128/ms*1000:.0f} QPS")

# free fast-state copy before the scan
st_fast = None
gc.collect()

# ---- phase 4: fused scan at this corpus size ----
log("fused scan...")
scan = lambda q: flat_search_rerank(
    q, c16, norms, valid, K, Metric.L2, pool=64
)
r_scan = recall_of(scan)
ms_scan_2048 = measure(scan, B_HEAD, 10) * 1000
ms_scan_128 = measure(scan, 128, 20) * 1000
results.update(
    scan_recall=round(r_scan, 4),
    scan_ms_b2048=round(ms_scan_2048, 3),
    scan_qps_b2048=round(B_HEAD / ms_scan_2048 * 1000, 1),
    scan_ms_b128=round(ms_scan_128, 3),
    scan_qps_b128=round(128 / ms_scan_128 * 1000, 1),
)
log(
    f"scan: recall {r_scan:.4f}, B=2048 {ms_scan_2048:.2f}ms "
    f"({B_HEAD/ms_scan_2048*1000:.0f} QPS), B=128 {ms_scan_128:.2f}ms "
    f"({128/ms_scan_128*1000:.0f} QPS)"
)

print(json.dumps(results))
with open(
    _o.path.join(_o.path.dirname(_o.path.abspath(__file__)), "..",
                 "benchmarks", f"graph_scale_{N//1_000_000}M.json"), "w"
) as f:
    json.dump(results, f, indent=1)
