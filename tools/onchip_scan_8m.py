"""Scan scale proof at 8M x 128 on ONE v5e chip (round-4 extension of
the 4M crossover study, benchmarks/graph_scale_4M.json).

ARCHITECTURE.md documents that the fused scan beats the graph on every
dense corpus that fits one chip; this records the scan's recall/QPS at
8M rows (2 GB bf16 corpus) so the scale story has a measured point at
2x the previous largest corpus. Graph build is skipped: its QPS is
N-invariant (~5k) and two live 8M structures would crowd HBM.

Honest timing per CLAUDE.md: all outputs feed one pre-compiled jitted
reduction; block_until_ready lies through the relay.

Run from the repo root: python tools/onchip_scan_8m.py [N_million]
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
    print(f"[scan8m {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
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

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_000_000
D, K, NEV = 128, 10, 256

log(f"corpus {N}x{D} (clustered)")
rng = np.random.default_rng(0)
ncl = 4096
centers = rng.standard_normal((ncl, D)).astype(np.float32) * 4.0

# stage in 500k chunks: one 8M f32 host array would be 4GB and the
# device cast is cheap per chunk (each chunk stays <60s of execution,
# the relay's kill threshold)
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
    centers[rng.integers(0, ncl, NEV + 4096)]
    + rng.standard_normal((NEV + 4096, D)).astype(np.float32)
)


@jax.jit
def _force(*ds):
    return sum(jnp.sum(x) for x in ds)


norms = squared_norms(c16.astype(jnp.float32))
valid = jnp.ones((N,), bool)
log("oracle (exact f32 over the stored bf16 corpus)...")
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


results = {"n": N, "d": D,
           "corpus_hbm_mb": round(N * D * 2 / 2**20, 1)}
scan = lambda q: flat_search_rerank(
    q, c16, norms, valid, K, Metric.L2, pool=64
)
log("scan recall...")
r_scan = recall_of(scan)
log(f"scan recall {r_scan:.4f}")
for b, iters in ((4096, 8), (2048, 10), (128, 20)):
    ms = measure(scan, b, iters) * 1000
    results[f"scan_ms_b{b}"] = round(ms, 3)
    results[f"scan_qps_b{b}"] = round(b / ms * 1000, 1)
    log(f"B={b}: {ms:.2f} ms/batch = {b/ms*1000:.0f} QPS")
results["scan_recall"] = round(r_scan, 4)

print(json.dumps(results))
with open(
    _o.path.join(_o.path.dirname(_o.path.abspath(__file__)), "..",
                 "benchmarks", f"scan_scale_{N//1_000_000}M.json"), "w"
) as f:
    json.dump(results, f, indent=1)
