"""On-chip A/B: corpus tile 8192 vs 4096 at D=128 (grid-overhead halving).

The lane-candidate kernel's 2048->4096 tile doubling bought 1.65x at
B=128 (grid overhead); this probes whether one more doubling pays at
the serving batches. VMEM at tile 8192 / B=4096 / depth 2 is ~21MB
(16MB registers + 2x2MB tile double-buffer + 2MB queries) — may not
fit; a clean compile failure is an acceptable outcome and is recorded.

Usage: python tools/onchip_tile8k.py
"""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m): print(f"[t8k {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

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

from longbow_tpu.ops.distance import Metric, squared_norms
from longbow_tpu.ops.pallas_scan import flat_search_rerank

N, D, K = 1_000_000, 128, 10
rng = np.random.default_rng(0)
centers = rng.standard_normal((1024, D)).astype(np.float32) * 4.0
assign = rng.integers(0, 1024, N + 8192)
allv = (centers[assign] + rng.standard_normal((N + 8192, D)).astype(np.float32))
corpus, queries = allv[:N], allv[N:]

c16 = jnp.asarray(corpus).astype(jnp.bfloat16)
norms = squared_norms(c16.astype(jnp.float32))
valid = jnp.ones((N,), bool)

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

def run(tile, B, iters=8):
    tag = f"tile{tile}/B{B}"
    qb = [jnp.asarray(queries[:B] + 1e-6 * i, np.float32).astype(jnp.bfloat16)
          for i in range(iters)]
    t0 = time.time()
    try:
        d, i = flat_search_rerank(
            qb[0], c16, norms, valid, K, Metric.L2, pool=64, tile_n=tile
        )
        ids0 = np.asarray(i)
        float(np.asarray(_force(*([d] * iters))))
    except Exception as e:
        log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return {"tile": tile, "B": B, "error": str(e)[:200]}
    compile_s = time.time() - t0
    outs = []
    t0 = time.perf_counter()
    for q in qb:
        d, _ = flat_search_rerank(
            q, c16, norms, valid, K, Metric.L2, pool=64, tile_n=tile
        )
        outs.append(d)
    float(np.asarray(_force(*outs)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    log(f"{tag}: {ms:.2f} ms/batch = {B/ms*1e3:.0f} QPS (compile+first {compile_s:.0f}s)")
    return {"tile": tile, "B": B, "ms": round(ms, 3),
            "qps": round(B / ms * 1e3, 1), "ids_sample": ids0[:2, :3].tolist()}

out = {"n": N, "d": D}
# serial compiles, baseline first (warm cache likely)
out["t4096_b2048"] = run(4096, 2048)
out["t8192_b2048"] = run(8192, 2048)
if "error" not in out["t8192_b2048"]:
    out["t4096_b4096"] = run(4096, 4096)
    out["t8192_b4096"] = run(8192, 4096)
    # ids must agree with the 4096-tile kernel (same exact candidates
    # modulo collision-window halving)
print(json.dumps(out, indent=1))
