"""On-chip: shard_map program overhead on ONE real chip (VERDICT r4
task #4b). Runs the SAME 1M x 128 bf16 corpus through (a) the bare
fused kernel and (b) ShardedFlatIndex's sharded search program on a
1-device mesh. The delta is the mesh tier's fixed program overhead —
the measured constant for projecting >1-chip scaling (docs/
ARCHITECTURE.md crossover section).
"""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[mesh1 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "1800"))):
        log("DEADLINE EXCEEDED"); _o._exit(4)
threading.Thread(target=_deadline, daemon=True).start()

import os, jax, jax.numpy as jnp
cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla")
from longbow_tpu.config import machine_cache_tag
cache_dir = os.path.join(cache_dir, machine_cache_tag())
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.ops.distance import Metric, squared_norms
from longbow_tpu.ops.pallas_scan import flat_search_rerank
from longbow_tpu.parallel.mesh import make_mesh
from longbow_tpu.parallel.sharded import ShardedFlatIndex

N, D, K, B = 1_000_000, 128, 10, 2048

log("gen...")

@jax.jit
def gen():
    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + B,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + B, D), jnp.float32)
    return allv[:N], allv[N:]

cj, qj = gen()
c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj)
valid = jnp.ones((N,), bool)
float(jnp.sum(norms))

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

# bare kernel
bare = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2, pool=64)[0]
bare(qj)
dt_bare = measure(bare)
log(f"bare kernel: {dt_bare*1000:.2f} ms = {B/dt_bare:.0f} QPS")

# sharded program on a 1-device mesh (the real chip)
mesh = make_mesh(1)
log(f"mesh devices: {mesh.devices.tolist()}")
idx = ShardedFlatIndex(D, mesh, Metric.L2, dtype=jnp.bfloat16)
t0 = time.time()
for off in range(0, N, 250_000):
    # host hop: ShardedFlatIndex.add is np-interfaced (striped split);
    # build time is not the measurement here
    idx.add(np.asarray(jax.lax.dynamic_slice_in_dim(cj, off, 250_000)))
log(f"sharded ingest {time.time()-t0:.0f}s")

def sharded_fn(q):  # device in, device out — honest program timing
    return idx.search(q, K)[0]

d, i = idx.search(np.asarray(qj[:256]), K)
dt_sh = measure(sharded_fn)
log(f"sharded(1-dev): {dt_sh*1000:.2f} ms = {B/dt_sh:.0f} QPS  "
    f"overhead {((dt_sh-dt_bare))*1000:.2f} ms = "
    f"{(dt_sh/dt_bare-1)*100:.1f}%")

out = {
    "corpus": f"{N}x{D}", "batch": B,
    "bare_ms": round(dt_bare * 1000, 3),
    "sharded_1dev_ms": round(dt_sh * 1000, 3),
    "overhead_ms": round((dt_sh - dt_bare) * 1000, 3),
    "overhead_pct": round((dt_sh / dt_bare - 1) * 100, 2),
    "captured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "mesh_overhead_1dev.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
log(f"wrote {path}")
log("SUMMARY " + json.dumps(out))
_done.set()
