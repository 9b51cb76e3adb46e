"""Build-only diagnostic: which bulk_build_rp stage dies at N million."""
import os as _o, sys
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
_o.environ["LONGBOW_BUILD_DEBUG"] = "1"
import threading, time
import numpy as np

def log(m): print(f"[diag {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def _p():
    import jax; jax.devices(); up.set()
threading.Thread(target=_p, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)
import jax, jax.numpy as jnp
from longbow_tpu.config import machine_cache_tag
cd = _o.path.join(_o.path.expanduser("~"), ".cache", "longbow_tpu", "xla", machine_cache_tag())
_o.makedirs(cd, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cd)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 4_000_000
D = 128
rng = np.random.default_rng(0)
ncl = 4096
centers = rng.standard_normal((ncl, D)).astype(np.float32) * 4.0
CH = 500_000
parts = []
for off in range(0, N, CH):
    m = min(CH, N - off)
    a = rng.integers(0, ncl, m)
    parts.append(jnp.asarray(centers[a] + rng.standard_normal((m, D)).astype(np.float32)).astype(jnp.bfloat16))
c16 = jnp.concatenate(parts); del parts
import gc; gc.collect()
log(f"corpus on device: {N}x{D} bf16")

from longbow_tpu.index.hnsw import HNSWConfig, HNSWIndex
gidx = HNSWIndex(D, dtype=jnp.bfloat16, storage="dense", edge_dtype=jnp.bfloat16,
                 config=HNSWConfig(m=32, m_max=48, ef_search=100), capacity=N)
t0 = time.time()
gidx.add(c16)
gidx.state.nbrs.block_until_ready()
log(f"BUILD OK {time.time()-t0:.0f}s = {N/(time.time()-t0):.0f} vec/s")

# honest completion proof: fetch a scalar depending on the adjacency
import jax.numpy as _jnp
@jax.jit
def _force_i(x):
    return _jnp.sum(x.astype(_jnp.float32))
t1 = time.time()
v = float(np.asarray(_force_i(gidx.state.nbrs)))
log(f"HONEST build total {time.time()-t0:.0f}s (forced fetch {time.time()-t1:.0f}s, checksum {v:.3e})")
