"""On-chip probe: does a B=8192 dispatch (tile_n=2048 to keep the
[B, T] VMEM tile at the headline footprint) beat 2x B=4096 at 1M x 128
bf16? Honest reduction-forced timing per CLAUDE.md. One compile at a
time; serial. Corpus/queries are generated ON DEVICE (jax PRNG) — no
512MB host upload, so the probe survives bad relay weather.

RESULT (2026-08-20, on-chip): B=8192 is INFEASIBLE for this kernel —
the per-lane candidate registers (out_vals/out_ids/rv/ri, each
[B, depth*128] i32) need 4 x 8192 x 256 x 4B = 32MB of scoped VMEM
against the v5e 16MB scoped limit; Mosaic fails with "Scoped
allocation with size 17.00M and limit 16.00M exceeded" at
tile_n=2048. B=4096 stays the max dispatch shape (measured this
session: 15.48 ms = 264.5k QPS, recall 0.9898 — ~11% slower than the
round's best verified 296.9k purely from relay dispatch weather)."""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import time, threading
import numpy as np

def log(m): print(f"[b8192 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

# mid-run deadline (ADVICE r4): a relay wedge during the B=8192 compile
# would hang this script forever — SIGALRM never fires inside PJRT C
# code, so use the daemon-thread + Event.wait + os._exit pattern.
_done = threading.Event()
def _deadline():
    if not _done.wait(float(_o.environ.get("LONGBOW_PROBE_DEADLINE_S", "1800"))):
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
from longbow_tpu.ops.pallas_scan import flat_search_rerank

N, D, K, NEV = 1_000_000, 128, 10, 512
NQ = 8192

log("on-device corpus gen...")
t0 = time.time()

@jax.jit
def gen():
    kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(0), 4)
    centers = jax.random.normal(kc, (1024, D), jnp.float32) * 4.0
    assign = jax.random.randint(ka, (N + NQ,), 0, 1024)
    allv = centers[assign] + jax.random.normal(kn, (N + NQ, D), jnp.float32)
    return allv[:N], allv[N:]

cj, qj = gen()
c16 = cj.astype(jnp.bfloat16)
norms = squared_norms(cj)
valid = jnp.ones((N,), bool)
float(jnp.sum(norms))  # force
log(f"gen {time.time()-t0:.0f}s")

log(f"oracle ({NEV} queries)...")
t0 = time.time()
_, gt_i = exact_search(qj[:NEV], cj, K, Metric.L2,
    corpus_norms_sq=norms, valid=valid, exact_precision=True, chunk_rows=131072)
gt = np.asarray(gt_i); log(f"oracle {time.time()-t0:.0f}s")

@jax.jit
def _force(*ds): return sum(jnp.sum(x) for x in ds)

@jax.jit
def _perturb(q, i):  # fresh query batch per iter without host traffic
    return q + 1e-6 * (i + 1)

def measure(fn, nb, iters=8):
    qb = [_perturb(qj[:nb], i) for i in range(iters)]
    d, _ = fn(qb[0]); float(np.asarray(_force(*([d] * iters))))  # warm
    t0 = time.perf_counter()
    outs = [fn(q)[0] for q in qb]
    float(np.asarray(_force(*outs)))
    return (time.perf_counter() - t0) / iters

def run(tag, nb, tile_n):
    fn = lambda q: flat_search_rerank(q, c16, norms, valid, K, Metric.L2,
                                      pool=64, tile_n=tile_n)
    log(f"compile {tag}...")
    t0 = time.time()
    d, i = fn(qj[:nb])
    got = np.asarray(i)[:NEV]
    rec = float(np.mean([len(set(got[j]) & set(gt[j])) / K for j in range(NEV)]))
    log(f"{tag}: compile {time.time()-t0:.0f}s, recall@10 {rec:.4f}")
    dt = measure(fn, nb)
    log(f"{tag}: {dt*1000:.2f} ms/batch = {nb/dt:.0f} QPS")
    return dt, rec

# reference point first (cached from the headline config)
dt4, r4 = run("B=4096 tile=4096", 4096, 0)
dt8, r8 = run("B=8192 tile=2048", 8192, 2048)

log(f"SUMMARY: 2x4096={2*dt4*1000:.2f}ms ({8192/(2*dt4):.0f} QPS) vs "
    f"1x8192(t2048)={dt8*1000:.2f}ms ({8192/dt8:.0f} QPS), "
    f"recall {r4:.4f}/{r8:.4f}")
_done.set()
