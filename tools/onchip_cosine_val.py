"""On-chip: served cosine recall at 1M x 128 bf16 (round-4 fix).

Cosine used to ride dot-on-normalized storage: ranking by -q.v against
normalized-but-ROUNDED bf16 rows injects the |v_hat| wobble (+-2^-9)
un-attenuated into every score — measured 0.9389-0.9418 recall@10 on
this corpus. The fix routes cosine through the l2 kernel path, whose
consistent stored-norm term cancels the wobble (0.9824 in the A/B),
and reports the declared 1-cos values. This validates the SERVED
FlatIndex path end to end on the real chip.
"""
import os as _o, sys; sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, threading, time
import numpy as np

def log(m): print(f"[cosval {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

up = threading.Event()
def probe():
    import jax; jax.devices(); up.set()
threading.Thread(target=probe, daemon=True).start()
if not up.wait(300):
    log("RELAY DOWN"); sys.exit(3)

import os, jax, jax.numpy as jnp
from longbow_tpu.config import machine_cache_tag
cd = os.path.join(os.path.expanduser("~"), ".cache", "longbow_tpu", "xla",
                  machine_cache_tag())
os.makedirs(cd, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cd)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.ops.distance import Metric, exact_search

N, D, K, NEV = 1_000_000, 128, 10, 512
rng = np.random.default_rng(0)
centers = rng.standard_normal((1024, D)).astype(np.float32) * 4.0
assign = rng.integers(0, 1024, N + 2048)
allv = centers[assign] + rng.standard_normal((N + 2048, D)).astype(np.float32)
corpus, queries = allv[:N], allv[N:]

# oracle: exact cosine on the f32 originals
cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
log("oracle (exact f32 cosine)...")
cj = jnp.asarray(cn)
_, gt_i = exact_search(
    jnp.asarray(queries[:NEV]), cj, K, Metric.DOT,
    corpus_norms_sq=jnp.zeros((N,), jnp.float32),
    valid=jnp.ones((N,), bool), exact_precision=True, chunk_rows=131072,
)
gt = np.asarray(gt_i)
del cj, cn

log("FlatIndex(cosine) ingest...")
idx = FlatIndex(D, metric=Metric.COSINE, dtype=jnp.bfloat16,
                capacity=1 << 20)
for off in range(0, N, 262_144):
    idx.add(corpus[off:off + 262_144])
idx.flush()

got, vals = [], []
for off in range(0, NEV, 128):
    d, i = idx.search(queries[off:off + 128], K)
    got.append(np.asarray(i)); vals.append(np.asarray(d))
got = np.concatenate(got); vals = np.concatenate(vals)
rec = float(np.mean([len(set(got[i]) & set(gt[i])) / K
                     for i in range(NEV)]))
log(f"served cosine recall@10: {rec:.4f} (was 0.9418 as dot mode)")
# values are the declared cosine distance: top hits well inside [0, 2]
assert 0.0 <= vals[:, 0].min() and vals[:, 0].max() < 1.0, (
    vals[:, 0].min(), vals[:, 0].max())
out = {"n": N, "d": D, "recall_at_10": round(rec, 4),
       "prev_dot_mode": 0.9418,
       "top1_cosdist_range": [float(vals[:, 0].min()),
                              float(vals[:, 0].max())]}
print(json.dumps(out))
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks",
        "cosine_1M_fix.json"), "w") as f:
    json.dump(out, f, indent=1)
assert rec >= 0.975, rec
