"""Distance-concentration probe: is this corpus graph-navigable?

Graph ANN collapses on distance-concentrated (high intrinsic
dimensionality) data: on 1M x 128 uniform Gaussian the beam search
recalls 0.26-0.43 at efS 150-300 regardless of build quality (measured
round 3 — more NN-descent rounds, diversified pruning, and exact-kNN
builds at smaller n all plateau the same way; the reference's own
recall gates only cover clustered/structured corpora,
recall_validation_test.go:38-50). This is intrinsic: when the 10-NN
distance approaches the mean distance, greedy graph descent has no
gradient to follow — no edge selection fixes it.

The TPU answer is routing, not heroics: the fused exact scan serves
1M x 128 at ~48k QPS with recall 0.9895 — strictly better than ANY
graph configuration on such data (3.8k QPS at 0.34). AdaptiveIndex
therefore probes *relative contrast*

    RC = E[d(q, X)] / E[d_k(q)]        (d = squared L2, k = 10)

on a 64k-row sample before migrating flat->graph and stays on the
exact scan when RC is below threshold. Measured at 64k db samples:
uniform Gaussian D=128 -> 1.54, D=384 -> 1.27; 1024-cluster corpora
(bench distribution) -> ~18; real embedding corpora are clustered by
nature. Threshold 2.0 separates cleanly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# below this relative contrast the flat exact scan dominates any graph
# config in BOTH recall and QPS (see module docstring)
DEFAULT_MIN_CONTRAST = 2.0


@functools.partial(jax.jit, static_argnames=("k",))
def _rc_kernel(db: jax.Array, q: jax.Array, k: int) -> jax.Array:
    """[S, D], [NQ, D] f32 -> scalar relative contrast."""
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    dn = jnp.sum(db * db, axis=1)
    d = qn - 2.0 * (q @ db.T) + dn[None, :]
    mean_d = jnp.mean(d)
    # queries are sampled from the corpus: exclude self/duplicate rows
    # from the NN side (they would fake contrast on concentrated data)
    d = jnp.where(d < 1e-9 * jnp.abs(mean_d), jnp.inf, d)
    nn_k = -jax.lax.top_k(-d, k)[0][:, k - 1]
    return mean_d / jnp.maximum(jnp.mean(nn_k), 1e-30)


def relative_contrast(
    vectors: jax.Array,
    count: int,
    *,
    n_queries: int = 256,
    max_db: int = 65536,
    k: int = 10,
) -> float:
    """Relative contrast of rows [0, count) of a (possibly padded)
    device vector array. One jitted call, scalar fetch; db sample size
    is bucketed to powers of two so repeated probes reuse the compile.
    """
    sampled = sample_for_contrast(
        vectors, count, n_queries=n_queries, max_db=max_db
    )
    if sampled is None:
        return float("inf")  # too small to judge; graphs are fine small
    db, q = sampled
    return relative_contrast_from_sample(db, q, k=k)


def sample_for_contrast(
    vectors,
    count: int,
    *,
    n_queries: int = 256,
    max_db: int = 65536,
):
    """Extract the (db, q) probe sample from the corpus buffer. This is
    the only part that READS `vectors` — callers that race donating
    flushes dispatch this under the index's dispatch lock and sync it
    (the returned arrays are fresh buffers, safe after the source is
    donated), then run the kernel outside any lock."""
    count = int(count)
    if count < 4 * n_queries:
        return None
    db_n = min(max_db, count - n_queries)
    db_n = 1 << (db_n.bit_length() - 1)  # pow2 bucket: stable jit shape
    # strided samples decorrelate from insertion order; queries drawn
    # from a different stride offset than the db rows
    db_idx = np.linspace(0, count - 1, db_n, dtype=np.int64)
    q_idx = np.linspace(1, count - 2, n_queries, dtype=np.int64)
    db = jnp.take(vectors, jnp.asarray(db_idx), axis=0).astype(jnp.float32)
    q = jnp.take(vectors, jnp.asarray(q_idx), axis=0).astype(jnp.float32)
    return db, q


def relative_contrast_from_sample(db, q, *, k: int = 10) -> float:
    return float(_rc_kernel(db, q, k))
