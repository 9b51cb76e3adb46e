"""Hardness-aware routing: distance-concentrated corpora stay on the
exact scan (index/hardness.py; measured rationale in the module
docstring — graph beam search recalls ~0.34 on 1M x 128 uniform while
the fused exact scan serves it at 0.9895 and ~12x the QPS)."""
import numpy as np
import jax.numpy as jnp

from longbow_tpu.index.adaptive import AdaptiveIndex
from longbow_tpu.index.hardness import relative_contrast


def _uniform(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def _clustered(n, d, seed=0, n_clusters=64):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 4.0
    a = rng.integers(0, n_clusters, n)
    return (centers[a] + rng.standard_normal((n, d)).astype(np.float32))


def test_relative_contrast_discriminates():
    u = jnp.asarray(_uniform(6000, 64))
    c = jnp.asarray(_clustered(6000, 64))
    rc_u = relative_contrast(u, 6000)
    rc_c = relative_contrast(c, 6000)
    assert rc_u < 2.0 < rc_c, (rc_u, rc_c)


def test_small_corpus_always_migratable():
    v = jnp.asarray(_uniform(500, 16))
    assert relative_contrast(v, 500) == float("inf")


def test_adaptive_stays_flat_on_concentrated_data():
    idx = AdaptiveIndex(64, migration_threshold=4096)
    idx.add(_uniform(6000, 64))
    idx.wait_migration(timeout_s=30)
    assert idx.kind == "flat"
    assert idx.last_contrast is not None and idx.last_contrast < 2.0
    # the probe re-arms on count doubling, not every add
    checked = idx._contrast_checked_at
    idx.add(_uniform(100, 64, seed=1))
    assert idx._contrast_checked_at == checked


def test_adaptive_migrates_on_structured_data():
    idx = AdaptiveIndex(64, migration_threshold=4096)
    idx.add(_clustered(6000, 64).astype(np.float32))
    idx.wait_migration(timeout_s=120)
    assert idx.kind == "hnsw"
    assert idx.last_contrast is not None and idx.last_contrast > 2.0


def test_min_contrast_zero_disables_probe():
    idx = AdaptiveIndex(64, migration_threshold=4096, min_contrast=0.0)
    idx.add(_uniform(6000, 64))
    idx.wait_migration(timeout_s=120)
    assert idx.kind == "hnsw"
