"""longbow_tpu — a TPU-native vector index-and-query engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
reference system (23skdu/longbow, a distributed Arrow-native vector
database in Go): exact and graph-based approximate k-NN over
L2/cosine/dot metrics, PQ/SQ8/BQ quantized search with ADC, metadata
predicate filtering, tombstoned deletes, hybrid dense+BM25 search with
RRF fusion, WAL + snapshot persistence, and shard-parallel distributed
search over a `jax.sharding.Mesh`.

Design stance (see SURVEY.md §7): arrays not objects, batched masked
fixed-shape kernels not pointer-chasing, functional index updates not
locks, and `shard_map` collectives over ICI instead of gRPC
scatter-gather.
"""

__version__ = "0.1.0"

from longbow_tpu.ops.distance import Metric  # noqa: F401

# Lazy top-level API (PEP 562): `longbow_tpu.VectorStore` /
# `longbow_tpu.LongbowClient` without importing jax or pyarrow.flight
# at package-import time (the storage tier deliberately stays
# importable without either).
_LAZY = {
    "VectorStore": ("longbow_tpu.store.vector_store", "VectorStore"),
    "Dataset": ("longbow_tpu.store.dataset", "Dataset"),
    "LongbowClient": ("longbow_tpu.serving.client", "LongbowClient"),
    "Config": ("longbow_tpu.config", "Config"),
    "load_config": ("longbow_tpu.config", "load_config"),
}


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    obj = getattr(importlib.import_module(target[0]), target[1])
    globals()[name] = obj  # cache: next access skips the import hook
    return obj


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
