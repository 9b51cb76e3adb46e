"""Store layer: datasets, the vector store, ingestion.

The functional re-design of the reference's `internal/store`
(reference: store.go:29 VectorStore, dataset.go:35 Dataset): instead of
an RCU dataset map with lock-striped indexes and worker queues, each
dataset owns functional device-array index state; the host mutates it
single-threadedly (Python serving edge) and every update is an atomic
swap of a pytree.
"""
from longbow_tpu.store.dataset import Dataset  # noqa: F401
from longbow_tpu.store.vector_store import VectorStore  # noqa: F401
