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
