"""Distributed layer: shard-parallel search over a device mesh.

Replaces the reference's entire L2 stack — SWIM gossip, consistent-hash
ring, gRPC scatter-gather, StreamAggregator top-k merge
(reference: mesh/gossip.go, sharding/ring.go:15, scatter_gather.go:12,
stream_aggregator.go:17, global_search.go:48) — with XLA collectives
over ICI inside one jitted program: the corpus is row-sharded across
devices, queries are replicated, each shard computes a local top-k, and
an all_gather + merge produces the global result. Membership, failure
detection and routing collapse into the mesh: XLA's SPMD runtime is the
cluster manager.
"""
from longbow_tpu.parallel.mesh import make_mesh  # noqa: F401
from longbow_tpu.parallel.sharded import ShardedFlatIndex  # noqa: F401
