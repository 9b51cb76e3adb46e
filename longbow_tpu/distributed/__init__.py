"""Cross-cluster consistency: replication, anti-entropy, quorum.

Intra-slice parallelism is the device mesh (longbow_tpu.parallel);
this package covers what remains genuinely distributed-systems work
when running multiple longbow-tpu processes/slices: LWW replication
with per-peer circuit breakers, Merkle-tree anti-entropy, vector
clocks, quorum reads/writes, and split-brain detection
(reference: peer_replicator.go, quorum.go, merkle.go, lww.go,
vector_clock.go, split_brain_detector.go, mesh/sync/sync_worker.go).
"""
from longbow_tpu.distributed.merkle import MerkleTree  # noqa: F401
from longbow_tpu.distributed.vector_clock import VectorClock  # noqa: F401
