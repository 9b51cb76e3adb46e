"""Durable storage: WAL + snapshots + replay.

Re-design of the reference's storage engine (reference:
storage/engine.go:39 StorageEngine, batched_wal.go WALBatcher, parquet
snapshots parquet.go, CRC-verified replay engine.go:138-280): CRC32C
framing and scanning run in a small C++ library (native/), snapshots
are Parquet via pyarrow plus npz blobs for index state, and recovery is
snapshots-then-WAL-tail with fail-fast on corruption.
"""
from longbow_tpu.storage.engine import StorageEngine  # noqa: F401
from longbow_tpu.storage.wal import WAL  # noqa: F401
