"""Vector indexes: flat exact, graph (HNSW-family), IVF, quantized.

The pluggable index contract mirrors the reference's `VectorIndexer`
interface (reference: types/interfaces.go:14-62) re-shaped for
functional device state: an index owns fixed-shape device arrays and
exposes add / search / tombstone as (mostly jitted) array programs.
"""
from longbow_tpu.index.flat import FlatIndex  # noqa: F401
