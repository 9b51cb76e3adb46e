"""Top-k selection and merge primitives.

Replaces the reference's heap-based result sets and its Arrow
`select_k` compute kernel (reference: arrow_kernels.go:230,
arrow_search_context.go:148) with fixed-shape, sort-based device
selection. All functions use *distances* (smaller is better).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from longbow_tpu.ops.distance import MASKED


def topk_smallest(dist: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Smallest-k along last axis -> (dist [..., k], idx [..., k])."""
    neg_vals, idx = jax.lax.top_k(-dist, k)
    return -neg_vals, idx


def masked_topk(
    dist: jax.Array, mask: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k over last axis where mask is True; masked slots get MASKED."""
    dist = jnp.where(mask, dist, MASKED)
    return topk_smallest(dist, k)


def merge_topk(
    d1: jax.Array,
    i1: jax.Array,
    d2: jax.Array,
    i2: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two sorted-or-unsorted top-k sets -> best k of the union.

    The device-side analogue of the reference's StreamAggregator merge
    (reference: sharding/stream_aggregator.go:17-293) and the sharded
    index's local-shard merge (reference: sharded_hnsw.go:436-470).
    Works on any leading batch dims.
    """
    d = jnp.concatenate([d1, d2], axis=-1)
    i = jnp.concatenate([i1, i2], axis=-1)
    vals, pos = topk_smallest(d, k)
    return vals, jnp.take_along_axis(i, pos, axis=-1)


def dedup_distances(dist: jax.Array, idx: jax.Array) -> jax.Array:
    """Mask duplicate indices along the last axis (keep first occurrence).

    Returns dist with later duplicates set to MASKED. Used when merging
    candidate lists in graph beam search where the same node can arrive
    via two edges. O(k^2) compare — k here is the beam width (<=512).
    """
    k = idx.shape[-1]
    eq = idx[..., :, None] == idx[..., None, :]  # [..., k, k]
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    is_dup = jnp.any(eq & earlier, axis=-1)
    return jnp.where(is_dup, MASKED, dist)


def sort_by_distance(
    dist: jax.Array, idx: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Sort (dist, idx) pairs ascending by distance along the last axis."""
    order = jnp.argsort(dist, axis=-1)
    return (
        jnp.take_along_axis(dist, order, axis=-1),
        jnp.take_along_axis(idx, order, axis=-1),
    )
