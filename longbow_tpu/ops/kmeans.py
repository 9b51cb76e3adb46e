"""Batched k-means (Lloyd iterations) as a jitted program.

Replaces the reference's pooled-buffer CPU k-means
(reference: pq/kmeans.go:64 TrainKMeans): assignment is a distance
matmul + argmin on the MXU, the update step is a one-hot matmul (also
MXU), and PQ trains all M subspace codebooks in one batched program
instead of M sequential fits.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_iters",))
def lloyd(
    data: jax.Array,       # [G, N, D] G independent k-means problems
    init: jax.Array,       # [G, K, D] initial centroids
    n_iters: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """-> (centroids [G, K, D], assignments [G, N])."""
    g, n, d = data.shape
    k = init.shape[1]

    def step(cent, _):
        # assign: [G, N, K] distances via batched MXU
        ip = jnp.einsum(
            "gnd,gkd->gnk", data, cent, preferred_element_type=jnp.float32
        )
        dn = jnp.sum(data * data, axis=2)[:, :, None]
        cn = jnp.sum(cent * cent, axis=2)[:, None, :]
        dist = dn - 2.0 * ip + cn
        assign = jnp.argmin(dist, axis=2)  # [G, N]
        # update: one-hot matmul keeps it on the MXU
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [G, N, K]
        sums = jnp.einsum(
            "gnk,gnd->gkd", onehot, data, preferred_element_type=jnp.float32
        )
        counts = jnp.sum(onehot, axis=1)[:, :, None]  # [G, K, 1]
        new_cent = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), cent)
        return new_cent, None

    cent, _ = jax.lax.scan(step, init, None, length=n_iters)
    # final assignment
    ip = jnp.einsum(
        "gnd,gkd->gnk", data, cent, preferred_element_type=jnp.float32
    )
    dn = jnp.sum(data * data, axis=2)[:, :, None]
    cn = jnp.sum(cent * cent, axis=2)[:, None, :]
    assign = jnp.argmin(dn - 2.0 * ip + cn, axis=2)
    return cent, assign


def kmeans_init(data: jax.Array, k: int, seed: int = 0) -> jax.Array:
    """Random-subset init for [G, N, D] -> [G, K, D]."""
    g, n, d = data.shape
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, shape=(k,), replace=False)
    return jnp.take(data, idx, axis=1)
