import numpy as np
import jax.numpy as jnp

from longbow_tpu.ops.topk import (
    dedup_distances,
    masked_topk,
    merge_topk,
    sort_by_distance,
    topk_smallest,
)


def test_topk_smallest():
    d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
    vals, idx = topk_smallest(d, 2)
    np.testing.assert_allclose(np.asarray(vals), [[0.5, 1.0]])
    np.testing.assert_array_equal(np.asarray(idx), [[3, 1]])


def test_masked_topk():
    d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
    m = jnp.asarray([[True, True, True, False]])
    vals, idx = masked_topk(d, m, 2)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 2]])


def test_merge_topk():
    d1 = jnp.asarray([[1.0, 4.0]])
    i1 = jnp.asarray([[10, 40]])
    d2 = jnp.asarray([[2.0, 3.0]])
    i2 = jnp.asarray([[20, 30]])
    vals, idx = merge_topk(d1, i1, d2, i2, 3)
    np.testing.assert_allclose(np.asarray(vals), [[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(idx), [[10, 20, 30]])


def test_dedup_distances_masks_later_duplicates():
    d = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    i = jnp.asarray([[7, 8, 7, 9]])
    out = np.asarray(dedup_distances(d, i))
    assert out[0, 0] == 1.0
    assert out[0, 2] > 1e30
    assert out[0, 1] == 2.0 and out[0, 3] == 4.0


def test_sort_by_distance():
    d = jnp.asarray([[3.0, 1.0, 2.0]])
    i = jnp.asarray([[30, 10, 20]])
    sd, si = sort_by_distance(d, i)
    np.testing.assert_allclose(np.asarray(sd), [[1.0, 2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(si), [[10, 20, 30]])
