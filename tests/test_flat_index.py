import numpy as np
import jax.numpy as jnp
import pytest

from longbow_tpu.index.flat import FlatIndex
from longbow_tpu.ops.distance import Metric


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_add_search_roundtrip():
    idx = FlatIndex(dim=32)
    v = _vecs(200, 32)
    rows = idx.add(v)
    assert len(idx) == 200
    assert rows.tolist() == list(range(200))
    # query with corpus rows: nearest must be the row itself
    dist, got = idx.search(jnp.asarray(v[:5]), 1)
    assert np.asarray(got)[:, 0].tolist() == [0, 1, 2, 3, 4]
    assert (np.asarray(dist)[:, 0] < 1e-3).all()


def test_incremental_adds_and_growth():
    idx = FlatIndex(dim=16, capacity=4096)
    all_v = _vecs(5000, 16)
    for i in range(0, 5000, 500):
        idx.add(all_v[i : i + 500])
    assert len(idx) == 5000
    assert idx.capacity >= 5000
    _, got = idx.search(jnp.asarray(all_v[4990:4995]), 1)
    assert np.asarray(got)[:, 0].tolist() == [4990, 4991, 4992, 4993, 4994]


def test_tombstoned_rows_not_returned():
    idx = FlatIndex(dim=8)
    v = _vecs(50, 8)
    idx.add(v)
    idx.delete_rows(np.array([7]))
    _, got = idx.search(jnp.asarray(v[7:8]), 3)
    assert 7 not in np.asarray(got)[0]


def test_filter_mask():
    idx = FlatIndex(dim=8)
    v = _vecs(64, 8)
    idx.add(v)
    mask = np.zeros(idx.capacity, dtype=bool)
    mask[10:20] = True
    _, got = idx.search(jnp.asarray(v[:3]), 5, filter_mask=jnp.asarray(mask))
    assert ((np.asarray(got) >= 10) & (np.asarray(got) < 20)).all()


def test_cosine_metric():
    idx = FlatIndex(dim=16, metric=Metric.COSINE)
    v = _vecs(100, 16)
    idx.add(v)
    # scaled copy of a vector has cosine distance ~0 to it
    q = v[42] * 7.5
    dist, got = idx.search(jnp.asarray(q), 1)
    assert np.asarray(got)[0, 0] == 42
    assert np.asarray(dist)[0, 0] < 1e-3


def test_bf16_storage():
    idx = FlatIndex(dim=32, dtype=jnp.bfloat16)
    v = _vecs(500, 32)
    idx.add(v)
    _, got = idx.search(jnp.asarray(v[:10]), 1)
    assert np.asarray(got)[:, 0].tolist() == list(range(10))


def test_export_import_state():
    idx = FlatIndex(dim=8)
    v = _vecs(30, 8)
    idx.add(v)
    idx.delete_rows(np.array([3, 4]))
    st = idx.export_state()
    idx2 = FlatIndex.import_state(st)
    assert len(idx2) == 30
    _, got = idx2.search(jnp.asarray(v[3:4]), 1)
    assert np.asarray(got)[0, 0] != 3


def test_dim_mismatch_raises():
    idx = FlatIndex(dim=8)
    with pytest.raises(ValueError):
        idx.add(_vecs(10, 9))


def test_staged_chunks_store_their_own_data():
    """Consecutive large np adds must store each chunk's OWN vectors.

    Regression: the staging buffer was reused across flushes, but jax
    zero-copy-aliases host f32 arrays on CPU and executes ingest
    asynchronously — every chunk ended up holding the NEXT chunk's
    data at 1M x 128 (recall collapsed to 0.28). The buffer is now
    handed off at flush and reallocated per cycle."""
    rng = np.random.default_rng(7)
    n, d, chunk = 600_000, 128, 150_000
    vecs = rng.standard_normal((n, d), dtype=np.float32)
    fl = FlatIndex(d)
    for a in range(0, n, chunk):
        fl.add(vecs[a : a + chunk])
    fl.flush()
    for a in (0, chunk, chunk + 1, 2 * chunk, 3 * chunk, n - 1):
        got = np.asarray(fl.vectors[a : a + 1]).astype(np.float32)
        assert np.abs(got - vecs[a : a + 1]).max() < 0.05, f"row {a}"


def test_host_scan_mirror_matches_device():
    """get_vectors serves from the host mirror (DoGet scans measured
    ~6 MB/s via device->host fetch through the relay vs GB/s host
    gather) and must match the device gather through ingest, upsert,
    delete and compaction."""
    from longbow_tpu.index.adaptive import AdaptiveIndex

    rng = np.random.default_rng(3)
    idx = AdaptiveIndex(16, "l2", dtype=jnp.bfloat16,
                        migration_threshold=2**62)
    v = rng.standard_normal((3000, 16)).astype(np.float32)
    idx.add(v)
    rows = np.arange(0, 3000, 7)
    got = idx.get_vectors(rows)
    dev = np.asarray(idx.get_vectors_device(rows))
    # bf16-bits mirror uses the same round-to-nearest-even as XLA's
    # device store, so mirror reads are BIT-identical to device reads
    assert np.array_equal(got, dev), np.abs(got - dev).max()
    # device-origin add disables the mirror (would need a fetch)
    idx2 = AdaptiveIndex(16, "l2", dtype=jnp.bfloat16,
                         migration_threshold=2**62)
    idx2.add(jnp.asarray(v))
    assert idx2._flat.mirror_rows(rows) is None
    got2 = idx2.get_vectors(rows)  # falls back to device gather
    assert np.allclose(got2, dev, atol=2e-2)


def test_mirror_contiguous_view_fast_path():
    """A contiguous ascending row range (the full-scan shape) must be
    served as a zero-copy VIEW of the mirror, and must read the same
    bytes as the general fancy-index path."""
    from longbow_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(4)
    idx = FlatIndex(16, dtype=jnp.bfloat16)
    v = rng.standard_normal((3000, 16)).astype(np.float32)
    idx.add(v)
    contig = np.arange(512, 2048, dtype=np.int64)
    mv = idx.mirror_rows(contig)
    assert np.shares_memory(mv, idx._host_mirror)  # view, no copy
    scattered = contig[::-1].copy()
    ms = idx.mirror_rows(scattered)
    assert not np.shares_memory(ms, idx._host_mirror)
    assert np.array_equal(mv[::-1], ms)
    # decode equivalence: native single-pass vs numpy chain
    f_native = FlatIndex.mirror_to_f32(np.ascontiguousarray(mv))
    f_numpy = (mv.astype(np.uint32) << 16).view(np.float32)
    assert np.array_equal(f_native, f_numpy)


def test_scan_mirror_survives_compaction():
    from longbow_tpu.store.dataset import Dataset

    rng = np.random.default_rng(4)
    ds = Dataset("m", 8, index_kind="flat")
    v = rng.standard_normal((500, 8)).astype(np.float32)
    ds.put(np.arange(500), v)
    ds.delete(np.arange(0, 500, 2))
    from longbow_tpu.store.compaction import compact_dataset

    out = compact_dataset(ds)
    assert out["reclaimed_rows"] >= 250
    assert ds.index._flat.mirror_rows(np.arange(5)) is not None
    # surviving ids still read back their own vectors via the mirror
    t_rows = np.asarray([ds._id_to_row[i] for i in (1, 3, 251)])
    got = ds.index.get_vectors(t_rows)
    assert np.allclose(got, v[[1, 3, 251]], atol=2e-2)


def test_coarse_shadow_maintenance():
    """The coarse int8 shadow (TPU serving accelerator) tracks ingest:
    codes quantize the STORED rows, norms are dequant-consistent, and
    growth/tombstones ride along. The shadow is maintenance-tested on
    CPU; the kernel path it feeds is validated on-chip (interpret-mode
    op test in test_pallas_scan.py)."""
    import jax.numpy as jnp

    from longbow_tpu.index.flat import FlatIndex

    idx = FlatIndex(16, dtype=jnp.bfloat16)
    idx._coarse_enabled = True  # CPU: force the TPU-only maintenance
    rng = np.random.default_rng(0)
    v1 = rng.standard_normal((300, 16)).astype(np.float32)
    idx.add(v1)
    idx.flush()
    assert idx._coarse_codes is not None
    assert idx._coarse_codes.dtype == jnp.int8
    # codes dequantize back to ~the stored rows
    lo = np.asarray(idx._coarse_lo)
    hi = np.asarray(idx._coarse_hi)
    scale = np.maximum(hi - lo, 1e-12) / 255.0
    deq = (
        np.asarray(idx._coarse_codes[:300]).astype(np.float32) * scale
        + (lo + 128 * scale)
    )
    stored = np.asarray(idx.vectors[:300].astype(jnp.float32))
    err = np.abs(deq - stored).max()
    assert err <= (hi - lo).max() / 255.0 + 1e-5, err
    # norms are |dequant|^2 (consistent-norms rule)
    np.testing.assert_allclose(
        np.asarray(idx._coarse_norms[:300]),
        np.sum(deq * deq, axis=1), rtol=1e-5,
    )
    # growth keeps the shadow aligned
    v2 = rng.standard_normal((5000, 16)).astype(np.float32)
    idx.add(v2)
    idx.flush()
    assert idx._coarse_codes.shape[0] == idx.vectors.shape[0]
    deq2 = (
        np.asarray(idx._coarse_codes[300:5300]).astype(np.float32)
        * scale + (lo + 128 * scale)
    )
    stored2 = np.asarray(idx.vectors[300:5300].astype(jnp.float32))
    # later rows may clip at the trained affine's range — bound the
    # non-clipped error only
    inside = (stored2 >= lo) & (stored2 <= hi)
    assert (
        np.abs(deq2 - stored2)[inside].max()
        <= (hi - lo).max() / 255.0 + 1e-5
    )
