"""Shard-parallel search on the 8-virtual-device CPU mesh —
the in-process stand-in for a v5e-8 slice (SURVEY.md §4 lesson 4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longbow_tpu.ops.distance import Metric, exact_search
from longbow_tpu.parallel.mesh import make_mesh
from longbow_tpu.parallel.sharded import ShardedFlatIndex


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_mesh_has_8_devices():
    assert make_mesh().size == 8


def test_sharded_matches_single_device_exact():
    mesh = make_mesh()
    v = _vecs(4000, 32)
    idx = ShardedFlatIndex(32, mesh)
    rows = idx.add(v)
    assert len(idx) == 4000
    q = _vecs(16, 32, seed=1)
    d, r = idx.search(q, 10)
    # oracle on the unsharded corpus
    ed, er = exact_search(jnp.asarray(q), jnp.asarray(v), 10, Metric.L2)
    # compare by distance (global rows differ from corpus order)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(ed), rtol=1e-3, atol=1e-3
    )


def test_global_rows_map_back_to_vectors():
    mesh = make_mesh()
    v = _vecs(1000, 16)
    idx = ShardedFlatIndex(16, mesh)
    rows = idx.add(v)
    # query corpus rows: the top hit's global row must be that vector's
    d, r = idx.search(v[:8], 1)
    got = np.asarray(r)[:, 0]
    np.testing.assert_array_equal(got, rows[:8])
    assert (np.asarray(d)[:, 0] < 1e-3).all()


def test_incremental_adds_across_shards():
    mesh = make_mesh()
    idx = ShardedFlatIndex(16, mesh)
    all_rows = []
    v = _vecs(3000, 16)
    for off in range(0, 3000, 700):
        all_rows.append(idx.add(v[off : off + 700]))
    rows = np.concatenate(all_rows)
    assert len(idx) == 3000
    assert len(np.unique(rows)) == 3000  # no row collisions
    d, r = idx.search(v[1500:1504], 1)
    np.testing.assert_array_equal(np.asarray(r)[:, 0], rows[1500:1504])


def test_sharded_growth():
    mesh = make_mesh()
    idx = ShardedFlatIndex(8, mesh, shard_capacity=2048)
    v = _vecs(20_000, 8)
    rows = idx.add(v)
    assert idx.shard_capacity > 2048
    d, r = idx.search(v[:4], 1)
    np.testing.assert_array_equal(np.asarray(r)[:, 0], rows[:4])


def test_sharded_tombstones():
    mesh = make_mesh()
    v = _vecs(800, 8)
    idx = ShardedFlatIndex(8, mesh)
    rows = idx.add(v)
    idx.delete_rows(rows[:10])
    _, r = idx.search(v[:10], 1)
    assert not np.isin(np.asarray(r)[:, 0], rows[:10]).any()


def test_sharded_cosine():
    mesh = make_mesh()
    v = _vecs(500, 16)
    idx = ShardedFlatIndex(16, mesh, metric=Metric.COSINE)
    rows = idx.add(v)
    d, r = idx.search(v[7] * 5.0, 1)
    assert np.asarray(r)[0, 0] == rows[7]


def test_smaller_mesh():
    mesh = make_mesh(4)
    v = _vecs(400, 8)
    idx = ShardedFlatIndex(8, mesh)
    rows = idx.add(v)
    d, r = idx.search(v[:3], 1)
    np.testing.assert_array_equal(np.asarray(r)[:, 0], rows[:3])


def test_sharded_graph_index():
    """ShardedHNSW parity: per-shard sub-graphs + collective merge
    (reference: sharded_hnsw.go:378-470)."""
    from longbow_tpu.parallel.sharded_graph import ShardedGraphIndex
    from longbow_tpu.index.hnsw import HNSWConfig

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    v = rng.standard_normal((8000, 32), dtype=np.float32)
    idx = ShardedGraphIndex(
        32, mesh, config=HNSWConfig(m=16, ef_construction=64, ef_search=64)
    )
    idx.add(v)
    idx.build()
    q = rng.standard_normal((16, 32), dtype=np.float32)
    d, rows = idx.search(q, 10)
    ed, er = exact_search(jnp.asarray(q), jnp.asarray(v), 10, Metric.L2)
    want = np.asarray(er)
    rec = np.mean([len(set(rows[i]) & set(want[i])) / 10 for i in range(16)])
    assert rec >= 0.9, rec
    # self-query: corpus rows map back through the stripe
    d2, rows2 = idx.search(v[:8], 1)
    assert (rows2[:, 0] == np.arange(8)).mean() >= 0.9


def test_sharded_graph_dot_metric():
    """Dot metric over shards: one global MIPS bound, augmented
    queries, distances comparable in the all_gather merge."""
    from longbow_tpu.index.hnsw import HNSWConfig
    from longbow_tpu.parallel.sharded_graph import ShardedGraphIndex

    mesh = make_mesh()
    rng = np.random.default_rng(1)
    v = rng.standard_normal((4000, 16), dtype=np.float32)
    idx = ShardedGraphIndex(
        16, mesh, metric=Metric.DOT,
        config=HNSWConfig(m=16, ef_construction=64, ef_search=96),
    )
    idx.add(v)
    idx.build()
    q = rng.standard_normal((8, 16), dtype=np.float32)
    d, rows = idx.search(q, 10)
    # exact MIPS ground truth
    ips = q @ v.T
    want = np.argsort(-ips, axis=1)[:, :10]
    rec = np.mean([len(set(rows[i]) & set(want[i])) / 10 for i in range(8)])
    assert rec >= 0.85, rec
    # returned "distances" are -ip: check values match the true ips
    for i in range(8):
        for j in range(3):
            np.testing.assert_allclose(
                -d[i, j], ips[i, rows[i, j]], rtol=2e-2, atol=1e-2
            )


def test_sharded_graph_live_ingest():
    """add after build is O(batch): new rows serve from the interim
    exact segment immediately, no rebuild per add (VERDICT r1 #5;
    reference: docs/autoshard.md:16-36 interim dual-read)."""
    from longbow_tpu.index.hnsw import HNSWConfig
    from longbow_tpu.parallel.sharded_graph import ShardedGraphIndex

    mesh = make_mesh()
    rng = np.random.default_rng(2)
    v = rng.standard_normal((3000, 16), dtype=np.float32)
    idx = ShardedGraphIndex(
        16, mesh, config=HNSWConfig(m=16, ef_construction=64, ef_search=64)
    )
    idx.add(v)
    idx.build()
    assert idx.built_count == 3000

    extra = rng.standard_normal((50, 16), dtype=np.float32)
    rows2 = idx.add(extra)
    assert idx.built_count == 3000  # NOT rebuilt
    assert idx._interim is not None and len(idx._interim) == 50

    # new rows searchable immediately
    d, r = idx.search(extra[:8], 1)
    assert (r[:, 0] == rows2[:8]).all()
    # old rows still fine
    d, r = idx.search(v[:8], 1)
    assert (r[:, 0] == np.arange(8)).mean() >= 0.9

    # add -> search -> add -> search (the VERDICT acceptance loop)
    extra2 = rng.standard_normal((30, 16), dtype=np.float32)
    rows3 = idx.add(extra2)
    d, r = idx.search(extra2[:5], 1)
    assert (r[:, 0] == rows3[:5]).all()

    # deletes hit both tiers and survive a fold
    idx.delete_rows(np.array([rows2[0], 5]))
    _, r = idx.search(np.vstack([extra[0], v[5]]), 1)
    assert r[0, 0] != rows2[0] and r[1, 0] != 5
    idx.fold_interim()
    assert idx.built_count == 3080 and idx._interim is None
    _, r = idx.search(np.vstack([extra[0], v[5]]), 1)
    assert r[0, 0] != rows2[0] and r[1, 0] != 5
    d, r = idx.search(extra2[:5], 1)
    assert (r[:, 0] == rows3[:5]).mean() >= 0.8


def test_mesh_flat_through_store():
    """The mesh tier as a first-class index kind: 8-way row-sharded
    exact search behind the same Dataset/VectorStore surface
    (reference capability: ShardedHNSW + scatter-gather, VERDICT r1
    'make multi-device the real serving path')."""
    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    vs.get_or_create("mf", 16, index_kind="mesh_flat")
    rng = np.random.default_rng(0)
    v = rng.standard_normal((500, 16), dtype=np.float32)
    vs.put("mf", np.arange(500), v, columns={"grp": np.arange(500) % 5})
    ids, scores, ok = vs.search("mf", v[17], 5)
    assert ids[0, 0] == 17 and ok[0, 0]
    # filters ride the sharded valid mask
    from longbow_tpu.query.parser import Filter

    ids, scores, ok = vs.search(
        "mf", v[18], 5, filters=[Filter("grp", "=", "3")]
    )
    got = [ids[0, j] for j in range(5) if ok[0, j]]
    assert got and all(int(i) % 5 == 3 for i in got)
    # deletes tombstone
    vs.delete("mf", [17])
    ids, scores, ok = vs.search("mf", v[17], 3)
    assert 17 not in [ids[0, j] for j in range(3) if ok[0, j]]


def test_mesh_flat_export_import_roundtrip():
    from longbow_tpu.index.factory import import_index, make_index

    idx = make_index("mesh_flat", 8, "l2")
    rng = np.random.default_rng(1)
    v = rng.standard_normal((300, 8), dtype=np.float32)
    rows = idx.add(v)
    st = idx.export_state()
    idx2 = import_index(st)
    q = jnp.asarray(v[:6])
    d1, r1 = idx.search(q, 3)
    d2, r2 = idx2.search(q, 3)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_mesh_graph_through_factory():
    from longbow_tpu.index.factory import import_index, make_index

    rng = np.random.default_rng(2)
    v = rng.standard_normal((3000, 16), dtype=np.float32)
    idx = make_index("mesh_graph", 16, "l2")
    idx.add(v)
    d, r = idx.search(v[:10], 5)
    r = np.asarray(r)
    assert (r[:, 0] == np.arange(10)).mean() >= 0.8
    # filtered search: oversample + host mask post-filter
    mask = np.zeros(idx.capacity, dtype=bool)
    mask[:1000] = True
    d, r = idx.search(v[:5], 5, filter_mask=jnp.asarray(mask))
    r = np.asarray(r)
    real = r[r >= 0]
    assert (real < 1000).all()
    # live adds after build: interim segment, then export/import
    idx.add(v[:50] + 0.01)
    d, r = idx.search(v[3] + 0.01, 1)
    assert np.asarray(r)[0, 0] in (3, 3000 + 3)
    st = idx.export_state()
    idx2 = import_index(st)
    assert len(idx2) == 3050
    d2, r2 = idx2.search(v[:10], 5)
    assert (np.asarray(r2)[:, 0] == np.arange(10)).mean() >= 0.8


def test_mesh_graph_through_store():
    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    vs.get_or_create("mg", 16, index_kind="mesh_graph")
    rng = np.random.default_rng(3)
    v = rng.standard_normal((2500, 16), dtype=np.float32)
    vs.put("mg", np.arange(2500), v)
    ids, scores, ok = vs.search("mg", v[9], 3)
    assert ids[0, 0] == 9 and ok[0, 0]
    # live adds after build serve from the interim segment
    vs.put("mg", np.arange(2500, 2550), v[:50] + 0.01)
    ids, scores, ok = vs.search("mg", v[3] + 0.01, 1)
    assert ids[0, 0] in (3, 2503)
    vs.delete("mg", [9])
    ids, scores, ok = vs.search("mg", v[9], 3)
    assert 9 not in [ids[0, j] for j in range(3) if ok[0, j]]


def test_row_ids_stable_across_capacity_growth():
    """Public row ids must survive shard-capacity growth: the old
    j*capacity+slot encoding invalidated every id the Dataset had
    recorded when capacity doubled (review finding — searches returned
    wrong ids and deletes tombstoned padding)."""
    from longbow_tpu.parallel.mesh import make_mesh
    from longbow_tpu.parallel.sharded import ShardedFlatIndex

    mesh = make_mesh(4)
    idx = ShardedFlatIndex(8, mesh, shard_capacity=2048)
    rng = np.random.default_rng(0)
    v1 = rng.standard_normal((1000, 8)).astype(np.float32)
    rows1 = idx.add(v1)
    got_before = idx.get_vectors(rows1[:5])
    # force growth: exceed 4 shards x 2048 slots
    v2 = rng.standard_normal((9000, 8)).astype(np.float32)
    idx.add(v2)
    assert idx.shard_capacity > 2048  # growth happened
    got_after = idx.get_vectors(rows1[:5])
    np.testing.assert_allclose(got_before, got_after, atol=1e-5)
    # searches still return the ORIGINAL ids for the original vectors
    d, r = idx.search(v1[3:4], 1)
    assert int(np.asarray(r)[0, 0]) == int(rows1[3])
    # deletes by original id hit the right row
    idx.delete_rows(rows1[3:4])
    d, r = idx.search(v1[3:4], 1)
    assert int(np.asarray(r)[0, 0]) != int(rows1[3])


def test_mesh_graph_empty_search_and_exact_fallback():
    """Searching an empty mesh_graph dataset returns masked results
    instead of crashing np.concatenate, and exact=True serves a real
    exact scan instead of silently returning ANN results."""
    from longbow_tpu.index.factory import make_index
    from longbow_tpu.ops.distance import MASKED

    idx = make_index("mesh_graph", 8, "l2", mesh_shards=2)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((1, 8)).astype(np.float32)
    d, r = idx.search(q, 3)  # empty: no crash
    assert (np.asarray(r) < 0).all() or (np.asarray(d) >= 1e30).all()
    v = rng.standard_normal((300, 8)).astype(np.float32)
    rows = idx.add(v)
    d, r = idx.search(v[5:6], 1, exact=True)
    assert int(np.asarray(r)[0, 0]) == int(rows[5])
    assert idx.n_shards == 2  # forwarded for the sharded metrics


def test_dcn_two_process_dryrun():
    """Two OS processes join a jax.distributed cluster (4 virtual CPU
    devices each), build ONE 8-device global mesh and run the sharded
    search step — the program shape a multi-host pod runs over DCN
    (SURVEY §5 comm-backend mapping). Folded into pytest from
    tools/dcn_dryrun.py (VERDICT r4 #4c)."""
    import os
    import pathlib
    import subprocess
    import sys

    if os.environ.get("LONGBOW_SKIP_PROC_TEST") == "1":
        pytest.skip("subprocess tests disabled")
    script = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools" / "dcn_dryrun.py"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    r = subprocess.run(
        [sys.executable, str(script)], env=env, timeout=280,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DCN dryrun: OK" in r.stdout, r.stdout


@pytest.mark.skipif(
    __import__("os").environ.get("LONGBOW_FULL_GATES") != "1",
    reason="256k mesh-tier gate: set LONGBOW_FULL_GATES=1",
)
@pytest.mark.parametrize("kind", ["mesh_flat", "mesh_graph"])
def test_mesh_tier_256k_full_gate(kind, tmp_path):
    """Scale evidence for the sharded tier (VERDICT r4 missing #6):
    >=256k rows through the mesh index kinds on the 8-device CPU mesh
    — recall vs exact oracle, filters, deletes, snapshot/restore, and
    capacity growth past the initial shard slots. Matches the
    reference's default-above-10k ShardedHNSW role
    (sharded_hnsw.go:378-470)."""
    from longbow_tpu.store.vector_store import VectorStore
    from longbow_tpu.query.parser import Filter

    n, d, k = 262_144, 64, 10
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((256, d)).astype(np.float32) * 3.0
    assign = rng.integers(0, 256, n)
    v = (centers[assign]
         + rng.standard_normal((n, d)).astype(np.float32))
    store = VectorStore(persist_dir=tmp_path)
    store.get_or_create("m", d, index_kind=kind)
    # ingest in chunks (capacity grows across shard-slot doublings)
    for off in range(0, n, 65536):
        store.put(
            "m", np.arange(off, off + 65536), v[off : off + 65536],
            columns={"par": (np.arange(off, off + 65536) % 4)},
        )
    ds = store.get("m")
    assert ds.live_count == n

    held = rng.standard_normal((64, d)).astype(np.float32) * 0.1
    q = centers[rng.integers(0, 256, 64)] + held
    _, gt_i = exact_search(
        jnp.asarray(q), jnp.asarray(v), k, exact_precision=True,
        chunk_rows=65536,
    )
    gt = np.asarray(gt_i)
    ids, sc, ok = store.search("m", q, k, use_cache=False)
    rec = np.mean([
        len({ids[i, j] for j in range(k) if ok[i, j]}
            & set(gt[i].tolist())) / k
        for i in range(64)
    ])
    floor = 0.95 if kind == "mesh_flat" else 0.80
    assert rec >= floor, f"{kind} recall {rec}"

    # filters: par == 2 restricts results to that quarter
    ids_f, _, ok_f = store.search(
        "m", q[:8], k, filters=[Filter("par", "=", "2")],
        use_cache=False,
    )
    got = [ids_f[i, j] for i in range(8) for j in range(k) if ok_f[i, j]]
    assert got and all(g % 4 == 2 for g in got)

    # deletes: remove the true top hit of query 0, it must vanish
    top0 = gt[0, 0]
    store.delete("m", [int(top0)])
    ids_d, _, ok_d = store.search("m", q[:1], k, use_cache=False)
    assert int(top0) not in [
        ids_d[0, j] for j in range(k) if ok_d[0, j]
    ]

    # snapshot/restore round trip preserves results
    ids_b, _, _ = store.search("m", q[:4], k, use_cache=False)
    store.snapshot()
    store.close()
    store2 = VectorStore(persist_dir=tmp_path)
    assert store2.get("m").live_count == n - 1
    ids_a, _, _ = store2.search("m", q[:4], k, use_cache=False)
    assert ids_a[:, 0].tolist() == ids_b[:, 0].tolist()
