"""O(1) equality pre-filters: bloom + column inverted index
(reference: internal/store/column_inverted_index.go, bloom_filter.go)."""
import numpy as np
import pytest

from longbow_tpu.query.parser import Filter, parse_ticket
from longbow_tpu.query.prefilter import BloomFilter, ColumnPrefilter
from longbow_tpu.query.filters import ColumnStore
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_bloom_no_false_negatives():
    bf = BloomFilter(1000, 0.01)
    keys = [f"k{i}" for i in range(1000)]
    for k in keys:
        bf.add(k)
    assert all(bf.might_contain(k) for k in keys)
    # fp rate sanity on absent keys
    fps = sum(bf.might_contain(f"absent{i}") for i in range(2000))
    assert fps < 2000 * 0.05


def test_prefilter_rows_and_growth():
    pf = ColumnPrefilter()
    # push past the initial bloom capacity to force a rebuild
    for batch in range(3):
        keys = np.array(
            [f"v{batch * 8000 + i}" for i in range(8000)], dtype=object
        )
        rows = np.arange(batch * 8000, batch * 8000 + 8000, dtype=np.int64)
        pf.add_batch(keys, rows)
    r = pf.rows_for("v12345")
    assert r is not None and list(r) == [12345]
    assert list(pf.rows_for("nope")) == []
    # same value across batches accumulates rows
    pf.add_batch(np.array(["v5"], dtype=object), np.array([99_000]))
    assert sorted(pf.rows_for("v5")) == [5, 99_000]


def test_prefilter_cardinality_cap_falls_back():
    pf = ColumnPrefilter(max_distinct=100)
    keys = np.array([f"v{i}" for i in range(200)], dtype=object)
    pf.add_batch(keys, np.arange(200, dtype=np.int64))
    assert not pf.active
    assert pf.rows_for("v50") is None     # bloom hit, no index -> scan
    assert list(pf.rows_for("nope")) == []  # bloom miss still O(1)


def test_column_store_eq_uses_inverted_index():
    cs = ColumnStore(64)
    cs.append(
        {"cat": np.array(["a", "b", "a", "c"]),
         "uid": np.array([10, 20, 10, 30])},
        4, 64,
    )
    m = np.asarray(cs.evaluate([Filter("cat", "eq", "a")]))
    assert list(np.flatnonzero(m)) == [0, 2]
    m = np.asarray(cs.evaluate([Filter("uid", "eq", "30")]))
    assert list(np.flatnonzero(m)) == [3]
    # absent value: all-false without a device compare
    m = np.asarray(cs.evaluate([Filter("uid", "eq", "999")]))
    assert not m.any()
    # in: union of row lists
    m = np.asarray(cs.evaluate([Filter("uid", "in", [10, 30])]))
    assert list(np.flatnonzero(m)) == [0, 2, 3]
    m = np.asarray(cs.evaluate([Filter("cat", "in", ["b", "c"])]))
    assert list(np.flatnonzero(m)) == [1, 3]


def test_in_on_float_column_scan_path():
    cs = ColumnStore(32)
    cs.append({"price": np.array([1.5, 2.5, 3.5])}, 3, 32)
    m = np.asarray(cs.evaluate([Filter("price", "in", [2.5, 3.5])]))
    assert list(np.flatnonzero(m)) == [1, 2]


def test_store_search_with_in_filter():
    vs = VectorStore()
    v = _vecs(40, 8)
    vs.put(
        "d", np.arange(40), v,
        columns={"tag": np.array([f"t{i % 5}" for i in range(40)])},
    )
    flt = [Filter("tag", "in", ["t1", "t3"])]
    ids, _, ok = vs.search("d", v[:3], 8, filters=flt, use_cache=False)
    for b in range(3):
        for j in range(8):
            if ok[b, j]:
                assert ids[b, j] % 5 in (1, 3)


def test_parser_accepts_in_operator():
    t = parse_ticket(
        b'{"search": {"dataset": "d", "vector": [0.0], "k": 1,'
        b' "filters": [{"field": "uid", "operator": "in",'
        b' "value": [1, 2, 3]}]}}'
    )
    f = t.search.filters[0]
    assert f.operator == "in" and f.value == [1, 2, 3]


def test_prefilter_survives_snapshot_roundtrip():
    cs = ColumnStore(64)
    cs.append({"cat": np.array(["x", "y", "x"])}, 3, 64)
    st = cs.export_state()
    cs2 = ColumnStore.import_state(st, 64)
    m = np.asarray(cs2.evaluate([Filter("cat", "eq", "x")]))
    assert list(np.flatnonzero(m)) == [0, 2]
    m = np.asarray(cs2.evaluate([Filter("cat", "in", ["y"])]))
    assert list(np.flatnonzero(m)) == [1]


def test_selective_filter_routes_graph_to_exact():
    """Round 5: predicates below ~2% selectivity starve graph beams
    (measured 0.77 recall@10 at 1% at 1M — benchmarks/filtered_1M.json)
    and must be served by the exact scan instead. Build a graph-tier
    dataset, apply a ~0.5% filter, and require exact-level recall."""
    import jax.numpy as jnp

    from longbow_tpu.ops.distance import exact_search
    from longbow_tpu.query.parser import Filter
    from longbow_tpu.store.vector_store import VectorStore

    rng = np.random.default_rng(0)
    n, d, k = 20_000, 32, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    group = (np.arange(n) % 200)  # group==7 -> 0.5% of rows
    store = VectorStore()
    store.get_or_create("g", d, index_kind="hnsw")
    for off in range(0, n, 5000):
        store.put(
            "g", np.arange(off, off + 5000), v[off : off + 5000],
            columns={"grp": group[off : off + 5000]},
        )
    ds = store.get("g")
    assert getattr(ds.index, "_graph", None) is not None, "graph never built"
    q = rng.standard_normal((16, d)).astype(np.float32)
    eligible = jnp.asarray(group == 7)
    _, want = exact_search(
        jnp.asarray(q), jnp.asarray(v), k, valid=eligible,
        exact_precision=True,
    )
    want = np.asarray(want)
    ids, _, ok = store.search(
        "g", q, k, filters=[Filter("grp", "=", "7")], use_cache=False
    )
    rec = np.mean([
        len({ids[i, j] for j in range(k) if ok[i, j]}
            & set(want[i].tolist())) / k
        for i in range(16)
    ])
    assert rec >= 0.99, rec  # exact-path recall, not beam-starved
