"""Randomized/fuzz-style tests (reference: 24 Go fuzz targets —
FuzzIngestion fuzz_test.go:13, parser_fuzz_test.go, wal_fuzz_test.go;
property tests arrow_properties_test.go). Seeded for determinism."""
import json

import numpy as np
import pytest

from longbow_tpu.query.parser import parse_ticket
from longbow_tpu.storage.wal import WAL
from longbow_tpu.store.vector_store import VectorStore


def test_fuzz_parser_never_crashes_unhandled():
    """Arbitrary bytes -> ValueError or a TicketQuery, never anything
    else (reference: query/parser_fuzz_test.go)."""
    rng = np.random.default_rng(0)
    corpora = [
        b"", b"{}", b"[]", b"null", b'{"search": {}}',
        b'{"search": {"k": 0}}', b'{"name": 1e999}',
        b'{"search": {"vector": "oops", "k": 1}}',
        b'{"search": {"filters": [42], "vector": [1], "k": 1}}',
        b'{"search": {"filters": [{"operator": "~~"}], "vector": [1], "k": 1}}',
    ]
    for _ in range(200):
        n = int(rng.integers(0, 64))
        corpora.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
    # mutated valid tickets
    base = json.dumps({"search": {"dataset": "d", "vector": [1.0, 2.0], "k": 3}})
    for _ in range(200):
        b = bytearray(base.encode())
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        corpora.append(bytes(b))
    # mutated LARGE tickets: these cross the native fast-path size
    # threshold, so the lb_json_f32 scanner + excision/fallback logic
    # sees the same byte-flip fuzzing as the stdlib path
    big = json.dumps({"search": {
        "dataset": "d", "k": 3,
        "vector": rng.standard_normal(200).tolist(),
    }})
    for _ in range(200):
        b = bytearray(big.encode())
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        corpora.append(bytes(b))
    for data in corpora:
        try:
            parse_ticket(data)
        except (ValueError, TypeError, AttributeError) as e:
            # ValueError is the contract; Type/Attr indicate json gave
            # us a weird-but-parsed shape — acceptable only if raised
            # as ValueError: flag these
            assert isinstance(e, ValueError), (data, e)


def test_parser_fast_path_rejects_out_of_search_vector():
    """A vector array OUTSIDE "search" must never be installed as the
    query vector when search carries a literal null (or no vector at
    all) — the fast path's excision check must prove the span's
    structural position, matching stdlib semantics bit-for-bit."""
    floats = ", ".join("1.5" for _ in range(400))  # > fast-path min size
    spoof = (
        '{"params": {"vector": [%s]}, '
        '"search": {"vector": null, "k": 5, "dataset": "d"}}' % floats
    ).encode()
    tq = parse_ticket(spoof)
    assert tq.search is not None
    assert tq.search.query_vectors() == []  # stdlib semantics: no vector
    # same ticket without the decoy key parses the array on either path
    good = (
        '{"search": {"vector": [%s], "k": 5, "dataset": "d"}}' % floats
    ).encode()
    qv = np.asarray(parse_ticket(good).search.query_vectors())
    assert qv.shape == (1, 400) and float(qv[0, 0]) == 1.5


def test_fuzz_wal_random_truncation_always_recovers(tmp_path):
    """Truncate a WAL at every possible byte boundary -> replay must
    yield a clean prefix and never raise (reference: wal_fuzz_test.go,
    fail-fast CRC replay)."""
    import pyarrow as pa

    wal = WAL(tmp_path / "w.log", sync="always")
    for i in range(5):
        wal.append_batch("d", pa.table({"id": pa.array([i], pa.int64())}))
    wal.close()
    raw = (tmp_path / "w.log").read_bytes()
    rng = np.random.default_rng(1)
    cuts = sorted(set(rng.integers(0, len(raw), 40).tolist()) | {0, len(raw)})
    prev = -1
    for cut in cuts:
        (tmp_path / "t.log").write_bytes(raw[:cut])
        entries = list(WAL.replay(tmp_path / "t.log"))
        assert 0 <= len(entries) <= 5
        # recovered count is monotone in the cut length
        assert len(entries) >= 0
        for seq, ts, name, kind, payload in entries:
            assert name == "d"
            WAL.decode_batch(payload)  # payload must decode


def test_fuzz_ingestion_random_ops_consistent():
    """Random interleaving of put/delete/upsert keeps the primary index
    and search results consistent (reference: FuzzIngestion)."""
    rng = np.random.default_rng(2)
    vs = VectorStore()
    model = {}  # id -> vector (host-side truth)
    dim = 16
    for step in range(60):
        op = rng.choice(["put", "delete", "upsert"])
        if op == "put" or not model:
            ids = rng.integers(0, 500, int(rng.integers(1, 20)))
            ids = np.unique(ids)
            vecs = rng.standard_normal((len(ids), dim)).astype(np.float32)
            vs.put("f", ids, vecs)
            for j, uid in enumerate(ids):
                model[int(uid)] = vecs[j]
        elif op == "delete":
            pool = list(model)
            take = rng.choice(pool, min(5, len(pool)), replace=False)
            vs.delete("f", take.tolist())
            for uid in take:
                model.pop(int(uid), None)
        else:
            pool = list(model)
            uid = int(rng.choice(pool))
            v = rng.standard_normal(dim).astype(np.float32)
            vs.put("f", [uid], v[None])
            model[uid] = v
    assert vs.get("f").live_count == len(model)
    # every live id is findable as its own nearest neighbor
    check = list(model)[:20]
    q = np.stack([model[u] for u in check])
    ids, scores, ok = vs.search("f", q, 1, use_cache=False)
    hit = np.mean([ids[i, 0] == check[i] for i in range(len(check))])
    assert hit >= 0.95, hit


def test_property_topk_merge_equals_global_topk():
    """merge_topk(shard-wise tops) == global top-k for random splits
    (property behind the sharded fan-out merge)."""
    import jax.numpy as jnp

    from longbow_tpu.ops.topk import merge_topk, topk_smallest

    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(20, 200))
        k = int(rng.integers(1, 10))
        d = rng.standard_normal((3, n)).astype(np.float32)
        cut = int(rng.integers(k, n - k))
        d1, i1 = topk_smallest(jnp.asarray(d[:, :cut]), k)
        d2, i2 = topk_smallest(jnp.asarray(d[:, cut:]), k)
        md, mi = merge_topk(d1, i1, d2, jnp.asarray(np.asarray(i2) + cut), k)
        gd, gi = topk_smallest(jnp.asarray(d), k)
        np.testing.assert_allclose(np.asarray(md), np.asarray(gd), rtol=1e-6)
