"""Replication, anti-entropy, quorum, vector clocks — two in-process
servers over real sockets (the reference tests multi-node logic the
same way, SURVEY.md §4).
"""
import time

import numpy as np
import pytest

from longbow_tpu.distributed.merkle import MerkleTree, bucket_of
from longbow_tpu.distributed.replicator import (
    ALL,
    ONE,
    QUORUM,
    Peer,
    PeerReplicator,
    SyncWorker,
    required_acks,
)
from longbow_tpu.distributed.vector_clock import (
    SplitBrainDetector,
    VectorClock,
)
from longbow_tpu.serving.flight_server import serve
from longbow_tpu.store.vector_store import VectorStore


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d), dtype=np.float32)


def _wait_for(fn, timeout=8.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if fn():
            return True
        time.sleep(0.1)
    return False


# ---------------------------------------------------------------- units

def test_vector_clock_ordering():
    a = VectorClock().tick("n1")
    b = VectorClock(a.to_dict()).tick("n2")
    assert a.compare(b) == "before" and b.compare(a) == "after"
    c = VectorClock().tick("n3")
    assert b.compare(c) == "concurrent"
    assert a.compare(VectorClock(a.to_dict())) == "equal"


def test_split_brain_detector():
    det = SplitBrainDetector()
    my = {"a": True, "b": False, "c": True}
    peers = {"c": {"a": True, "b": True}}
    out = det.check(my, peers)
    assert out["suspects"] == ["b"]
    assert out["have_quorum"]  # 2/3 alive
    out2 = det.check({"a": True, "b": False, "c": False}, peers)
    assert out2["split_brain"]


def test_required_acks():
    assert required_acks(ONE, 3) == 1
    assert required_acks(ALL, 3) == 3
    # QUORUM counts the local replica toward the majority: a 3-node
    # cluster (2 peers) satisfies quorum with 1 peer ack + self
    assert required_acks(QUORUM, 2) == 1
    assert required_acks(QUORUM, 3) == 2  # majority of 4 = 3, -self
    assert required_acks(QUORUM, 4) == 2  # majority of 5 = 3, -self
    assert required_acks(QUORUM, 0) == 0


def test_merkle_diff_localizes_changes():
    vs1, vs2 = VectorStore(), VectorStore()
    v = _vecs(50, 8)
    vs1.put("d", np.arange(50), v)
    vs2.put("d", np.arange(50), v)
    # force identical LWW timestamps so trees match
    vs2.get("d")._lww = dict(vs1.get("d")._lww)
    t1 = MerkleTree.from_dataset(vs1.get("d"))
    t2 = MerkleTree.from_dataset(vs2.get("d"))
    assert t1.root == t2.root
    vs1.put("d", np.array([7]), _vecs(1, 8, seed=9))
    t1b = MerkleTree.from_dataset(vs1.get("d"))
    diffs = t1b.diff_buckets(t2.leaves)
    assert diffs == [bucket_of(7)]


# ------------------------------------------------------------ end-to-end

@pytest.fixture()
def two_nodes():
    s1, s2 = VectorStore(), VectorStore()
    h1 = serve(s1, data_port=0, meta_port=0, host="127.0.0.1")
    h2 = serve(s2, data_port=0, meta_port=0, host="127.0.0.1")
    yield (s1, h1), (s2, h2)
    h1.shutdown()
    h2.shutdown()


def test_async_replication(two_nodes):
    (s1, h1), (s2, h2) = two_nodes
    peer = Peer("127.0.0.1", h2.data_server.port, h2.meta_server.port)
    rep = PeerReplicator([peer], mode="async")
    v = _vecs(20, 8)
    s1.put("r", np.arange(20), v)
    rep.on_put("r", np.arange(20), v)
    rep.drain()
    assert _wait_for(
        lambda: "r" in s2.list_datasets() and s2.get("r").live_count == 20
    )
    rep.on_delete("r", [3, 4])
    rep.drain()
    assert _wait_for(lambda: s2.get("r").live_count == 18)
    rep.close()


def test_quorum_replication_counts_acks(two_nodes):
    (s1, h1), (s2, h2) = two_nodes
    good = Peer("127.0.0.1", h2.data_server.port, h2.meta_server.port)
    dead = Peer("127.0.0.1", 1, 1)  # nothing listens here
    rep = PeerReplicator([good, dead], mode="quorum", level=ONE)
    v = _vecs(5, 8)
    assert rep.on_put("q", np.arange(5), v)  # ONE satisfied by `good`
    rep_all = PeerReplicator([good, dead], mode="quorum", level=ALL)
    assert not rep_all.on_put("q", np.arange(5), v)  # dead peer fails ALL
    rep.close(); rep_all.close()


def test_anti_entropy_sync(two_nodes):
    (s1, h1), (s2, h2) = two_nodes
    v = _vecs(30, 8)
    # node1 has everything; node2 is missing rows + has a stale row
    s1.put("ae", np.arange(30), v)
    s2.put("ae", np.arange(20), v[:20])
    # make node1's timestamps strictly newer
    for uid in list(s1.get("ae")._lww):
        s1.get("ae")._lww[uid] = time.time() + 5
    # node1 also deleted row 2
    s1.delete("ae", [2])
    s1.get("ae")._lww[2] = time.time() + 10

    peer1 = Peer("127.0.0.1", h1.data_server.port, h1.meta_server.port)
    sw = SyncWorker(s2, [peer1])
    applied = sw.run_once()
    assert applied > 0
    assert s2.get("ae").live_count == 29  # 30 - deleted row 2
    ids, _, _ = s2.search("ae", v[25], 1, use_cache=False)
    assert ids[0, 0] == 25  # previously missing row pulled over
    assert 2 not in s2.get("ae")._id_to_row  # deletion propagated


def test_vector_clock_wired_into_replication(two_nodes):
    """A replicated put carries the origin's vector clock; the receiver
    merges it and counts concurrent (LWW-resolved) writes
    (reference: vector_clock.go:23 wired through the write path)."""
    from longbow_tpu.distributed.cluster import ClusterCoordinator

    (s1, h1), (s2, h2) = two_nodes
    c1 = ClusterCoordinator(
        s1, "n1", [f"127.0.0.1:{h2.data_server.port}:{h2.meta_server.port}"],
        replication_mode="async",
    )
    c2 = ClusterCoordinator(s2, "n2", [], replication_mode="off")
    h2.data_server.cluster = c2
    try:
        v = _vecs(5, 8)
        s1.put("vc", np.arange(5), v)
        c1.on_put("vc", np.arange(5), v, None, None, time.time())
        assert c1.clocks["vc"].to_dict() == {"n1": 1}
        assert _wait_for(
            lambda: "vc" in s2.list_datasets()
            and c2.clocks.get("vc") is not None
        )
        # in-order replica apply: merged, not a conflict
        assert c2.clocks["vc"].to_dict().get("n1") == 1
        assert c2.conflicts == 0
        # a concurrent clock (disjoint component) = conflict, counted
        c2.observe_remote_clock("vc", {"n3": 1})
        assert c2.conflicts == 1
        assert c2.clocks["vc"].to_dict() == {"n1": 1, "n3": 1}
        assert c2.status()["write_conflicts_lww_resolved"] == 1
    finally:
        c1.stop()
        c2.stop()
        h2.data_server.cluster = None


def test_split_brain_check_over_wire(two_nodes):
    """check_split_brain pulls peers' membership views over the real
    cluster-status action (reference: split_brain_detector.go:25)."""
    from longbow_tpu.distributed.cluster import ClusterCoordinator

    (s1, h1), (s2, h2) = two_nodes
    p2 = f"127.0.0.1:{h2.data_server.port}:{h2.meta_server.port}"
    c1 = ClusterCoordinator(s1, "n1", [p2], replication_mode="off")
    c2 = ClusterCoordinator(s2, p2.rsplit(":", 1)[0] and p2, [],
                            replication_mode="off")
    h2.data_server.cluster = c2
    h2.meta_server.cluster = c2
    try:
        # mark the peer alive so check_split_brain queries it
        for m in c1.membership.members.values():
            m.status = "alive"
        verdict = c1.check_split_brain()
        assert set(verdict) >= {"split_brain", "suspects", "have_quorum"}
        assert verdict["have_quorum"] is True
        assert verdict["split_brain"] is False
    finally:
        c1.stop()
        c2.stop()
        h2.data_server.cluster = None
        h2.meta_server.cluster = None


def test_export_delta_have_filter_sends_only_divergence(two_nodes):
    """export-delta with a 'have' list returns only strictly-newer or
    missing rows — a bucket that differs by one row transfers one row,
    not the whole bucket (restart catch-up is uniformly spread over
    hash buckets, so whole-bucket transfer re-sent the full dataset
    every sync round)."""
    (s1, h1), (s2, h2) = two_nodes
    v = _vecs(40, 8, seed=3)
    s1.put("hf", np.arange(40), v)
    ds = s1.get("hf")
    # a puller that already holds everything: every bucket exports empty
    for b, uids in ds._bucket_map().items():
        have = [[u, ds._lww[u]] for u in uids]
        assert ds.export_delta(b, have=have)["rows"] == []
    # a puller missing one row gets exactly that row
    target = 17
    from longbow_tpu.distributed.merkle import bucket_of

    b = bucket_of(target)
    have = [
        [u, ds._lww[u]] for u in ds._bucket_map()[b] if u != target
    ]
    rows = ds.export_delta(b, have=have)["rows"]
    assert [r["id"] for r in rows] == [target]
    # a stale ts still pulls the newer copy
    have = [[u, ds._lww[u] - (10.0 if u == target else 0.0)]
            for u in ds._bucket_map()[b]]
    rows = ds.export_delta(b, have=have)["rows"]
    assert [r["id"] for r in rows] == [target]


def test_breaker_reopens_after_failed_half_open_probe():
    """A failed half-open probe must RE-open the breaker for a fresh
    cooldown — sticking half-open forever makes every call pay the
    full timeout against a dead peer (review finding)."""
    import time as _t

    from longbow_tpu.serving.middleware import CircuitBreaker

    br = CircuitBreaker(threshold=2, cooldown_s=0.2, name="t")
    br.record_failure()
    br.record_failure()
    assert br.state == "open"
    _t.sleep(0.25)
    assert br.state == "half-open"
    br.record_failure()  # probe failed
    assert br.state == "open"  # re-armed, not stuck half-open
    _t.sleep(0.25)
    assert br.state == "half-open"
    br.record_success()
    assert br.state == "closed"


def test_anti_entropy_carries_columns_and_bm25(two_nodes):
    """Healed rows must arrive with their metadata columns and text
    (filters and hybrid search on a healed replica were silently
    broken, and identical merkle leaves hid the loss forever)."""
    (s1, h1), (s2, h2) = two_nodes
    v = _vecs(20, 8, seed=9)
    s1.put(
        "cols", np.arange(20), v,
        columns={
            "price": np.arange(20.0),
            "text": np.asarray([f"doc {i} alpha" for i in range(20)]),
        },
    )
    for uid in list(s1.get("cols")._lww):
        s1.get("cols")._lww[uid] = time.time() + 5
    peer1 = Peer("127.0.0.1", h1.data_server.port, h1.meta_server.port)
    sw = SyncWorker(s2, [peer1])
    assert sw.run_once() > 0
    ds2 = s2.get("cols")
    assert ds2.live_count == 20
    from longbow_tpu.query.parser import Filter

    ids, _, _ = s2.search(
        "cols", v[3], 3, filters=[Filter("price", "<", "5")],
        use_cache=False,
    )
    got = [i for i in ids[0] if i is not None]
    assert got and all(i < 5 for i in got)
    assert len(ds2.bm25) == 20  # text columns re-indexed


def test_apply_remote_tombstones_lww_guard():
    """A remote tombstone older than the local write neither deletes
    the row nor rolls the timestamp back."""
    import jax

    from longbow_tpu.store.vector_store import VectorStore

    s = VectorStore()
    v = _vecs(5, 8)
    s.put("t", np.arange(5), v, timestamp=100.0)
    ds = s.get("t")
    n = ds.apply_remote_tombstones([2], [50.0])  # stale tombstone
    assert n == 0
    assert ds.live_count == 5
    assert ds._lww[2] == 100.0
    n = ds.apply_remote_tombstones([2], [200.0])  # newer tombstone
    assert n == 1
    assert ds.live_count == 4
    assert ds._lww[2] == 200.0


def test_sync_pulls_dataset_missing_locally(two_nodes):
    """A node restarted with a lost disk (no local datasets) must
    still pull peers' datasets — run_once unions peer dataset lists
    and a missing local dataset pulls every non-empty bucket."""
    (s1, h1), (s2, h2) = two_nodes
    v = _vecs(40, 8, seed=11)
    s1.put("lost", np.arange(40), v)
    assert "lost" not in s2.list_datasets()
    peer1 = Peer("127.0.0.1", h1.data_server.port, h1.meta_server.port)
    sw = SyncWorker(s2, [peer1])
    applied = sw.run_once()
    assert applied == 40
    assert s2.get("lost").live_count == 40
    ids, _, _ = s2.search("lost", v[7], 1, use_cache=False)
    assert ids[0, 0] == 7


def test_dead_member_pruned_from_replication_and_ring():
    """A DEAD member leaves replicator/sync/ring so quorum math and
    write fan-out stop counting a gone peer (k8s rolling restarts
    would otherwise accumulate dead IPs forever)."""
    from longbow_tpu.distributed.cluster import ClusterCoordinator
    from longbow_tpu.distributed.membership import ALIVE, DEAD, Member
    from longbow_tpu.store.vector_store import VectorStore

    store = VectorStore()
    cc = ClusterCoordinator(
        store, self_id="127.0.0.1:3000",
        peers=["127.0.0.1:4000:4001"],
        placement="partitioned",
    )
    m = Member("127.0.0.1:4000", "127.0.0.1", 4000, 4001, status=ALIVE)
    cc._on_member_change(m)
    assert "127.0.0.1:4000" in cc._peers
    assert cc.ring is not None and "127.0.0.1:4000" in cc.ring.nodes
    m.status = DEAD
    cc._on_member_change(m)
    assert "127.0.0.1:4000" not in cc._peers
    assert "127.0.0.1:4000" not in cc.ring.nodes
    if cc.replicator is not None:
        assert all(
            p.addr != "127.0.0.1:4000" for p in cc.replicator.peers
        )


# -- spatial (content-based) routing ---------------------------------------


def test_region_router_routes_and_fails_open():
    """Peers with fresh summaries are skipped only when every query is
    provably outside their region ball; unknown peers always fan out
    (reference: mesh/region.go Router.Route + spatial_index.go)."""
    from longbow_tpu.distributed.spatial import RegionRouter

    r = RegionRouter(margin=1.5)
    d = 8
    # peer A owns a cluster at the origin, peer B one far away
    r.update("A", "ds", np.zeros(d), radius=1.0, n=100)
    r.update("B", "ds", np.full(d, 100.0), radius=1.0, n=100)
    q = np.zeros((2, d), np.float32)  # queries inside A's ball
    kept, skipped = r.route("ds", q, ["A", "B", "C"])
    assert kept == ["A", "C"]  # C has no summary: fail open
    assert skipped == 1
    # a query batch straddling both regions keeps both peers
    q2 = np.stack([np.zeros(d), np.full(d, 100.0)]).astype(np.float32)
    kept2, skipped2 = r.route("ds", q2, ["A", "B"])
    assert kept2 == ["A", "B"] and skipped2 == 0
    # dimension drift or an unknown dataset fails open
    kept3, _ = r.route("other", q, ["A", "B"])
    assert kept3 == ["A", "B"]
    r.drop_peer("B")
    kept4, _ = r.route("ds", q2, ["A", "B"])
    assert kept4 == ["A", "B"]  # B's summary gone -> included again


def test_region_router_is_metric_aware():
    """Cosine queries are normalized before the ball test (summaries
    are computed over normalized storage, so they live on the unit
    ball); dot/MIPS and unknown metrics have no ball geometry and must
    fail open (sweep regression: raw-L2 geometry on a cosine dataset
    skipped the right peer whenever the query magnitude was large)."""
    from longbow_tpu.distributed.spatial import RegionRouter

    d = 8
    r = RegionRouter(margin=1.5)
    e0 = np.zeros(d, np.float32)
    e0[0] = 1.0
    e1 = np.zeros(d, np.float32)
    e1[1] = 1.0
    # unit-ball summaries, as dataset_region produces for cosine storage
    r.update("A", "ds", e0, radius=0.2, n=100)
    r.update("B", "ds", e1, radius=0.2, n=100)

    # a large-magnitude query aligned with A: raw L2 puts it ~999 from
    # BOTH centroids (both would be skipped); normalized it sits at A
    q = (e0 * 1000.0)[None, :]
    kept, skipped = r.route("ds", q, ["A", "B"], metric="cosine")
    assert kept == ["A"] and skipped == 1

    # dot has no distance geometry: every peer kept no matter what
    kept_dot, skipped_dot = r.route("ds", q, ["A", "B"], metric="dot")
    assert kept_dot == ["A", "B"] and skipped_dot == 0

    # unknown metric string also fails open
    kept_u, _ = r.route("ds", q, ["A", "B"], metric="mahalanobis")
    assert kept_u == ["A", "B"]

    # l2 still uses raw geometry: the magnitude-1000 query is outside
    # both unit balls, so both peers are provably skippable
    kept_l2, skipped_l2 = r.route("ds", q, ["A", "B"], metric="l2")
    assert kept_l2 == [] and skipped_l2 == 2


def test_dataset_region_and_action(two_nodes):
    """region-summary action returns a centroid+radius that actually
    encloses the dataset's vectors."""
    (s1, h1), _ = two_nodes
    rng = np.random.default_rng(5)
    v = rng.standard_normal((300, 16)).astype(np.float32) + 7.0
    s1.put("spat", np.arange(300), v)
    from longbow_tpu.serving.client import LongbowClient

    c = LongbowClient("127.0.0.1")
    c.data_location = f"grpc://127.0.0.1:{h1.data_server.port}"
    c.meta_location = f"grpc://127.0.0.1:{h1.meta_server.port}"
    c.connect()
    resp = c._action("region-summary", {"datasets": ["spat"]})
    reg = resp["regions"]["spat"]
    assert reg["n"] == 300
    cent = np.asarray(reg["centroid"], np.float32)
    assert np.allclose(cent, v.mean(axis=0), atol=0.5)
    dmax = np.sqrt(((v - cent) ** 2).sum(axis=1).max())
    assert reg["radius"] >= 0.9 * dmax  # sampled radius ~ true radius
    c.close()


def test_dcn_two_process_dryrun():
    """The multi-host program shape actually runs: two OS processes
    join one jax.distributed cluster (CPU, 4 virtual devices each),
    build ONE 8-device global mesh, and execute the sharded search
    step (local top-k + all_gather merge over what would be DCN).
    Mirrors the driver's dryrun_multichip but across process
    boundaries (tools/dcn_dryrun.py)."""
    import pathlib
    import socket
    import subprocess
    import sys

    # the tool's fixed coordinator port must be free (REUSEADDR: a
    # TIME_WAIT socket from a previous run is fine — the coordinator
    # sets it too)
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    try:
        s.bind(("127.0.0.1", 9876))
    except OSError:
        pytest.skip("coordinator port 9876 in use")
    finally:
        s.close()

    root = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(root / "tools" / "dcn_dryrun.py")],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DCN dryrun: OK" in proc.stdout + proc.stderr
