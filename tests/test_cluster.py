"""Cluster tier: membership, replication through the serving path,
cross-process global search honoring local_only.

Mirrors the reference's multi-node test strategy (SURVEY.md §4: 3 local
processes via scripts/start_local_cluster.sh, validated by
verify_global_search.py; gossip tested with real sockets on localhost).
"""
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from longbow_tpu.distributed.cluster import ClusterCoordinator
from longbow_tpu.distributed.membership import (
    ALIVE,
    DEAD,
    MembershipManager,
    SUSPECT,
    parse_peer,
)
from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import LongbowFlightServer
from longbow_tpu.store.vector_store import VectorStore


def _free_ports(n):
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        ports.append(s.getsockname()[1])
        socks.append(s)
    for s in socks:
        s.close()
    return ports


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d)).astype(
        np.float32
    )


def test_parse_peer():
    assert parse_peer("h:3000") == ("h", 3000, 3001, "")
    assert parse_peer("h:3000:3005") == ("h", 3000, 3005, "")
    assert parse_peer("h:3000@us-east") == ("h", 3000, 3001, "us-east")
    assert parse_peer("h:3000:3005@eu") == ("h", 3000, 3005, "eu")


def test_membership_transitions():
    # nothing listens on these ports -> suspect then dead
    mm = MembershipManager(
        "self:1", ["127.0.0.1:1", "127.0.0.1:2"],
        suspect_after=1, dead_after=2, probe_timeout_s=0.2,
    )
    events = []
    mm.subscribe(lambda m: events.append((m.id, m.status)))
    mm.probe_round()
    assert all(m.status == SUSPECT for m in mm.members.values())
    mm.probe_round()
    assert all(m.status == DEAD for m in mm.members.values())
    assert mm.alive() == []
    assert ("127.0.0.1:1", SUSPECT) in events
    assert ("127.0.0.1:1", DEAD) in events
    # a listener appears -> back to alive with a bumped incarnation
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    mm2 = MembershipManager(
        "self:1", [f"127.0.0.1:{port}"], probe_timeout_s=0.5
    )
    mm2.probe_round()
    assert [m.status for m in mm2.members.values()] == [ALIVE]
    srv.close()


class _Node:
    """One in-process node: store + cluster coordinator + data/meta
    Flight servers on real gRPC sockets."""

    def __init__(self, i, all_specs, data_port, meta_port, replication):
        import threading

        self.store = VectorStore()
        self.id = f"127.0.0.1:{data_port}"
        self.cluster = ClusterCoordinator(
            self.store, self.id, all_specs,
            replication_mode=replication,
            sync_interval_s=3600,  # manual sync in tests
            probe_interval_s=0.2,
        )
        self.data = LongbowFlightServer(
            self.store, f"grpc://127.0.0.1:{data_port}", cluster=self.cluster
        )
        self.meta = LongbowFlightServer(
            self.store, f"grpc://127.0.0.1:{meta_port}", cluster=self.cluster
        )
        self.threads = []
        for srv in (self.data, self.meta):
            t = threading.Thread(target=srv.serve, daemon=True)
            t.start()
            self.threads.append(t)
        self.client = LongbowClient("127.0.0.1", data_port, meta_port)

    def stop(self):
        self.cluster.stop()
        self.data.shutdown()
        self.meta.shutdown()
        self.client.close()


@pytest.fixture
def three_nodes():
    ports = _free_ports(6)
    specs = [f"127.0.0.1:{ports[2*i]}:{ports[2*i+1]}" for i in range(3)]
    nodes = [
        _Node(i, specs, ports[2 * i], ports[2 * i + 1], "async")
        for i in range(3)
    ]
    for n in nodes:
        n.cluster.membership.start()
    # wait until everyone sees everyone
    t0 = time.time()
    while time.time() - t0 < 10:
        if all(len(n.cluster.membership.alive()) == 2 for n in nodes):
            break
        time.sleep(0.1)
    yield nodes
    for n in nodes:
        n.stop()


def test_replicated_put_searchable_on_peer(three_nodes):
    """VERDICT r1 #1 acceptance: put to node0, search via node2."""
    n0, n1, n2 = three_nodes
    v = _vecs(50, 8)
    n0.client.write("docs", np.arange(50), v)
    # async replication: wait for the fanout queue to drain
    t0 = time.time()
    while time.time() - t0 < 10:
        try:
            if n2.store.get("docs").live_count == 50:
                break
        except KeyError:
            pass
        time.sleep(0.1)
    assert n2.store.get("docs").live_count == 50
    tbl = n2.client.search("docs", v[7], k=1)
    assert tbl.column("id")[0].as_py() == 7
    # deletes replicate too (and do not boomerang)
    n0.client.delete("docs", [7])
    t0 = time.time()
    while time.time() - t0 < 10:
        if n2.store.get("docs").live_count == 49:
            break
        time.sleep(0.1)
    assert n2.store.get("docs").live_count == 49
    assert n0.store.get("docs").live_count == 49


def test_global_search_honors_local_only(three_nodes):
    """A dataset living only on node1 is reachable from node0 with
    local_only:false and invisible with local_only:true (reference:
    global_search.go:48, store_query.go:696-717)."""
    n0, n1, n2 = three_nodes
    # write ONLY to node1's store directly (bypass replication)
    v = _vecs(40, 8, seed=3)
    n1.store.put("solo", np.arange(40), v)

    # local_only=true on node0: dataset not found
    import pyarrow.flight as flight
    import json

    with pytest.raises(flight.FlightError):
        n0.client._dc().do_get(
            flight.Ticket(
                json.dumps(
                    {"search": {"dataset": "solo", "k": 3,
                                "vector": v[5].tolist(),
                                "local_only": True}}
                ).encode()
            )
        ).read_all()

    # local_only=false (default): fans out and finds node1's rows
    tbl = n0.client.search("solo", v[5], k=3)
    assert tbl.column("id")[0].as_py() == 5

    # VectorSearch action path honors it too
    resp = n0.client._action(
        "VectorSearch",
        {"dataset": "solo", "vector": v[9].tolist(), "k": 2},
        meta=False,
    )
    assert resp["ids"][0] == 9


def test_global_search_merges_topk(three_nodes):
    """Each node holds a disjoint slice; a global read returns the true
    global top-k."""
    n0, n1, n2 = three_nodes
    rng = np.random.default_rng(4)
    base = rng.standard_normal((30, 8)).astype(np.float32)
    q = base[0]
    # craft distances: node i holds rows whose ids encode their rank
    for i, n in enumerate(three_nodes):
        vecs = q[None, :] + (0.1 * (np.arange(10) * 3 + i + 1))[:, None]
        ids = np.arange(10) * 3 + i
        n.store.put("parts", ids, vecs.astype(np.float32))
    tbl = n0.client.search("parts", q, k=6)
    got = [tbl.column("id")[j].as_py() for j in range(6)]
    assert got == [0, 1, 2, 3, 4, 5], got


def test_cluster_status_reports_members(three_nodes):
    n0 = three_nodes[0]
    st = n0.client.cluster_status()
    assert st["self"]["id"] == n0.id
    assert len(st["members"]) == 2
    assert all(m["status"] == "alive" for m in st["members"])
    assert "replication" in st


def test_anti_entropy_heals_missed_writes(three_nodes):
    """Rows written while a peer was 'down' arrive via Merkle sync
    (reference: mesh/sync/sync_worker.go:41-250)."""
    n0, n1, n2 = three_nodes
    v = _vecs(20, 8, seed=5)
    # simulate a missed replication: write only locally on node0
    n0.store.put("heal", np.arange(20), v)
    assert "heal" not in n2.store.list_datasets()
    # node2 pulls the delta (needs the dataset registered locally first,
    # as the reference's sync does via dataset discovery; create empty)
    n2.store.get_or_create("heal", 8)
    applied = n2.cluster.sync_worker.run_once()
    assert applied >= 20
    assert n2.store.get("heal").live_count == 20


@pytest.mark.skipif(
    os.environ.get("LONGBOW_SKIP_PROC_TEST") == "1",
    reason="subprocess cluster test disabled",
)
def test_three_process_cluster(tmp_path):
    """The real thing: 3 OS processes, replication + global search
    (reference: scripts/start_local_cluster.sh + verify_global_search.py)."""
    ports = _free_ports(6)
    specs = ",".join(
        f"127.0.0.1:{ports[2*i]}:{ports[2*i+1]}" for i in range(3)
    )
    procs = []
    try:
        for i in range(3):
            env = dict(os.environ)
            env.update(
                LONGBOW_DATA_PORT=str(ports[2 * i]),
                LONGBOW_META_PORT=str(ports[2 * i + 1]),
                LONGBOW_METRICS_PORT="0",
                LONGBOW_DATA_DIR=str(tmp_path / f"node{i}"),
                LONGBOW_NODE_ID=f"127.0.0.1:{ports[2*i]}",
                LONGBOW_PEERS=specs,
                LONGBOW_REPLICATION="async",
                LONGBOW_SYNC_INTERVAL_S="3600",
                LONGBOW_FORCE_CPU="1",
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-m", "longbow_tpu.serve"],
                    env=env,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.STDOUT,
                )
            )
        c0 = LongbowClient("127.0.0.1", ports[0], ports[1])
        c2 = LongbowClient("127.0.0.1", ports[4], ports[5])
        t0 = time.time()
        ready = 0
        while time.time() - t0 < 60:
            try:
                c0.check_readiness()
                c2.check_readiness()
                ready = 1
                break
            except Exception:
                time.sleep(0.5)
        assert ready, "cluster processes never became ready"

        v = _vecs(30, 8, seed=6)
        c0.write("docs", np.arange(30), v)
        t0 = time.time()
        hit = False
        while time.time() - t0 < 30:
            try:
                tbl = c2.search("docs", v[4], k=1)
                if tbl.num_rows and tbl.column("id")[0].as_py() == 4:
                    hit = True
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert hit, "put to node0 not searchable via node2"
        st = c0.cluster_status()
        assert len(st["members"]) == 2
        c0.close()
        c2.close()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_dns_discovery():
    """DNS discovery parity (reference: mesh/discovery*.go): members
    re-resolved from a name each probe round."""
    mm = MembershipManager(
        "self:1", [], dns_name="localhost:12345", probe_timeout_s=0.2,
        suspect_after=1, dead_after=2,
    )
    mm.probe_round()
    assert mm.members  # localhost resolved into the member set
    assert all(m.data_port == 12345 for m in mm.members.values())


def test_region_aware_alive_ordering():
    """Same-region peers order first in fan-out (reference:
    mesh/region.go region-aware member grouping)."""
    mm = MembershipManager(
        "self:1", ["a:3000@eu", "b:3000@us", "c:3000@eu"],
        self_region="eu",
    )
    for m in mm.members.values():
        m.status = "alive"
    order = [m.region for m in mm.alive()]
    assert order == ["eu", "eu", "us"]


def test_k8s_endpoint_discovery(monkeypatch, tmp_path):
    """Peers discovered from the Kubernetes Endpoints API (reference:
    mesh/discovery k8s pods) — exercised against a local fake API."""
    import http.server
    import json as _json
    import threading as _th

    payload = {
        "subsets": [
            {
                "addresses": [
                    {"ip": "10.0.0.7", "nodeName": "node-a.zone1"},
                    {"ip": "10.0.0.8", "nodeName": "node-b.zone2"},
                ]
            }
        ]
    }
    seen = {}

    class FakeK8s(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            seen["path"] = self.path
            seen["auth"] = self.headers.get("Authorization")
            body = _json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), FakeK8s)
    t = _th.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        tok = tmp_path / "token"
        tok.write_text("sekret")
        monkeypatch.setenv(
            "LONGBOW_K8S_API", f"http://127.0.0.1:{srv.server_port}"
        )
        monkeypatch.setenv("LONGBOW_K8S_TOKEN_FILE", str(tok))
        monkeypatch.setenv("LONGBOW_K8S_NAMESPACE", "prod")
        mm = MembershipManager(
            "self:1", [], k8s_service="longbow:3000"
        )
        mm._discover_k8s()
        assert seen["path"] == "/api/v1/namespaces/prod/endpoints/longbow"
        assert seen["auth"] == "Bearer sekret"
        ids = sorted(mm.members)
        assert ids == ["10.0.0.7:3000", "10.0.0.8:3000"]
        assert mm.members["10.0.0.7:3000"].region == "node-a"
        assert mm.members["10.0.0.7:3000"].meta_port == 3001
    finally:
        srv.shutdown()


def test_consistent_hash_ring():
    """reference: sharding/ring.go — clockwise assignment, vnodes,
    distinct-node preference walk, stability under node removal."""
    from longbow_tpu.distributed.ring import ConsistentHashRing

    ring = ConsistentHashRing(["a:1", "b:1", "c:1"])
    keys = [str(i) for i in range(3000)]
    owners = [ring.lookup(k) for k in keys]
    from collections import Counter

    c = Counter(owners)
    assert set(c) == {"a:1", "b:1", "c:1"}
    # 20 vnodes keep the spread sane (reference uses the same count)
    assert min(c.values()) > 3000 * 0.15, c
    # preference list: distinct nodes, owner first
    pl = ring.preference_list(keys[0], 2)
    assert pl[0] == ring.lookup(keys[0]) and len(set(pl)) == 2
    # removing a node only remaps ITS keys (consistency property)
    before = dict(zip(keys, owners))
    ring.remove("b:1")
    moved = sum(
        1 for k in keys
        if before[k] != ring.lookup(k) and before[k] != "b:1"
    )
    assert moved == 0
    assert all(ring.lookup(k) != "b:1" for k in keys)


@pytest.fixture
def three_partitioned_nodes():
    ports = _free_ports(6)
    specs = [f"127.0.0.1:{ports[2*i]}:{ports[2*i+1]}" for i in range(3)]

    class _PNode(_Node):
        def __init__(self, i, all_specs, data_port, meta_port):
            import threading

            self.store = VectorStore()
            self.id = f"127.0.0.1:{data_port}"
            self.cluster = ClusterCoordinator(
                self.store, self.id, all_specs,
                placement="partitioned",
                sync_interval_s=3600, probe_interval_s=0.2,
            )
            self.data = LongbowFlightServer(
                self.store, f"grpc://127.0.0.1:{data_port}",
                cluster=self.cluster,
            )
            self.meta = LongbowFlightServer(
                self.store, f"grpc://127.0.0.1:{meta_port}",
                cluster=self.cluster,
            )
            self.threads = []
            for srv in (self.data, self.meta):
                t = threading.Thread(target=srv.serve, daemon=True)
                t.start()
                self.threads.append(t)
            self.client = LongbowClient(
                "127.0.0.1", data_port, meta_port
            )

    nodes = [_PNode(i, specs, ports[2*i], ports[2*i+1]) for i in range(3)]
    for n in nodes:
        n.cluster.membership.start()
    t0 = time.time()
    while time.time() - t0 < 10:
        if all(len(n.cluster.membership.alive()) == 2 for n in nodes):
            break
        time.sleep(0.1)
    yield nodes
    for n in nodes:
        n.stop()


def test_partitioned_placement(three_partitioned_nodes):
    """Rows route to ring owners: the corpus is DISJOINT across nodes,
    global reads merge the true top-k, deletes broadcast (reference:
    sharding ring + partition proxy + scatter-gather)."""
    n0, n1, n2 = three_partitioned_nodes
    v = _vecs(90, 8, seed=5)
    n0.client.write("parts", np.arange(90), v)

    def count(n):
        try:
            return n.store.get("parts").live_count
        except KeyError:
            return 0

    t0 = time.time()
    while time.time() - t0 < 10 and sum(count(n) for n in (n0, n1, n2)) < 90:
        time.sleep(0.1)
    counts = [count(n) for n in (n0, n1, n2)]
    assert sum(counts) == 90, counts          # disjoint partition
    assert all(c < 90 for c in counts), counts  # actually spread
    assert max(counts) - min(counts) < 80

    # global read from any node returns the true nearest row
    for n in (n0, n1, n2):
        t = n.client.search("parts", v[17], k=3)
        assert t.column("id")[0].as_py() == 17

    # delete broadcasts to the owner wherever it lives
    n2.client.delete("parts", [17])
    t0 = time.time()
    while time.time() - t0 < 10 and sum(count(n) for n in (n0, n1, n2)) != 89:
        time.sleep(0.1)
    assert sum(count(n) for n in (n0, n1, n2)) == 89
    t = n0.client.search("parts", v[17], k=3)
    assert 17 not in t.column("id").to_pylist()

    st = n0.client.cluster_status()
    assert st["placement"] == "partitioned"
    assert len(st["ring_nodes"]) == 3


def test_lan_multicast_discovery():
    """Zero-config LAN discovery: two nodes on the same multicast
    group find each other with no peer list (reference: mDNS discovery
    mesh/discovery*.go, zeroconf)."""
    import socket as _s

    # pick a free UDP port for the group
    probe = _s.socket(_s.AF_INET, _s.SOCK_DGRAM)
    probe.bind(("", 0))
    port = probe.getsockname()[1]
    probe.close()
    group = f"224.0.1.187:{port}"

    a = MembershipManager(
        "127.0.0.1:4100", [], lan_group=group, self_region="r1"
    )
    b = MembershipManager(
        "127.0.0.1:4200", [], lan_group=group, self_region="r2"
    )
    try:
        # a announces; b hears it on the next round (loop enabled)
        for _ in range(5):
            a.probe_round()
            b.probe_round()
            if "127.0.0.1:4100" in b.members and "127.0.0.1:4200" in a.members:
                break
            time.sleep(0.05)
        assert "127.0.0.1:4100" in b.members
        assert "127.0.0.1:4200" in a.members
        assert b.members["127.0.0.1:4100"].region == "r1"
        assert a.members["127.0.0.1:4200"].meta_port == 4201
    finally:
        a.stop()
        b.stop()


def test_smart_client_routes_to_owners(three_partitioned_nodes):
    """Client-side ring routing puts each row directly on its owner
    (reference: Go SmartClient client/client.go:15) — the local-only
    view of every node matches the ring assignment exactly."""
    from longbow_tpu.distributed.ring import ConsistentHashRing

    n0, n1, n2 = three_partitioned_nodes
    c = n0.client.enable_smart_routing()
    assert c._ring is not None
    v = _vecs(60, 8, seed=11)
    ids = np.arange(1000, 1060)
    c.write("smart", ids, v)

    ring = ConsistentHashRing(sorted(n.id for n in (n0, n1, n2)))
    t0 = time.time()
    while time.time() - t0 < 10:
        total = 0
        for n in (n0, n1, n2):
            try:
                total += n.store.get("smart").live_count
            except KeyError:
                pass
        if total == 60:
            break
        time.sleep(0.1)
    for n in (n0, n1, n2):
        want = {int(i) for i in ids if ring.lookup(str(i)) == n.id}
        try:
            ds = n.store.get("smart")
            got = {
                int(i) for i in ds._row_to_id if i is not None
            }
        except KeyError:
            got = set()
        assert got == want, (n.id, got ^ want)
    # reads still merge globally from any node
    t = n1.client.search("smart", v[7], k=1)
    assert t.column("id")[0].as_py() == 1007


def test_asymmetric_partition_no_false_dead(three_nodes):
    """SWIM indirect probing (reference: mesh/gossip.go:235): A cannot
    reach B directly, but C reaches both — B must stay ALIVE on A via
    the K-relay ping-req path, never false-SUSPECT/DEAD."""
    a, bnode, c = three_nodes
    b_id = bnode.id
    orig = a.cluster.membership._probe_one

    def lossy(m, _orig=orig):
        return False if m.id == b_id else _orig(m)

    a.cluster.membership._probe_one = lossy
    # run many rounds past dead_after (5) — without indirect probes B
    # would be DEAD after 5 misses
    for _ in range(12):
        a.cluster.membership.probe_round()
    m = a.cluster.membership.members[b_id]
    assert m.status == ALIVE, f"false {m.status} under asymmetric partition"
    assert m.misses == 0


def test_indirect_probe_cannot_save_a_dead_node(three_nodes):
    """When the target is really down, relays agree and the death is
    declared (no availability masking)."""
    a, bnode, c = three_nodes
    b_id = bnode.id
    # actually take B down
    bnode.data.shutdown()
    bnode.meta.shutdown()
    time.sleep(0.2)
    for _ in range(14):
        a.cluster.membership.probe_round()
        time.sleep(0.02)
    assert a.cluster.membership.members[b_id].status == DEAD


def test_digest_merge_rules():
    """Piggybacked rumor rules: discovery of unknown members; ALIVE
    with a newer incarnation refutes local suspicion; remote DEAD only
    degrades an already-suspect member; stale rumors ignored."""
    mm = MembershipManager("self:9", ["127.0.0.1:7001"])
    m = mm.members["127.0.0.1:7001"]
    m.status = SUSPECT
    m.incarnation = 1
    events = []
    mm.subscribe(lambda mem: events.append((mem.id, mem.status)))
    # stale alive (equal incarnation): no refutation
    mm.merge_digest([{"id": "127.0.0.1:7001", "host": "127.0.0.1",
                      "data_port": 7001, "status": ALIVE,
                      "incarnation": 1}])
    assert m.status == SUSPECT
    # newer alive: refutes
    mm.merge_digest([{"id": "127.0.0.1:7001", "host": "127.0.0.1",
                      "data_port": 7001, "status": ALIVE,
                      "incarnation": 2}])
    assert m.status == ALIVE and m.incarnation == 2 and m.misses == 0
    assert ("127.0.0.1:7001", ALIVE) in events
    # remote DEAD does not kill an ALIVE member (local probes are
    # authoritative for reachability from this node)
    mm.merge_digest([{"id": "127.0.0.1:7001", "host": "127.0.0.1",
                      "data_port": 7001, "status": DEAD,
                      "incarnation": 3}])
    assert m.status == ALIVE
    # ...but does confirm a suspicion
    m.status = SUSPECT
    mm.merge_digest([{"id": "127.0.0.1:7001", "host": "127.0.0.1",
                      "data_port": 7001, "status": DEAD,
                      "incarnation": 4}])
    assert m.status == DEAD
    # unknown member: discovered as SUSPECT (promoted by first probe)
    mm.merge_digest([{"id": "10.0.0.9:7002", "host": "10.0.0.9",
                      "data_port": 7002, "meta_port": 7003,
                      "status": ALIVE, "incarnation": 0,
                      "region": "eu"}])
    new = mm.members["10.0.0.9:7002"]
    assert new.status == SUSPECT and new.region == "eu"
    # self entries never loop back
    mm.merge_digest([{"id": "self:9", "host": "self", "data_port": 9,
                      "status": DEAD, "incarnation": 99}])
    assert "self:9" not in mm.members


def test_self_refutation_bumps_incarnation():
    """SWIM alive-rumor refutation: only the member itself originates
    incarnations. Learning we are rumored SUSPECT/DEAD at our current
    incarnation bumps past it so our next digest refutes the rumor
    (reference: gossip.go:493-559)."""
    mm = MembershipManager("self:9", ["127.0.0.1:7001"])
    assert mm.self_incarnation == 0
    mm.merge_digest([{"id": "self:9", "host": "self", "data_port": 9,
                      "status": SUSPECT, "incarnation": 0}])
    assert mm.self_incarnation == 1
    # the bumped incarnation rides the next digest's self entry, ALIVE
    self_entry = mm.digest()[0]
    assert self_entry["incarnation"] == 1 and self_entry["status"] == ALIVE
    # ALIVE rumors about self never bump
    mm.merge_digest([{"id": "self:9", "host": "self", "data_port": 9,
                      "status": ALIVE, "incarnation": 1}])
    assert mm.self_incarnation == 1
    # stale suspicion (below current incarnation) is ignored
    mm.merge_digest([{"id": "self:9", "host": "self", "data_port": 9,
                      "status": SUSPECT, "incarnation": 0}])
    assert mm.self_incarnation == 1
    # a peer refutes our suspicion once ITS self-originated incarnation
    # exceeds the one we recorded — round-trip of the rule above
    m = mm.members["127.0.0.1:7001"]
    m.status = SUSPECT
    m.incarnation = 0
    mm.merge_digest([{"id": "127.0.0.1:7001", "host": "127.0.0.1",
                      "data_port": 7001, "status": ALIVE,
                      "incarnation": 1}])
    assert m.status == ALIVE and m.incarnation == 1


def test_digest_piggyback_spreads_membership(three_nodes):
    """A member learned only by one node spreads to the others on
    digest-carrying probe rounds (reference: gossip.go:493-559)."""
    a, bnode, c = three_nodes
    ghost = {"id": "10.9.9.9:7100", "host": "10.9.9.9",
             "data_port": 7100, "meta_port": 7101,
             "status": ALIVE, "incarnation": 0, "region": ""}
    a.cluster.membership.merge_digest([ghost])
    assert "10.9.9.9:7100" in a.cluster.membership.members
    # force digest exchange on the next direct probes
    a.cluster.membership.digest_every = 1
    for _ in range(3):
        a.cluster.membership.probe_round()
    assert "10.9.9.9:7100" in bnode.cluster.membership.members
    assert "10.9.9.9:7100" in c.cluster.membership.members


def test_exchange_batch_search_fans_out(three_partitioned_nodes):
    """SDK batches >=256 auto-route through DoExchange — that path must
    merge peers' top-k exactly like the DoGet ticket path (review
    finding: it silently returned only the contacted node's local
    matches)."""
    n0, n1, n2 = three_partitioned_nodes
    c = n0.client.enable_smart_routing()
    v = _vecs(300, 8, seed=21)
    c.write("xfan", np.arange(300), v)  # rows spread over ring owners
    t0 = time.time()
    while time.time() - t0 < 10:
        total = sum(
            n.store.get("xfan").live_count
            for n in (n0, n1, n2)
            if "xfan" in n.store.list_datasets()
        )
        if total == 300:
            break
        time.sleep(0.2)
    # batch of 256 queries (auto-exchange) against ONE node: every
    # query's true nearest (itself) must come back, wherever it lives
    plain = n0.client  # no smart routing on the search side
    t = plain.search("xfan", v[:256] + 0.0005, k=1)
    ids = t.column("id").to_numpy(zero_copy_only=False)
    qi = t.column("query_index").to_numpy()
    hits = sum(1 for b in range(256) if b in ids[qi == b])
    assert hits == 256, f"only {hits}/256 queries found their row"


def test_global_hybrid_search_forwards_text_query(three_nodes):
    """Cross-node hybrid: text_query/alpha forward through global
    search so each node runs its LOCAL BM25 + dense fusion, merged by
    RRF (reference forwards the full VectorSearchRequest,
    global_search.go:48; requests.go:4-21). BM25 docs are split across
    nodes: the keyword-only match lives on node1 and must surface in a
    search issued at node0."""
    n0, n1, n2 = three_nodes
    rng = np.random.default_rng(11)
    q = rng.standard_normal(8).astype(np.float32)
    # node0: dense-close rows with unrelated text
    v0 = q[None, :] + 0.05 * rng.standard_normal((10, 8)).astype(np.float32)
    n0.store.put(
        "hyb", np.arange(10), v0,
        columns={"text": [f"common filler doc {i}" for i in range(10)]},
    )
    # node1: one dense-FAR row whose text matches the query exactly
    v1 = q[None, :] + 5.0 + rng.standard_normal((5, 8)).astype(np.float32)
    n1.store.put(
        "hyb", np.arange(100, 105), v1,
        columns={"text": [
            "quantum flux capacitor blueprint",
            "unrelated beta", "unrelated gamma", "unrelated delta",
            "unrelated epsilon",
        ]},
    )
    # node2: noise
    v2 = q[None, :] + 3.0 + rng.standard_normal((5, 8)).astype(np.float32)
    n2.store.put(
        "hyb", np.arange(200, 205), v2,
        columns={"text": [f"noise doc {i}" for i in range(5)]},
    )

    # dense-only global search from node0: the far row cannot appear
    tbl = n0.client.search("hyb", q, k=5)
    dense_ids = {tbl.column("id")[j].as_py() for j in range(5)}
    assert 100 not in dense_ids

    # hybrid global search: the node1 keyword match must surface
    tbl = n0.client.search(
        "hyb", q, k=5, text_query="quantum flux capacitor", alpha=0.3
    )
    hy_ids = [tbl.column("id")[j].as_py() for j in range(tbl.num_rows)]
    assert 100 in hy_ids, hy_ids
    # dense-close local rows still present (fusion, not replacement)
    assert any(i < 10 for i in hy_ids), hy_ids
