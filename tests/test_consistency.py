"""Read-consistency levels + coordinated checkpoints
(reference: QuorumManager ONE/QUORUM/ALL reads quorum.go:93-126;
CheckpointCoordinator epoch barrier checkpoint_coordinator.go:21-126).
"""
import json
import socket
import threading
import time

import numpy as np
import pyarrow.flight as flight
import pytest

from longbow_tpu.distributed.cluster import (
    ClusterCoordinator,
    ConsistencyError,
)
from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import LongbowFlightServer
from longbow_tpu.store.vector_store import VectorStore


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _vecs(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, d), np.float32
    )


def test_quorum_read_fails_when_peers_dead():
    vs = VectorStore()
    vs.put("d", np.arange(8), _vecs(8, 8))
    # two peers that will never answer (nothing listens there)
    coord = ClusterCoordinator(
        vs, "127.0.0.1:59990",
        ["127.0.0.1:59991", "127.0.0.1:59992"],
        replication_mode="off",
        global_search_timeout_s=0.5,
    )
    ids, scores, okm = vs.search("d", _vecs(1, 8), 3, use_cache=False)
    local = (ids, scores, okm)
    # best-effort merge still answers
    out = coord.global_search("d", _vecs(1, 8), 3, local=local)
    assert out[2].any()
    # ONE is satisfied by the local answer
    coord.global_search(
        "d", _vecs(1, 8), 3, local=local, consistency="ONE"
    )
    # QUORUM needs 2 of 3 -> only local answered
    with pytest.raises(ConsistencyError):
        coord.global_search(
            "d", _vecs(1, 8), 3, local=local, consistency="QUORUM"
        )
    with pytest.raises(ConsistencyError):
        coord.global_search(
            "d", _vecs(1, 8), 3, local=local, consistency="ALL"
        )
    coord.stop()


def test_quorum_read_met_with_live_peer():
    # a real peer server that holds the dataset
    peer_port = _free_port()
    peer_store = VectorStore()
    peer_store.put("d", np.arange(5), _vecs(5, 8, seed=1))
    peer_srv = LongbowFlightServer(
        peer_store, f"grpc://127.0.0.1:{peer_port}"
    )
    t = threading.Thread(target=peer_srv.serve, daemon=True)
    t.start()
    time.sleep(0.5)
    try:
        vs = VectorStore()
        vs.put("d", np.arange(10, 15), _vecs(5, 8))
        coord = ClusterCoordinator(
            vs, "127.0.0.1:59990",
            [f"127.0.0.1:{peer_port}:{peer_port}"],
            replication_mode="off",
            global_search_timeout_s=5.0,
        )
        ids, scores, okm = vs.search(
            "d", _vecs(1, 8), 4, use_cache=False
        )
        out_ids, _, out_ok = coord.global_search(
            "d", _vecs(1, 8), 4, local=(ids, scores, okm),
            consistency="ALL",
        )
        got = {i for i in out_ids[0] if i is not None}
        assert got & {0, 1, 2, 3, 4}, "peer rows merged"
        assert got & {10, 11, 12, 13, 14}, "local rows merged"
        coord.stop()
    finally:
        peer_srv.shutdown()


def test_search_ticket_consistency_unavailable():
    port = _free_port()
    vs = VectorStore()
    vs.put("d", np.arange(4), _vecs(4, 8))
    coord = ClusterCoordinator(
        vs, "127.0.0.1:59990", ["127.0.0.1:59993"],
        replication_mode="off", global_search_timeout_s=0.5,
    )
    srv = LongbowFlightServer(
        vs, f"grpc://127.0.0.1:{port}", cluster=coord
    )
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    time.sleep(0.5)
    try:
        c = LongbowClient("127.0.0.1", port, port).connect()
        # best-effort works
        tbl = c.search("d", _vecs(1, 8)[0], k=2)
        assert tbl.num_rows > 0
        # QUORUM over {self, dead peer} = 2 required, 1 answers
        ticket = flight.Ticket(
            json.dumps(
                {
                    "search": {
                        "dataset": "d",
                        "vector": _vecs(1, 8)[0].tolist(),
                        "k": 2,
                        "consistency": "ALL",
                    }
                }
            ).encode()
        )
        with pytest.raises(flight.FlightUnavailableError):
            c._dc().do_get(ticket).read_all()
        c.close()
    finally:
        srv.shutdown()
        coord.stop()


def test_single_node_checkpoint_action(tmp_path):
    port = _free_port()
    vs = VectorStore(persist_dir=tmp_path)
    vs.put("d", np.arange(6), _vecs(6, 8))
    srv = LongbowFlightServer(vs, f"grpc://127.0.0.1:{port}")
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    time.sleep(0.5)
    try:
        c = LongbowClient("127.0.0.1", port, port).connect()
        r = c._action("checkpoint", {})
        assert r["ok"] and r["local"]
        c.close()
    finally:
        srv.shutdown()
    vs.close()
    # restart recovers from the snapshot
    vs2 = VectorStore(persist_dir=tmp_path)
    assert vs2.get("d").live_count == 6


def test_coordinated_checkpoint_two_nodes(tmp_path):
    ports = [_free_port(), _free_port()]
    stores, servers = [], []
    for i, p in enumerate(ports):
        st = VectorStore(persist_dir=tmp_path / f"n{i}")
        st.put("d", np.arange(4), _vecs(4, 8, seed=i))
        srv = LongbowFlightServer(st, f"grpc://127.0.0.1:{p}")
        threading.Thread(target=srv.serve, daemon=True).start()
        stores.append(st)
        servers.append(srv)
    time.sleep(0.5)
    try:
        coord = ClusterCoordinator(
            stores[0], f"127.0.0.1:{ports[0]}",
            [f"127.0.0.1:{ports[1]}:{ports[1]}"],
            replication_mode="off",
        )
        result = coord.coordinated_checkpoint()
        assert result["ok"], result
        assert result["committed"], result
        coord.stop()
    finally:
        for srv in servers:
            srv.shutdown()
