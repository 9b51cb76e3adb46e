"""Transport security: TLS + bearer-token auth on the Flight edge
(reference: longbowclientsdk/src/longbow/client.py:63-70 sends
`Bearer <api_key>` call headers; docs/security.md assumes TLS).
"""
import shutil
import socket
import subprocess
import threading
import time

import numpy as np
import pyarrow.flight as flight
import pytest

from longbow_tpu.serving.client import LongbowClient
from longbow_tpu.serving.flight_server import LongbowFlightServer
from longbow_tpu.store.vector_store import VectorStore


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _start(server):
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    time.sleep(0.5)
    return t


def test_bearer_token_required():
    port = _free_port()
    srv = LongbowFlightServer(
        VectorStore(), f"grpc://127.0.0.1:{port}", auth_token="sekrit"
    )
    _start(srv)
    try:
        v = np.random.default_rng(0).standard_normal((10, 8), np.float32)

        # good token: full round trip works
        c = LongbowClient("127.0.0.1", port, port, api_key="sekrit")
        c.write("a", np.arange(10), v)
        t = c.search("a", v[0], k=1)
        assert t.num_rows == 1
        c.close()

        # no token: unauthenticated
        c2 = LongbowClient("127.0.0.1", port, port)
        with pytest.raises(flight.FlightUnauthenticatedError):
            c2.search("a", v[0], k=1)
        c2.close()

        # wrong token: unauthenticated
        c3 = LongbowClient("127.0.0.1", port, port, api_key="wrong")
        with pytest.raises(flight.FlightUnauthenticatedError):
            c3.write("a", np.arange(10), v)
        c3.close()
    finally:
        srv.shutdown()


@pytest.mark.skipif(
    shutil.which("openssl") is None, reason="openssl not available"
)
def test_tls_with_token(tmp_path):
    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(cert),
            "-days", "1", "-nodes",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    port = _free_port()
    srv = LongbowFlightServer(
        VectorStore(),
        f"grpc://127.0.0.1:{port}",
        auth_token="tls-tok",
        tls_cert_file=str(cert),
        tls_key_file=str(key),
    )
    _start(srv)
    try:
        v = np.random.default_rng(1).standard_normal((6, 8), np.float32)
        c = LongbowClient(
            "localhost", port, port,
            api_key="tls-tok", tls_root_certs=cert.read_bytes(),
        )
        c.write("t", np.arange(6), v)
        t = c.search("t", v[2], k=1)
        assert t.num_rows == 1
        c.close()

        # plaintext client cannot talk to the TLS listener
        c2 = LongbowClient("localhost", port, port, api_key="tls-tok")
        with pytest.raises(flight.FlightError):
            c2.check_readiness()
        c2.close()
    finally:
        srv.shutdown()


def test_audit_trail_records_mutations(tmp_path):
    """Every mutating op leaves an append-only JSONL audit entry
    (reference: security/audit.go:16-32 logs operation/resource)."""
    import json

    from longbow_tpu.serving.security import AuditLogger

    port = _free_port()
    audit_path = tmp_path / "audit.jsonl"
    srv = LongbowFlightServer(
        VectorStore(),
        f"grpc://127.0.0.1:{port}",
        audit_logger=AuditLogger(audit_path),
    )
    _start(srv)
    try:
        v = np.random.default_rng(2).standard_normal((8, 8), np.float32)
        c = LongbowClient("127.0.0.1", port, port)
        c.create_namespace("aud", dim=8)
        c.write("aud", np.arange(8), v)
        c.delete("aud", [0, 1])
        c.delete_namespace("aud")
        c.close()
    finally:
        srv.shutdown()

    entries = [
        json.loads(line)
        for line in audit_path.read_text().strip().splitlines()
    ]
    ops = [(e["op"], e["dataset"]) for e in entries]
    assert ("create_namespace", "aud") in ops
    assert ("put", "aud") in ops
    assert ("delete", "aud") in ops
    assert ("drop_dataset", "aud") in ops
    # reads leave no trace
    assert all(e["op"] not in ("search", "scan") for e in entries)
    # delete carries its row count, drop its result
    d = next(e for e in entries if e["op"] == "delete")
    assert d["n"] == 2
    assert next(e for e in entries if e["op"] == "drop_dataset")["dropped"]
