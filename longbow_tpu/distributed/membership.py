"""Cluster membership + failure detection over the Flight control
plane.

The reference runs a hand-rolled SWIM protocol over UDP with indirect
pings and piggybacked membership updates (reference: mesh/gossip.go:
16-235, member model mesh/member.go:18, discovery mesh/discovery*.go).
The TPU rebuild replaces it with a static-peer heartbeat over the same
gRPC/Flight channel the data plane uses: at the cluster sizes a
TPU-backed search tier runs at (units of nodes, each fronting a slice),
O(N) direct probing every period is cheaper than maintaining a UDP
stack, and the failure-detection semantics the rest of the system
needs — alive / suspect / dead with incarnation counters — are
preserved. Discovery modes (reference: mesh/discovery*.go): static
peers, a DNS name resolved per probe round, or Kubernetes endpoints
polled from the API server. Members carry an optional region label
(reference: mesh/region.go region-aware member grouping) used to order
fan-out and replication toward same-region peers first.
"""
from __future__ import annotations

import json
import logging
import os
import socket
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

log = logging.getLogger("longbow.membership")

ALIVE = "alive"
SUSPECT = "suspect"
DEAD = "dead"


def parse_peer(spec: str) -> tuple[str, int, int, str]:
    """'host:data[:meta][@region]' -> (host, data_port, meta_port,
    region); meta defaults to data+1 (reference convention:
    :3000/:3001), region defaults to ''."""
    spec = spec.strip()
    region = ""
    if "@" in spec:
        spec, region = spec.rsplit("@", 1)
    parts = spec.rsplit(":", 2)
    if len(parts) == 3 and parts[1].isdigit() and parts[2].isdigit():
        return parts[0], int(parts[1]), int(parts[2]), region
    host, port = spec.rsplit(":", 1)
    return host, int(port), int(port) + 1, region


@dataclass
class Member:
    """reference: mesh/member.go:18 Member{ID,Addr,Status,Incarnation};
    region label per mesh/region.go."""

    id: str
    host: str
    data_port: int
    meta_port: int
    status: str = ALIVE
    incarnation: int = 0
    last_seen: float = field(default_factory=time.time)
    misses: int = 0
    region: str = ""

    @property
    def addr(self) -> str:
        return f"{self.host}:{self.data_port}"

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "addr": self.addr,
            "status": self.status,
            "incarnation": self.incarnation,
            "last_seen": self.last_seen,
            "region": self.region,
        }


class MembershipManager:
    """Probes peers each protocol period; drives alive->suspect->dead
    transitions (reference suspicion flow: gossip.go:170-235 probe ->
    suspect -> dead after timeout). Notifies subscribers on state
    change (the reference's EventDelegate, sharding/manager.go:11-99).
    """

    def __init__(
        self,
        self_id: str,
        peers: list[str],
        *,
        probe_interval_s: float = 1.0,
        suspect_after: int = 2,
        dead_after: int = 5,
        probe_timeout_s: float = 2.0,
        dns_name: Optional[str] = None,
        k8s_service: Optional[str] = None,
        self_region: str = "",
        lan_group: Optional[str] = None,
        advertise_host: str = "",
    ):
        self.self_id = self_id
        self.self_region = self_region
        self.probe_interval_s = probe_interval_s
        self.suspect_after = suspect_after
        self.dead_after = dead_after
        self.probe_timeout_s = probe_timeout_s
        # DNS discovery (reference: mesh/discovery*.go DNS mode):
        # "name:data_port[:meta_port]" re-resolved every probe round so
        # scale-ups/downs of a headless service are picked up live
        self.dns_name = dns_name
        # Kubernetes discovery (reference: mesh/discovery k8s pods +
        # pod_parser.go): "service:data_port[:meta_port]" — endpoints
        # polled from the API server each probe round
        self.k8s_service = k8s_service
        # LAN zero-config discovery (reference: mesh/discovery mDNS via
        # zeroconf): "group:port" — nodes announce themselves on a UDP
        # multicast group each probe round and fold in what they hear
        self.lan_group = lan_group
        self.advertise_host = advertise_host
        self._lan_sock = None
        if lan_group:
            self._lan_open()
        self.members: dict[str, Member] = {}
        for spec in peers:
            h, dp, mp, region = parse_peer(spec)
            mid = f"{h}:{dp}"
            if mid != self_id:
                self.members[mid] = Member(mid, h, dp, mp, region=region)
        self._subs: list[Callable[[Member], None]] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def _is_self(self, host: str, dp: int) -> bool:
        """True when a discovered address is THIS node. self_id alone
        is not enough: it may be the bind form ('0.0.0.0:3000') or a
        hostname while discovery returns the pod IP — registering self
        as a peer makes every write re-put to itself (tombstone churn)
        and inflates quorum counts."""
        if f"{host}:{dp}" == self.self_id:
            return True
        self_port = self.self_id.rsplit(":", 1)[-1]
        if not self_port.isdigit() or int(self_port) != dp:
            return False
        try:
            local = {"127.0.0.1", "::1", "localhost"}
            hostname = socket.gethostname()
            local.add(hostname)
            local.update(socket.gethostbyname_ex(hostname)[2])
            return host in local
        except OSError:
            return False

    def _add_discovered(self, host: str, dp: int, mp: int, region="") -> None:
        mid = f"{host}:{dp}"
        if not self._is_self(host, dp) and mid not in self.members:
            with self._lock:
                # start SUSPECT: the first successful probe fires
                # the subscriber callbacks (join notification)
                self.members[mid] = Member(
                    mid, host, dp, mp, status=SUSPECT, region=region
                )

    def _discover_dns(self) -> None:
        if not self.dns_name:
            return
        name, dp, mp, region = parse_peer(self.dns_name)
        try:
            infos = socket.getaddrinfo(
                name, dp, proto=socket.IPPROTO_TCP
            )
        except OSError:
            return
        for info in infos:
            self._add_discovered(info[4][0], dp, mp, region)

    def _discover_k8s(self) -> None:
        """Poll the Kubernetes Endpoints API for peer pod IPs
        (reference: mesh/discovery_k8s + pod_parser.go). Uses the
        in-cluster service-account credentials; the API base and token
        path are overridable for tests (LONGBOW_K8S_API / _TOKEN_FILE /
        _NAMESPACE). Pod topology zone labels map to regions."""
        if not self.k8s_service:
            return
        svc, dp, mp, _ = parse_peer(self.k8s_service)
        api = os.environ.get("LONGBOW_K8S_API")
        if not api:
            host = os.environ.get("KUBERNETES_SERVICE_HOST")
            port = os.environ.get("KUBERNETES_SERVICE_PORT", "443")
            if not host:
                return
            api = f"https://{host}:{port}"
        ns_file = "/var/run/secrets/kubernetes.io/serviceaccount/namespace"
        ns = os.environ.get("LONGBOW_K8S_NAMESPACE")
        if not ns:
            try:
                with open(ns_file) as f:
                    ns = f.read().strip()
            except OSError:
                ns = "default"
        token_file = os.environ.get(
            "LONGBOW_K8S_TOKEN_FILE",
            "/var/run/secrets/kubernetes.io/serviceaccount/token",
        )
        headers = {}
        try:
            with open(token_file) as f:
                headers["Authorization"] = f"Bearer {f.read().strip()}"
        except OSError:
            pass
        import ssl
        import urllib.request

        url = f"{api}/api/v1/namespaces/{ns}/endpoints/{svc}"
        ctx = None
        if url.startswith("https"):
            ca = "/var/run/secrets/kubernetes.io/serviceaccount/ca.crt"
            if os.path.exists(ca):
                ctx = ssl.create_default_context(cafile=ca)
            elif os.environ.get("LONGBOW_K8S_INSECURE") == "1":
                # explicit test-only opt-out; without it a MITM on the
                # API path could inject "peers" that then receive
                # replicated vector data
                ctx = ssl.create_default_context()
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            else:
                log.error(
                    "k8s discovery: service-account CA missing at %s; "
                    "refusing unverified https (set LONGBOW_K8S_INSECURE=1 "
                    "to override in tests)", ca,
                )
                return
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=2.0, context=ctx) as r:
                body = json.loads(r.read())
        except Exception:
            return
        for subset in body.get("subsets") or []:
            for addr in subset.get("addresses") or []:
                region = (addr.get("nodeName") or "").split(".")[0]
                self._add_discovered(addr.get("ip", ""), dp, mp, region)

    # -- probing --------------------------------------------------------

    def _probe_one(self, m: Member) -> bool:
        """TCP connect to the data port — the cheapest liveness signal
        that still exercises the serving socket (a full Flight action
        would be heavier than the reference's 1400B UDP ping)."""
        try:
            with socket.create_connection(
                (m.host, m.data_port), timeout=self.probe_timeout_s
            ):
                return True
        except OSError:
            return False

    def _lan_open(self) -> None:
        import struct

        group, port, _, _ = parse_peer(self.lan_group)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        try:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        except (AttributeError, OSError):
            pass
        s.bind(("", port))
        mreq = struct.pack(
            "4s4s", socket.inet_aton(group), socket.inet_aton("0.0.0.0")
        )
        s.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP, mreq)
        s.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 1)
        # loop multicast back so same-host nodes (and tests) hear it
        s.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_LOOP, 1)
        s.setblocking(False)
        self._lan_sock = s
        self._lan_dest = (group, port)

    def _discover_lan(self) -> None:
        """Announce self on the multicast group; fold in peers heard
        (reference: mDNS zeroconf discovery, mesh/discovery*.go)."""
        if self._lan_sock is None:
            return
        try:
            h, dp, mp, _ = parse_peer(self.self_id)
        except (ValueError, IndexError):
            return
        beacon = json.dumps({
            "longbow": 1,
            "id": self.self_id,
            "host": self.advertise_host or h,
            "data_port": dp,
            "meta_port": mp,
            "region": self.self_region,
        }).encode()
        try:
            self._lan_sock.sendto(beacon, self._lan_dest)
        except OSError:
            pass
        for _ in range(64):  # drain what's queued, bounded
            try:
                pkt, _addr = self._lan_sock.recvfrom(2048)
            except (BlockingIOError, OSError):
                break
            try:
                msg = json.loads(pkt)
            except ValueError:
                continue
            if msg.get("longbow") != 1 or msg.get("id") == self.self_id:
                continue
            self._add_discovered(
                msg.get("host", ""), int(msg.get("data_port", 0)),
                int(msg.get("meta_port", 0)), msg.get("region", ""),
            )

    def probe_round(self) -> None:
        self._discover_dns()
        self._discover_k8s()
        self._discover_lan()
        try:
            from longbow_tpu.metrics import get_registry

            _reg = get_registry()
        except Exception:
            _reg = None
        for m in list(self.members.values()):
            ok = self._probe_one(m)
            if _reg is not None:
                _reg.inc("longbow_gossip_pings_total", direction="out")
            with self._lock:
                old = m.status
                if ok:
                    m.last_seen = time.time()
                    m.misses = 0
                    if m.status != ALIVE:
                        m.incarnation += 1
                    m.status = ALIVE
                else:
                    m.misses += 1
                    if m.misses >= self.dead_after:
                        m.status = DEAD
                    elif m.misses >= self.suspect_after:
                        m.status = SUSPECT
                changed = m.status != old
            if changed:
                for cb in self._subs:
                    try:
                        cb(m)
                    except Exception:
                        pass
        if _reg is not None:
            _reg.set(
                "longbow_gossip_active_members",
                sum(
                    1 for m in self.members.values() if m.status == ALIVE
                ),
            )

    def subscribe(self, cb: Callable[[Member], None]) -> None:
        self._subs.append(cb)

    def alive(self) -> list[Member]:
        """Alive members, same-region peers first (reference:
        mesh/region.go region-aware grouping — fan-out and replication
        prefer peers that don't cross a region boundary)."""
        with self._lock:
            live = [m for m in self.members.values() if m.status == ALIVE]
        if self.self_region:
            live.sort(key=lambda m: (m.region != self.self_region, m.id))
        return live

    def status(self) -> dict:
        """reference: 'cluster-status' action payload shape."""
        with self._lock:
            return {
                "self": {
                    "id": self.self_id,
                    "status": ALIVE,
                    "region": self.self_region,
                },
                "members": [m.to_dict() for m in self.members.values()],
            }

    # -- lifecycle ------------------------------------------------------

    def start(self) -> None:
        def loop():
            while not self._stop.wait(self.probe_interval_s):
                try:
                    self.probe_round()
                except Exception:
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        if self._lan_sock is not None:
            try:
                self._lan_sock.close()
            except OSError:
                pass
