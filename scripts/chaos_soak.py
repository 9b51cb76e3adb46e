"""Chaos soak: 3-node cluster, kill a node under load, verify the
cluster keeps serving and anti-entropy heals the restarted node.

reference: the soak/chaos scripts that kill local-cluster processes
and validate recovery (scripts/validate_soak_fix.sh,
soak/validate_cluster_soak.sh; SURVEY §5 failure detection).

Usage:  python scripts/chaos_soak.py [--duration 60]
Runs on CPU (LONGBOW_FORCE_CPU=1) so it works on any box.
"""
from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def free_ports(n):
    out, socks = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        out.append(s.getsockname()[1])
        socks.append(s)
    for s in socks:
        s.close()
    return out


def spawn(i, ports, specs, root):
    env = dict(os.environ)
    env.update(
        LONGBOW_DATA_PORT=str(ports[2 * i]),
        LONGBOW_META_PORT=str(ports[2 * i + 1]),
        LONGBOW_METRICS_PORT="0",
        LONGBOW_DATA_DIR=str(root / f"node{i}"),
        LONGBOW_NODE_ID=f"127.0.0.1:{ports[2*i]}",
        LONGBOW_PEERS=specs,
        LONGBOW_REPLICATION="async",
        LONGBOW_SYNC_INTERVAL_S="5",
        LONGBOW_PROBE_INTERVAL_S="0.5",
        LONGBOW_FORCE_CPU="1",
    )
    logf = open(root / f"node{i}.log", "ab")
    return subprocess.Popen(
        [sys.executable, "-m", "longbow_tpu.serve"],
        env=env, stdout=logf, stderr=subprocess.STDOUT,
    )


def main() -> int:
    from longbow_tpu.serving.client import LongbowClient

    dur = 60.0
    if "--duration" in sys.argv:
        dur = float(sys.argv[sys.argv.index("--duration") + 1])

    root = pathlib.Path(tempfile.mkdtemp(prefix="longbow-chaos-"))
    ports = free_ports(6)
    specs = ",".join(
        f"127.0.0.1:{ports[2*i]}:{ports[2*i+1]}" for i in range(3)
    )
    procs = {i: spawn(i, ports, specs, root) for i in range(3)}
    clients = {
        i: LongbowClient("127.0.0.1", ports[2 * i], ports[2 * i + 1])
        for i in range(3)
    }
    try:
        # wait ready
        t0 = time.time()
        while time.time() - t0 < 90:
            try:
                for c in clients.values():
                    c.check_readiness()
                break
            except Exception:
                time.sleep(0.5)
        else:
            print("FAIL: cluster never became ready")
            return 1
        print("cluster up")

        rng = np.random.default_rng(0)
        dim, batch = 16, 200
        next_id = 0
        checked = errors = 0
        kill_at = time.time() + dur * 0.25
        restart_at = time.time() + dur * 0.55
        end_at = time.time() + dur
        victim = 1
        killed = restarted = False
        while time.time() < end_at:
            writer = clients[0]
            v = rng.standard_normal((batch, dim)).astype(np.float32)
            ids = np.arange(next_id, next_id + batch)
            try:
                writer.write("soak", ids, v)
                next_id += batch
            except Exception as e:
                errors += 1
            # read from a live node with global fan-out
            reader = clients[2]
            try:
                t = reader.search("soak", v[0], k=1)
                if t.num_rows:
                    checked += 1
            except Exception:
                errors += 1
            if not killed and time.time() > kill_at:
                procs[victim].kill()
                print(f"killed node{victim}")
                killed = True
            if killed and not restarted and time.time() > restart_at:
                procs[victim] = spawn(victim, ports, specs, root)
                print(f"restarted node{victim}")
                restarted = True
            time.sleep(0.2)

        # wait for the restarted node to come back up (a fresh
        # process pays ~20s of jax import before it binds), then give
        # anti-entropy a couple of sync rounds
        t0 = time.time()
        while time.time() - t0 < 60:
            try:
                clients[victim].check_readiness()
                break
            except Exception:
                time.sleep(1.0)
        # poll until the victim converges (bounded): a fixed 12s
        # window was marginal for ~60k rows of catch-up divergence —
        # pass/fail should measure CONVERGENCE, not a lucky box
        t0 = time.time()
        while time.time() - t0 < 60:
            try:
                a = clients[victim].cluster_status()["datasets"]["soak"][
                    "live_rows"
                ]
                b = clients[0].cluster_status()["datasets"]["soak"][
                    "live_rows"
                ]
                if a >= 0.98 * b:
                    break
            except Exception:
                pass
            time.sleep(2.0)
        counts = {}
        for i in (0, 2, victim):
            try:
                st = clients[i].cluster_status()
                counts[i] = st["datasets"]["soak"]["live_rows"]
            except Exception as e:
                counts[i] = f"error: {e}"
        print(f"rows written={next_id} reads_ok={checked} errors={errors}")
        print("per-node live rows:", counts)
        healthy = all(isinstance(c, int) and c > 0 for c in counts.values())
        # the restarted node must have healed to (close to) the others
        if isinstance(counts.get(victim), int) and isinstance(
            counts.get(0), int
        ):
            healed = counts[victim] >= 0.9 * counts[0]
        else:
            healed = False
        print("HEALED" if healed and healthy else "NOT HEALED")
        return 0 if (healed and healthy and checked > 0) else 1
    finally:
        for p in procs.values():
            p.terminate()
        for p in procs.values():
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    sys.exit(main())
