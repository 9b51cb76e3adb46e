"""Mixed-load soak against a live server: ingest + upserts (tombstone
pressure -> live compactions) + deletes + searches, with invariant
checks at the end."""
import numpy as np, time, threading, sys, json, urllib.request

from longbow_tpu.serving.client import LongbowClient

DUR = float(sys.argv[1]) if len(sys.argv) > 1 else 1200.0
DS = "soak"
DIM = 128

c0 = LongbowClient("localhost", data_port=3000, meta_port=3001).connect()
try:
    c0.create_namespace(DS, dim=DIM, metric="l2", index="flat", capacity=1_000_000)
except Exception as e:
    print("create:", e)
rng = np.random.default_rng(0)
N0 = 100_000
for off in range(0, N0, 20_000):
    c0.write(DS, np.arange(off, off+20_000, dtype=np.int64),
             rng.standard_normal((20_000, DIM)).astype(np.float32))
print("seeded", N0, flush=True)
time.sleep(20)  # drain + warm

stop = threading.Event()
stats = {"writes": 0, "werr": 0, "searches": 0, "serr": 0,
         "deletes": 0, "derr": 0}
latest = {}  # id -> vector (последний upsert), checked at the end
lk = threading.Lock()
next_id = [N0]

def writer():
    c = LongbowClient("localhost", data_port=3000, meta_port=3001).connect()
    r = np.random.default_rng(1)
    while not stop.is_set():
        fresh = r.integers(0, 2) == 0
        n = 1000
        if fresh:
            with lk:
                ids = np.arange(next_id[0], next_id[0]+n, dtype=np.int64)
                next_id[0] += n
        else:
            ids = np.asarray(r.choice(next_id[0], n, replace=False), dtype=np.int64)
        v = r.standard_normal((n, DIM)).astype(np.float32)
        try:
            c.write(DS, ids, v)
            stats["writes"] += n
            with lk:
                for j in range(0, n, 100):  # sample for end-check
                    latest[int(ids[j])] = v[j].copy()
        except Exception:
            stats["werr"] += 1
            time.sleep(1)
        time.sleep(0.4)
    c.close()

def searcher(i):
    c = LongbowClient("localhost", data_port=3000, meta_port=3001).connect()
    r = np.random.default_rng(100+i)
    lat = []
    while not stop.is_set():
        try:
            t0 = time.perf_counter()
            c.search(DS, r.standard_normal(DIM).astype(np.float32), k=10)
            lat.append(time.perf_counter()-t0)
            stats["searches"] += 1
        except Exception:
            stats["serr"] += 1
            time.sleep(0.5)
    stats[f"lat{i}"] = lat
    c.close()

def deleter():
    c = LongbowClient("localhost", data_port=3000, meta_port=3001).connect()
    r = np.random.default_rng(7)
    while not stop.is_set():
        ids = r.choice(next_id[0], 200, replace=False).tolist()
        try:
            c.delete(DS, ids)
            stats["deletes"] += 200
            with lk:
                for i in ids:
                    latest.pop(int(i), None)
        except Exception:
            stats["derr"] += 1
        stop.wait(5.0)
    c.close()

threads = ([threading.Thread(target=writer)]
           + [threading.Thread(target=searcher, args=(i,)) for i in range(3)]
           + [threading.Thread(target=deleter)])
t0 = time.time()
for t in threads: t.start()
while time.time() - t0 < DUR:
    time.sleep(60)
    try:
        m = urllib.request.urlopen("http://localhost:9090/metrics", timeout=10).read().decode()
        comp = [ln for ln in m.splitlines() if ln.startswith("longbow_compaction_operations_total")]
        frag = [ln for ln in m.splitlines() if ln.startswith("longbow_memory_fragmentation_ratio")]
    except Exception as e:
        comp, frag = [f"metrics err {e}"], []
    print(f"[{time.time()-t0:.0f}s] {stats['writes']}w/{stats['werr']}we "
          f"{stats['searches']}s/{stats['serr']}se {stats['deletes']}d/{stats['derr']}de "
          f"| {comp} {frag}", flush=True)
stop.set()
for t in threads: t.join(timeout=60)

# ---- invariant checks ----
time.sleep(15)  # drain
fails = 0
with lk:
    sample = list(latest.items())[-40:]
ok_top1 = 0
for uid, vec in sample:
    try:
        t = c0.search(DS, vec, k=1)
        got = t.column("id")[0].as_py()
        if got == uid:
            ok_top1 += 1
    except Exception:
        fails += 1
lats = sorted(sum((stats.get(f"lat{i}", []) for i in range(3)), []))
import numpy as _np
la = _np.array(lats)*1000
print(f"END: top1 self-match {ok_top1}/{len(sample)} (errors {fails}); "
      f"search p50 {_np.percentile(la,50):.0f}ms p99 {_np.percentile(la,99):.0f}ms n={len(la)}", flush=True)
