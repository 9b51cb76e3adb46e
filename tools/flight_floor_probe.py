"""Loopback gRPC/Flight throughput ceiling on this box (no JAX).

Serves a prebuilt in-memory table through pyarrow.flight's pure C++
serialization path (RecordBatchStream over a Table — zero Python in the
data plane) and measures client-side read bandwidth, 1 and 2 parallel
streams. This is the structural ceiling any Python Flight server on
this machine can reach; compare the longbow scan path against it
(VERDICT round-3 #4: "or a profiled proof the floor is gRPC memcpy").

Run: python tools/flight_floor_probe.py [total_mb] [dim]
"""
import json
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.flight as flight

TOTAL_MB = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CHUNK_BYTES = 2 * 1024 * 1024


def log(m):
    print(f"[floor] {m}", file=sys.stderr, flush=True)


n = TOTAL_MB * 1024 * 1024 // (DIM * 4 + 8)
rng = np.random.default_rng(0)
vecs = rng.standard_normal((n, DIM)).astype(np.float32)
ids = np.arange(n, dtype=np.int64)
schema = pa.schema(
    [("id", pa.int64()), ("vector", pa.list_(pa.float32(), DIM))]
)
tbl = pa.table(
    {
        "id": pa.array(ids),
        "vector": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), DIM
        ),
    },
    schema=schema,
)
rows_per = max(1, CHUNK_BYTES // (DIM * 4 + 8))
batches = tbl.to_batches(max_chunksize=rows_per)
tbl_chunked = pa.Table.from_batches(batches, schema=schema)
nbytes = tbl.nbytes
log(f"table {n} rows x {DIM}d = {nbytes/2**20:.0f} MB, "
    f"{len(batches)} batches")


class Floor(flight.FlightServerBase):
    def __init__(self, loc):
        super().__init__(loc)

    def do_get(self, context, ticket):
        mode = ticket.ticket.decode()
        if mode == "table":
            # C++ walks the pre-chunked table: the ceiling
            return flight.RecordBatchStream(tbl_chunked)
        if mode == "gen":
            # per-batch Python generator: what a streaming scan pays
            def g():
                for b in batches:
                    yield b

            return flight.GeneratorStream(schema, g())
        raise KeyError(mode)


server = Floor("grpc://127.0.0.1:0")
port = server.port
threading.Thread(target=server.serve, daemon=True).start()
time.sleep(0.3)
log(f"serving on :{port}")


def read_stream(tag):
    c = flight.connect(f"grpc://127.0.0.1:{port}")
    r = c.do_get(flight.Ticket(tag.encode()))
    got = 0
    while True:
        try:
            chunk = r.read_chunk()
        except StopIteration:
            break
        if chunk.data is None:
            break
        got += chunk.data.nbytes
    c.close()
    return got


results = {}
for tag in ("table", "gen"):
    read_stream(tag)  # warm
    t0 = time.perf_counter()
    got = read_stream(tag)
    dt = time.perf_counter() - t0
    results[f"{tag}_1stream_mbps"] = round(got / 2**20 / dt, 1)
    log(f"{tag} x1: {got/2**20/dt:.0f} MB/s")
    # two parallel streams
    outs = [0, 0]

    def rd(i):
        outs[i] = read_stream(tag)

    ts = [threading.Thread(target=rd, args=(i,)) for i in range(2)]
    t0 = time.perf_counter()
    [t.start() for t in ts]
    [t.join() for t in ts]
    dt = time.perf_counter() - t0
    results[f"{tag}_2stream_mbps"] = round(sum(outs) / 2**20 / dt, 1)
    log(f"{tag} x2: {sum(outs)/2**20/dt:.0f} MB/s aggregate")

print(json.dumps(results))
