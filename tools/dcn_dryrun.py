"""Multi-host DCN dryrun: 2 jax.distributed processes, one global mesh.

SURVEY §5 maps the reference's cross-node gRPC scatter-gather to XLA
collectives: intra-slice over ICI, cross-host over DCN via the
multi-controller runtime. Real multi-host hardware isn't available
here, so this dryrun proves the program shape: two OS processes join a
jax.distributed cluster (CPU backend, 4 virtual devices each), build
ONE 8-device global mesh, row-shard a corpus across it and run the
sharded search step (local top-k + all_gather merge) — the exact
program a v5e pod would run with TPU devices.

Usage:
    python tools/dcn_dryrun.py            # parent: spawns 2 workers
    python tools/dcn_dryrun.py --worker I # internal
"""
from __future__ import annotations

import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_PROC = 2
DEV_PER_PROC = 4
COORD = "127.0.0.1:9876"


def worker(pid: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=N_PROC, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == N_PROC * DEV_PER_PROC, (pid, len(devs))
    mesh = Mesh(np.asarray(devs), ("shard",))

    n, d, b, k = 64 * len(devs), 32, 4, 5
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = corpus[:b]

    # global arrays in a multi-controller world: every process provides
    # its local shards via callback (same host data everywhere here)
    sh_rows = NamedSharding(mesh, P("shard", None))
    sh_rep = NamedSharding(mesh, P())
    gc = jax.make_array_from_callback(
        corpus.shape, sh_rows, lambda idx: corpus[idx]
    )
    gq = jax.make_array_from_callback(
        queries.shape, sh_rep, lambda idx: queries[idx]
    )

    shard_rows = n // len(devs)

    @jax.jit
    def search(c, q):
        def local(cs, qs):
            ip = qs @ cs.T
            qn = jnp.sum(qs * qs, 1, keepdims=True)
            cn = jnp.sum(cs * cs, 1)[None, :]
            dist = qn - 2.0 * ip + cn
            neg, pos = jax.lax.top_k(-dist, k)
            off = jax.lax.axis_index("shard") * shard_rows
            ds = jax.lax.all_gather(-neg, "shard")
            gs = jax.lax.all_gather(pos + off, "shard")
            dall = jnp.moveaxis(ds, 0, 1).reshape(q.shape[0], -1)
            iall = jnp.moveaxis(gs, 0, 1).reshape(q.shape[0], -1)
            neg2, pos2 = jax.lax.top_k(-dall, k)
            return -neg2, jnp.take_along_axis(iall, pos2, axis=1)

        return shard_map(
            local, mesh=mesh, in_specs=(P("shard", None), P()),
            out_specs=(P(), P()), check_vma=False,
        )(c, q)

    dist, rows = search(gc, gq)
    # fully-replicated outputs: every process can read them
    rows_np = np.asarray(jax.device_get(rows))
    ok = (rows_np[:, 0] == np.arange(b)).all()
    if pid == 0:
        print(f"DCN dryrun: self-match={ok} rows0={rows_np[:, 0].tolist()}")
    jax.distributed.shutdown()
    return 0 if ok else 1


def main() -> int:
    if "--worker" in sys.argv:
        return worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i)], env=env
        )
        for i in range(N_PROC)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=300)
    print("DCN dryrun:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
