"""Process entry point: `python -m longbow_tpu.serve`.

The equivalent of the reference's cmd/longbow main
(reference: cmd/longbow/main.go:137 run() — config, persistence
recovery, metrics server, data+meta Flight servers, graceful shutdown
with final snapshot :524-565).
"""
from __future__ import annotations

import logging
import os
import sys
import threading

if os.environ.get("LONGBOW_FORCE_CPU") == "1":
    # test/CI escape hatch, applied BEFORE any longbow import: this
    # environment's sitecustomize pins JAX to the axon TPU platform
    # (the env var alone is ignored), and any module-level jnp constant
    # in the import graph would initialize that backend — after which
    # jax_platforms updates are silently ignored and multi-process
    # tests wedge the single-TPU relay.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from longbow_tpu.config import load_config
from longbow_tpu.index.hnsw import HNSWConfig
from longbow_tpu.metrics import get_registry
from longbow_tpu.serving.flight_server import LongbowFlightServer, ServerHandle
from longbow_tpu.serving.middleware import MiddlewareChain
from longbow_tpu.store.vector_store import VectorStore
from longbow_tpu.utils.logging import setup_logging


def main(argv=None) -> int:
    # ops escape hatch: SIGUSR1 dumps every thread's Python stack to
    # stderr (diagnose stuck workers without killing the server)
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)
    cfg = load_config()
    # The cache exists for the TPU relay's 30-400s kernel compiles. On
    # the CPU backend it is a measured PESSIMIZATION: XLA:CPU AOT
    # entries load with a target-feature mismatch (+prefer-no-gather /
    # +prefer-no-scatter pseudo-features the load-time host probe never
    # reports) and the loaded executable runs ~2.4x slower than a fresh
    # compile of the identical program (served dense search p50 10.9ms
    # cached vs 4.6ms fresh, 50k x 384 bf16, one core). CPU compiles
    # are seconds, so default the cache OFF there;
    # LONGBOW_COMPILE_CACHE_CPU=1 opts back in (multi-node CPU soaks
    # where restart-recompile time dominates).
    import jax as _jax

    _cpu_backend = (
        os.environ.get("LONGBOW_FORCE_CPU") == "1"
        or str(_jax.config.jax_platforms or "").startswith("cpu")
    )
    _cache_on_cpu = os.environ.get("LONGBOW_COMPILE_CACHE_CPU") == "1"
    if cfg.compile_cache_dir and (not _cpu_backend or _cache_on_cpu):
        # persistent XLA executable cache: restart cold-start goes from
        # minutes of kernel compiles to cache reads. Best-effort — a
        # backend that can't serialize executables just recompiles.
        # Keyed by host CPU features: XLA:CPU AOT results fail to load
        # across machines (and the failed loads flood logs + slow every
        # jit); a per-feature-set subdir keeps restarts warm anyway —
        # measured: a chaos-soak node restarted with a cold cache
        # healed 3x slower (compiles ate the catch-up window).
        try:
            import jax

            from longbow_tpu.config import machine_cache_tag

            cache_dir = os.path.join(
                cfg.compile_cache_dir, machine_cache_tag()
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception:
            pass
    log = setup_logging()
    log.info("starting longbow-tpu", extra={"fields": {"config": vars(cfg)}})

    snapshot_backend = None
    if cfg.snapshot_s3_bucket:
        from longbow_tpu.storage.backends import AsyncBackend, S3Backend

        snapshot_backend = AsyncBackend(
            S3Backend(
                cfg.snapshot_s3_bucket,
                endpoint_url=cfg.snapshot_s3_endpoint or None,
            )
        )
    elif cfg.snapshot_mirror_dir:
        from longbow_tpu.storage.backends import LocalBackend

        snapshot_backend = LocalBackend(cfg.snapshot_mirror_dir)

    store = VectorStore(
        dtype=jnp.bfloat16 if cfg.storage_dtype == "bfloat16" else jnp.float32,
        migration_threshold=cfg.migration_threshold,
        hnsw_config=HNSWConfig(
            m=cfg.hnsw_m,
            m_max=cfg.hnsw_m_max,
            ef_construction=cfg.hnsw_ef_construction,
            ef_search=cfg.hnsw_ef_search,
            search_m_max=cfg.hnsw_search_m_max,
            search_expand=cfg.hnsw_search_expand,
        ),
        query_cache_size=cfg.query_cache_size,
        query_cache_ttl=cfg.query_cache_ttl_s,
        default_index_kind=cfg.index_kind,
        default_index_params=(
            {"mesh_shards": cfg.mesh_shards} if cfg.mesh_shards else None
        ),
        persist_dir=cfg.data_dir or None,
        wal_sync=cfg.wal_sync,
        wal_io_uring=cfg.wal_io_uring,
        wal_direct_io=cfg.wal_direct_io,
        snapshot_backend=snapshot_backend,
    )

    registry = get_registry()
    try:
        # debug mux: /metrics, /healthz, /debug/pprof/* (reference
        # serves pprof on the same port, cmd/longbow/main.go:296-300)
        from longbow_tpu.utils.health import (
            HealthManager,
            device_checker,
            storage_checker,
            store_checker,
        )

        _hm = HealthManager()
        _hm.register("store", store_checker(store))
        _hm.register("storage", storage_checker(store))
        _hm.register("device", device_checker())
        registry.health_fn = _hm.check
        registry.serve(cfg.metrics_port)
        log.info(
            "metrics on :%d/metrics (+/healthz, /debug/pprof)",
            cfg.metrics_port,
        )
    except OSError as e:
        log.warning("metrics port unavailable: %s", e)

    # static transport gauges (reference sets the same at boot,
    # docs/metrics.md System & Configuration) — pyarrow Flight gRPC
    # defaults: unlimited recv (-1 -> 2GiB wire cap), 64KB window
    registry.set("longbow_grpc_max_recv_msg_size_bytes", 2**31 - 1)
    registry.set("longbow_grpc_max_send_msg_size_bytes", 2**31 - 1)
    registry.set("longbow_grpc_initial_window_size_bytes", 65535)

    def _memory_gauges() -> None:
        import pyarrow as _pa

        registry.set(
            "longbow_arrow_memory_used_bytes",
            _pa.total_allocated_bytes(),
            allocator="default",
        )
        try:
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            registry.set(
                "longbow_memory_heap_in_use_bytes",
                rss_pages * os.sysconf("SC_PAGE_SIZE"),
            )
        except (OSError, ValueError, IndexError):
            pass

    _memory_gauges()

    def _memory_loop() -> None:
        import time as _t

        while True:
            _t.sleep(10.0)
            try:
                _memory_gauges()
            except Exception:
                pass

    threading.Thread(target=_memory_loop, daemon=True).start()

    # index warmer: pre-compile the common search shape OFF the query
    # path — at startup for recovered datasets, and again whenever a
    # dataset's kernel shape changes (new dataset's first rows, a
    # capacity doubling, an index-kind swap). Without this the first
    # client query pays the XLA compile (~30s via the remote compiler)
    # and times out — observed on-chip: 10 consecutive compile-window
    # timeouts opened the circuit breaker. One SEQUENTIAL thread:
    # concurrent remote compiles wedge the compile helper.
    # LONGBOW_WARMUP=0 opts out.
    if cfg.warmup:

        def _warmup_loop() -> None:
            import time as _t

            warmed: dict = {}
            while True:
                for name in store.list_datasets():
                    try:
                        ds = store.get(name)
                        if ds.live_count == 0:
                            continue
                        key = (
                            ds.index_kind,
                            type(ds.index).__name__,
                            getattr(ds.index, "capacity", 0),
                            # adaptive migration swaps flat->graph
                            # INSIDE the index object: the beam-search
                            # program is a different compile
                            getattr(ds.index, "_graph", None)
                            is not None,
                        )
                        if warmed.get(name) == key:
                            continue
                        # one attempt per shape, even on failure — a
                        # failing compile must not retry in a hot loop
                        warmed[name] = key
                        t0 = _t.time()
                        # ds.warm compiles WITHOUT holding the index
                        # dispatch lock (a warm search held it for the
                        # whole compile, stalling concurrent ingest
                        # flushes — profiled: the warmup thread pinned
                        # the apply path for seconds per new dataset)
                        ds.warm()
                        dt = _t.time() - t0
                        if dt > 1.0:
                            log.info("warmed %s in %.1fs", name, dt)
                    except Exception:
                        log.exception(
                            "warmup search failed for %s", name
                        )
                _t.sleep(2.0)

        threading.Thread(
            target=_warmup_loop, daemon=True, name="longbow-warmup"
        ).start()

    # periodic snapshots in addition to the WAL-size trigger
    # (reference: SNAPSHOT_INTERVAL, cmd/longbow/main.go:57)
    if cfg.snapshot_interval_s > 0 and store.engine is not None:

        def _snapshot_loop() -> None:
            import time as _t

            while True:
                _t.sleep(cfg.snapshot_interval_s)
                try:
                    store.snapshot()
                    log.info("periodic snapshot complete")
                except Exception:
                    log.exception("periodic snapshot failed")

        threading.Thread(target=_snapshot_loop, daemon=True).start()

    # background compaction + optional eviction (reference:
    # CompactionWorker compaction.go:59, RecordEvictionManager
    # record_eviction.go:79 — access stats fed from the read path)
    from longbow_tpu.store.compaction import (
        CompactionWorker,
        EvictionManager,
        MemoryBackpressureController,
    )

    eviction = None
    if cfg.eviction_policy or cfg.eviction_ttl_s > 0:
        eviction = EvictionManager(
            policy=cfg.eviction_policy or "lru",
            ttl_s=cfg.eviction_ttl_s or None,
            max_rows=cfg.eviction_max_rows or None,
        )
        store.eviction = eviction
    backpressure = None
    if cfg.hbm_soft_limit_mb or cfg.hbm_hard_limit_mb:
        backpressure = MemoryBackpressureController(
            soft_bytes=cfg.hbm_soft_limit_mb * 1024 * 1024 or None,
            hard_bytes=cfg.hbm_hard_limit_mb * 1024 * 1024 or None,
            eviction=eviction,
        )
        store.backpressure = backpressure
    compactor = CompactionWorker(
        store,
        interval_s=cfg.compaction_interval_s,
        frag_threshold=cfg.compaction_frag_threshold,
        eviction=eviction,
        backpressure=backpressure,
        dataset_ttl_s=cfg.dataset_ttl_s,
    )
    compactor.start()

    # cluster tier: membership + replication + global search
    # (reference: cmd/longbow/main.go:370-458 wires gossip -> ring ->
    # forwarder -> interceptors at boot)
    cluster = None
    if (
        cfg.peers.strip() or cfg.peers_dns.strip()
        or cfg.peers_k8s.strip() or cfg.peers_lan.strip()
    ):
        from longbow_tpu.distributed.cluster import ClusterCoordinator

        self_id = cfg.node_id or f"{cfg.host}:{cfg.data_port}"
        # Partitioned placement hashes self_id into the consistent-hash
        # ring AND hands it to clients as a dialable address
        # (cluster-status ring_nodes -> smart routing). A bind-address
        # identity like 0.0.0.0 would claim a keyspace slice nobody can
        # dial and differs per coordinator -> duplicate/stale copies.
        # Require an advertisable host:port in partitioned mode.
        if cfg.placement == "partitioned":
            host_part = self_id.rsplit(":", 1)[0]
            if host_part in ("", "0.0.0.0", "::", "[::]"):
                log.error(
                    "partitioned placement requires a dialable node "
                    "identity: set LONGBOW_NODE_ID=<advertised-host:port> "
                    "(got %r from the bind address)", self_id,
                )
                return 2
        peer_ca = None
        if cfg.tls_ca_file:
            with open(cfg.tls_ca_file, "rb") as f:
                peer_ca = f.read()
        cluster = ClusterCoordinator(
            store,
            self_id,
            [p for p in cfg.peers.split(",") if p.strip()],
            replication_mode=cfg.replication,
            replication_level=cfg.replication_level,
            sync_interval_s=cfg.sync_interval_s,
            probe_interval_s=cfg.probe_interval_s,
            dns_name=cfg.peers_dns,
            k8s_service=cfg.peers_k8s,
            region=cfg.region,
            lan_group=cfg.peers_lan,
            placement=cfg.placement,
            api_key=cfg.auth_token,
            tls_root_certs=peer_ca,
            spatial_routing=cfg.spatial_routing,
            spatial_margin=cfg.spatial_margin,
        )
        cluster.start()
        log.info(
            "cluster: self=%s peers=%s replication=%s",
            self_id, cfg.peers, cfg.replication,
        )

    middleware = MiddlewareChain(
        cfg.rate_limit_rps,
        cfg.rate_limit_burst,
        cfg.breaker_threshold,
        cfg.breaker_cooldown_s,
        bulkhead_max_concurrent=cfg.bulkhead_max_concurrent,
        bulkhead_max_wait_s=cfg.bulkhead_max_wait_s,
        ip_rate_limit_rps=cfg.ip_rate_limit_rps,
        ip_rate_limit_burst=cfg.ip_rate_limit_burst,
    )
    degradation = None
    if cfg.degradation_enabled:
        # health-driven degradation levels + stale fallback serving
        # (reference: resilience/graceful_degradation.go wired over the
        # same health checkers the check_health action reports)
        from longbow_tpu.serving.middleware import (
            FallbackCache,
            GracefulDegradation,
        )
        from longbow_tpu.utils.health import (
            device_checker,
            storage_checker,
            store_checker,
        )

        degradation = GracefulDegradation()
        degradation.register_check("store", store_checker(store))
        degradation.register_check("storage", storage_checker(store))
        degradation.register_check("device", device_checker())
        degradation.start(cfg.degradation_interval_s)
        middleware.degradation = degradation
        middleware.fallback = FallbackCache(ttl_s=cfg.fallback_cache_ttl_s)
    ingest_queue = None
    if cfg.async_ingest:
        from longbow_tpu.serving.ingest import IngestQueue

        ingest_queue = IngestQueue(store, max_depth=cfg.ingest_queue_depth)
    coalescer = None
    if cfg.search_coalesce:
        from longbow_tpu.serving.coalescer import SearchCoalescer

        shards = cfg.search_coalesce_shards
        if (
            not _cpu_backend
            and os.environ.get("LONGBOW_SEARCH_COALESCE_SHARDS") is None
        ):
            # the platform rules require ONE remote compile at a time;
            # parallel shard threads could compile two fresh shapes
            # concurrently through the relay. CPU backends compile
            # in-process (safe); on TPU default to a single dispatch
            # thread unless the operator opts in explicitly.
            shards = 1
        coalescer = SearchCoalescer(
            store, max_batch=cfg.search_coalesce_max_batch,
            shards=shards,
        )
    audit = None
    if cfg.audit_log:
        from longbow_tpu.serving.security import AuditLogger

        audit = AuditLogger(cfg.audit_log)  # shared; lock serializes
    sec = dict(
        auth_token=cfg.auth_token or None,
        tls_cert_file=cfg.tls_cert_file or None,
        tls_key_file=cfg.tls_key_file or None,
        audit_logger=audit,
    )
    data = LongbowFlightServer(
        store,
        f"grpc://{cfg.host}:{cfg.data_port}",
        middleware_chain=middleware,
        cluster=cluster,
        ingest_queue=ingest_queue,
        coalescer=coalescer,
        **sec,
    )
    meta = LongbowFlightServer(
        store,
        f"grpc://{cfg.host}:{cfg.meta_port}",
        middleware_chain=middleware,
        cluster=cluster,
        ingest_queue=ingest_queue,
        coalescer=coalescer,
        **sec,
    )

    # pyarrow's FlightServerBase.serve() installs its own SIGINT/SIGTERM
    # handling and returns when a signal arrives — so the data server
    # runs on the main thread and the teardown happens after it returns
    # (a Python-level signal handler would be stomped by pyarrow's).
    meta_thread = threading.Thread(target=meta.serve, daemon=True)
    meta_thread.start()
    log.info("data on :%d, meta on :%d", cfg.data_port, cfg.meta_port)

    # host-local AF_UNIX mirrors (fast path for co-located clients:
    # loopback TCP ~0.5-0.9 GB/s vs ~1.3-1.6 GB/s over unix sockets)
    mirrors = []
    if cfg.unix_socket_dir:
        os.makedirs(cfg.unix_socket_dir, exist_ok=True)
        for srv, sock in (
            (data, "data.sock"), (meta, "meta.sock"),
        ):
            m = srv.spawn_unix_mirror(
                os.path.join(cfg.unix_socket_dir, sock)
            )
            threading.Thread(target=m.serve, daemon=True).start()
            mirrors.append(m)
        log.info("unix sockets in %s", cfg.unix_socket_dir)

        def _mirror_healer() -> None:
            # graceful-restart overlap: a PREVIOUS server instance
            # draining on the same socket dir unlinks the paths this
            # instance just bound when its gRPC listener shuts down
            # (grpc removes AF_UNIX paths at server stop). Re-bind
            # any mirror whose socket file disappeared.
            import time as _t

            while True:
                _t.sleep(5.0)
                for i, m in enumerate(list(mirrors)):
                    if os.path.exists(m.path):
                        continue
                    try:
                        m.shutdown()  # before rebinding: its stop
                        # unlinks m.path again
                    except Exception:
                        pass
                    try:
                        nm = m._primary.spawn_unix_mirror(m.path)
                        threading.Thread(
                            target=nm.serve, daemon=True
                        ).start()
                        mirrors[i] = nm
                        log.info("rebound unix socket %s", m.path)
                    except Exception as e:
                        log.warning(
                            "unix socket rebind failed (%s): %s",
                            m.path, e,
                        )

        threading.Thread(target=_mirror_healer, daemon=True).start()

    # SIGINT: pyarrow re-raises it as KeyboardInterrupt out of serve().
    # SIGTERM: pyarrow ignores it (default action kills the process),
    # so map it to the same KeyboardInterrupt path for k8s-style stops.
    import signal as _signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    _signal.signal(_signal.SIGTERM, _term)

    try:
        data.serve()  # blocks until a signal or shutdown()
    except KeyboardInterrupt:
        pass

    log.info("stopping servers")
    if degradation is not None:
        degradation.stop()
    compactor.stop()
    if coalescer is not None:
        coalescer.stop()
    if ingest_queue is not None:
        ingest_queue.close()  # drain before the final snapshot
    if cluster is not None:
        cluster.stop()
    for m in mirrors:
        m.shutdown()
    data.shutdown()
    meta.shutdown()
    meta_thread.join(timeout=5)
    # final flush + snapshot (reference: main.go:524-565)
    store.close()
    log.info("shutdown complete")
    logging.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
