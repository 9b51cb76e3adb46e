from longbow_tpu.metrics.registry import MetricsRegistry, get_registry  # noqa: F401
