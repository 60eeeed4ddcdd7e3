from .metrics import MetricsCollector, create_metrics_collector  # noqa: F401
