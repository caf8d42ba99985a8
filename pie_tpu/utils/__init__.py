"""Utilities: metrics, profiling instrumentation."""

from pie_tpu.utils.metrics import Metrics, get_metrics
