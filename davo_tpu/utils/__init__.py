"""Utilities: structured metrics, profiling harness, logging."""

from davo_tpu.utils.metrics import MetricsLogger  # noqa: F401
from davo_tpu.utils.profiling import profile_trace, timed  # noqa: F401
