"""Utilities: structured logging, metrics, profiling/roofline."""
from .logging import get_logger, log_event
from .metrics import GLOBAL as metrics, Metrics
from .profiling import Roofline, attention_roofline, q4_matmul_roofline, trace

__all__ = [
    "get_logger",
    "log_event",
    "metrics",
    "Metrics",
    "trace",
    "Roofline",
    "q4_matmul_roofline",
    "attention_roofline",
]
