"""Host runtime: engine, batching, serving."""
from .engine import Engine

__all__ = ["Engine"]
