"""embedding_cpp_tpu — a TPU-native text-embedding engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
rinor/embedding.cpp (a ggml-based CPU BERT embedder): GGUF model loading
(f32/f16/Q4_0/Q4_1), tokenizer.json WordPiece tokenization, a masked batched
BERT encoder with mean-pool + L2-normalize, fused Q4 dequant+matmul Pallas
kernels, continuous batching, GSPMD multi-chip sharding, serving, and an MTEB
evaluation harness.
"""

__version__ = "0.1.0"

from . import gguf  # noqa: F401


def __getattr__(name):
    # lazy: importing Engine pulls in jax; keep bare-package import cheap
    if name == "Engine":
        from .runtime.engine import Engine

        return Engine
    if name == "VectorIndex":
        from .runtime.search import VectorIndex

        return VectorIndex
    raise AttributeError(name)


__all__ = ["gguf", "Engine", "VectorIndex", "__version__"]
