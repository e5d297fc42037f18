"""TPU compute ops: Q4 tensors, linear dispatch, Pallas kernels."""
from .linear import linear
from .qtensor import Q4Tensor, dequantize, gather_rows, pack_q4_matmul, pack_q4_rows

__all__ = [
    "linear",
    "Q4Tensor",
    "dequantize",
    "gather_rows",
    "pack_q4_matmul",
    "pack_q4_rows",
]
