"""TPU compute ops: quantized tensors, linear dispatch, Pallas kernels."""
from .linear import linear
from .qtensor import (
    Q4Tensor,
    QTensor,
    dequantize,
    gather_rows,
    pack_q4_matmul,
    pack_q4_rows,
    pack_q8_matmul,
    pack_q8_rows,
)

__all__ = [
    "linear",
    "Q4Tensor",
    "QTensor",
    "dequantize",
    "gather_rows",
    "pack_q4_matmul",
    "pack_q4_rows",
    "pack_q8_matmul",
    "pack_q8_rows",
]
