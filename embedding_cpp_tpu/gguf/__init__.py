"""GGUF model-file subsystem: constants, reader, writer, Q4 codecs."""
from .constants import (
    GGMLType,
    GGUFFileType,
    GGUFTokenType,
    GGUFValueType,
    Keys,
    QK4,
    ggml_nbytes,
)
from .quant import (
    dequantize,
    dequantize_q4_0,
    dequantize_q4_1,
    dequantize_q8_0,
    quantize,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
)
from .reader import GGUFReader, GGUFTensorInfo
from .writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFFileType",
    "GGUFTokenType",
    "GGUFValueType",
    "Keys",
    "QK4",
    "ggml_nbytes",
    "quantize",
    "dequantize",
    "quantize_q4_0",
    "quantize_q4_1",
    "quantize_q8_0",
    "dequantize_q4_0",
    "dequantize_q4_1",
    "dequantize_q8_0",
    "GGUFReader",
    "GGUFTensorInfo",
    "GGUFWriter",
]
