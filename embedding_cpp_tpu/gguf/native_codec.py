"""ctypes binding to the native C++ quant codecs (native/gguf/codec.cpp).

Optional fast path for the quantizer tool; the numpy codecs in quant.py are
the reference and must agree bit-for-bit (tested).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from .constants import GGMLType, QK4, ggml_nbytes

_TYPE_CODE = {
    GGMLType.F32: 0,
    GGMLType.F16: 1,
    GGMLType.Q4_0: 2,
    GGMLType.Q4_1: 3,
    GGMLType.Q8_0: 8,
}

_lib = None


def _find_library() -> str:
    env = os.environ.get("TPUEMBED_CODEC_LIB")
    if env in ("off", "0"):
        raise ImportError("native codec disabled via TPUEMBED_CODEC_LIB=off")
    if env and Path(env).is_file():
        return env
    root = Path(__file__).resolve().parents[2]
    cand = root / "native" / "build" / "libtpuembed_codec.so"
    if cand.is_file():
        return str(cand)
    raise ImportError("native codec library not built (run `make -C native`)")


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_find_library())
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tpuembed_quantize.restype = ctypes.c_int64
        lib.tpuembed_quantize.argtypes = [f32p, ctypes.c_int64, ctypes.c_int, u8p]
        lib.tpuembed_dequantize.restype = ctypes.c_int64
        lib.tpuembed_dequantize.argtypes = [u8p, ctypes.c_int, ctypes.c_int64, f32p]
        lib.tpuembed_requantize.restype = ctypes.c_int64
        lib.tpuembed_requantize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int64, ctypes.c_int, u8p, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def quantize(x: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    out = np.empty(ggml_nbytes(ggml_type, x.size), dtype=np.uint8)
    n = lib.tpuembed_quantize(_f32(x), x.size, _TYPE_CODE[ggml_type], _u8(out))
    if n < 0:
        raise ValueError(f"native quantize failed (n={x.size}, {ggml_type})")
    return out


def dequantize(raw: np.ndarray, ggml_type: GGMLType, n_elements: int) -> np.ndarray:
    lib = _load()
    raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    need = ggml_nbytes(ggml_type, n_elements)
    if raw.size < need:
        # the C side takes no length and would read out of bounds
        raise ValueError(
            f"raw buffer too small for {n_elements} {ggml_type.name} "
            f"elements: {raw.size} < {need} bytes"
        )
    out = np.empty(n_elements, dtype=np.float32)
    n = lib.tpuembed_dequantize(_u8(raw), _TYPE_CODE[ggml_type], n_elements, _f32(out))
    if n < 0:
        raise ValueError(f"native dequantize failed ({ggml_type})")
    return out


def requantize(
    raw: np.ndarray,
    src_type: GGMLType,
    n_elements: int,
    dst_type: GGMLType,
    n_threads: int | None = None,
) -> np.ndarray:
    """Multithreaded src_type -> dst_type tensor conversion."""
    lib = _load()
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    need = ggml_nbytes(src_type, n_elements)
    if raw.size < need:
        raise ValueError(
            f"raw buffer too small for {n_elements} {src_type.name} "
            f"elements: {raw.size} < {need} bytes"
        )
    out = np.empty(ggml_nbytes(dst_type, n_elements), dtype=np.uint8)
    n = lib.tpuembed_requantize(
        _u8(raw), _TYPE_CODE[src_type], n_elements, _TYPE_CODE[dst_type],
        _u8(out), n_threads,
    )
    if n < 0:
        raise ValueError("native requantize failed")
    return out
