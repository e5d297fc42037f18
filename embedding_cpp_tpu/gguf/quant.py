"""Q4_0 / Q4_1 / Q8_0 block codecs, vectorized with numpy.

Reproduces the *math* of ggml's reference codecs (the deterministic block
format consumed by the reference engine's fused dequant-dot kernels — see
/root/reference/bert.cpp:1236-1311 for the dequant path and bert.cpp:1487-1534
for the quantize path) without any ggml code:

Q4_0 (18 bytes / 32 elems):  f16 d;  uint8 qs[16]
    d  = x[argmax |x|] / -8                 (sign-preserving "max")
    q  = min(15, floor(x/d + 8.5))          value = (q - 8) * d
Q4_1 (20 bytes / 32 elems):  f16 d;  f16 m;  uint8 qs[16]
    m  = min(x);  d = (max(x) - min(x)) / 15
    q  = min(15, floor((x - m)/d + 0.5))    value = q * d + m
Q8_0 (34 bytes / 32 elems):  f16 d;  int8 qs[32]
    d  = max(|x|) / 127
    q  = roundf(x/d)  (half away from zero) value = q * d
    (Q8_0 is our extension beyond the reference's four ftypes — same block
    layout ggml uses, so files interop with other GGUF tooling.)

Nibble packing (Q4): byte j of a block holds element j in the low nibble and
element j+16 in the high nibble.

Scales are computed in f32 and *stored* as f16 (quantization uses the f32
value, dequantization the f16-rounded one — matching the reference pipeline).
"""
from __future__ import annotations

import numpy as np

from .constants import GGMLType, QK4, QK8

__all__ = [
    "quantize_q4_0",
    "quantize_q4_1",
    "quantize_q8_0",
    "dequantize_q4_0",
    "dequantize_q4_1",
    "dequantize_q8_0",
    "dequantize",
    "quantize",
    "unpack_nibbles",
    "pack_nibbles",
]


def _blocks(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.size % QK4:
        raise ValueError(f"size {x.size} not divisible by block size {QK4}")
    return x.reshape(-1, QK4)


def pack_nibbles(q: np.ndarray) -> np.ndarray:
    """[nb, 32] uint8 (values 0..15) -> [nb, 16] packed bytes (ggml layout)."""
    lo = q[:, : QK4 // 2]
    hi = q[:, QK4 // 2 :]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_nibbles(qs: np.ndarray) -> np.ndarray:
    """[nb, 16] packed bytes -> [nb, 32] uint8 values 0..15 (ggml layout)."""
    lo = qs & 0x0F
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=1)


def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    """f32 array (size % 32 == 0) -> raw Q4_0 bytes, one 18-byte rec/block."""
    b = _blocks(x)
    nb = b.shape[0]
    # sign-preserving absolute max per block
    idx = np.argmax(np.abs(b), axis=1)
    maxv = b[np.arange(nb), idx]
    d = maxv / -8.0
    inv = np.where(d != 0.0, np.divide(1.0, d, where=d != 0.0), 0.0)
    # x/d + 8.5 is >= 0.5, so C's truncating int cast == floor here
    q = np.minimum(np.floor(b * inv[:, None] + 8.5), 15.0).astype(np.uint8)
    out = np.empty((nb, 18), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = pack_nibbles(q)
    return out.reshape(-1)


def quantize_q4_1(x: np.ndarray) -> np.ndarray:
    """f32 array (size % 32 == 0) -> raw Q4_1 bytes, one 20-byte rec/block."""
    b = _blocks(x)
    nb = b.shape[0]
    mn = b.min(axis=1)
    mx = b.max(axis=1)
    d = (mx - mn) / 15.0
    inv = np.where(d != 0.0, np.divide(1.0, d, where=d != 0.0), 0.0)
    q = np.minimum(np.floor((b - mn[:, None]) * inv[:, None] + 0.5), 15.0)
    q = q.astype(np.uint8)
    out = np.empty((nb, 20), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = mn.astype(np.float16)[:, None].view(np.uint8)
    out[:, 4:] = pack_nibbles(q)
    return out.reshape(-1)


def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """f32 array (size % 32 == 0) -> raw Q8_0 bytes, one 34-byte rec/block."""
    b = _blocks(x)
    nb = b.shape[0]
    d = np.abs(b).max(axis=1) / 127.0
    inv = np.where(d != 0.0, np.divide(1.0, d, where=d != 0.0), 0.0)
    v = b * inv[:, None]
    # C roundf: round half away from zero (numpy rounds half to even)
    q = np.trunc(v + np.copysign(0.5, v)).astype(np.int8)
    out = np.empty((nb, 34), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def dequantize_q4_0(raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Raw Q4_0 bytes -> f32 array of n_elements."""
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    nb = n_elements // QK4
    rec = rec[: nb * 18].reshape(nb, 18)
    d = rec[:, 0:2].copy().view(np.float16).astype(np.float32)  # [nb,1]
    q = unpack_nibbles(rec[:, 2:]).astype(np.float32)
    return ((q - 8.0) * d).reshape(-1)[:n_elements].astype(np.float32)


def dequantize_q4_1(raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Raw Q4_1 bytes -> f32 array of n_elements."""
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    nb = n_elements // QK4
    rec = rec[: nb * 20].reshape(nb, 20)
    d = rec[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = rec[:, 2:4].copy().view(np.float16).astype(np.float32)
    q = unpack_nibbles(rec[:, 4:]).astype(np.float32)
    return (q * d + m).reshape(-1)[:n_elements].astype(np.float32)


def dequantize_q8_0(raw: np.ndarray, n_elements: int) -> np.ndarray:
    """Raw Q8_0 bytes -> f32 array of n_elements."""
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    nb = n_elements // QK8
    rec = rec[: nb * 34].reshape(nb, 34)
    d = rec[:, 0:2].copy().view(np.float16).astype(np.float32)  # [nb,1]
    q = rec[:, 2:].copy().view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)[:n_elements].astype(np.float32)


def quantize(x: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    """f32 array -> raw bytes of the requested type."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    if ggml_type == GGMLType.F32:
        return x.view(np.uint8).reshape(-1)
    if ggml_type == GGMLType.F16:
        return x.astype(np.float16).view(np.uint8).reshape(-1)
    if ggml_type == GGMLType.Q4_0:
        return quantize_q4_0(x)
    if ggml_type == GGMLType.Q4_1:
        return quantize_q4_1(x)
    if ggml_type == GGMLType.Q8_0:
        return quantize_q8_0(x)
    raise NotImplementedError(f"quantize to {ggml_type.name}")


def dequantize(raw: np.ndarray, ggml_type: GGMLType, n_elements: int) -> np.ndarray:
    """Raw tensor bytes of any supported type -> f32 array."""
    if ggml_type == GGMLType.F32:
        return np.frombuffer(
            np.ascontiguousarray(raw), dtype=np.float32, count=n_elements
        ).copy()
    if ggml_type == GGMLType.F16:
        return (
            np.frombuffer(np.ascontiguousarray(raw), dtype=np.float16, count=n_elements)
            .astype(np.float32)
        )
    if ggml_type == GGMLType.Q4_0:
        return dequantize_q4_0(raw, n_elements)
    if ggml_type == GGMLType.Q4_1:
        return dequantize_q4_1(raw, n_elements)
    if ggml_type == GGMLType.Q8_0:
        return dequantize_q8_0(raw, n_elements)
    raise NotImplementedError(f"dequantize from {ggml_type.name}")
