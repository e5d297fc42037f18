"""TPU-resident quantized weight representation (Q4_0 / Q4_1 / Q8_0).

GGUF quantized payloads are repacked once at load time into a layout chosen
for the fused dequant+matmul Pallas kernel (ops/q4_matmul.py) and for
XLA-fused dequant, instead of ggml's AoS 18/20/34-byte block records (which
interleave scales with codes and are hostile to vector loads):

- matmul weights are stored contraction-major: logical [K, N] (in, out), so
  `y = x @ W` needs no transpose on the hot path;
- Q4 nibbles are packed *block-locally split-half*: within each 32-row block,
  byte-row j holds element j (low nibble) and element j+16 (high nibble).
  Unpacking a [Kt, N] tile is then two bit-ops and one concat along the
  sublane axis — no gathers.  Q8 codes are plain int8 [K, N] — no packing;
- scales (and Q4_1 mins) live in separate planes [K/32, N] as f32.

HBM cost is identical to ggml's (4 or 8 bits + one f16 scale / 32 weights);
only the arrangement differs.  `dequantize()` here is the bit-exact reference
for kernel parity tests.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, QK4

Array = jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scales", "mins"],
    meta_fields=["shape", "qtype"],
)
@dataclass
class QTensor:
    """Packed quantized tensor.

    qs:     Q4: uint8 [..., K//2, N]  (block-local split-half nibble packing)
            Q8: int8  [..., K, N]     (plain codes)
    scales: f32   [..., K//32, N]
    mins:   f32   [..., K//32, N] for Q4_1, else None
    shape:  logical per-tensor shape (K, N) — excludes any stacked leading
            axes (e.g. the layer axis after stacking)
    qtype:  GGMLType.Q4_0, Q4_1, or Q8_0
    """

    qs: Array
    scales: Array
    mins: Array | None
    shape: tuple[int, ...]
    qtype: GGMLType

    @property
    def logical_nbytes(self) -> int:
        k, n = self.shape
        per_block = {GGMLType.Q4_0: 18, GGMLType.Q4_1: 20, GGMLType.Q8_0: 34}[
            self.qtype
        ]
        return k // QK4 * per_block * n


# Historical name (the framework started Q4-only); same class.
Q4Tensor = QTensor


def _split_ggml_records(raw: np.ndarray, n_elements: int, qtype: GGMLType):
    """Raw ggml block records -> (q values [nb,32] uint8, d [nb], m [nb])."""
    from ..gguf.quant import unpack_nibbles

    nb = n_elements // QK4
    if qtype == GGMLType.Q4_0:
        rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)[: nb * 18]
        rec = rec.reshape(nb, 18)
        d = rec[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
        q = unpack_nibbles(rec[:, 2:])
        m = None
    elif qtype == GGMLType.Q4_1:
        rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)[: nb * 20]
        rec = rec.reshape(nb, 20)
        d = rec[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
        m = rec[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(nb)
        q = unpack_nibbles(rec[:, 4:])
    else:
        raise ValueError(f"not a Q4 type: {qtype}")
    return q, d, m


def _pack_block_local(q_kn: np.ndarray) -> np.ndarray:
    """q values [K, N] uint8 -> packed [K//2, N] with block-local split-half."""
    k, n = q_kn.shape
    blocks = q_kn.reshape(k // QK4, QK4, n)
    lo = blocks[:, : QK4 // 2, :]
    hi = blocks[:, QK4 // 2 :, :]
    return (lo | (hi << 4)).reshape(k // 2, n).astype(np.uint8)


def pack_q4_matmul(
    raw: np.ndarray, out_in_shape: tuple[int, int], qtype: GGMLType
) -> Q4Tensor:
    """GGUF Q4 payload of a [out, in] weight -> contraction-major Q4Tensor.

    Blocks in GGUF run along the `in` axis (ggml ne[0]), which becomes our
    contraction axis K after transposition — block structure is preserved.
    """
    out, inner = out_in_shape
    q, d, m = _split_ggml_records(raw, out * inner, qtype)
    # [out * in/32, 32] -> [out, in] -> [in, out] = [K, N]
    q_kn = q.reshape(out, inner).T.copy()
    scales = d.reshape(out, inner // QK4).T.copy()  # [K/32, N]
    qs = _pack_block_local(q_kn)
    mins = None if m is None else m.reshape(out, inner // QK4).T.copy()
    return Q4Tensor(
        qs=jnp.asarray(qs),
        scales=jnp.asarray(scales),
        mins=None if mins is None else jnp.asarray(mins),
        shape=(inner, out),
        qtype=qtype,
    )


def pack_q4_rows(
    raw: np.ndarray, shape: tuple[int, int], qtype: GGMLType
) -> Q4Tensor:
    """GGUF Q4 payload of a row-gathered table (e.g. [vocab, n_embd]).

    Kept row-major: qs [V, E//2] (block-local split-half along E),
    scales [V, E//32].  Used with `gather_rows`.
    """
    v, e = shape
    q, d, m = _split_ggml_records(raw, v * e, qtype)
    q_ve = q.reshape(v, e)
    # block-local split-half along the last axis
    blocks = q_ve.reshape(v, e // QK4, QK4)
    qs = (blocks[:, :, : QK4 // 2] | (blocks[:, :, QK4 // 2 :] << 4)).reshape(
        v, e // 2
    ).astype(np.uint8)
    scales = d.reshape(v, e // QK4)
    mins = None if m is None else m.reshape(v, e // QK4)
    return Q4Tensor(
        qs=jnp.asarray(qs),
        scales=jnp.asarray(scales),
        mins=None if mins is None else jnp.asarray(mins),
        shape=(v, e),
        qtype=qtype,
    )


def _split_q8_records(raw: np.ndarray, n_elements: int):
    """Raw ggml Q8_0 records -> (q codes [nb, 32] int8, d [nb] f32)."""
    nb = n_elements // QK4
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)[: nb * 34]
    rec = rec.reshape(nb, 34)
    d = rec[:, 0:2].copy().view(np.float16).astype(np.float32).reshape(nb)
    q = rec[:, 2:].copy().view(np.int8)
    return q, d


def pack_q8_matmul(raw: np.ndarray, out_in_shape: tuple[int, int]) -> QTensor:
    """GGUF Q8_0 payload of a [out, in] weight -> contraction-major QTensor.

    Codes stay plain int8 [K, N] (no nibble packing); scales [K/32, N] f32.
    """
    out, inner = out_in_shape
    q, d = _split_q8_records(raw, out * inner)
    q_kn = q.reshape(out, inner).T.copy()  # [K, N] int8
    scales = d.reshape(out, inner // QK4).T.copy()  # [K/32, N]
    return QTensor(
        qs=jnp.asarray(q_kn),
        scales=jnp.asarray(scales),
        mins=None,
        shape=(inner, out),
        qtype=GGMLType.Q8_0,
    )


def pack_q8_rows(raw: np.ndarray, shape: tuple[int, int]) -> QTensor:
    """GGUF Q8_0 payload of a row-gathered table (e.g. [vocab, n_embd]).

    Kept row-major: qs int8 [V, E], scales [V, E//32].  Used with
    `gather_rows`.
    """
    v, e = shape
    q, d = _split_q8_records(raw, v * e)
    return QTensor(
        qs=jnp.asarray(q.reshape(v, e)),
        scales=jnp.asarray(d.reshape(v, e // QK4)),
        mins=None,
        shape=(v, e),
        qtype=GGMLType.Q8_0,
    )


def _unpack_block_local(qs: Array) -> Array:
    """packed [..., K//2, N] -> int32 q values [..., K, N]."""
    *lead, half_k, n = qs.shape
    k = half_k * 2
    nb = k // QK4
    b = qs.reshape(*lead, nb, QK4 // 2, n).astype(jnp.int32)
    lo = b & 0x0F
    hi = b >> 4
    return jnp.concatenate([lo, hi], axis=-2).reshape(*lead, k, n)


def dequantize(t: QTensor, dtype=jnp.float32) -> Array:
    """QTensor -> dense array in its logical layout.

    Bit-exact reference for the Pallas kernel; also the XLA-fused
    'dequant on the fly' fallback path.
    """
    if t.qtype == GGMLType.Q8_0:
        *lead, k, n = t.qs.shape
        qf = t.qs.astype(dtype).reshape(*lead, k // QK4, QK4, n)
        scales = t.scales.reshape(*lead, k // QK4, 1, n).astype(dtype)
        return (qf * scales).reshape(*lead, k, n)
    *lead, half_k, n = t.qs.shape
    k = half_k * 2
    q = _unpack_block_local(t.qs)  # [..., K, N] int32
    qf = q.reshape(*lead, k // QK4, QK4, n).astype(dtype)
    scales = t.scales.reshape(*lead, k // QK4, 1, n).astype(dtype)
    if t.qtype == GGMLType.Q4_0:
        out = (qf - 8.0) * scales
    else:
        mins = t.mins.reshape(*lead, k // QK4, 1, n).astype(dtype)
        out = qf * scales + mins
    return out.reshape(*lead, k, n)


def gather_rows(t: QTensor, ids: Array, dtype=jnp.float32) -> Array:
    """Dequantized row gather: table [V, E] packed row-major, ids [...].

    Gathers packed codes + scales (4.5 or 8.5 bits/element of HBM traffic),
    then dequantizes only the gathered rows — the quantized analog of
    ggml_get_rows (bert.cpp:880-887).
    """
    v, e = t.shape
    if t.qtype == GGMLType.Q8_0:
        q = t.qs[ids].astype(dtype)  # [..., E]
        lead = q.shape[:-1]
        q = q.reshape(*lead, e // QK4, QK4)
        s = t.scales[ids][..., None].astype(dtype)
        return (q * s).reshape(*lead, e)
    qs = t.qs[ids]  # [..., E//2]
    scales = t.scales[ids]  # [..., E//32]
    lead = qs.shape[:-1]
    nb = e // QK4
    b = qs.reshape(*lead, nb, QK4 // 2).astype(jnp.int32)
    q = jnp.concatenate([b & 0x0F, b >> 4], axis=-1).astype(dtype)  # [..., nb, 32]
    s = scales[..., None].astype(dtype)
    if t.qtype == GGMLType.Q4_0:
        out = (q - 8.0) * s
    else:
        m = t.mins[ids][..., None].astype(dtype)
        out = q * s + m
    return out.reshape(*lead, e)
