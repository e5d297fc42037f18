"""Fused Q4 dequant + matmul Pallas TPU kernel.

The TPU analog of ggml's fused Q4 dequant-dot CPU kernels (the hot loop of
the reference, bert.cpp:1080 via ggml's vec_dot_q4_0): weights stay packed
4-bit in HBM; nibbles are unpacked and scaled in VMEM and fed straight to the
MXU — HBM weight traffic is 4.5 bits/element instead of 16/32.

Layout contract (ops/qtensor.py): qs uint8 [K/2, N] with block-local
split-half packing (within each 32-row block, byte-row j holds elements j and
j+16), scales/mins f32 [K/32, N].  Unpacking a tile is therefore just
bit-ops + one sublane-axis concat — no gathers, any K tile multiple of 32.

Encoder weight matrices are small (<=768x3072 for bert-base), so the whole
dequantized weight fits VMEM: the kernel runs a 1-D grid over M tiles,
dequantizes the full [K, N] weight into VMEM scratch once (first program) and
reuses it for every M tile — x and the packed weight are each read from HBM
exactly once per matmul.  A 2-D (N_tiles, M_tiles) grid with per-N-tile
scratch is the fallback for weights too large for VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gguf.constants import GGMLType, QK4
from .qtensor import Q4Tensor

Array = jax.Array


def _pick_tile(dim: int, candidates: tuple[int, ...]) -> int:
    for c in candidates:
        if dim % c == 0 and c <= dim:
            return c
    return dim


def _dequant_tile(qs, scales, mins, compute_dtype):
    """qs [Kt/2, TN] uint8, scales/mins [Kt/32, TN] -> w [Kt, TN]."""
    half_k, tn = qs.shape
    kt = half_k * 2
    nb = kt // QK4
    b = qs.reshape(nb, QK4 // 2, tn).astype(jnp.int32)
    lo = b & 0x0F
    hi = b >> 4
    q = jnp.concatenate([lo, hi], axis=1)  # [nb, 32, TN]
    s = scales.reshape(nb, 1, tn)
    if mins is None:
        w = (q.astype(jnp.float32) - 8.0) * s
    else:
        w = q.astype(jnp.float32) * s + mins.reshape(nb, 1, tn)
    return w.reshape(kt, tn).astype(compute_dtype)


def _kernel_q4_0(x_ref, qs_ref, s_ref, o_ref, w_scratch, *, compute_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        w_scratch[:] = _dequant_tile(qs_ref[:], s_ref[:], None, compute_dtype)

    o_ref[:] = jnp.dot(
        x_ref[:], w_scratch[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _kernel_q4_1(x_ref, qs_ref, s_ref, m_ref, o_ref, w_scratch, *, compute_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _():
        w_scratch[:] = _dequant_tile(
            qs_ref[:], s_ref[:], m_ref[:], compute_dtype
        )

    o_ref[:] = jnp.dot(
        x_ref[:], w_scratch[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm",))
def _q4_matmul_1d(
    x: Array, qs: Array, scales: Array, mins: Array | None, *, tm: int
) -> Array:
    """1-D grid over M; full weight dequantized into VMEM scratch once."""
    m, k = x.shape
    n = qs.shape[-1]
    grid = (m // tm,)
    compute_dtype = x.dtype

    in_specs = [
        pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // 2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // QK4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, qs, scales]
    if mins is not None:
        in_specs.append(
            pl.BlockSpec((k // QK4, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mins)

    def kernel(*refs):
        if mins is not None:
            x_ref, qs_ref, s_ref, m_ref, o_ref, w_scratch = refs
        else:
            x_ref, qs_ref, s_ref, o_ref, w_scratch = refs
            m_ref = None

        @pl.when(pl.program_id(0) == 0)
        def _():
            w_scratch[:] = _dequant_tile(
                qs_ref[:], s_ref[:], None if m_ref is None else m_ref[:],
                compute_dtype,
            )

        o_ref[:] = jnp.dot(
            x_ref[:], w_scratch[:], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((k, n), compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize
            + (k // 2) * n
            + (k // QK4) * n * 4
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def _q4_matmul_2d(
    x: Array, qs: Array, scales: Array, mins: Array | None, *, tm: int, tn: int
) -> Array:
    m, k = x.shape
    n = qs.shape[-1]
    grid = (n // tn, m // tm)
    compute_dtype = x.dtype

    in_specs = [
        pl.BlockSpec((tm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // 2, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // QK4, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, qs, scales]
    if mins is not None:
        in_specs.append(
            pl.BlockSpec((k // QK4, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(mins)
        kernel = functools.partial(_kernel_q4_1, compute_dtype=compute_dtype)
    else:
        kernel = functools.partial(_kernel_q4_0, compute_dtype=compute_dtype)

    flops = 2 * m * n * k
    bytes_accessed = (
        m * k * x.dtype.itemsize + (k // 2) * n + (k // QK4) * n * 4 + m * n * 4
    )
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((k, tn), compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


def q4_matmul(x: Array, w: Q4Tensor) -> Array:
    """x [M, K] @ packed-Q4 w [K, N] -> f32 [M, N].

    Fused: 4-bit weights are dequantized in VMEM, never materialized in HBM.
    Falls back to the XLA dequant path for shapes the kernel does not tile.
    """
    if w.qtype not in (GGMLType.Q4_0, GGMLType.Q4_1):
        raise ValueError(f"not a Q4 tensor: {w.qtype}")
    m, k = x.shape
    k2, n = w.qs.shape
    assert k == k2 * 2, (x.shape, w.qs.shape)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    itemsize = x.dtype.itemsize

    def vmem_est(tm: int) -> int:
        # VMEM for the 1-D (full-weight-resident) kernel, x2 buffered
        return (
            k * n * itemsize  # dequantized weight scratch
            + 2 * tm * (k + n) * itemsize  # double-buffered x and out tiles
            + (k // 2) * n  # packed nibbles
            + (k // QK4) * n * 4 * (2 if w.mins is not None else 1)
        )

    candidates = tuple(
        c for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
        if c <= m and m % c == 0 and c % sublane == 0
    )
    if not candidates or k % QK4 or n % 128:
        from .qtensor import dequantize

        wd = dequantize(w, dtype=x.dtype)
        return jnp.matmul(x, wd, preferred_element_type=jnp.float32)

    # largest M tile that fits VMEM: fewer grid steps amortize the per-tile
    # pipeline overhead (tm=1024 measured 181 TF/s for the FFN pair at M=32k
    # vs 512's ~176; benchmarks/results/q4_kernel_analysis.md)
    tm = next((c for c in candidates if vmem_est(c) <= 12 * 1024 * 1024), 0)
    if tm:
        return _q4_matmul_1d(x, w.qs, w.scales, w.mins, tm=tm)
    tn = _pick_tile(n, (512, 384, 256, 128))
    if n % tn:
        from .qtensor import dequantize

        wd = dequantize(w, dtype=x.dtype)
        return jnp.matmul(x, wd, preferred_element_type=jnp.float32)
    tm2 = _pick_tile(m, (256, 128, 64, 32, 16, 8))
    return _q4_matmul_2d(x, w.qs, w.scales, w.mins, tm=tm2, tn=tn)
