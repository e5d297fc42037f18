"""Fused quantized dequant + matmul Pallas TPU kernel (Q4_0 / Q4_1 / Q8_0).

The TPU analog of ggml's fused quantized dequant-dot CPU kernels (the hot
loop of the reference, bert.cpp:1080 via ggml's vec_dot_q4_0): weights stay
packed 4- or 8-bit in HBM; codes are unpacked and scaled in VMEM and fed
straight to the MXU — HBM weight traffic is 4.5 or 8.5 bits/element instead
of 16/32.

Layout contract (ops/qtensor.py): Q4 qs uint8 [K/2, N] with block-local
split-half packing (within each 32-row block, byte-row j holds elements j and
j+16); Q8 qs int8 [K, N] plain.  scales/mins f32 [K/32, N].  Unpacking a Q4
tile is therefore just bit-ops + one sublane-axis concat — no gathers, any K
tile multiple of 32; a Q8 tile is one convert + scale multiply.  The kernels
branch on the (trace-time) qs dtype, so both formats share one code path.

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
    """Q4: qs [Kt/2, TN] uint8; Q8: qs [Kt, TN] int8 (dtype picks the path).
    scales/mins [Kt/32, TN] -> w [Kt, TN]."""
    if qs.dtype == jnp.int8:  # Q8_0: plain codes, one convert + scale
        kt, tn = qs.shape
        nb = kt // QK4
        q = qs.reshape(nb, QK4, tn).astype(jnp.float32)
        w = q * scales.reshape(nb, 1, tn)
        return w.reshape(kt, tn).astype(compute_dtype)
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


def _erf_poly(x: Array) -> Array:
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no erf lowering (NotImplementedError on real TPU — invisible
    under interpret=True, which is exactly the CLAUDE.md tiling-landmine
    class), so the in-kernel exact-GELU path builds erf from exp, which
    Mosaic does support."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0.0, -y, y)


def _epilogue(y: Array, bias, activation: str | None,
              in_kernel: bool = True, residual=None,
              ln_scale=None, ln_bias=None, ln_eps: float = 0.0) -> Array:
    """Fused matmul epilogue, computed in f32 (y: [TM, TN] f32).

    This is the piece XLA fuses into its matmul for free and a pallas_call
    otherwise forfeits (the r2 adjudication's stated bar for flipping the
    production default — benchmarks/results/q4_kernel_analysis.md): bias
    add, GELU, residual add, and the LayerNorm tail ride the dot's VMEM
    tile instead of separate HBM passes.  LayerNorm requires the FULL row
    in the tile (the 1-D kernel's layout); the math matches
    models.bert.layer_norm (f32 mean/var/rsqrt)."""
    if bias is not None:
        y = y + bias
    if activation == "gelu_erf":
        # jax.nn.gelu(approximate=False): 0.5 x (1 + erf(x/sqrt(2)))
        erf = _erf_poly if in_kernel else jax.lax.erf
        y = 0.5 * y * (1.0 + erf(y * (2.0**-0.5)))
    elif activation == "gelu_tanh":
        # ggml_gelu's tanh approximation
        c = (2.0 / 3.141592653589793) ** 0.5
        y = 0.5 * y * (1.0 + jnp.tanh(c * (y + 0.044715 * y * y * y)))
    elif activation == "silu":
        # x * sigmoid(x) — exp-based, no erf lowering issue in Mosaic
        y = y / (1.0 + jnp.exp(-y))
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    if residual is not None:
        y = y + residual
    if ln_scale is not None:
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + ln_eps)
        y = y * ln_scale + ln_bias
    return y


@functools.partial(
    jax.jit, static_argnames=("tm", "activation", "ln_eps", "out_f32")
)
def _q4_matmul_1d(
    x: Array, qs: Array, scales: Array, mins: Array | None,
    bias: Array | None = None, residual: Array | None = None,
    ln_sb: Array | None = None, prologue_mul: Array | None = None, *,
    tm: int, activation: str | None = None,
    ln_eps: float = 0.0, out_f32: bool = False
) -> Array:
    """1-D grid over M; full weight dequantized into VMEM scratch once.

    `residual` ([M, N], added in f32 after bias/activation) and `ln_sb`
    (LayerNorm scale+bias stacked [2, N] f32, applied last with `ln_eps`)
    extend the fused epilogue — valid here because each tile holds FULL
    rows, so the LN row statistics are complete.  `prologue_mul` ([M, K])
    multiplies elementwise into x on the LOADED tiles before the dot — the
    gated-FFN pattern (GeGLU/SwiGLU down-projection of u * g): as a
    separate XLA op between two pallas_calls the multiply costs a full
    [M, K] HBM read+write pass that nothing can fuse away (the same
    asymmetry as the r2 epilogue analysis, on the input side)."""
    m, k = x.shape
    qk_rows, n = qs.shape  # K/2 packed (Q4) or K plain (Q8)
    grid = (m // tm,)
    compute_dtype = x.dtype

    in_specs = [
        pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((qk_rows, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // QK4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, qs, scales]
    if mins is not None:
        in_specs.append(
            pl.BlockSpec((k // QK4, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mins)
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32).reshape(1, n))
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    if ln_sb is not None:
        in_specs.append(
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(ln_sb)
    if prologue_mul is not None:
        in_specs.append(
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(prologue_mul)

    def kernel(*refs):
        refs = list(refs)
        x_ref, qs_ref, s_ref = refs[:3]
        pos = 3
        m_ref = None
        if mins is not None:
            m_ref = refs[pos]
            pos += 1
        bias_ref = None
        if bias is not None:
            bias_ref = refs[pos]
            pos += 1
        res_ref = None
        if residual is not None:
            res_ref = refs[pos]
            pos += 1
        ln_ref = None
        if ln_sb is not None:
            ln_ref = refs[pos]
            pos += 1
        g_ref = None
        if prologue_mul is not None:
            g_ref = refs[pos]
            pos += 1
        o_ref, w_scratch = refs[pos], refs[pos + 1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            w_scratch[:] = _dequant_tile(
                qs_ref[:], s_ref[:], None if m_ref is None else m_ref[:],
                compute_dtype,
            )

        xx = x_ref[:] if g_ref is None else x_ref[:] * g_ref[:]
        y = jnp.dot(
            xx, w_scratch[:], preferred_element_type=jnp.float32
        )
        b = None if bias_ref is None else bias_ref[0][None, :]
        res = None if res_ref is None else res_ref[:].astype(jnp.float32)
        ls = lb = None
        if ln_ref is not None:
            ls = ln_ref[0][None, :]
            lb = ln_ref[1][None, :]
        o_ref[:] = _epilogue(
            y, b, activation, residual=res,
            ln_scale=ls, ln_bias=lb, ln_eps=ln_eps,
        ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (m, n), jnp.float32 if out_f32 else x.dtype
        ),
        scratch_shapes=[pltpu.VMEM((k, n), compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize
            + qk_rows * n
            + (k // QK4) * n * 4
            + m * n * x.dtype.itemsize,
            transcendentals=m * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # epilogue f32 temporaries (GELU chain) can push the stack past
            # Mosaic's conservative 16M default; v5e has 128M physical
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "activation", "out_f32")
)
def _q4_matmul_2d(
    x: Array, qs: Array, scales: Array, mins: Array | None,
    bias: Array | None = None, prologue_mul: Array | None = None, *,
    tm: int, tn: int,
    activation: str | None = None, out_f32: bool = False
) -> Array:
    m, k = x.shape
    qk_rows, n = qs.shape  # K/2 packed (Q4) or K plain (Q8)
    grid = (n // tn, m // tm)
    compute_dtype = x.dtype

    in_specs = [
        pl.BlockSpec((tm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((qk_rows, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // QK4, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, qs, scales]
    if mins is not None:
        in_specs.append(
            pl.BlockSpec((k // QK4, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(mins)
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32).reshape(1, n))
    if prologue_mul is not None:
        in_specs.append(
            pl.BlockSpec((tm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(prologue_mul)

    def kernel(*refs):
        refs = list(refs)
        x_ref, qs_ref, s_ref = refs[:3]
        pos = 3
        m_ref = None
        if mins is not None:
            m_ref = refs[pos]
            pos += 1
        bias_ref = None
        if bias is not None:
            bias_ref = refs[pos]
            pos += 1
        g_ref = None
        if prologue_mul is not None:
            g_ref = refs[pos]
            pos += 1
        o_ref, w_scratch = refs[pos], refs[pos + 1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            w_scratch[:] = _dequant_tile(
                qs_ref[:], s_ref[:], None if m_ref is None else m_ref[:],
                compute_dtype,
            )

        xx = x_ref[:] if g_ref is None else x_ref[:] * g_ref[:]
        y = jnp.dot(
            xx, w_scratch[:], preferred_element_type=jnp.float32
        )
        b = None if bias_ref is None else bias_ref[0][None, :]
        o_ref[:] = _epilogue(y, b, activation).astype(o_ref.dtype)

    flops = 2 * m * n * k
    bytes_accessed = (
        m * k * x.dtype.itemsize + qk_rows * n + (k // QK4) * n * 4 + m * n * 4
    )
    interpret = jax.devices()[0].platform != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (m, n), jnp.float32 if out_f32 else x.dtype
        ),
        scratch_shapes=[pltpu.VMEM((k, tn), compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=m * n if activation else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def q4_matmul(
    x: Array, w: Q4Tensor, bias: Array | None = None,
    activation: str | None = None, residual: Array | None = None,
    ln: tuple | None = None, out_f32: bool = False,
    prologue_mul: Array | None = None,
) -> Array:
    """x [M, K] @ packed-quantized w [K, N] (+ epilogue) -> [M, N] in x.dtype.
    (Exceptions returning the f32 accumulator unrounded: `out_f32=True` —
    the shard_map row-parallel caller psums the partial product across
    devices BEFORE any cast, and a bf16 round here would degrade the
    cross-device sum — and a raw product on a shape the kernel does not
    tile, which falls back to XLA.)

    Fused: 4-bit weights are dequantized in VMEM, never materialized in HBM.
    The epilogue runs in f32 on the VMEM output tile, in order: `bias`
    ([N]), `activation` (None | "gelu_erf" | "gelu_tanh"), `residual`
    ([M, N] add), `ln` ((scale [N], bias [N], eps) LayerNorm tail) — the
    fusion XLA's matmul gets for free, which the r2 adjudication identified
    as the bar for the Pallas path (benchmarks/results/q4_kernel_analysis.md).
    The epilogue semantics are guaranteed on every path: shapes the 1-D
    kernel does not tile compose the same f32 math via XLA (the LN tail
    needs full rows, which only the 1-D kernel's tiles have).
    """
    if w.qtype not in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0):
        raise ValueError(f"not a quantized tensor: {w.qtype}")
    m, k = x.shape
    qk_rows, n = w.qs.shape
    is_q8 = w.qtype == GGMLType.Q8_0
    assert k == (qk_rows if is_q8 else qk_rows * 2), (x.shape, w.qs.shape)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    itemsize = x.dtype.itemsize

    def _tail(y32: Array) -> Array:
        """Residual+LN composed via XLA (f32), for paths that could not
        fuse them in-kernel."""
        return _epilogue(
            y32, None, None, in_kernel=False,
            residual=None if residual is None
            else residual.astype(jnp.float32),
            ln_scale=None if ln is None else ln[0].astype(jnp.float32),
            ln_bias=None if ln is None else ln[1].astype(jnp.float32),
            ln_eps=0.0 if ln is None else float(ln[2]),
        ).astype(x.dtype)

    no_epilogue = (
        bias is None and activation is None
        and residual is None and ln is None
    )

    def xla_fallback() -> Array:
        from .qtensor import dequantize

        wd = dequantize(w, dtype=x.dtype)
        xx = x if prologue_mul is None else x * prologue_mul
        y = jnp.matmul(xx, wd, preferred_element_type=jnp.float32)
        if no_epilogue:
            # raw product: keep the f32 accumulator (pre-epilogue contract;
            # the shard_map row-parallel path psums this BEFORE any cast —
            # rounding to bf16 here would degrade the cross-device sum)
            return y
        y = _epilogue(
            y, None if bias is None else bias.astype(jnp.float32)[None, :],
            activation, in_kernel=False,
        )
        return _tail(y)

    def vmem_est(tm: int) -> int:
        # VMEM for the 1-D (full-weight-resident) kernel, x2 buffered
        return (
            k * n * itemsize  # dequantized weight scratch
            + 2 * tm * (k + n) * itemsize  # double-buffered x and out tiles
            + (2 * tm * n * itemsize if residual is not None else 0)
            + (2 * tm * k * itemsize if prologue_mul is not None else 0)
            + qk_rows * n  # packed codes (nibbles or int8)
            + (k // QK4) * n * 4 * (2 if w.mins is not None else 1)
        )

    candidates = tuple(
        c for c in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
        if c <= m and m % c == 0 and c % sublane == 0
    )
    if not candidates or k % QK4 or n % 128:
        return xla_fallback()

    # largest M tile that fits VMEM: fewer grid steps amortize the per-tile
    # pipeline overhead (tm=1024 measured 181 TF/s for the FFN pair at M=32k
    # vs 512's ~176; benchmarks/results/q4_kernel_analysis.md)
    tm = next((c for c in candidates if vmem_est(c) <= 12 * 1024 * 1024), 0)
    if tm:
        ln_sb = None
        if ln is not None:
            ln_sb = jnp.stack(
                [ln[0].astype(jnp.float32), ln[1].astype(jnp.float32)]
            )
        return _q4_matmul_1d(
            x, w.qs, w.scales, w.mins, bias, residual, ln_sb, prologue_mul,
            tm=tm,
            activation=activation, ln_eps=0.0 if ln is None else float(ln[2]),
            out_f32=out_f32,
        )
    if residual is not None or ln is not None:
        # the 2-D (N-tiled) kernel holds partial rows, so the LN tail would
        # have to run on its x.dtype-rounded output — path-dependent
        # numerics vs the 1-D kernel's f32 epilogue.  Full-f32 XLA math
        # instead (these shapes are rare: weights too large for VMEM).
        return xla_fallback()
    tn = _pick_tile(n, (512, 384, 256, 128))
    if n % tn:
        return xla_fallback()
    tm2 = _pick_tile(m, (256, 128, 64, 32, 16, 8))
    return _q4_matmul_2d(x, w.qs, w.scales, w.mins, bias, prologue_mul,
                         tm=tm2, tn=tn,
                         activation=activation, out_f32=out_f32)
