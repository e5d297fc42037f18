"""Linear (dense / Q4) projection dispatch.

The single entry point `linear()` hides the weight representation from the
model code: dense arrays hit the MXU directly; Q4Tensors go through either the
XLA-fused dequant path or the Pallas fused dequant+matmul kernel
(ops/q4_matmul.py).  Accumulation is always f32 (`preferred_element_type`),
bias addition is f32 — output is cast back to the activation dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .qtensor import QTensor, dequantize

Array = jax.Array


def _apply_activation(y: Array, activation: str | None) -> Array:
    if activation is None:
        return y
    if activation == "gelu_erf":
        return jax.nn.gelu(y, approximate=False)
    if activation == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    if activation == "silu":
        return jax.nn.silu(y)
    raise ValueError(f"unknown activation {activation!r}")


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float,
                out_dtype) -> Array:
    """f32 LayerNorm tail — same math as models.bert.layer_norm (kept local
    to avoid a circular import)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


def linear(
    x: Array,
    w,
    b: Array | None = None,
    *,
    q4_impl: str = "xla",
    reduce_axis: str | None = None,
    activation: str | None = None,
    residual: Array | None = None,
    ln: tuple | None = None,
    prologue_mul: Array | None = None,
) -> Array:
    """y = act((x [* prologue_mul]) @ w (+ b)) [+ residual] [-> LayerNorm].
    x: [..., K]; w: [K, N] dense or Q4Tensor; b: [N]; activation: None |
    "gelu_erf" | "gelu_tanh"; residual: [..., N] added after activation;
    ln: (scale [N], bias [N], eps) LayerNorm applied last.

    reduce_axis: mesh axis name for manual (shard_map) row-parallelism —
    the partial product is psum'd over it BEFORE the bias is added (so the
    bias is applied exactly once).  None under GSPMD/single-device.

    On the Pallas Q4 path (no reduce_axis) bias and activation fuse into
    the matmul kernel's epilogue, and `prologue_mul` ([..., K], the
    gated-FFN u*g multiplicand) into its prologue on the loaded tiles —
    as a separate op between two pallas_calls the multiply is a full
    [M, K] HBM pass nothing can fuse away (ops/q4_matmul.py).  The residual/LN tail
    deliberately composes OUTSIDE the kernel even there: fusing it in-kernel
    measured a ~5% full-forward regression on v5e (7.33 vs 6.93 ms at
    [32, 512] — the in-kernel lane-reduction LayerNorm loses to XLA's own
    add&norm fusion; q4_matmul keeps the capability for callers that want
    one dispatch).  On the XLA path everything is separate ops here and XLA
    fuses them into its matmul anyway.
    """
    dtype = x.dtype
    pm2 = (None if prologue_mul is None
           else prologue_mul.reshape(-1, prologue_mul.shape[-1]))
    if isinstance(w, QTensor):
        if q4_impl == "pallas":
            from .q4_matmul import q4_matmul

            lead = x.shape[:-1]
            fuse = reduce_axis is None
            if fuse:
                y = q4_matmul(
                    x.reshape(-1, x.shape[-1]), w,
                    bias=b, activation=activation, prologue_mul=pm2,
                )
                y = y.reshape(*lead, -1).astype(dtype)
                if residual is not None:
                    y = y + residual
                if ln is not None:
                    y = _layer_norm(y, ln[0], ln[1], ln[2], dtype)
                return y
            # row-parallel (psum follows): keep the f32 accumulator — a
            # bf16 round here would degrade the cross-device sum
            y = q4_matmul(x.reshape(-1, x.shape[-1]), w, out_f32=True,
                          prologue_mul=pm2)
            y = y.reshape(*lead, -1)
        else:
            wd = dequantize(w, dtype=dtype)
            xx = x if prologue_mul is None else x * prologue_mul
            y = jnp.matmul(xx, wd, preferred_element_type=jnp.float32)
    else:
        xx = x if prologue_mul is None else x * prologue_mul
        y = jnp.matmul(xx, w.astype(dtype),
                       preferred_element_type=jnp.float32)
    if reduce_axis is not None:
        y = jax.lax.psum(y, reduce_axis)
    if b is not None:
        y = y + b.astype(jnp.float32)
    y = _apply_activation(y.astype(dtype), activation)
    # composed tail mirrors the historical bert.py order exactly (residual
    # added in the activation dtype, LN in f32) so the XLA path's numerics
    # are unchanged
    if residual is not None:
        y = y + residual
    if ln is not None:
        y = _layer_norm(y, ln[0], ln[1], ln[2], dtype)
    return y
