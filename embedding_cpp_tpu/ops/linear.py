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

from .qtensor import Q4Tensor, dequantize

Array = jax.Array


def linear(
    x: Array,
    w,
    b: Array | None = None,
    *,
    q4_impl: str = "xla",
    reduce_axis: str | None = None,
) -> Array:
    """y = x @ w (+ b).  x: [..., K]; w: [K, N] dense or Q4Tensor; b: [N].

    reduce_axis: mesh axis name for manual (shard_map) row-parallelism —
    the partial product is psum'd over it BEFORE the bias is added (so the
    bias is applied exactly once).  None under GSPMD/single-device.
    """
    dtype = x.dtype
    if isinstance(w, Q4Tensor):
        if q4_impl == "pallas":
            from .q4_matmul import q4_matmul

            lead = x.shape[:-1]
            y = q4_matmul(x.reshape(-1, x.shape[-1]), w)
            y = y.reshape(*lead, -1).astype(jnp.float32)
        else:
            wd = dequantize(w, dtype=dtype)
            y = jnp.matmul(x, wd, preferred_element_type=jnp.float32)
    else:
        y = jnp.matmul(x, w.astype(dtype), preferred_element_type=jnp.float32)
    if reduce_axis is not None:
        y = jax.lax.psum(y, reduce_axis)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dtype)
