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


def _apply_activation(y: Array, activation: str | None) -> Array:
    if activation is None:
        return y
    if activation == "gelu_erf":
        return jax.nn.gelu(y, approximate=False)
    if activation == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    raise ValueError(f"unknown activation {activation!r}")


def linear(
    x: Array,
    w,
    b: Array | None = None,
    *,
    q4_impl: str = "xla",
    reduce_axis: str | None = None,
    activation: str | None = None,
) -> Array:
    """y = act(x @ w (+ b)).  x: [..., K]; w: [K, N] dense or Q4Tensor;
    b: [N]; activation: None | "gelu_erf" | "gelu_tanh".

    reduce_axis: mesh axis name for manual (shard_map) row-parallelism —
    the partial product is psum'd over it BEFORE the bias is added (so the
    bias is applied exactly once).  None under GSPMD/single-device.

    On the Pallas Q4 path (no reduce_axis) bias and activation fuse into
    the matmul kernel's epilogue (ops/q4_matmul.py) — the elementwise never
    round-trips HBM.  On the XLA path they are separate ops here and XLA
    fuses them into its matmul anyway.
    """
    dtype = x.dtype
    if isinstance(w, Q4Tensor):
        if q4_impl == "pallas":
            from .q4_matmul import q4_matmul

            lead = x.shape[:-1]
            fuse = reduce_axis is None
            y = q4_matmul(
                x.reshape(-1, x.shape[-1]), w,
                bias=b if fuse else None,
                activation=activation if fuse else None,
            )
            y = y.reshape(*lead, -1)
            if fuse:
                return y.astype(dtype)
            y = y.astype(jnp.float32)
        else:
            wd = dequantize(w, dtype=dtype)
            y = jnp.matmul(x, wd, preferred_element_type=jnp.float32)
    else:
        y = jnp.matmul(x, w.astype(dtype), preferred_element_type=jnp.float32)
    if reduce_axis is not None:
        y = jax.lax.psum(y, reduce_axis)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return _apply_activation(y.astype(dtype), activation)
