"""Fused Q4 dequant+matmul kernel vs the reference dequant path.

On CPU the kernel runs in Pallas interpret mode; on TPU it compiles for real.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from embedding_cpp_tpu.gguf import (
    GGMLType,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
)
from embedding_cpp_tpu.ops.q4_matmul import q4_matmul
from embedding_cpp_tpu.ops.qtensor import dequantize, pack_q4_matmul


def _make(qtype, out, inner, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(out, inner)).astype(np.float32)
    if qtype == GGMLType.Q8_0:
        from embedding_cpp_tpu.ops.qtensor import pack_q8_matmul

        return pack_q8_matmul(quantize_q8_0(w), (out, inner))
    raw = quantize_q4_0(w) if qtype == GGMLType.Q4_0 else quantize_q4_1(w)
    return pack_q4_matmul(raw, (out, inner), qtype)


@pytest.mark.parametrize(
    "qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0]
)
@pytest.mark.parametrize("m,k,n", [(64, 384, 384), (128, 384, 1536), (32, 1536, 384)])
def test_matches_dequant_path(qtype, m, k, n):
    qt = _make(qtype, n, k)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    expected = np.asarray(x @ dequantize(qt, dtype=jnp.float32))
    got = np.asarray(q4_matmul(x, qt))
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)


def test_out_f32_keeps_accumulator_precision():
    """out_f32=True (the row-parallel pre-psum contract) must return the
    unrounded f32 accumulator from the kernel path — matching the dequant
    reference far tighter than a bf16-rounded output could."""
    qt = _make(GGMLType.Q4_0, 384, 384)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(64, 384)), dtype=jnp.bfloat16)
    y = q4_matmul(x, qt, out_f32=True)
    assert y.dtype == jnp.float32
    ref = jnp.matmul(x, dequantize(qt, dtype=jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    # same math, possibly different accumulation order (cf.
    # test_bf16_activation); the point under test is the unrounded f32
    # output dtype on the KERNEL path, not bitwise agreement
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=0.5, rtol=2e-2)
    # f32 output must at least refine the bf16-rounded default: rounding y
    # to bf16 reproduces the default output exactly
    y_bf = np.asarray(q4_matmul(x, qt))
    np.testing.assert_array_equal(
        np.asarray(y.astype(jnp.bfloat16)), y_bf
    )


def test_bf16_activation():
    qt = _make(GGMLType.Q4_0, 384, 384)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 384)), dtype=jnp.bfloat16)
    expected = np.asarray(
        jnp.matmul(x, dequantize(qt, dtype=jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    )
    got = np.asarray(q4_matmul(x, qt))
    # same math, possibly different accumulation order
    np.testing.assert_allclose(got, expected, atol=0.5, rtol=2e-2)


@pytest.mark.parametrize(
    "qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0]
)
@pytest.mark.parametrize("activation", [None, "gelu_erf", "gelu_tanh"])
def test_fused_bias_activation_epilogue(qtype, activation):
    """bias + GELU computed in the kernel epilogue == the composed XLA ops
    (the r2 adjudication's bar for the Pallas path: q4_kernel_analysis.md)."""
    import jax

    qt = _make(qtype, 384, 384)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    ref = x @ dequantize(qt, dtype=jnp.float32) + bias
    if activation == "gelu_erf":
        ref = jax.nn.gelu(ref, approximate=False)
    elif activation == "gelu_tanh":
        ref = jax.nn.gelu(ref, approximate=True)
    got = np.asarray(q4_matmul(x, qt, bias=bias, activation=activation))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_fused_epilogue_2d_grid_path():
    """Epilogue on the 2-D (N-tiled) kernel: a weight too large for the
    full-resident VMEM budget tiles over N, and the per-tile bias slices
    must line up."""
    qt = _make(GGMLType.Q4_0, 4096, 1024)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(64, 1024)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32))
    import jax

    ref = jax.nn.gelu(x @ dequantize(qt, dtype=jnp.float32) + bias,
                      approximate=False)
    got = np.asarray(q4_matmul(x, qt, bias=bias, activation="gelu_erf"))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_linear_fuses_activation_parity():
    """ops.linear with activation= on the pallas path == xla path."""
    from embedding_cpp_tpu.ops.linear import linear

    qt = _make(GGMLType.Q4_0, 1536, 384)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(32, 384)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1536,)).astype(np.float32))
    y_xla = np.asarray(linear(x, qt, b, q4_impl="xla", activation="gelu_erf"))
    y_pal = np.asarray(linear(x, qt, b, q4_impl="pallas",
                              activation="gelu_erf"))
    np.testing.assert_allclose(y_pal, y_xla, atol=2e-3, rtol=1e-4)


def test_fused_residual_layernorm_epilogue():
    """residual add + LayerNorm tail in the kernel epilogue == composed
    reference ops (the transformer add&norm pattern, fused in r3)."""
    qt = _make(GGMLType.Q4_0, 384, 384)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    lbias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    eps = 1e-12
    y = x @ dequantize(qt, dtype=jnp.float32) + bias + res
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    ref = (y - mean) / np.sqrt(np.asarray(var) + eps) * scale + lbias
    got = q4_matmul(x, qt, bias=bias, residual=res, ln=(scale, lbias, eps))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_linear_residual_ln_pallas_matches_xla():
    """ops.linear with residual+ln: pallas fused path == xla composed path
    (the encoder block uses exactly this form)."""
    from embedding_cpp_tpu.ops.linear import linear

    qt = _make(GGMLType.Q4_0, 384, 1536, seed=8)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 16, 1536)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(2, 16, 384)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    lbias = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    ln = (scale, lbias, 1e-12)
    y_xla = np.asarray(linear(x, qt, b, q4_impl="xla", residual=res, ln=ln))
    y_pal = np.asarray(linear(x, qt, b, q4_impl="pallas", residual=res, ln=ln))
    np.testing.assert_allclose(y_pal, y_xla, atol=2e-3, rtol=1e-3)


def test_odd_m_falls_back():
    qt = _make(GGMLType.Q4_0, 384, 384)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(7, 384)).astype(np.float32))
    got = np.asarray(q4_matmul(x, qt))  # fallback path, still correct
    expected = np.asarray(x @ dequantize(qt, dtype=jnp.float32))
    np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)


def test_forward_with_pallas_impl_matches_xla():
    """Full model forward with q4_impl='pallas' == q4_impl='xla'."""
    from embedding_cpp_tpu.gguf.constants import GGUFFileType
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions, bert_embed_batch, random_params

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256
    )
    params = random_params(cfg, GGUFFileType.MOSTLY_Q4_0, seed=0)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 256, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    a = np.asarray(
        bert_embed_batch(params, ids, mask, cfg, ComputeOptions(q4_impl="xla"))
    )
    b = np.asarray(
        bert_embed_batch(params, ids, mask, cfg, ComputeOptions(q4_impl="pallas"))
    )
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_prologue_mul_matches_explicit_multiply():
    """prologue_mul (the gated-FFN u*g fused into the loaded x tiles) must
    equal the explicit (x * g) @ W on every path: the 1-D kernel, the 2-D
    kernel (weights too large for the full-resident scratch), and the XLA
    fallback (unaligned shapes)."""
    rng = np.random.default_rng(11)
    # 1-D kernel path (small weight, aligned)
    qt = _make(GGMLType.Q4_0, 384, 384)
    x = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    fused = np.asarray(q4_matmul(x, qt, prologue_mul=g))
    explicit = np.asarray(q4_matmul(x * g, qt))
    np.testing.assert_allclose(fused, explicit, atol=1e-5, rtol=1e-5)
    # with the full epilogue stack riding alongside
    b = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(64, 384)).astype(np.float32))
    fused = np.asarray(q4_matmul(x, qt, bias=b, activation="gelu_erf",
                                 residual=res, prologue_mul=g))
    explicit = np.asarray(q4_matmul(x * g, qt, bias=b,
                                    activation="gelu_erf", residual=res))
    np.testing.assert_allclose(fused, explicit, atol=1e-5, rtol=1e-5)
    # XLA fallback path (n % 128 != 0)
    qt2 = _make(GGMLType.Q4_0, 320, 384)
    fused = np.asarray(q4_matmul(x, qt2, prologue_mul=g))
    explicit = np.asarray(q4_matmul(x * g, qt2))
    np.testing.assert_allclose(fused, explicit, atol=1e-5, rtol=1e-5)
