"""QTensor repacking: kernel layout must dequantize bit-identically to the
ggml-layout reference decoder."""
import numpy as np
import pytest

from embedding_cpp_tpu.gguf import (
    GGMLType,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
)
from embedding_cpp_tpu.gguf.quant import dequantize as ref_dequant
from embedding_cpp_tpu.ops.qtensor import (
    dequantize,
    gather_rows,
    pack_q4_matmul,
    pack_q4_rows,
    pack_q8_matmul,
    pack_q8_rows,
)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1])
def test_matmul_layout_dequant_matches_reference(qtype):
    rng = np.random.default_rng(0)
    out, inner = 96, 64  # [out, in], blocks along in
    w = rng.normal(size=(out, inner)).astype(np.float32)
    raw = quantize_q4_0(w) if qtype == GGMLType.Q4_0 else quantize_q4_1(w)

    ref = ref_dequant(raw, qtype, out * inner).reshape(out, inner).T  # [K, N]
    qt = pack_q4_matmul(raw, (out, inner), qtype)
    got = np.asarray(dequantize(qt))
    assert got.shape == (inner, out)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1])
def test_rows_layout_gather_matches_reference(qtype):
    rng = np.random.default_rng(1)
    v, e = 50, 64
    table = rng.normal(size=(v, e)).astype(np.float32)
    raw = quantize_q4_0(table) if qtype == GGMLType.Q4_0 else quantize_q4_1(table)
    ref = ref_dequant(raw, qtype, v * e).reshape(v, e)

    qt = pack_q4_rows(raw, (v, e), qtype)
    ids = np.array([[0, 3, 49], [7, 7, 1]], dtype=np.int32)
    got = np.asarray(gather_rows(qt, ids))
    assert got.shape == (2, 3, e)
    np.testing.assert_array_equal(got, ref[ids])


def test_q8_matmul_layout_dequant_matches_reference():
    rng = np.random.default_rng(3)
    out, inner = 96, 64
    w = rng.normal(size=(out, inner)).astype(np.float32)
    raw = quantize_q8_0(w)
    ref = ref_dequant(raw, GGMLType.Q8_0, out * inner).reshape(out, inner).T
    qt = pack_q8_matmul(raw, (out, inner))
    assert qt.qs.dtype == np.int8 and qt.qs.shape == (inner, out)
    got = np.asarray(dequantize(qt))
    assert got.shape == (inner, out)
    np.testing.assert_array_equal(got, ref)


def test_q8_rows_layout_gather_matches_reference():
    rng = np.random.default_rng(4)
    v, e = 50, 64
    table = rng.normal(size=(v, e)).astype(np.float32)
    raw = quantize_q8_0(table)
    ref = ref_dequant(raw, GGMLType.Q8_0, v * e).reshape(v, e)
    qt = pack_q8_rows(raw, (v, e))
    ids = np.array([[0, 3, 49], [7, 7, 1]], dtype=np.int32)
    got = np.asarray(gather_rows(qt, ids))
    assert got.shape == (2, 3, e)
    np.testing.assert_array_equal(got, ref[ids])


def test_q8_stacked_dequant():
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.qtensor import QTensor

    rng = np.random.default_rng(5)
    tensors, denses = [], []
    for _ in range(3):
        w = rng.normal(size=(32, 64)).astype(np.float32)
        raw = quantize_q8_0(w)
        tensors.append(pack_q8_matmul(raw, (32, 64)))
        denses.append(ref_dequant(raw, GGMLType.Q8_0, 32 * 64).reshape(32, 64).T)
    stacked = QTensor(
        qs=jnp.stack([t.qs for t in tensors]),
        scales=jnp.stack([t.scales for t in tensors]),
        mins=None,
        shape=tensors[0].shape,
        qtype=GGMLType.Q8_0,
    )
    got = np.asarray(dequantize(stacked))
    np.testing.assert_array_equal(got, np.stack(denses))


def test_stacked_dequant():
    """Layer-stacked Q4Tensors (leading L axis) must dequantize per layer."""
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.qtensor import Q4Tensor

    rng = np.random.default_rng(2)
    tensors = []
    denses = []
    for _ in range(3):
        w = rng.normal(size=(32, 64)).astype(np.float32)
        raw = quantize_q4_0(w)
        tensors.append(pack_q4_matmul(raw, (32, 64), GGMLType.Q4_0))
        denses.append(ref_dequant(raw, GGMLType.Q4_0, 32 * 64).reshape(32, 64).T)
    stacked = Q4Tensor(
        qs=jnp.stack([t.qs for t in tensors]),
        scales=jnp.stack([t.scales for t in tensors]),
        mins=None,
        shape=tensors[0].shape,
        qtype=GGMLType.Q4_0,
    )
    got = np.asarray(dequantize(stacked))
    np.testing.assert_array_equal(got, np.stack(denses))
