"""Q4_0/Q4_1/Q8_0 block codec tests.

Golden values are hand-derived from the codec definition (ggml's deterministic
block format, see embedding_cpp_tpu/gguf/quant.py docstring); round-trip
bounds follow from 4-bit uniform quantization.
"""
import numpy as np
import pytest

from embedding_cpp_tpu.gguf import (
    GGMLType,
    QK4,
    dequantize,
    dequantize_q4_0,
    dequantize_q4_1,
    dequantize_q8_0,
    quantize,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q8_0,
)
from embedding_cpp_tpu.gguf.quant import pack_nibbles, unpack_nibbles


def test_nibble_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(7, QK4), dtype=np.uint8)
    assert np.array_equal(unpack_nibbles(pack_nibbles(q)), q)


def test_nibble_layout_is_split_half():
    # byte j must hold element j (low nibble) and element j+16 (high nibble)
    q = np.arange(QK4, dtype=np.uint8).reshape(1, QK4) % 16
    packed = pack_nibbles(q)
    assert packed[0, 0] == (0 | ((16 % 16) << 4))
    assert packed[0, 5] == (5 | ((21 % 16) << 4))


def test_q4_0_golden_block():
    # Block = [-8, -7.5, ..., +7.5]: sign-preserving max is -8 -> d = 1.0
    x = np.arange(-8, 8, 0.5, dtype=np.float32)
    assert x.size == QK4 and np.abs(x).max() == 8.0 and x.min() == -8.0
    raw = quantize_q4_0(x)
    d = raw[0:2].copy().view(np.float16)[0]
    assert d == np.float16(1.0)
    y = dequantize_q4_0(raw, QK4)
    # q = min(15, floor(x + 8.5)) -> rounds to nearest integer, clamped at 7
    expected = np.minimum(np.floor(x + 8.5), 15) - 8
    np.testing.assert_allclose(y, expected)


def test_q4_0_scale_sign_preserved():
    # Largest-|x| element is positive -> d negative
    x = np.zeros(QK4, dtype=np.float32)
    x[3] = 4.0
    x[4] = -2.0
    raw = quantize_q4_0(x)
    d = raw[0:2].copy().view(np.float16)[0]
    assert d == np.float16(-0.5)
    y = dequantize_q4_0(raw, QK4)
    assert y[3] == pytest.approx(4.0)
    assert y[4] == pytest.approx(-2.0)
    assert y[0] == pytest.approx(0.0)


def test_q4_1_golden_block():
    x = np.linspace(2.0, 17.0, QK4, dtype=np.float32)  # min 2, max 17, d = 1
    raw = quantize_q4_1(x)
    d = raw[0:2].copy().view(np.float16)[0]
    m = raw[2:4].copy().view(np.float16)[0]
    assert d == np.float16(1.0)
    assert m == np.float16(2.0)
    y = dequantize_q4_1(raw, QK4)
    np.testing.assert_allclose(y, np.round(x - 2.0) + 2.0, atol=1e-3)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1])
def test_roundtrip_error_bound(qtype):
    rng = np.random.default_rng(42)
    x = rng.normal(size=8 * 1024).astype(np.float32)
    y = dequantize(quantize(x, qtype), qtype, x.size)
    # error per block bounded by ~d/2; d <= max|block|/8 * 2 for q4_0
    blocks = x.reshape(-1, QK4)
    scale = np.abs(blocks).max(axis=1, keepdims=True)
    err = np.abs((y.reshape(-1, QK4) - blocks))
    assert np.all(err <= scale / 8.0 + 1e-6)
    # and correlation stays high
    assert np.corrcoef(x, y)[0, 1] > 0.995


def test_zero_block():
    x = np.zeros(QK4, dtype=np.float32)
    for qtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        y = dequantize(quantize(x, qtype), qtype, QK4)
        np.testing.assert_array_equal(y, x)


def test_q8_0_golden_block():
    # Block with max|x| = 127 -> d = 1.0, every value hits its own int8 code
    x = np.arange(-16, 16, dtype=np.float32) * 127.0 / 16.0
    assert x.size == QK4 and np.abs(x).max() == 127.0
    raw = quantize_q8_0(x)
    assert raw.size == 34
    d = raw[0:2].copy().view(np.float16)[0]
    assert d == np.float16(1.0)
    q = raw[2:].copy().view(np.int8)
    # C roundf: half away from zero
    expected_q = np.trunc(x + np.copysign(0.5, x))
    np.testing.assert_array_equal(q.astype(np.float32), expected_q)
    y = dequantize_q8_0(raw, QK4)
    np.testing.assert_allclose(y, expected_q)


def test_q8_0_round_half_away_from_zero():
    # 2.5/d and -2.5/d must round to 3 / -3, not banker's 2 / -2
    x = np.zeros(QK4, dtype=np.float32)
    x[0] = 127.0  # d = 1.0 exactly
    x[1] = 2.5
    x[2] = -2.5
    raw = quantize_q8_0(x)
    q = raw[2:].copy().view(np.int8)
    assert q[1] == 3 and q[2] == -3


def test_q8_0_roundtrip_error_bound():
    rng = np.random.default_rng(42)
    x = rng.normal(size=8 * 1024).astype(np.float32)
    y = dequantize(quantize(x, GGMLType.Q8_0), GGMLType.Q8_0, x.size)
    blocks = x.reshape(-1, QK4)
    scale = np.abs(blocks).max(axis=1, keepdims=True)
    # error bounded by d/2 = max|block|/254, plus the f16-rounded scale's
    # relative error (<= 2^-11) amplified by |q| <= 127
    err = np.abs(y.reshape(-1, QK4) - blocks)
    assert np.all(err <= scale * (1 / 254.0 + 2.0**-11) + 1e-7)
    assert np.corrcoef(x, y)[0, 1] > 0.9999


def test_q8_0_zero_block():
    x = np.zeros(QK4, dtype=np.float32)
    y = dequantize(quantize(x, GGMLType.Q8_0), GGMLType.Q8_0, QK4)
    np.testing.assert_array_equal(y, x)


def test_f16_f32_passthrough():
    rng = np.random.default_rng(1)
    x = rng.normal(size=256).astype(np.float32)
    np.testing.assert_array_equal(dequantize(quantize(x, GGMLType.F32), GGMLType.F32, x.size), x)
    y = dequantize(quantize(x, GGMLType.F16), GGMLType.F16, x.size)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_quantize_idempotent_q4_0():
    # quantize(dequantize(quantize(x))) == quantize(x): grid points map to
    # themselves (within f16 scale rounding)
    rng = np.random.default_rng(7)
    x = rng.normal(size=1024).astype(np.float32)
    raw1 = quantize_q4_0(x)
    y1 = dequantize_q4_0(raw1, x.size)
    raw2 = quantize_q4_0(y1)
    y2 = dequantize_q4_0(raw2, x.size)
    np.testing.assert_allclose(y1, y2, atol=2e-2)
