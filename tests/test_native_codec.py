"""Native C++ codecs must be bit-exact with the numpy reference codecs."""
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from embedding_cpp_tpu.gguf import GGMLType, dequantize, quantize

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def nc():
    from embedding_cpp_tpu.gguf import native_codec

    if not native_codec.available():
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        r = subprocess.run(
            ["make", "-C", str(ROOT / "native")], capture_output=True, text=True
        )
        if r.returncode != 0:
            pytest.fail(f"native build failed:\n{r.stderr}")
    assert native_codec.available()
    return native_codec


@pytest.mark.parametrize(
    "qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0, GGMLType.F16]
)
@pytest.mark.parametrize("scale", [1e-6, 1.0, 1e4])
def test_encode_decode_bit_exact(nc, qtype, scale):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=1 << 14) * scale).astype(np.float32)
    a = quantize(x, qtype)
    b = nc.quantize(x, qtype)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        dequantize(a, qtype, x.size), nc.dequantize(b, qtype, x.size)
    )


def test_requantize_matches_two_step(nc):
    rng = np.random.default_rng(1)
    x = rng.normal(size=1 << 14).astype(np.float32)
    f16 = quantize(x, GGMLType.F16)
    expected = quantize(dequantize(f16, GGMLType.F16, x.size), GGMLType.Q4_0)
    got = nc.requantize(f16, GGMLType.F16, x.size, GGMLType.Q4_0, n_threads=4)
    np.testing.assert_array_equal(expected, got)


def test_requantize_q4_to_q8(nc):
    rng = np.random.default_rng(3)
    x = rng.normal(size=1 << 12).astype(np.float32)
    q4 = quantize(x, GGMLType.Q4_0)
    expected = quantize(dequantize(q4, GGMLType.Q4_0, x.size), GGMLType.Q8_0)
    got = nc.requantize(q4, GGMLType.Q4_0, x.size, GGMLType.Q8_0, n_threads=2)
    np.testing.assert_array_equal(expected, got)


def test_special_values(nc):
    # zeros, infs collapse safely, f16 subnormals round-trip
    x = np.zeros(64, np.float32)
    np.testing.assert_array_equal(
        quantize(x, GGMLType.Q4_0), nc.quantize(x, GGMLType.Q4_0)
    )
    tiny = (np.random.default_rng(2).normal(size=256) * 1e-7).astype(np.float32)
    np.testing.assert_array_equal(
        quantize(tiny, GGMLType.F16), nc.quantize(tiny, GGMLType.F16)
    )


def test_unaligned_rejected(nc):
    with pytest.raises(ValueError):
        nc.quantize(np.zeros(33, np.float32), GGMLType.Q4_0)


def test_short_buffer_rejected():
    """The C codec takes no buffer length — the wrapper must reject short
    payloads instead of letting the native side read out of bounds."""
    import numpy as np
    import pytest

    from embedding_cpp_tpu.gguf import GGMLType
    from embedding_cpp_tpu.gguf import native_codec

    if not native_codec.available():
        pytest.skip("native codec not built")
    short = np.zeros(10, np.uint8)  # far less than 18 bytes/block
    with pytest.raises(ValueError, match="too small"):
        native_codec.dequantize(short, GGMLType.Q4_0, 64)
    with pytest.raises(ValueError, match="too small"):
        native_codec.requantize(short, GGMLType.Q4_0, 64, GGMLType.Q4_1)
