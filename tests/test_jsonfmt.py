"""Native JSON embedding renderer (utils/jsonfmt.py + native/jsonfmt/).

The HTTP float mode embeds every f32 as a JSON number; the native
std::to_chars renderer must produce output that parses back bit-identical
as float32 and is interchangeable with the pure-Python fallback.
"""
import json

import numpy as np
import pytest

from embedding_cpp_tpu.utils import jsonfmt


def _parsed(blob: bytes):
    data = json.loads(blob)
    return data, np.array([d["embedding"] for d in data], np.float32)


def test_python_fallback_shape_and_fields():
    v = np.arange(6, dtype=np.float32).reshape(2, 3) / 7
    data, back = _parsed(jsonfmt._py_embedding_data(v, index_base=3))
    assert [d["index"] for d in data] == [3, 4]
    assert all(d["object"] == "embedding" for d in data)
    np.testing.assert_array_equal(back, v)


@pytest.mark.skipif(not jsonfmt.available(), reason="native lib not built")
def test_native_roundtrip_bit_identical():
    rng = np.random.default_rng(0)
    # mix of magnitudes incl. subnormal-adjacent and huge values
    v = (rng.standard_normal((64, 96)) *
         10.0 ** rng.integers(-30, 30, (64, 96))).astype(np.float32)
    data, back = _parsed(jsonfmt.embedding_data_json(v, index_base=11))
    assert [d["index"] for d in data] == list(range(11, 75))
    np.testing.assert_array_equal(back, v)


@pytest.mark.skipif(not jsonfmt.available(), reason="native lib not built")
def test_native_matches_python_as_f32():
    """to_chars renders shortest-f32, Python renders the f64 widening —
    textually different, bit-identical once parsed as float32."""
    rng = np.random.default_rng(1)
    v = rng.standard_normal((8, 17)).astype(np.float32)
    _, a = _parsed(jsonfmt._py_embedding_data(v, 5))
    _, b = _parsed(jsonfmt.embedding_data_json(v, 5))
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not jsonfmt.available(), reason="native lib not built")
def test_non_finite_values_render_as_null():
    """JSON has no Inf/NaN tokens; defensive nulls keep output parseable
    (strict parsers reject json.dumps's -Infinity)."""
    s = np.array([[np.inf, -np.inf, np.nan, 1.5]], np.float32)
    data, _unused = json.loads(jsonfmt.embedding_data_json(s)), None
    assert data[0]["embedding"] == [None, None, None, 1.5]


def test_flt_max_is_finite_and_renders():
    """Regression: the finiteness guard must be std::isfinite, not a
    magnitude threshold — FLT_MAX is a finite float and must render as a
    number (the old 3.4e38 cutoff nulled it)."""
    m = np.finfo(np.float32).max
    s = np.array([[m, -m, 1.0]], np.float32)
    row = json.loads(jsonfmt.embedding_data_json(s))[0]["embedding"]
    assert row[2] == 1.0
    assert row[0] is not None and np.float32(row[0]) == m
    assert row[1] is not None and np.float32(row[1]) == -m


def test_rejects_non_matrix():
    with pytest.raises(ValueError):
        jsonfmt.embedding_data_json(np.zeros(3, np.float32))


@pytest.mark.skipif(not jsonfmt.available(), reason="native lib not built")
def test_worst_case_widths_no_overflow():
    """Regression: 20-digit index values + maximal float widths must fit
    the cap formula (an undersized cap was a reproduced heap overflow —
    the C side's only bound check is the same formula up front)."""
    v = np.full((200, 4), np.float32(-1.26542145e-11))
    blob = jsonfmt.embedding_data_json(v, index_base=-(2**63))
    data = json.loads(blob)
    assert data[0]["index"] == -(2**63)
    back = np.array([d["embedding"] for d in data], np.float32)
    np.testing.assert_array_equal(back, v)
    # and the densest-float corner: subnormal-adjacent negatives
    v2 = np.full((64, 33), np.float32(-1.17549435e-38))
    data2, _ = json.loads(jsonfmt.embedding_data_json(v2, 2**62)), None
    assert len(data2) == 64 and len(data2[0]["embedding"]) == 33
