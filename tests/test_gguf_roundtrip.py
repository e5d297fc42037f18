"""GGUF writer -> reader round-trip, and cross-check against the `gguf`
python package's writer when available (the same package the reference's
converter uses, convert-to-gguf.py)."""
import numpy as np
import pytest

from embedding_cpp_tpu.gguf import (
    GGMLType,
    GGUFReader,
    GGUFWriter,
    GGUFValueType,
    Keys,
    quantize_q4_0,
)


def _write_sample(path):
    w = GGUFWriter()
    w.add_string(Keys.ARCHITECTURE, "bert")
    w.add_string(Keys.NAME, "test-model")
    w.add_uint32(Keys.EMBEDDING_LENGTH, 64)
    w.add_uint32(Keys.BLOCK_COUNT, 2)
    w.add_float32(Keys.LAYER_NORM_EPS, 1e-12)
    w.add_bool("test.flag", True)
    w.add_array("tokenizer.ggml.tokens", ["[PAD]", "hello", "wörld"], GGUFValueType.STRING)
    w.add_array("tokenizer.ggml.scores", [0.0, -1.5, 2.25], GGUFValueType.FLOAT32)
    w.add_array("tokenizer.ggml.token_type", [3, 1, 1], GGUFValueType.INT32)

    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(8, 64)).astype(np.float32)
    f16 = rng.normal(size=(64, 32)).astype(np.float16)
    q4src = rng.normal(size=(16, 64)).astype(np.float32)
    w.add_tensor("a.f32", f32)
    w.add_tensor("b.f16", f16)
    w.add_tensor_raw("c.q4_0", (16, 64), GGMLType.Q4_0, quantize_q4_0(q4src))
    w.write(str(path))
    return f32, f16, q4src


def test_roundtrip(tmp_path):
    path = tmp_path / "model.gguf"
    f32, f16, q4src = _write_sample(path)

    with GGUFReader(path) as r:
        assert r.version == 2
        assert r.kv[Keys.ARCHITECTURE] == "bert"
        assert r.kv[Keys.EMBEDDING_LENGTH] == 64
        assert r.kv[Keys.LAYER_NORM_EPS] == pytest.approx(1e-12)
        assert r.kv["test.flag"] is True
        assert r.kv["tokenizer.ggml.tokens"] == ["[PAD]", "hello", "wörld"]
        np.testing.assert_allclose(
            np.asarray(r.kv["tokenizer.ggml.scores"]), [0.0, -1.5, 2.25]
        )

        assert r.tensors["a.f32"].shape == (8, 64)
        assert r.tensors["a.f32"].ggml_type == GGMLType.F32
        np.testing.assert_array_equal(r.tensor_f32("a.f32"), f32)

        assert r.tensors["b.f16"].ggml_type == GGMLType.F16
        np.testing.assert_allclose(r.tensor_f32("b.f16"), f16.astype(np.float32))

        assert r.tensors["c.q4_0"].ggml_type == GGMLType.Q4_0
        deq = r.tensor_f32("c.q4_0")
        assert deq.shape == (16, 64)
        # 4-bit round-trip: within one quantization step per block
        scale = np.abs(q4src.reshape(-1, 32)).max(axis=1, keepdims=True)
        assert np.all(np.abs(deq.reshape(-1, 32) - q4src.reshape(-1, 32)) <= scale / 8 + 1e-6)

    # alignment: every tensor payload offset must be 32-byte aligned
    with GGUFReader(path) as r:
        assert r.data_start % 32 == 0
        for info in r.tensors.values():
            assert info.offset % 32 == 0


def test_infer_file_type(tmp_path):
    path = tmp_path / "m.gguf"
    _write_sample(path)
    with GGUFReader(path) as r:
        # 1 f32 + 1 f16 + 1 q4_0 -> majority is a tie broken by count order;
        # write another f16 file to check the common case instead
        pass
    w = GGUFWriter()
    w.add_string(Keys.ARCHITECTURE, "bert")
    rng = np.random.default_rng(0)
    for i in range(3):
        w.add_tensor(f"t{i}.weight", rng.normal(size=(4, 32)).astype(np.float16))
    w.add_tensor("bias", rng.normal(size=(32,)).astype(np.float32))
    w.write(str(path))
    with GGUFReader(path) as r:
        from embedding_cpp_tpu.gguf import GGUFFileType

        assert r.infer_file_type() == GGUFFileType.MOSTLY_F16


def test_read_gguf_package_output(tmp_path):
    """Files written by the upstream `gguf` python package must parse."""
    gguf = pytest.importorskip("gguf")
    path = str(tmp_path / "upstream.gguf")
    try:
        w = gguf.GGUFWriter(path, "bert")
        w.add_uint32("bert.embedding_length", 384)
        w.add_string("general.name", "upstream")
        arr = np.arange(128, dtype=np.float32).reshape(4, 32)
        w.add_tensor("x.weight", arr)
        w.write_header_to_file()
        w.write_kv_data_to_file()
        w.write_tensors_to_file()
        w.close()
    except Exception as e:  # pragma: no cover - API drift in gguf pkg
        pytest.skip(f"gguf package API mismatch: {e}")
    with GGUFReader(path) as r:
        assert r.kv["general.architecture"] == "bert"
        assert r.kv["bert.embedding_length"] == 384
        np.testing.assert_array_equal(r.tensor_f32("x.weight"), arr)
