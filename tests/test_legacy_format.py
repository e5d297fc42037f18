"""Legacy pre-GGUF ggml .bin format: write, read, upgrade-to-GGUF, load.

The reference ships a converter for this format (models/convert-to-ggml.py)
but its engine only reads GGUF; here legacy files round-trip and load
directly (gguf/legacy.py)."""
import numpy as np
import pytest

from embedding_cpp_tpu.gguf.legacy import (
    LEGACY_MAGIC,
    read_legacy_bin,
    upgrade_legacy_bin,
    write_legacy_bin,
)
from embedding_cpp_tpu.models import BertConfig, random_state_dict

CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    name="tiny-test",
)


@pytest.fixture(scope="module")
def tokenizer_json():
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    return build_tokenizer_json(CFG.n_vocab)


@pytest.fixture(scope="module")
def state_dict():
    return random_state_dict(CFG, seed=0)


@pytest.mark.parametrize("ftype", ["f32", "f16"])
def test_legacy_roundtrip(tmp_path, tokenizer_json, state_dict, ftype):
    path = tmp_path / f"ggml-model-{ftype}.bin"
    write_legacy_bin(path, CFG, state_dict, tokenizer_json, ftype)
    m = read_legacy_bin(path)
    assert m.ftype == (1 if ftype == "f16" else 0)
    assert m.config.n_vocab == CFG.n_vocab
    assert m.config.n_embd == CFG.n_embd
    assert m.config.n_layer == CFG.n_layer
    assert m.config.n_ff == CFG.n_ff
    assert m.tokenizer_json == tokenizer_json
    assert len(m.vocab) == CFG.n_vocab
    # tensor payloads survive (2-D weights f16-cast when ftype=f16,
    # exactly the reference converter's policy, convert-to-ggml.py:106-110)
    for name, want in state_dict.items():
        if name in m.tensors:
            got = m.tensors[name]
            want = np.squeeze(np.asarray(want, np.float32))
            if ftype == "f16" and name.endswith(".weight") and want.ndim == 2:
                np.testing.assert_array_equal(got, want.astype(np.float16))
            else:
                np.testing.assert_array_equal(got, want)
    assert "embeddings.word_embeddings.weight" in m.tensors


def test_legacy_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"GGUF" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_legacy_bin(p)


def test_legacy_magic_value():
    assert LEGACY_MAGIC == 0x67676D6C  # 'ggml' (convert-to-ggml.py:56)


def test_upgrade_then_engine(tmp_path, tokenizer_json, state_dict):
    from embedding_cpp_tpu.gguf import GGUFReader, Keys
    from embedding_cpp_tpu.runtime.engine import Engine

    bin_path = tmp_path / "ggml-model-f16.bin"
    write_legacy_bin(bin_path, CFG, state_dict, tokenizer_json, "f16")
    gguf_path = tmp_path / "upgraded.gguf"
    upgrade_legacy_bin(bin_path, gguf_path)
    with GGUFReader(gguf_path) as r:
        assert r.kv[Keys.ARCHITECTURE] == "bert"
        assert r.kv[Keys.EMBEDDING_LENGTH] == CFG.n_embd

    # direct load of the legacy file == load of the upgraded GGUF
    e1 = Engine.from_legacy_bin(str(bin_path))
    e2 = Engine.from_gguf(str(gguf_path))
    texts = ["hello world", "a slightly longer test sentence"]
    np.testing.assert_allclose(e1.encode(texts), e2.encode(texts), atol=1e-6)


def test_upgrade_requantize(tmp_path, tokenizer_json, state_dict):
    from embedding_cpp_tpu.gguf import GGUFFileType, GGUFReader

    bin_path = tmp_path / "ggml-model-f32.bin"
    write_legacy_bin(bin_path, CFG, state_dict, tokenizer_json, "f32")
    q4 = tmp_path / "q4.gguf"
    upgrade_legacy_bin(bin_path, q4, "q4_0")
    with GGUFReader(q4) as r:
        assert r.kv["general.file_type"] == int(GGUFFileType.MOSTLY_Q4_0)
