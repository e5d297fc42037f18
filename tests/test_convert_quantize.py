"""Converter + quantizer pipeline tests: HF state dict -> GGUF -> load ->
forward; GGUF f32 -> q4_0/q4_1 requantization with the reference's tensor
selection rules."""
import json

import numpy as np
import pytest

from embedding_cpp_tpu.gguf import GGMLType, GGUFFileType, GGUFReader, Keys
from embedding_cpp_tpu.models import BertConfig, bert_embed_batch, random_state_dict
from embedding_cpp_tpu.models.bert import ComputeOptions
from embedding_cpp_tpu.models.convert import write_bert_gguf
from embedding_cpp_tpu.models.params import load_params
from embedding_cpp_tpu.models.quantize_tool import quantize_gguf

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
def f32_gguf(tokenizer_json, tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny-f32.gguf"
    sd = random_state_dict(CFG, seed=0)
    write_bert_gguf(path, CFG, sd, tokenizer_json, GGUFFileType.ALL_F32)
    return path


def test_written_gguf_metadata(f32_gguf):
    with GGUFReader(f32_gguf) as r:
        assert r.kv[Keys.ARCHITECTURE] == "bert"
        assert r.kv[Keys.EMBEDDING_LENGTH] == CFG.n_embd
        assert r.kv[Keys.BLOCK_COUNT] == CFG.n_layer
        assert len(r.kv[Keys.TOKENIZER_LIST]) == CFG.n_vocab
        # special ids resolved from the synthetic vocab
        assert r.kv[Keys.TOKENIZER_CLS_ID] == 2
        assert r.kv[Keys.TOKENIZER_SEP_ID] == 3
        assert r.kv[Keys.TOKENIZER_PAD_ID] == 0
        # blob round-trips as valid tokenizer.json
        blob = r.kv[Keys.TOKENIZER_JSON_BLOB]
        assert json.loads(blob)["model"]["type"] == "WordPiece"
        # pooler/position_ids never written
        assert not any("pooler" in n for n in r.tensors)
        cfg2 = BertConfig.from_gguf_kv(r.kv)
        assert cfg2.n_embd == CFG.n_embd and cfg2.n_vocab == CFG.n_vocab


def test_load_and_forward_from_gguf(f32_gguf):
    with GGUFReader(f32_gguf) as r:
        params, config = load_params(r)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, config.n_vocab, size=(2, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    out = np.asarray(bert_embed_batch(params, ids, mask, config, ComputeOptions()))
    assert out.shape == (2, config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


@pytest.mark.parametrize(
    "ftype_name,qtype",
    [
        ("q4_0", GGMLType.Q4_0),
        ("q4_1", GGMLType.Q4_1),
        ("q8_0", GGMLType.Q8_0),
    ],
)
def test_quantize_tool(f32_gguf, tmp_path, ftype_name, qtype):
    out = tmp_path / f"tiny-{ftype_name}.gguf"
    stats = quantize_gguf(str(f32_gguf), str(out), ftype_name, verbose=False)
    assert stats.n_quantized > 0
    assert stats.total_out_bytes < stats.total_in_bytes

    with GGUFReader(out) as r:
        # reference selection rule: 2-D *weight quantized, everything else kept
        for name, info in r.tensors.items():
            if name.endswith("weight") and len(info.shape) == 2:
                assert info.ggml_type == qtype, name
            else:
                assert info.ggml_type == GGMLType.F32, name
        assert r.infer_file_type().name.endswith(ftype_name.upper())
        # kv metadata survived the rewrite
        assert r.kv[Keys.ARCHITECTURE] == "bert"
        assert len(r.kv[Keys.TOKENIZER_LIST]) == CFG.n_vocab

        # quantized file still loads and embeds
        params, config = load_params(r)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, config.n_vocab, size=(2, 8)).astype(np.int32)
    mask = np.ones_like(ids)
    out_v = np.asarray(bert_embed_batch(params, ids, mask, config, ComputeOptions()))
    np.testing.assert_allclose(np.linalg.norm(out_v, axis=-1), 1.0, atol=1e-5)


def test_quantize_then_requantize(f32_gguf, tmp_path):
    """q4_0 -> q4_1 requantization (dequant-first path, bert.cpp:1459-1475)."""
    mid = tmp_path / "mid.gguf"
    out = tmp_path / "out.gguf"
    quantize_gguf(str(f32_gguf), str(mid), "q4_0", verbose=False)
    quantize_gguf(str(mid), str(out), "q4_1", verbose=False)
    with GGUFReader(out) as r:
        assert r.infer_file_type() == GGUFFileType.MOSTLY_Q4_1


def test_q8_0_forward_close_to_f32(f32_gguf, tmp_path):
    """8-bit quantization noise is tiny: q8_0 embeddings must cosine-match
    the f32 embeddings to ~1e-4 (vs the quantization-class tolerance q4
    gets)."""
    out = tmp_path / "tiny-q8.gguf"
    quantize_gguf(str(f32_gguf), str(out), "q8_0", verbose=False)
    with GGUFReader(f32_gguf) as r:
        params_f32, config = load_params(r)
    with GGUFReader(out) as r:
        params_q8, _ = load_params(r)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, config.n_vocab, size=(4, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    a = np.asarray(bert_embed_batch(params_f32, ids, mask, config, ComputeOptions()))
    b = np.asarray(bert_embed_batch(params_q8, ids, mask, config, ComputeOptions()))
    cos = np.sum(a * b, axis=-1)  # both L2-normalized
    assert cos.min() > 0.9999


def test_q8_0_one_step_convert(tokenizer_json, tmp_path):
    """Direct HF -> q8_0 GGUF conversion (no intermediate f32 file)."""
    path = tmp_path / "tiny-q8-direct.gguf"
    sd = random_state_dict(CFG, seed=0)
    write_bert_gguf(path, CFG, sd, tokenizer_json, GGUFFileType.MOSTLY_Q8_0)
    with GGUFReader(path) as r:
        assert r.infer_file_type() == GGUFFileType.MOSTLY_Q8_0
        wq = r.tensors["encoder.layer.0.attention.self.query.weight"]
        assert wq.ggml_type == GGMLType.Q8_0
        params, config = load_params(r)
    ids = np.array([[1, 2, 3, 4]], dtype=np.int32)
    out = np.asarray(
        bert_embed_batch(params, ids, np.ones_like(ids), config, ComputeOptions())
    )
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_f16_roundtrip(f32_gguf, tmp_path):
    out = tmp_path / "f16.gguf"
    quantize_gguf(str(f32_gguf), str(out), "f16", verbose=False)
    with GGUFReader(f32_gguf) as r32, GGUFReader(out) as r16:
        w32 = r32.tensor_f32("encoder.layer.0.attention.self.query.weight")
        w16 = r16.tensor_f32("encoder.layer.0.attention.self.query.weight")
        np.testing.assert_allclose(w16, w32, atol=1e-3)
