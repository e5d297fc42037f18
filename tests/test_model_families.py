"""Non-BERT encoder families: DistilBERT and RoBERTa.

The reference accepts only the BertModel architecture
(convert-to-gguf.py:133-136).  These tests gate our extension to the sibling
families with the same criterion the BERT forward is held to (SURVEY.md §7):
full-forward cosine >= 0.9999 vs HF torch on identical random weights.
"""
import dataclasses

import numpy as np
import pytest

from embedding_cpp_tpu.gguf import GGUFFileType
from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_params,
    random_state_dict,
)
from embedding_cpp_tpu.models.params import build_params, source_from_arrays

F32 = ComputeOptions(dtype="float32")

ROBERTA_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    layer_norm_eps=1e-5, n_token_types=1, arch="roberta", pos_offset=2,
    name="tiny-roberta",
)
DISTIL_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    n_token_types=0, arch="distilbert", name="tiny-distilbert",
)
MPNET_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    n_token_types=0, arch="mpnet", pos_offset=2, rel_attn_buckets=32,
    name="tiny-mpnet",
)


def _ids_and_mask(rng, cfg, batch, max_len):
    # draw ids from [4, n_vocab): HF RoBERTa computes position ids from
    # input_ids != pad_token_id (create_position_ids_from_input_ids), so a
    # random pad id (1) INSIDE a sentence would skew its positions — a state
    # real tokenizer output never produces
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def test_arch_defaults_and_validation():
    c = BertConfig.arch_defaults(
        "roberta", n_vocab=10, n_ctx=8, n_embd=8, n_layer=1, n_head=2, n_ff=16
    )
    assert (c.n_token_types, c.pos_offset, c.layer_norm_eps) == (1, 2, 1e-5)
    c = BertConfig.arch_defaults(
        "distilbert", n_vocab=10, n_ctx=8, n_embd=8, n_layer=1, n_head=2,
        n_ff=16
    )
    assert (c.n_token_types, c.pos_offset) == (0, 0)
    with pytest.raises(ValueError, match="unsupported architecture"):
        BertConfig(
            n_vocab=10, n_ctx=8, n_embd=8, n_layer=1, n_head=2, n_ff=16,
            arch="mamba",
        )


def test_schema_shapes_per_arch():
    from embedding_cpp_tpu.models import schema

    emb_r = schema.embedding_tensors(ROBERTA_CFG)
    # roberta position table carries pos_offset extra rows
    key, shape_fn = emb_r["embeddings.position_embeddings.weight"]
    assert shape_fn(ROBERTA_CFG) == (
        ROBERTA_CFG.n_ctx + 2, ROBERTA_CFG.n_embd
    )
    key, shape_fn = emb_r["embeddings.token_type_embeddings.weight"]
    assert shape_fn(ROBERTA_CFG) == (1, ROBERTA_CFG.n_embd)

    emb_d = schema.embedding_tensors(DISTIL_CFG)
    assert "embeddings.token_type_embeddings.weight" not in emb_d
    names_d = schema.layer_tensor_names(0, DISTIL_CFG)
    assert "transformer.layer.0.attention.q_lin.weight" in names_d
    # param keys stay arch-invariant
    assert {v[0] for v in names_d.values()} == {
        v[0] for v in schema.layer_tensor_names(0, ROBERTA_CFG).values()
    }


@pytest.mark.parametrize("cfg", [ROBERTA_CFG, DISTIL_CFG, MPNET_CFG],
                         ids=["roberta", "distilbert", "mpnet"])
def test_padded_batch_equals_per_sentence(cfg):
    rng = np.random.default_rng(0)
    params = random_params(cfg, seed=1)
    ids, mask, lens = _ids_and_mask(rng, cfg, 4, 24)
    batched = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    for i, l in enumerate(lens):
        single = np.asarray(
            bert_embed_batch(
                params, ids[i : i + 1, :l], mask[i : i + 1, :l], cfg, F32
            )
        )[0]
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cfg", [ROBERTA_CFG, DISTIL_CFG, MPNET_CFG],
                         ids=["roberta", "distilbert", "mpnet"])
def test_q4_forward_runs(cfg):
    rng = np.random.default_rng(2)
    params = random_params(cfg, GGUFFileType.MOSTLY_Q4_0, seed=3)
    ids, mask, _ = _ids_and_mask(rng, cfg, 3, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_roberta_hf_parity():
    """RoBERTa forward (pos_offset=2, 1-row token-type table, eps 1e-5) vs
    HF torch RobertaModel on identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = ROBERTA_CFG
    sd = random_state_dict(cfg, seed=9)
    hf_config = transformers.RobertaConfig(
        vocab_size=cfg.n_vocab,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx + cfg.pos_offset,
        type_vocab_size=1,
        layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=1,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.RobertaModel(hf_config, add_pooling_layer=False)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all(
        "position_ids" in m or "token_type_ids" in m for m in missing
    ), missing

    rng = np.random.default_rng(10)
    ids, mask, _ = _ids_and_mask(rng, cfg, 5, 20)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_distilbert_hf_parity():
    """DistilBERT forward (no token-type table, transformer.* tensor names)
    vs HF torch DistilBertModel on identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = DISTIL_CFG
    sd = random_state_dict(cfg, seed=11)
    hf_config = transformers.DistilBertConfig(
        vocab_size=cfg.n_vocab,
        dim=cfg.n_embd,
        n_layers=cfg.n_layer,
        n_heads=cfg.n_head,
        hidden_dim=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        activation="gelu",
        dropout=0.0,
        attention_dropout=0.0,
    )
    model = transformers.DistilBertModel(hf_config)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing), missing

    rng = np.random.default_rng(12)
    ids, mask, _ = _ids_and_mask(rng, cfg, 5, 20)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_mpnet_schema_and_bucket():
    from embedding_cpp_tpu.models import schema
    from embedding_cpp_tpu.models.bert import t5_relative_bucket

    names = schema.layer_tensor_names(0, MPNET_CFG)
    assert "encoder.layer.0.attention.attn.q.weight" in names
    assert "encoder.layer.0.attention.LayerNorm.weight" in names
    extra = schema.extra_tensors(MPNET_CFG)
    key, shape_fn = extra["encoder.relative_attention_bias.weight"]
    assert key == "rel_attn_bias" and shape_fn(MPNET_CFG) == (32, 4)
    assert schema.extra_tensors(ROBERTA_CFG) == {}
    assert (
        "encoder.relative_attention_bias.weight"
        in schema.all_tensor_names(2, MPNET_CFG)
    )

    # bucket function vs the HF reference implementation
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder

    pos = np.arange(48)
    rel = pos[None, :] - pos[:, None]
    ours = t5_relative_bucket(rel, 32, xp=np)
    theirs = MPNetEncoder.relative_position_bucket(
        torch.from_numpy(rel), num_buckets=32
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_mpnet_hf_parity():
    """MPNet forward (shared T5-style relative attention bias, RoBERTa
    position numbering, no token types) vs HF torch MPNetModel on identical
    random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = MPNET_CFG
    sd = random_state_dict(cfg, seed=13)
    hf_config = transformers.MPNetConfig(
        vocab_size=cfg.n_vocab,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx + cfg.pos_offset,
        relative_attention_num_buckets=cfg.rel_attn_buckets,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = transformers.MPNetModel(hf_config, add_pooling_layer=False)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing), missing

    rng = np.random.default_rng(14)
    ids, mask, _ = _ids_and_mask(rng, cfg, 5, 20)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    params = build_params(source_from_arrays(sd), cfg)
    assert "rel_attn_bias" in params
    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_mpnet_packed_equals_plain():
    """Sequence-packed MPNet (per-segment positions drive the relative
    bias) matches the plain per-sentence forward."""
    from embedding_cpp_tpu.models.bert import bert_embed_packed

    cfg = MPNET_CFG
    params = random_params(cfg, seed=15)
    rng = np.random.default_rng(16)
    ids, mask, lens = _ids_and_mask(rng, cfg, 4, 12)

    # pack all 4 sentences into one row
    s_total = int(lens.sum())
    pad = -(-s_total // 8) * 8 - s_total  # align to 8 for the kernels
    row_ids = np.concatenate(
        [ids[i, :l] for i, l in enumerate(lens)] + [np.zeros(pad, np.int32)]
    )[None]
    row_seg = np.concatenate(
        [np.full(l, i, np.int32) for i, l in enumerate(lens)]
        + [np.full(pad, -1, np.int32)]
    )[None]
    row_pos = np.concatenate(
        [np.arange(l, dtype=np.int32) for l in lens]
        + [np.zeros(pad, np.int32)]
    )[None]

    packed = np.asarray(
        bert_embed_packed(
            params, row_ids, row_seg, row_pos, cfg, F32, n_seg=4
        )
    )[0]
    plain = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(packed, plain, atol=2e-5, rtol=1e-4)


def test_hf_config_dispatch():
    c = BertConfig.from_hf_config(
        {
            "model_type": "distilbert", "vocab_size": 100, "dim": 32,
            "n_layers": 2, "n_heads": 4, "hidden_dim": 64,
            "max_position_embeddings": 128,
        }
    )
    assert c.arch == "distilbert" and c.n_token_types == 0 and c.n_ff == 64
    c = BertConfig.from_hf_config(
        {
            "model_type": "roberta", "vocab_size": 100, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "max_position_embeddings": 514,
            "pad_token_id": 1, "type_vocab_size": 1,
        }
    )
    assert c.arch == "roberta" and c.pos_offset == 2 and c.n_ctx == 512
    assert c.layer_norm_eps == 1e-5
    c = BertConfig.from_hf_config({
        "vocab_size": 100, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
    })
    assert c.arch == "bert" and c.pos_offset == 0


def test_arch_kv_roundtrip(tmp_path):
    """arch / token-type-count / position-offset kv survive GGUF write->read
    (reference files carry none of these and default to bert)."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.gguf import GGUFReader
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    cfg = dataclasses.replace(DISTIL_CFG, n_vocab=1000)
    path = tmp_path / "distil.gguf"
    write_bert_gguf(path, cfg, random_state_dict(cfg, 0),
                    build_tokenizer_json(1000), GGUFFileType.ALL_F32)
    with GGUFReader(path) as r:
        cfg2 = BertConfig.from_gguf_kv(r.kv)
    assert cfg2.arch == "distilbert"
    assert cfg2.n_token_types == 0
    assert cfg2.pos_offset == 0
    assert "embeddings.token_type_embeddings.weight" not in r.tensors


@pytest.mark.parametrize("preset,ftype", [("tiny-roberta", "q4_0"),
                                          ("tiny-distilbert", "q8_0"),
                                          ("tiny-mpnet", "q4_0"),
                                          ("tiny-nomic", "q4_0")])
def test_engine_end_to_end(tmp_path, preset, ftype):
    """Synthetic GGUF -> Engine -> encode for the non-bert families
    (RoBERTa rides the byte-level BPE tokenizer, DistilBERT WordPiece)."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / f"{preset}.gguf"
    make_test_model(str(path), preset, ftype)
    eng = Engine.from_gguf(str(path))
    assert eng.config.arch == {"tiny-nomic": "nomic-bert"}.get(
        preset, preset.removeprefix("tiny-")
    )
    if eng.config.arch == "mpnet":
        assert eng.config.rel_attn_buckets == 32
    out = eng.encode(["hello world", "It's the quick brown fox."])
    assert out.shape == (2, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    toks = eng.tokenize("hello world")
    assert toks[0] == eng.special_ids.cls and toks[-1] == eng.special_ids.sep


def test_xlmr_hf_dir_conversion_end_to_end(tmp_path):
    """XLM-R = RoBERTa encoder + SentencePiece-Unigram tokenizer, through
    the FULL conversion path: a local HF checkpoint dir (config.json with
    model_type xlm-roberta, pytorch weights, Unigram tokenizer.json) ->
    convert_hf_dir -> Engine.encode, gated vs torch mean-pool+L2 on the
    same tokenization.  The reference cannot convert or load this family
    (convert-to-gguf.py:133-136)."""
    import json

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer

    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.tokenizer.testvocab import (
        build_unigram_tokenizer_json,
    )

    tokenizer_json = build_unigram_tokenizer_json(600)
    spec = json.loads(tokenizer_json)
    n_vocab = len(spec["model"]["vocab"])

    hf_config = transformers.XLMRobertaConfig(
        vocab_size=n_vocab,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=66,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.XLMRobertaModel(hf_config, add_pooling_layer=False)
    model.eval()

    src = tmp_path / "hf-xlmr"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(tokenizer_json)

    out = tmp_path / "xlmr.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)

    texts = ["hello world", "Café déjà vu", "你好世界 中文 模型",
             "Ein schneller brauner Fuchs"]
    got = eng.encode(texts)

    hf_tok = Tokenizer.from_str(tokenizer_json.decode())
    framed = [
        [eng.special_ids.cls]
        + hf_tok.encode(t, add_special_tokens=False).ids
        + [eng.special_ids.sep]
        for t in texts
    ]
    max_len = max(len(f) for f in framed)
    ids = np.full((len(texts), max_len), eng.special_ids.pad, np.int64)
    mask = np.zeros((len(texts), max_len), np.int64)
    for i, f in enumerate(framed):
        ids[i, : len(f)] = f
        mask[i, : len(f)] = 1
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    # specials followed the spm order from the added_tokens
    assert eng.special_ids.pad == 1
    assert eng.tokenize(texts[0])[0] == eng.special_ids.cls
