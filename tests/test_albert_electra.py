"""ALBERT and ELECTRA encoder families.

The reference accepts only the BertModel architecture
(convert-to-gguf.py:133-136).  These tests gate our extension with the same
criterion every other family is held to (SURVEY.md §7): full-forward cosine
>= 0.9999 vs HF torch on identical random weights.

ALBERT exercises two mechanisms no other family has: a factorized embedding
table (narrow emb_width tables + the embedding_hidden_mapping_in projection)
and cross-layer parameter sharing (one parameter set, leading stack dim 1,
reused n_layer times by the scan).  ELECTRA shares the factorized-embedding
mechanism (embeddings_project) over the plain BERT graph.
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
from embedding_cpp_tpu.models.bert import bert_embed_packed, bert_score_batch
from embedding_cpp_tpu.models.params import build_params, source_from_arrays

F32 = ComputeOptions(dtype="float32")

ALBERT_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=3, n_head=4, n_ff=128,
    arch="albert", gelu="tanh", n_embd_emb=32, name="tiny-albert",
)
ELECTRA_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    arch="electra", n_embd_emb=32, name="tiny-electra",
)
# ELECTRA-base-style: embedding_size == hidden_size, no projection
ELECTRA_WIDE_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    arch="electra", name="tiny-electra-wide",
)


def _ids_and_mask(rng, cfg, batch, max_len):
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def test_schema_shapes():
    from embedding_cpp_tpu.models import schema

    emb = schema.embedding_tensors(ALBERT_CFG)
    # tables live at emb_width, the projection maps up to n_embd
    assert emb["embeddings.word_embeddings.weight"][1](ALBERT_CFG) == (160, 32)
    assert emb["embeddings.LayerNorm.weight"][1](ALBERT_CFG) == (32,)
    key, shape_fn = emb["encoder.embedding_hidden_mapping_in.weight"]
    assert key == "emb_proj_w" and shape_fn(ALBERT_CFG) == (64, 32)

    emb_e = schema.embedding_tensors(ELECTRA_CFG)
    assert emb_e["embeddings_project.weight"][1](ELECTRA_CFG) == (64, 32)
    # no projection when embedding_size == hidden_size
    emb_w = schema.embedding_tensors(ELECTRA_WIDE_CFG)
    assert "embeddings_project.weight" not in emb_w
    assert emb_w["embeddings.word_embeddings.weight"][1](ELECTRA_WIDE_CFG) == (
        160, 64,
    )

    # ALBERT's shared layer: names carry no index, ONE set in the file
    names = schema.all_tensor_names(ALBERT_CFG.n_layer, ALBERT_CFG)
    assert len(names) == len(set(names))
    assert (
        "encoder.albert_layer_groups.0.albert_layers.0.attention.query.weight"
        in names
    )
    # param keys stay arch-invariant
    assert {v[0] for v in schema.layer_tensor_names(0, ALBERT_CFG).values()} \
        == {v[0] for v in schema.LAYER_TENSORS.values()}


def test_config_validation_and_dispatch():
    with pytest.raises(ValueError, match="factorized"):
        BertConfig(
            n_vocab=10, n_ctx=8, n_embd=8, n_layer=1, n_head=2, n_ff=16,
            n_embd_emb=4,  # bert may not factorize
        )
    c = BertConfig.from_hf_config(
        {
            "model_type": "albert", "vocab_size": 100, "hidden_size": 32,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "intermediate_size": 64, "embedding_size": 16,
            "hidden_act": "gelu_new",
        }
    )
    assert c.arch == "albert" and c.n_embd_emb == 16 and c.gelu == "tanh"
    assert c.shared_layers and c.emb_width == 16
    with pytest.raises(ValueError, match="num_hidden_groups"):
        BertConfig.from_hf_config(
            {
                "model_type": "albert", "vocab_size": 100, "hidden_size": 32,
                "num_hidden_layers": 4, "num_attention_heads": 4,
                "intermediate_size": 64, "num_hidden_groups": 2,
            }
        )
    c = BertConfig.from_hf_config(
        {
            "model_type": "electra", "vocab_size": 100, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "embedding_size": 16,
        }
    )
    assert c.arch == "electra" and c.n_embd_emb == 16
    # embedding_size == hidden_size -> no projection recorded
    c = BertConfig.from_hf_config(
        {
            "model_type": "electra", "vocab_size": 100, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "embedding_size": 32,
        }
    )
    assert c.n_embd_emb == 0 and not c.shared_layers


def test_albert_params_share_one_layer():
    params = random_params(ALBERT_CFG, seed=1)
    assert params["layers"]["q_w"].shape[0] == 1  # stack dim 1, not n_layer
    assert "emb_proj_w" in params["embeddings"]
    assert params["embeddings"]["emb_proj_w"].shape == (32, 64)
    assert params["embeddings"]["word"].shape == (160, 32)


@pytest.mark.parametrize(
    "cfg", [ALBERT_CFG, ELECTRA_CFG, ELECTRA_WIDE_CFG],
    ids=["albert", "electra", "electra-wide"],
)
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


@pytest.mark.parametrize("cfg", [ALBERT_CFG, ELECTRA_CFG],
                         ids=["albert", "electra"])
def test_q4_forward_runs(cfg):
    rng = np.random.default_rng(2)
    params = random_params(cfg, GGUFFileType.MOSTLY_Q4_0, seed=3)
    ids, mask, _ = _ids_and_mask(rng, cfg, 3, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_albert_packed_equals_plain():
    """Sequence packing through the shared-layer scan (closure over the
    single parameter set instead of scanning stacked xs)."""
    cfg = ALBERT_CFG
    params = random_params(cfg, seed=15)
    rng = np.random.default_rng(16)
    ids, mask, lens = _ids_and_mask(rng, cfg, 4, 12)

    s_total = int(lens.sum())
    pad = -(-s_total // 8) * 8 - s_total
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
        bert_embed_packed(params, row_ids, row_seg, row_pos, cfg, F32, n_seg=4)
    )[0]
    plain = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(packed, plain, atol=2e-5, rtol=1e-4)


def test_albert_hf_parity():
    """ALBERT forward (factorized embeddings + shared layers + gelu_new)
    vs HF torch AlbertModel on identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = ALBERT_CFG
    sd = random_state_dict(cfg, seed=9)
    hf_config = transformers.AlbertConfig(
        vocab_size=cfg.n_vocab,
        embedding_size=cfg.n_embd_emb,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_hidden_groups=1,
        inner_group_num=1,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu_new",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.AlbertModel(hf_config, add_pooling_layer=False)
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


@pytest.mark.parametrize("cfg", [ELECTRA_CFG, ELECTRA_WIDE_CFG],
                         ids=["small-style", "base-style"])
def test_electra_hf_parity(cfg):
    """ELECTRA forward (BERT graph, optional embeddings_project) vs HF torch
    ElectraModel on identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    sd = random_state_dict(cfg, seed=11)
    hf_config = transformers.ElectraConfig(
        vocab_size=cfg.n_vocab,
        embedding_size=cfg.emb_width,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.ElectraModel(hf_config)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all(
        "position_ids" in m or "token_type_ids" in m for m in missing
    ), missing

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


def test_electra_classification_head_parity():
    """ELECTRA cross-encoder head (dense + erf-gelu + out_proj on the first
    token) vs HF ElectraForSequenceClassification."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = dataclasses.replace(
        ELECTRA_CFG, n_labels=2, head_activation="gelu"
    )
    sd = random_state_dict(cfg, seed=21)
    hf_config = transformers.ElectraConfig(
        vocab_size=cfg.n_vocab,
        embedding_size=cfg.emb_width,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu",
        num_labels=cfg.n_labels,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        classifier_dropout=0.0,
    )
    model = transformers.ElectraForSequenceClassification(hf_config)
    model.eval()
    sd_t = {
        (k if k.startswith("classifier.") else "electra." + k):
            torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(sd_t, strict=False)
    assert not unexpected
    assert all(
        "position_ids" in m or "token_type_ids" in m for m in missing
    ), missing

    rng = np.random.default_rng(22)
    ids, mask, _ = _ids_and_mask(rng, cfg, 4, 18)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()

    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_score_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_albert_classification_head_parity():
    """ALBERT reranker head: the bare-linear pooler (pooler.weight) + tanh +
    classifier vs HF AlbertForSequenceClassification."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = dataclasses.replace(ALBERT_CFG, n_labels=1)
    sd = random_state_dict(cfg, seed=31)
    hf_config = transformers.AlbertConfig(
        vocab_size=cfg.n_vocab,
        embedding_size=cfg.n_embd_emb,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_hidden_groups=1,
        inner_group_num=1,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu_new",
        num_labels=cfg.n_labels,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
    )
    model = transformers.AlbertForSequenceClassification(hf_config)
    model.eval()
    sd_t = {
        (k if k.startswith("classifier.") else "albert." + k):
            torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(sd_t, strict=False)
    assert not unexpected
    assert all(
        "position_ids" in m or "token_type_ids" in m for m in missing
    ), missing

    rng = np.random.default_rng(32)
    ids, mask, _ = _ids_and_mask(rng, cfg, 4, 18)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()

    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_score_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("preset,ftype", [("tiny-albert", "q4_0"),
                                          ("tiny-electra", "q8_0")])
def test_engine_end_to_end(tmp_path, preset, ftype):
    """Synthetic GGUF -> Engine -> encode (kv roundtrip incl. EMB_WIDTH /
    GELU keys, quantized tables at emb_width, shared-layer stack)."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / f"{preset}.gguf"
    make_test_model(str(path), preset, ftype)
    eng = Engine.from_gguf(str(path))
    assert eng.config.arch == preset.removeprefix("tiny-")
    assert eng.config.n_embd_emb == 32
    if eng.config.arch == "albert":
        assert eng.config.gelu == "tanh" and eng.config.shared_layers
    out = eng.encode(["hello world", "It's the quick brown fox."])
    assert out.shape == (2, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_albert_hf_dir_conversion_end_to_end(tmp_path):
    """ALBERT through the FULL conversion path: a local HF checkpoint dir
    (config.json with model_type albert + embedding_size + gelu_new,
    pytorch weights, Unigram tokenizer.json — real ALBERTs tokenize with
    SentencePiece) -> convert_hf_dir -> Engine.encode, gated vs torch
    mean-pool+L2 on the same tokenization."""
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

    hf_config = transformers.AlbertConfig(
        vocab_size=n_vocab,
        embedding_size=32,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_act="gelu_new",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.AlbertModel(hf_config, add_pooling_layer=False)
    model.eval()

    src = tmp_path / "hf-albert"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(tokenizer_json)

    out = tmp_path / "albert.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)
    assert eng.config.arch == "albert"
    assert eng.config.n_embd_emb == 32 and eng.config.gelu == "tanh"

    texts = ["hello world", "Café déjà vu", "Ein schneller brauner Fuchs"]
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
