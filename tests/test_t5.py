"""T5 encoder family (sentence-t5 / GTR dense retrievers).

The reference accepts only the BertModel architecture
(convert-to-gguf.py:133-136).  Gates: full-forward cosine >= 0.9999 vs HF
torch T5EncoderModel on identical random weights, for both FFN recipes
(v1.0 relu — all published sentence-t5/gtr — and v1.1 gated gelu_new) and
for d_kv decoupled from d_model (t5-3b/xl geometry).
"""
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

T5_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=3, n_head=4, n_ff=128,
    arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=16,
    ffn_act="relu", name="tiny-t5",
)
# v1.1 recipe with inner attention width != d_model (t5-3b/xl geometry)
T5_GATED_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=32,
    ffn_act="gelu_tanh", ffn_gated=True, name="tiny-t5-gated",
)
# ungated feed_forward_proj="gelu": HF uses the EXACT erf GELU here (only
# the "gated-gelu" back-compat means gelu_new)
T5_GELU_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=16,
    ffn_act="gelu_erf", name="tiny-t5-gelu",
)


def _ids_and_mask(rng, cfg, batch, max_len):
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def _hf_model(cfg, transformers):
    hf_config = transformers.T5Config(
        vocab_size=cfg.n_vocab,
        d_model=cfg.n_embd,
        d_kv=cfg.head_dim,
        d_ff=cfg.n_ff,
        num_layers=cfg.n_layer,
        num_heads=cfg.n_head,
        relative_attention_num_buckets=cfg.rel_attn_buckets,
        relative_attention_max_distance=cfg.rel_attn_max_dist,
        dropout_rate=0.0,
        layer_norm_epsilon=cfg.layer_norm_eps,
        feed_forward_proj=(
            "gated-gelu" if cfg.ffn_gated
            else "gelu" if cfg.ffn_act == "gelu_erf" else "relu"
        ),
    )
    model = transformers.T5EncoderModel(hf_config)
    model.eval()
    return model


def test_schema_shapes():
    from embedding_cpp_tpu.models import schema

    emb = schema.embedding_tensors(T5_CFG)
    assert emb == schema.T5_EMBEDDING_TENSORS
    names = schema.layer_tensor_names(0, T5_GATED_CFG)
    # gated: wi_0/wi_1; q/k/v at attn_inner = 4*32 = 128 != d_model 64
    assert "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in names
    key, fn = names["encoder.block.0.layer.0.SelfAttention.q.weight"]
    assert key == "q_w" and fn(T5_GATED_CFG) == (128, 64)
    key, fn = names["encoder.block.0.layer.0.SelfAttention.o.weight"]
    assert key == "o_w" and fn(T5_GATED_CFG) == (64, 128)
    names_v10 = schema.layer_tensor_names(1, T5_CFG)
    assert "encoder.block.1.layer.1.DenseReluDense.wi.weight" in names_v10
    extra = schema.extra_tensors(T5_CFG)
    assert set(v[0] for v in extra.values()) == {
        "rel_attn_bias", "final_ln_scale",
    }


def test_config_dispatch():
    c = BertConfig.from_hf_config(
        {
            "model_type": "t5", "vocab_size": 32128, "d_model": 768,
            "num_layers": 12, "num_heads": 12, "d_ff": 3072, "d_kv": 64,
            "feed_forward_proj": "relu",
        }
    )
    assert c.arch == "t5" and c.head_dim == 64 and not c.ffn_gated
    assert c.layer_norm_eps == 1e-6 and c.rel_attn_buckets == 32
    c = BertConfig.from_hf_config(
        {
            "model_type": "t5", "vocab_size": 100, "d_model": 64,
            "num_layers": 2, "num_heads": 4, "d_ff": 128, "d_kv": 32,
            "feed_forward_proj": "gated-gelu",
        }
    )
    assert c.ffn_gated and c.ffn_act == "gelu_tanh" and c.attn_inner == 128
    # HF back-compat: ONLY "gated-gelu" means gelu_new; plain "gelu" is erf
    c = BertConfig.from_hf_config(
        {
            "model_type": "t5", "vocab_size": 100, "d_model": 64,
            "num_layers": 2, "num_heads": 4, "d_ff": 128, "d_kv": 16,
            "feed_forward_proj": "gelu",
        }
    )
    assert not c.ffn_gated and c.ffn_act == "gelu_erf"


@pytest.mark.parametrize("cfg", [T5_CFG, T5_GATED_CFG],
                         ids=["relu", "gated"])
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


def test_q4_forward_runs():
    rng = np.random.default_rng(2)
    params = random_params(T5_CFG, GGUFFileType.MOSTLY_Q4_0, seed=3)
    ids, mask, _ = _ids_and_mask(rng, T5_CFG, 3, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, T5_CFG, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_packed_equals_plain():
    """Per-segment restart positions rebuild the shared relative bias
    exactly (cross-segment pairs masked block-diagonal)."""
    cfg = T5_CFG
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


@pytest.mark.parametrize("cfg", [T5_CFG, T5_GATED_CFG, T5_GELU_CFG],
                         ids=["relu", "gated-dkv32", "gelu-erf"])
def test_t5_hf_parity(cfg):
    """T5 encoder forward (RMSNorm pre-norm, unscaled attention, shared
    relative bias, d_kv-decoupled heads) vs HF torch T5EncoderModel on
    identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    sd = random_state_dict(cfg, seed=9)
    model = _hf_model(cfg, transformers)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    # encoder.embed_tokens ties to shared — the only acceptable miss
    assert all("embed_tokens" in m for m in missing), missing

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


def test_no_classification_head():
    params = random_params(T5_CFG, seed=1)
    ids = np.zeros((1, 8), np.int32)
    mask = np.ones((1, 8), np.int32)
    with pytest.raises(ValueError, match="no classification head"):
        bert_score_batch(params, ids, mask, T5_CFG, F32)


def test_engine_end_to_end(tmp_path):
    """Synthetic GGUF (Unigram tokenizer, t5 kv geometry) -> Engine ->
    encode; framing is ids + [</s>] with NO leading CLS."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / "t5.gguf"
    make_test_model(str(path), "tiny-t5", "q4_0")
    eng = Engine.from_gguf(str(path))
    assert eng.config.arch == "t5"
    assert eng.config.head_dim == 16 and eng.config.ffn_act == "relu"
    toks = eng.tokenize("hello world")
    assert toks[-1] == eng.special_ids.sep  # </s> appended
    assert toks[0] != eng.special_ids.cls  # no CLS framing
    out = eng.encode(["hello world", "the quick brown fox"])
    assert out.shape == (2, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_t5_hf_dir_conversion_end_to_end(tmp_path):
    """GTR-style checkpoint through the FULL conversion path: a local HF
    dir (config.json model_type t5, T5EncoderModel weights, Unigram
    tokenizer.json) -> convert_hf_dir -> Engine.encode, gated vs torch
    mean-pool+L2 on the same tokenization (ids + </s>)."""
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

    hf_config = transformers.T5Config(
        vocab_size=n_vocab,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=32,
        dropout_rate=0.0,
        layer_norm_epsilon=1e-6,
        feed_forward_proj="relu",
        architectures=["T5EncoderModel"],
    )
    model = transformers.T5EncoderModel(hf_config)
    model.eval()

    src = tmp_path / "hf-t5"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(tokenizer_json)

    out = tmp_path / "t5.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)
    assert eng.config.arch == "t5" and eng.config.head_dim == 16

    texts = ["hello world", "Ein schneller brauner Fuchs", "Café déjà vu"]
    got = eng.encode(texts)

    hf_tok = Tokenizer.from_str(tokenizer_json.decode())
    framed = [
        hf_tok.encode(t, add_special_tokens=False).ids + [eng.special_ids.sep]
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


def test_mesh_forward_matches_single(eight_devices):
    """GSPMD dp=2 tp=4 over the T5 graph: d_kv-wide column-parallel q/k/v,
    row-parallel o/wo, replicated bias table."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import (
        shard_params_and_make_forward,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=32,
        ffn_act="relu", name="shard-t5",
    )
    params = random_params(cfg, seed=3)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.n_vocab, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 12:] = 0
    expected = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))

    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    sharded, fwd = shard_params_and_make_forward(params, cfg, F32, mesh)
    got = np.asarray(fwd(sharded, ids, mask))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_manual_shard_map_tp(eight_devices):
    """Manual-TP shard_map: the per-device head slice of the shared bias
    table feeds the unscaled attention; psums on the row-parallel o/wo."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=32,
        ffn_act="relu", name="shardmap-t5",
    )
    params = random_params(cfg, GGUFFileType.MOSTLY_Q8_0, seed=5)
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.n_vocab, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 12:] = 0
    expected = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))

    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    sharded, fwd = shard_params_and_make_forward_manual(
        params, cfg, F32, mesh
    )
    got = np.asarray(fwd(sharded, ids, mask))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_t5_forward_pallas_matches_xla():
    """attn_impl="pallas" routes T5 plain batches through the fused
    bias-attention kernel with q pre-scaled by sqrt(d) (the kernel divides
    by sqrt(d); T5 is unscaled) — outputs must match the XLA path."""
    cfg = T5_CFG
    params = random_params(cfg, seed=31)
    rng = np.random.default_rng(32)
    ids, mask, _ = _ids_and_mask(rng, cfg, 4, 16)
    xla = np.asarray(
        bert_embed_batch(params, ids, mask, cfg,
                         ComputeOptions(dtype="float32", attn_impl="xla"))
    )
    pal = np.asarray(
        bert_embed_batch(params, ids, mask, cfg,
                         ComputeOptions(dtype="float32", attn_impl="pallas"))
    )
    np.testing.assert_allclose(pal, xla, atol=2e-5, rtol=1e-4)
