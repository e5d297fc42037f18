"""DeBERTa-v2/v3 encoder family (disentangled attention).

The reference accepts only the BertModel architecture
(convert-to-gguf.py:133-136).  Gates: full-forward cosine >= 0.9999 and
classification-logit parity vs HF torch DebertaV2Model /
DebertaV2ForSequenceClassification on identical random weights — the
family behind the mxbai-rerank v1 / nli-deberta-v3 cross-encoders.
"""
import dataclasses

from conftest import tpu_atol

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

DEBERTA_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=3, n_head=4, n_ff=128,
    n_token_types=0, arch="deberta", layer_norm_eps=1e-7,
    rel_attn_buckets=32, rel_attn_max_dist=64, name="tiny-deberta",
)


def _hf_config(cfg, transformers, **kw):
    return transformers.DebertaV2Config(
        vocab_size=cfg.n_vocab,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps,
        relative_attention=True,
        position_buckets=cfg.rel_attn_buckets,
        max_relative_positions=cfg.rel_attn_max_dist,
        pos_att_type="p2c|c2p",
        position_biased_input=False,
        share_att_key=True,
        norm_rel_ebd="layer_norm",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pooler_dropout=0.0,
        **kw,
    )


def _ids_and_mask(rng, cfg, batch, max_len):
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def test_config_validation_and_dispatch():
    base = {
        "model_type": "deberta-v2", "vocab_size": 128100,
        "hidden_size": 768, "num_hidden_layers": 12,
        "num_attention_heads": 12, "intermediate_size": 3072,
        "max_position_embeddings": 512, "type_vocab_size": 0,
        "layer_norm_eps": 1e-7, "relative_attention": True,
        "position_buckets": 256, "max_relative_positions": -1,
        "pos_att_type": "p2c|c2p", "position_biased_input": False,
        "share_att_key": True, "norm_rel_ebd": "layer_norm",
    }
    c = BertConfig.from_hf_config(base)  # deberta-v3-base geometry
    assert c.arch == "deberta" and c.rel_attn_buckets == 256
    assert c.rel_attn_max_dist == 512  # -1 falls back to n_ctx
    assert c.n_token_types == 0 and c.layer_norm_eps == 1e-7
    for bad in (
        {"position_biased_input": True},
        {"share_att_key": False},
        {"conv_kernel_size": 3},
        {"norm_rel_ebd": "none"},
        {"pos_att_type": "c2p"},
        {"relative_attention": False},
    ):
        with pytest.raises(ValueError):
            BertConfig.from_hf_config({**base, **bad})


def test_log_bucket_matches_hf():
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers.models.deberta_v2.modeling_deberta_v2 import (
        make_log_bucket_position,
    )

    from embedding_cpp_tpu.models.deberta import deberta_log_bucket

    for s, buckets, maxp in [(300, 64, 512), (512, 256, 512), (48, 32, 64)]:
        pos = np.arange(s)
        rel = pos[:, None] - pos[None, :]
        theirs = make_log_bucket_position(
            torch.from_numpy(rel), buckets, maxp
        ).numpy().astype(np.int32)
        np.testing.assert_array_equal(
            deberta_log_bucket(rel, buckets, maxp, xp=np), theirs
        )


def test_schema_shapes():
    from embedding_cpp_tpu.models import schema

    emb = schema.embedding_tensors(DEBERTA_CFG)
    # v3: no position or token-type tables
    assert set(emb) == {
        "embeddings.word_embeddings.weight",
        "embeddings.LayerNorm.weight",
        "embeddings.LayerNorm.bias",
    }
    names = schema.layer_tensor_names(0, DEBERTA_CFG)
    assert "encoder.layer.0.attention.self.query_proj.weight" in names
    extra = schema.extra_tensors(DEBERTA_CFG)
    key, fn = extra["encoder.rel_embeddings.weight"]
    assert key == "rel_emb" and fn(DEBERTA_CFG) == (64, 64)  # [2*buckets, E]
    assert "encoder.LayerNorm.weight" in extra


def test_padded_batch_equals_per_sentence():
    rng = np.random.default_rng(0)
    params = random_params(DEBERTA_CFG, seed=1)
    ids, mask, lens = _ids_and_mask(rng, DEBERTA_CFG, 4, 24)
    batched = np.asarray(bert_embed_batch(params, ids, mask, DEBERTA_CFG, F32))
    for i, l in enumerate(lens):
        single = np.asarray(
            bert_embed_batch(
                params, ids[i : i + 1, :l], mask[i : i + 1, :l],
                DEBERTA_CFG, F32,
            )
        )[0]
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=1e-4)


def test_q4_forward_runs():
    rng = np.random.default_rng(2)
    params = random_params(DEBERTA_CFG, GGUFFileType.MOSTLY_Q4_0, seed=3)
    ids, mask, _ = _ids_and_mask(rng, DEBERTA_CFG, 3, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, DEBERTA_CFG, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_packed_equals_plain():
    """Gather indices rebuilt from per-segment restart positions equal the
    per-sentence buckets; cross-segment pairs masked block-diagonal."""
    cfg = DEBERTA_CFG
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


def test_deberta_hf_parity():
    """Disentangled-attention forward (c2p + p2c against the LayerNormed
    shared table, sqrt(3d) scaling, log buckets) vs HF torch
    DebertaV2Model on identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = DEBERTA_CFG
    sd = random_state_dict(cfg, seed=9)
    model = transformers.DebertaV2Model(_hf_config(cfg, transformers))
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected and not missing, (missing, unexpected)

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


def test_deberta_classification_head_parity():
    """ContextPooler (dense + gelu on the first token) + classifier vs HF
    DebertaV2ForSequenceClassification — the mxbai/nli reranker shape."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = dataclasses.replace(
        DEBERTA_CFG, n_labels=2, head_activation="gelu"
    )
    sd = random_state_dict(cfg, seed=21)
    hf_config = _hf_config(cfg, transformers, num_labels=cfg.n_labels,
                           cls_dropout=0.0)
    model = transformers.DebertaV2ForSequenceClassification(hf_config)
    model.eval()
    sd_t = {
        (k if k.startswith(("classifier.", "pooler."))
         else "deberta." + k): torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(sd_t, strict=False)
    assert not unexpected and not missing, (missing, unexpected)

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


def test_engine_end_to_end(tmp_path):
    """Synthetic GGUF (Unigram tokenizer like real v3 spm) -> Engine ->
    encode, kv geometry roundtrip."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / "deberta.gguf"
    make_test_model(str(path), "tiny-deberta", "q4_0")
    eng = Engine.from_gguf(str(path))
    assert eng.config.arch == "deberta"
    assert eng.config.rel_attn_buckets == 32
    assert eng.config.rel_attn_max_dist == 128
    out = eng.encode(["hello world", "the quick brown fox"])
    assert out.shape == (2, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_engine_rerank_end_to_end(tmp_path):
    """tiny-deberta-reranker GGUF -> Engine.score_pairs/rerank (the
    ContextPooler head over pair framing)."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / "deberta-rr.gguf"
    make_test_model(str(path), "tiny-deberta-reranker", "f32")
    eng = Engine.from_gguf(str(path))
    assert eng.config.n_labels == 1
    assert eng.config.head_activation == "gelu"
    scores = eng.score_pairs([("a dog", "the dog sat"), ("a dog", "milk")])
    assert scores.shape == (2,) or scores.shape == (2, 1)
    ranked = eng.rerank("a dog", ["the dog sat", "milk", "a dog barks"],
                        top_n=2)
    assert len(ranked) == 2


def test_deberta_hf_dir_conversion_end_to_end(tmp_path):
    """deberta-v3-style checkpoint through the FULL conversion path (HF dir
    with model_type deberta-v2 + Unigram tokenizer.json) -> convert_hf_dir
    -> Engine.encode, gated vs torch mean-pool+L2 on the same
    tokenization."""
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

    cfg = dataclasses.replace(DEBERTA_CFG, n_vocab=n_vocab)
    hf_config = _hf_config(cfg, transformers)
    hf_config.architectures = ["DebertaV2Model"]
    model = transformers.DebertaV2Model(hf_config)
    model.eval()

    src = tmp_path / "hf-deberta"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(tokenizer_json)

    out = tmp_path / "deberta.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)
    assert eng.config.arch == "deberta"

    texts = ["hello world", "Ein schneller brauner Fuchs", "Café déjà vu"]
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


def test_mesh_forward_matches_single(eight_devices):
    """GSPMD dp=2 tp=4: the shared rel table replicates; its per-layer
    projections ride the column-sharded q/k weights, so the disentangled
    terms come out head-local on each shard."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import (
        shard_params_and_make_forward,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        arch="deberta", layer_norm_eps=1e-7, rel_attn_buckets=32,
        rel_attn_max_dist=64, name="shard-deberta",
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
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        arch="deberta", layer_norm_eps=1e-7, rel_attn_buckets=32,
        rel_attn_max_dist=64, name="shardmap-deberta",
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


def test_fused_kernel_matches_xla():
    """The fused disentangled-attention kernel (ops/deberta_attention.py,
    interpret mode on CPU) reproduces the XLA einsum+gather path bit-close:
    the skewed-matmul + barrel-shift diagonal alignment must be an exact
    re-indexing of HF's c2p/p2c gathers.  Real-TPU parity at deberta-v3-base
    geometry is recorded separately (benchmarks/attn_bias_smoke.py ->
    attn_bias_smoke_v5e.json)."""
    rng = np.random.default_rng(7)
    # s=64 exercises the small-edge tiles; span > s exercises v3-base's
    # regime (position_buckets 256 > bucket length); span < s the clipping
    for s, span, max_dist in ((64, 96, 192), (64, 16, 64)):
        cfg = dataclasses.replace(
            DEBERTA_CFG, rel_attn_buckets=span, rel_attn_max_dist=max_dist
        )
        params = random_params(cfg, GGUFFileType.ALL_F32, seed=3)
        ids, mask, _ = _ids_and_mask(rng, cfg, batch=3, max_len=s)
        ref = np.asarray(bert_embed_batch(
            params, ids, mask, cfg, ComputeOptions(attn_impl="xla")))
        got = np.asarray(bert_embed_batch(
            params, ids, mask, cfg, ComputeOptions(attn_impl="pallas")))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_packed_pallas_matches_xla():
    """Packed DeBERTa through the fused segment kernel (plain delta tables
    + in-kernel block-diagonal mask) == the XLA path with per-row bucket
    indices and a [B, Sq, Sk] segment bias."""
    cfg = dataclasses.replace(DEBERTA_CFG, n_ctx=256)
    params = random_params(cfg, seed=31)
    rng = np.random.default_rng(32)
    b, s, n_seg = 2, 128, 8
    seg = np.full((b, s), -1, np.int32)
    pos = np.zeros((b, s), np.int32)
    for i in range(b):
        c = g = 0
        while c < s - 4 and g < n_seg:
            ln = min(int(rng.integers(6, 30)), s - c)
            seg[i, c:c + ln] = g
            pos[i, c:c + ln] = np.arange(ln)
            c, g = c + ln, g + 1
    ids = rng.integers(4, cfg.n_vocab, size=(b, s)).astype(np.int32)
    ids[seg < 0] = 0
    a = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg,
        ComputeOptions(dtype="float32", attn_impl="xla"), n_seg=n_seg,
    ))
    bb = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg,
        ComputeOptions(dtype="float32", attn_impl="pallas"), n_seg=n_seg,
    ))
    np.testing.assert_allclose(a, bb, atol=tpu_atol(2e-5), rtol=1e-4)
