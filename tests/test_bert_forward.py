"""BERT forward-pass correctness.

Parity gates (SURVEY.md §7): cosine >= 0.9999 vs HF torch per full forward,
padded-batch outputs identical to per-sentence outputs, Q4 fused-layout path
equal to the dequantize-at-load path.
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

CFG = BertConfig(
    n_vocab=128, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    name="tiny-test",
)
F32 = ComputeOptions(dtype="float32")


def _ids_and_mask(rng, batch, max_len, lens=None):
    if lens is None:
        lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(0, CFG.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def test_padded_batch_equals_per_sentence():
    rng = np.random.default_rng(0)
    params = random_params(CFG, seed=1)
    ids, mask, lens = _ids_and_mask(rng, 5, 32)

    batched = np.asarray(bert_embed_batch(params, ids, mask, CFG, F32))
    for i, l in enumerate(lens):
        single = np.asarray(
            bert_embed_batch(
                params, ids[i : i + 1, :l], mask[i : i + 1, :l], CFG, F32
            )
        )[0]
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=1e-4)


def test_output_is_l2_normalized():
    rng = np.random.default_rng(3)
    params = random_params(CFG, seed=1)
    ids, mask, _ = _ids_and_mask(rng, 4, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, CFG, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("ftype", [GGUFFileType.MOSTLY_Q4_0, GGUFFileType.MOSTLY_Q4_1])
def test_q4_fused_layout_equals_dequant_load(ftype):
    """'auto' (packed Q4, dequant on the fly) must equal 'dequant' (dense at
    load) — same math, different layout."""
    rng = np.random.default_rng(5)
    packed = random_params(CFG, ftype, seed=2, weight_mode="auto")
    dense = random_params(CFG, ftype, seed=2, weight_mode="dequant")
    ids, mask, _ = _ids_and_mask(rng, 3, 24)
    a = np.asarray(bert_embed_batch(packed, ids, mask, CFG, F32))
    b = np.asarray(bert_embed_batch(dense, ids, mask, CFG, F32))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_q4_score_stays_close_to_f32():
    """4-bit weights should perturb embeddings, not destroy them (the
    reference's observed quant delta is ~0.01 Spearman)."""
    rng = np.random.default_rng(6)
    f32p = random_params(CFG, GGUFFileType.ALL_F32, seed=3)
    q4p = random_params(CFG, GGUFFileType.MOSTLY_Q4_0, seed=3)
    ids, mask, _ = _ids_and_mask(rng, 8, 24)
    a = np.asarray(bert_embed_batch(f32p, ids, mask, CFG, F32))
    b = np.asarray(bert_embed_batch(q4p, ids, mask, CFG, F32))
    cos = np.sum(a * b, axis=-1)  # both L2-normalized
    assert np.all(cos > 0.95), cos


def test_bfloat16_close_to_f32():
    rng = np.random.default_rng(7)
    params = random_params(CFG, seed=4)
    ids, mask, _ = _ids_and_mask(rng, 4, 16)
    a = np.asarray(bert_embed_batch(params, ids, mask, CFG, F32))
    b = np.asarray(
        bert_embed_batch(params, ids, mask, CFG, ComputeOptions(dtype="bfloat16"))
    )
    cos = np.sum(a * b, axis=-1)
    assert np.all(cos > 0.999), cos


def test_hf_parity():
    """Full-forward cosine >= 0.9999 and max abs err small vs HF torch
    BertModel with identical random weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    sd = random_state_dict(CFG, seed=9)
    hf_config = transformers.BertConfig(
        vocab_size=CFG.n_vocab,
        hidden_size=CFG.n_embd,
        num_hidden_layers=CFG.n_layer,
        num_attention_heads=CFG.n_head,
        intermediate_size=CFG.n_ff,
        max_position_embeddings=CFG.n_ctx,
        layer_norm_eps=CFG.layer_norm_eps,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_config, add_pooling_layer=False)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    # only non-persistent/position_ids style buffers may be missing
    assert not unexpected
    assert all("position_ids" in m for m in missing), missing

    rng = np.random.default_rng(10)
    ids, mask, _ = _ids_and_mask(rng, 6, 20)
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    from embedding_cpp_tpu.models.params import build_params, source_from_arrays

    params = build_params(source_from_arrays(sd), CFG)
    got = np.asarray(bert_embed_batch(params, ids, mask, CFG, F32))

    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_pooling_modes():
    """cls/max/no-normalize pooling vs manual computation."""
    import dataclasses

    from embedding_cpp_tpu.models.bert import pool_normalize
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)

    xm = np.asarray(x)
    # cls
    cls = np.asarray(pool_normalize(x, jnp.asarray(mask), "cls", False))
    np.testing.assert_allclose(cls, xm[:, 0], atol=1e-6)
    # max ignores masked positions
    mx = np.asarray(pool_normalize(x, jnp.asarray(mask), "max", False))
    np.testing.assert_allclose(mx[0], xm[0, :3].max(0), atol=1e-6)
    np.testing.assert_allclose(mx[1], xm[1].max(0), atol=1e-6)
    # normalize=True gives unit norm
    nn = np.asarray(pool_normalize(x, jnp.asarray(mask), "max", True))
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-6)

    # end-to-end: cls-pooling config flows through bert_embed_batch
    cfg = dataclasses.replace(CFG, pooling="cls")
    params = random_params(cfg, seed=1)
    rng = np.random.default_rng(12)
    ids, m, _ = _ids_and_mask(rng, 3, 16)
    out_cls = np.asarray(bert_embed_batch(params, ids, m, cfg, F32))
    out_mean = np.asarray(bert_embed_batch(params, ids, m, CFG, F32))
    assert not np.allclose(out_cls, out_mean)
    np.testing.assert_allclose(np.linalg.norm(out_cls, axis=-1), 1.0, atol=1e-5)


def test_pooling_kv_roundtrip(tmp_path):
    """Pooling config survives GGUF write -> load."""
    import dataclasses

    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.gguf import GGUFFileType, GGUFReader
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.models.params import random_state_dict
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    cfg = dataclasses.replace(CFG, n_vocab=1000, pooling="cls", normalize=False)
    path = tmp_path / "cls.gguf"
    write_bert_gguf(path, cfg, random_state_dict(cfg, 0),
                    build_tokenizer_json(1000), GGUFFileType.ALL_F32)
    with GGUFReader(path) as r:
        from embedding_cpp_tpu.models import BertConfig

        cfg2 = BertConfig.from_gguf_kv(r.kv)
    assert cfg2.pooling == "cls"
    assert cfg2.normalize is False
