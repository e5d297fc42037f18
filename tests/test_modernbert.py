"""ModernBERT encoder family (HF ModernBertModel — gte-modernbert /
nomic-modernbert base).

The reference accepts only the BertModel architecture
(convert-to-gguf.py:133-136); this family adds pre-norm blocks, RoPE with
per-layer theta, alternating global/local attention, GeGLU, and bias-free
norms/linears (models/modernbert.py).  Gated with the same criterion as
every family: full-forward cosine >= 0.9999 vs HF torch on identical
random weights — plus packed-vs-plain equality (RoPE + window masks under
per-segment positions) and the fused Wqkv/Wi load-time split under Q4/Q8.
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
from embedding_cpp_tpu.models.bert import bert_embed_packed
from embedding_cpp_tpu.models.params import build_params, source_from_arrays

F32 = ComputeOptions(dtype="float32")

# 4 layers cover the alternation (global, local, local, global); window 8
# (|q-k| <= 4) is well under the test sequence lengths, so local masking
# actually changes scores
MB_CFG = BertConfig(
    n_vocab=160, n_ctx=64, n_embd=64, n_layer=4, n_head=4, n_ff=128,
    n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
    rope_theta=160000.0, local_rope_theta=10000.0,
    global_attn_every=3, local_window=8, name="tiny-modernbert",
)


def _ids_and_mask(rng, cfg, batch, max_len):
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask, lens


def _hf_model(cfg, sd):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_config = transformers.ModernBertConfig(
        vocab_size=cfg.n_vocab,
        hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer,
        num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx,
        global_attn_every_n_layers=cfg.global_attn_every,
        local_attention=cfg.local_window,
        global_rope_theta=cfg.rope_theta,
        local_rope_theta=cfg.local_rope_theta,
        norm_eps=cfg.layer_norm_eps,
        attention_dropout=0.0,
        mlp_dropout=0.0,
        embedding_dropout=0.0,
        reference_compile=False,
        attn_implementation="sdpa",
        pad_token_id=0,
    )
    model = transformers.ModernBertModel(hf_config)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    # our state dict covers the HF module tree exactly: layer 0 has no
    # attn_norm on either side (nn.Identity), inv_freq is a non-persistent
    # buffer
    assert not missing and not unexpected, (missing, unexpected)
    return model, torch


def test_schema_layer0_attn_norm_absent():
    from embedding_cpp_tpu.models import schema

    names0 = schema.layer_tensor_names(0, MB_CFG)
    names1 = schema.layer_tensor_names(1, MB_CFG)
    assert "layers.0.attn_norm.weight" not in names0
    assert "layers.1.attn_norm.weight" in names1
    assert "layers.0.attn.Wqkv.weight" in names0
    key, shape_fn = names0["layers.0.attn.Wqkv.weight"]
    assert key == "wqkv" and shape_fn(MB_CFG) == (3 * 64, 64)
    key, shape_fn = names0["layers.0.mlp.Wi.weight"]
    assert key == "wi" and shape_fn(MB_CFG) == (2 * 128, 64)
    extra = schema.extra_tensors(MB_CFG)
    assert extra["final_norm.weight"][0] == "final_ln_scale"
    assert "final_norm.weight" in schema.all_tensor_names(4, MB_CFG)


def test_params_split_and_layer0_pad():
    params = random_params(MB_CFG, seed=1)
    layers = params["layers"]
    for k in ("q_w", "k_w", "v_w"):
        assert layers[k].shape == (4, 64, 64)
    assert layers["ffn_up_w"].shape == (4, 64, 128)
    assert layers["ffn_gate_w"].shape == (4, 64, 128)
    # layer 0's synthesized (never-read) attn_norm row is ones
    np.testing.assert_array_equal(
        np.asarray(layers["ln_att_scale"][0]), np.ones(64, np.float32)
    )
    assert "final_ln_scale" in params
    # no biases anywhere
    assert not any(k.endswith("_b") for k in layers)

    # the split halves match a manual split of the fused state-dict tensors
    sd = random_state_dict(MB_CFG, seed=1)
    wqkv = sd["layers.2.attn.Wqkv.weight"]  # [3E, E]
    np.testing.assert_allclose(
        np.asarray(layers["k_w"][2]), wqkv[64:128].T, rtol=1e-6
    )
    wi = sd["layers.2.mlp.Wi.weight"]  # [2F, E]
    np.testing.assert_allclose(
        np.asarray(layers["ffn_gate_w"][2]), wi[128:].T, rtol=1e-6
    )


def test_modernbert_hf_parity():
    """Full forward vs HF torch: pre-norm, RoPE (global 160k / local 10k
    theta), sliding-window local layers, GeGLU, final_norm."""
    cfg = MB_CFG
    sd = random_state_dict(cfg, seed=21)
    model, torch = _hf_model(cfg, sd)

    rng = np.random.default_rng(22)
    ids, mask, _ = _ids_and_mask(rng, cfg, 5, 24)
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


def test_local_window_actually_masks():
    """The local layers must differ from all-global: the same weights with
    local_window large enough to cover the whole sequence give a different
    forward than the tight window."""
    params = random_params(MB_CFG, seed=3)
    wide = dataclasses.replace(MB_CFG, local_window=4 * 64)
    rng = np.random.default_rng(4)
    ids, mask, _ = _ids_and_mask(rng, MB_CFG, 3, 24)
    tight_out = np.asarray(bert_embed_batch(params, ids, mask, MB_CFG, F32))
    wide_out = np.asarray(bert_embed_batch(params, ids, mask, wide, F32))
    assert np.abs(tight_out - wide_out).max() > 1e-3


def test_padded_batch_equals_per_sentence():
    rng = np.random.default_rng(5)
    params = random_params(MB_CFG, seed=6)
    ids, mask, lens = _ids_and_mask(rng, MB_CFG, 4, 24)
    batched = np.asarray(bert_embed_batch(params, ids, mask, MB_CFG, F32))
    for i, l in enumerate(lens):
        single = np.asarray(
            bert_embed_batch(
                params, ids[i : i + 1, :l], mask[i : i + 1, :l], MB_CFG, F32
            )
        )[0]
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=1e-4)


def test_packed_equals_plain():
    """Per-segment positions reproduce RoPE rotations and window distances
    of the unpacked sentences; cross-segment pairs are masked."""
    params = random_params(MB_CFG, seed=7)
    rng = np.random.default_rng(8)
    ids, mask, lens = _ids_and_mask(rng, MB_CFG, 4, 12)

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
        bert_embed_packed(
            params, row_ids, row_seg, row_pos, MB_CFG, F32, n_seg=4
        )
    )[0]
    plain = np.asarray(bert_embed_batch(params, ids, mask, MB_CFG, F32))
    np.testing.assert_allclose(packed, plain, atol=2e-5, rtol=1e-4)


def test_packed_pallas_matches_xla():
    """Packed ModernBERT through the fused route (resident [1, S, S]
    window bias + in-kernel segment mask, models/modernbert._attention)
    == the XLA einsum path with per-row [B, S, S] biases."""
    cfg = dataclasses.replace(MB_CFG, n_ctx=256)
    params = random_params(cfg, seed=21)
    rng = np.random.default_rng(22)
    b, s, n_seg = 2, 128, 8
    seg = np.full((b, s), -1, np.int32)
    pos = np.zeros((b, s), np.int32)
    for i in range(b):
        c = g = 0
        while c < s - 4 and g < n_seg:
            l = min(int(rng.integers(6, 30)), s - c)
            seg[i, c:c + l] = g
            pos[i, c:c + l] = np.arange(l)
            c, g = c + l, g + 1
    ids = rng.integers(1, cfg.n_vocab, size=(b, s)).astype(np.int32)
    ids[seg < 0] = 0
    a = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg,
        ComputeOptions(dtype="float32", attn_impl="xla"), n_seg=n_seg,
    ))
    bb = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg,
        ComputeOptions(dtype="float32", attn_impl="pallas"), n_seg=n_seg,
    ))
    np.testing.assert_allclose(a, bb, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("ftype", [GGUFFileType.MOSTLY_Q4_0,
                                   GGUFFileType.MOSTLY_Q8_0],
                         ids=["q4_0", "q8_0"])
def test_quantized_forward_runs(ftype):
    """The fused Wqkv/Wi tensors quantize as single [out, in] matrices and
    split exactly at load (blocks run along the contraction axis)."""
    rng = np.random.default_rng(9)
    params = random_params(MB_CFG, ftype, seed=10)
    from embedding_cpp_tpu.ops.qtensor import QTensor

    assert isinstance(params["layers"]["q_w"], QTensor)
    assert isinstance(params["layers"]["ffn_gate_w"], QTensor)
    ids, mask, _ = _ids_and_mask(rng, MB_CFG, 3, 16)
    out = np.asarray(bert_embed_batch(params, ids, mask, MB_CFG, F32))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    # quantized split dequantizes close to the dense split (rounding only)
    dense = random_params(MB_CFG, seed=10)
    from embedding_cpp_tpu.ops.qtensor import dequantize

    approx = np.asarray(dequantize(params["layers"]["k_w"]))
    exact = np.asarray(dense["layers"]["k_w"])
    assert approx.shape == exact.shape
    assert np.abs(approx - exact).max() < 0.05  # quantization rounding only


def test_quantized_split_matches_dense_split():
    """Splitting the quantized fused tensor row-wise must dequantize to the
    same values as quantizing the already-split halves (block alignment)."""
    from embedding_cpp_tpu.gguf.quant import dequantize as deq, quantize as q
    from embedding_cpp_tpu.gguf.constants import GGMLType

    rng = np.random.default_rng(11)
    w = rng.standard_normal((6 * 32, 64)).astype(np.float32)  # [3E, E]-like
    raw = q(w.reshape(-1), GGMLType.Q4_0)
    # full dequant then row split
    full = deq(raw, GGMLType.Q4_0, w.size).reshape(w.shape)
    for j in range(3):
        sub = w[j * 64 : (j + 1) * 64]
        sub_raw = q(sub.reshape(-1), GGMLType.Q4_0)
        sub_deq = deq(sub_raw, GGMLType.Q4_0, sub.size).reshape(sub.shape)
        np.testing.assert_array_equal(full[j * 64 : (j + 1) * 64], sub_deq)


def test_gguf_roundtrip_kv_and_engine(tmp_path):
    """Synthetic modernbert GGUF -> Engine -> encode: rope/local-attention
    kv keys survive, the BPE tokenizer engages, embeddings normalize."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.gguf import GGUFReader
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / "tiny-modernbert.gguf"
    make_test_model(str(path), "tiny-modernbert", "q4_0")
    with GGUFReader(path) as r:
        cfg2 = BertConfig.from_gguf_kv(r.kv)
        assert "embeddings.position_embeddings.weight" not in r.tensors
        assert "layers.0.attn_norm.weight" not in r.tensors
        assert "layers.1.attn_norm.weight" in r.tensors
    assert cfg2.arch == "modernbert"
    assert cfg2.rope_theta == 160000.0
    assert cfg2.local_rope_theta == 10000.0
    assert cfg2.global_attn_every == 3 and cfg2.local_window == 16

    eng = Engine.from_gguf(str(path))
    out = eng.encode(["hello world", "It's the quick brown fox."])
    assert out.shape == (2, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_hf_dir_conversion_end_to_end(tmp_path):
    """A local HF ModernBERT checkpoint dir (config.json model_type
    modernbert, torch weights, byte-level BPE tokenizer.json) through
    convert_hf_dir -> Engine.encode, gated vs torch mean-pool+L2 on the
    same tokenization."""
    import json

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer

    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.tokenizer.testvocab import build_bpe_tokenizer_json

    tokenizer_json = build_bpe_tokenizer_json(600)
    spec = json.loads(tokenizer_json)
    ids = list(spec["model"]["vocab"].values()) + [
        t["id"] for t in spec.get("added_tokens", [])
    ]
    n_vocab = max(ids) + 1

    hf_config = transformers.ModernBertConfig(
        vocab_size=n_vocab,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=128,
        global_attn_every_n_layers=3,
        local_attention=16,
        global_rope_theta=160000.0,
        local_rope_theta=10000.0,
        norm_eps=1e-5,
        attention_dropout=0.0,
        mlp_dropout=0.0,
        embedding_dropout=0.0,
        reference_compile=False,
        attn_implementation="sdpa",
        pad_token_id=1,
    )
    model = transformers.ModernBertModel(hf_config)
    model.eval()

    src = tmp_path / "hf-modernbert"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(tokenizer_json)

    out = tmp_path / "modernbert.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)
    assert eng.config.arch == "modernbert"
    assert eng.config.rope_theta == 160000.0 and eng.config.local_window == 16

    texts = ["hello world", "the quick brown fox jumps over the lazy dog",
             "a b c d e f g h i j k l m n o p q r s t"]
    got = eng.encode(texts)

    hf_tok = Tokenizer.from_str(tokenizer_json.decode())
    framed = [
        [eng.special_ids.cls]
        + hf_tok.encode(t, add_special_tokens=False).ids
        + [eng.special_ids.sep]
        for t in texts
    ]
    max_len = max(len(f) for f in framed)
    tok_ids = np.full((len(texts), max_len), eng.special_ids.pad, np.int64)
    mask = np.zeros((len(texts), max_len), np.int64)
    for i, f in enumerate(framed):
        tok_ids[i, : len(f)] = f
        mask[i, : len(f)] = 1
    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(tok_ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    pooled = (hidden * m).sum(1) / m.sum(1)
    expected = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos


def test_from_hf_config():
    c = BertConfig.from_hf_config(
        {
            "model_type": "modernbert", "vocab_size": 50368,
            "hidden_size": 768, "num_hidden_layers": 22,
            "num_attention_heads": 12, "intermediate_size": 1152,
            "max_position_embeddings": 8192, "norm_eps": 1e-5,
            "global_rope_theta": 160000.0, "local_rope_theta": 10000.0,
            "global_attn_every_n_layers": 3, "local_attention": 128,
        }
    )
    assert c.arch == "modernbert" and c.n_token_types == 0
    assert c.rope_theta == 160000.0 and c.local_rope_theta == 10000.0
    assert c.global_attn_every == 3 and c.local_window == 128
    with pytest.raises(ValueError, match="bias"):
        BertConfig.from_hf_config(
            {
                "model_type": "modernbert", "vocab_size": 100,
                "hidden_size": 32, "num_hidden_layers": 2,
                "num_attention_heads": 4, "intermediate_size": 64,
                "attention_bias": True,
            }
        )
