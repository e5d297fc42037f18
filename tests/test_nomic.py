"""nomic-bert encoder family (RoPE + SwiGLU post-norm — HF NomicBertModel).

transformers ships no NomicBert class (the HF checkpoints use
trust_remote_code), so the parity gate here is a line-for-line torch
reimplementation of modeling_hf_nomic_bert.py's documented semantics
(NomicBertEmbeddings + emb_ln, NomicBertBlock post-norm path,
NomicBertGatedMLP's fc11 * silu(fc12) halves, rotate-half RoPE at
rotary_emb_base, dynamic-NTK base scaling) — every assumption the JAX
forward makes is therefore pinned by an independent implementation of the
same public source.  Real-checkpoint verification is environment-blocked
(zero egress), like the MTEB score gates in test_real_model.py.
"""
import dataclasses
import json

import numpy as np
import pytest

from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_params,
    random_state_dict,
)
from embedding_cpp_tpu.models.params import build_params, source_from_arrays

F32 = ComputeOptions(dtype="float32")

CFG = BertConfig(
    n_vocab=300, n_ctx=128, n_embd=64, n_layer=3, n_head=4, n_ff=96,
    arch="nomic-bert", rope_theta=1000.0, rope_max_trained=2048,
    ffn_act="silu", ffn_gated=True, attn_bias=False, ffn_bias=False,
    name="tiny-nomic",
)


def _ids_and_mask(rng, cfg, batch, max_len):
    lens = rng.integers(3, max_len + 1, size=batch)
    ids = np.zeros((batch, max_len), dtype=np.int32)
    mask = np.zeros((batch, max_len), dtype=np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(4, cfg.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask


def _torch_forward(cfg, sd, ids, mask):
    """Reference NomicBertModel semantics in torch (see module docstring)."""
    torch = pytest.importorskip("torch")
    t = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in sd.items()}
    ids_t = torch.from_numpy(ids).long()
    B, S = ids.shape
    d = cfg.n_embd // cfg.n_head

    def ln(x, w, b):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), w, b, cfg.layer_norm_eps
        )

    x = t["embeddings.word_embeddings.weight"][ids_t]
    x = x + t["embeddings.token_type_embeddings.weight"][0]
    x = ln(x, t["emb_ln.weight"], t["emb_ln.bias"])

    # rotate-half RoPE at the (possibly NTK-scaled) base
    base = cfg.rope_theta
    if cfg.rope_scaling_factor > 0 and S > cfg.rope_max_trained:
        f = cfg.rope_scaling_factor
        base = base * ((f * S / cfg.rope_max_trained) - (f - 1.0)) ** (
            d / (d - 2.0)
        )
    inv = torch.tensor(
        base ** -(np.arange(0, d, 2, dtype=np.float64) / d),
        dtype=torch.float32,
    )
    pos = torch.arange(S, dtype=torch.float32)
    freqs = pos[:, None] * inv[None, :]
    emb = torch.cat([freqs, freqs], dim=-1)
    cos, sin = emb.cos(), emb.sin()

    def rope(v):  # v [B, S, H, d]
        half = torch.cat([-v[..., d // 2:], v[..., : d // 2]], dim=-1)
        return v * cos[None, :, None, :] + half * sin[None, :, None, :]

    bias = torch.where(
        torch.from_numpy(mask).bool(), 0.0, -1e9
    )[:, None, None, :]
    for i in range(cfg.n_layer):
        p = f"encoder.layers.{i}."
        qkv = x @ t[p + "attn.Wqkv.weight"].T
        if cfg.attn_bias:
            qkv = qkv + t[p + "attn.Wqkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        q = rope(q.view(B, S, cfg.n_head, d))
        k = rope(k.view(B, S, cfg.n_head, d))
        v = v.view(B, S, cfg.n_head, d)
        sc = torch.einsum("bqhd,bkhd->bhqk", q, k) / d**0.5 + bias
        att = torch.einsum(
            "bhqk,bkhd->bqhd", sc.softmax(-1), v
        ).reshape(B, S, cfg.n_embd)
        att = att @ t[p + "attn.out_proj.weight"].T
        if cfg.attn_bias:
            att = att + t[p + "attn.out_proj.bias"]
        x = ln(x + att, t[p + "norm1.weight"], t[p + "norm1.bias"])
        y = x @ t[p + "mlp.fc11.weight"].T
        g = x @ t[p + "mlp.fc12.weight"].T
        if cfg.ffn_bias:
            y = y + t[p + "mlp.fc11.bias"]
            g = g + t[p + "mlp.fc12.bias"]
        m = (y * torch.nn.functional.silu(g)) @ t[p + "mlp.fc2.weight"].T
        if cfg.ffn_bias:
            m = m + t[p + "mlp.fc2.bias"]
        x = ln(x + m, t[p + "norm2.weight"], t[p + "norm2.bias"])

    m = torch.from_numpy(mask)[..., None].float()
    pooled = (x * m).sum(1) / m.sum(1)
    out = pooled / pooled.norm(dim=-1, keepdim=True)
    return out.numpy()


@pytest.mark.parametrize("attn_bias,ffn_bias", [(False, False), (True, True)])
def test_reference_parity(attn_bias, ffn_bias):
    """JAX forward == the torch reference on identical random weights —
    both bias layouts (published checkpoints are bias-free; the flags also
    cover community variants that keep biases)."""
    cfg = dataclasses.replace(CFG, attn_bias=attn_bias, ffn_bias=ffn_bias)
    sd = random_state_dict(cfg, seed=11)
    rng = np.random.default_rng(12)
    ids, mask = _ids_and_mask(rng, cfg, 4, 24)
    expected = _torch_forward(cfg, sd, ids, mask)
    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    cos = np.sum(got * expected, axis=-1)
    assert np.all(cos > 0.9999), cos
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_ntk_scaling_kicks_in_past_trained_length():
    """Dynamic-NTK: past max_trained_positions the rotary base scales by
    ((f*S/max) - (f-1)) ** (d/(d-2)); below it the plain base applies."""
    from embedding_cpp_tpu.models.nomic import _inv_freq

    cfg = dataclasses.replace(CFG, rope_scaling_factor=2.0,
                              rope_max_trained=32, n_ctx=128)
    d = cfg.head_dim
    below = _inv_freq(cfg, 32)
    np.testing.assert_allclose(
        below, cfg.rope_theta ** -(np.arange(0, d, 2) / d), rtol=1e-6
    )
    above = _inv_freq(cfg, 64)
    scaled = cfg.rope_theta * ((2.0 * 64 / 32) - 1.0) ** (d / (d - 2.0))
    np.testing.assert_allclose(
        above, scaled ** -(np.arange(0, d, 2) / d), rtol=1e-6
    )
    # and the torch reference agrees end-to-end at S > max_trained
    sd = random_state_dict(cfg, seed=3)
    rng = np.random.default_rng(4)
    ids, mask = _ids_and_mask(rng, cfg, 2, 64)
    expected = _torch_forward(cfg, sd, ids, mask)
    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_padded_batch_equals_per_sentence():
    params = random_params(CFG, seed=5)
    rng = np.random.default_rng(6)
    ids, mask = _ids_and_mask(rng, CFG, 5, 20)
    batched = np.asarray(bert_embed_batch(params, ids, mask, CFG, F32))
    for i in range(5):
        n = int(mask[i].sum())
        one = np.asarray(bert_embed_batch(
            params, ids[i : i + 1, :n], mask[i : i + 1, :n], CFG, F32
        ))
        np.testing.assert_allclose(batched[i], one[0], atol=2e-5, rtol=1e-4)


def test_packed_equals_plain():
    from embedding_cpp_tpu.models.bert import bert_embed_packed
    from embedding_cpp_tpu.runtime.batching import pack_segments

    params = random_params(CFG, seed=7)
    rng = np.random.default_rng(8)
    token_lists = [
        rng.integers(4, CFG.n_vocab, size=rng.integers(3, 12)).tolist()
        for _ in range(6)
    ]
    plain = []
    for toks in token_lists:
        ids = np.asarray([toks], np.int32)
        m = np.ones_like(ids)
        plain.append(np.asarray(
            bert_embed_batch(params, ids, m, CFG, F32))[0])
    (pb,) = pack_segments(token_lists, list(range(6)), 0, seq_len=32, n_seg=8)
    packed = np.asarray(bert_embed_packed(
        params, pb.ids, pb.seg, pb.pos, CFG, F32, n_seg=8
    ))
    for j, orig in enumerate(pb.orig):
        row, slot = divmod(pb.slots[j], 8)
        np.testing.assert_allclose(
            packed[row, slot], plain[orig], atol=2e-5, rtol=1e-4
        )


def test_gguf_roundtrip(tmp_path):
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = str(tmp_path / "nomic.gguf")
    make_test_model(path, "tiny-nomic", "q4_0")
    e = Engine.from_gguf(path)
    assert e.config.arch == "nomic-bert"
    assert e.config.rope_theta == 1000.0
    assert e.config.rope_scaling_factor == 2.0
    assert not e.config.attn_bias and not e.config.ffn_bias
    assert e.config.ffn_act == "silu" and e.config.ffn_gated
    v = e.encode(["hello world", "another test"])
    assert v.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_conversion_from_hf_dir(tmp_path):
    """A local nomic_bert checkpoint dir converts; bias flags come from the
    serialized tensors (the checkpoint ground truth), and the loaded engine
    matches the torch reference."""
    pytest.importorskip("safetensors")
    pytest.importorskip("tokenizers")
    from safetensors.numpy import save_file

    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    sd = random_state_dict(CFG, seed=9)
    d = tmp_path / "nomic-ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "architectures": ["NomicBertModel"], "model_type": "nomic_bert",
        "vocab_size": CFG.n_vocab, "n_embd": CFG.n_embd,
        "n_layer": CFG.n_layer, "n_head": CFG.n_head, "n_inner": CFG.n_ff,
        "n_positions": CFG.n_ctx, "activation_function": "swiglu",
        "rotary_emb_base": 1000.0, "rotary_emb_fraction": 1.0,
        "rotary_emb_interleaved": False, "max_trained_positions": 2048,
        "qkv_proj_bias": False, "mlp_fc1_bias": False,
        "mlp_fc2_bias": False, "type_vocab_size": 2,
        "layer_norm_epsilon": 1e-12,
    }))
    tok_json = build_tokenizer_json(CFG.n_vocab)
    (d / "tokenizer.json").write_bytes(
        tok_json if isinstance(tok_json, (bytes, bytearray))
        else tok_json.encode()
    )
    save_file(dict(sd), str(d / "model.safetensors"))
    out = tmp_path / "nomic.gguf"
    convert_hf_dir(d, out, "f32")
    e = Engine.from_gguf(str(out))
    assert e.config.arch == "nomic-bert" and not e.config.attn_bias
    rng = np.random.default_rng(10)
    ids, mask = _ids_and_mask(rng, CFG, 3, 16)
    expected = _torch_forward(CFG, sd, ids, mask)
    got = e.embed_tokens([list(ids[i][: mask[i].sum()]) for i in range(3)])
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_config_validation():
    with pytest.raises(ValueError, match="swiglu"):
        BertConfig.from_hf_config({
            "model_type": "nomic_bert", "vocab_size": 100, "n_embd": 32,
            "n_layer": 1, "n_head": 2, "n_inner": 64,
            "activation_function": "gelu", "rotary_emb_fraction": 1.0,
        })
    with pytest.raises(ValueError, match="rotary_emb_fraction"):
        BertConfig.from_hf_config({
            "model_type": "nomic_bert", "vocab_size": 100, "n_embd": 32,
            "n_layer": 1, "n_head": 2, "n_inner": 64,
            "rotary_emb_fraction": 0.5,
        })
    with pytest.raises(ValueError, match="classification"):
        from embedding_cpp_tpu.models.bert import bert_score_batch

        params = random_params(CFG, seed=0)
        bert_score_batch(params, np.zeros((1, 8), np.int32),
                         np.ones((1, 8), np.int32), CFG, F32)


def test_mesh_gspmd_equals_shard_map(eight_devices):
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import (
        shard_params_and_make_forward,
    )
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    # wider dims: tp=4 needs (K/32) % 4 == 0 (Q4 block alignment)
    cfg = dataclasses.replace(CFG, n_embd=128, n_ff=256, n_vocab=256)
    params = random_params(cfg, seed=13)
    rng = np.random.default_rng(14)
    ids, mask = _ids_and_mask(rng, cfg, 4, 16)
    outs = []
    for maker in (shard_params_and_make_forward,
                  shard_params_and_make_forward_manual):
        sh, fwd = maker(params, cfg, F32, mesh)
        outs.append(np.asarray(fwd(sh, ids, mask)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=1e-4)
    single = np.asarray(bert_embed_batch(
        random_params(cfg, seed=13), ids, mask, cfg, F32))
    np.testing.assert_allclose(outs[0], single, atol=2e-5, rtol=1e-4)
