"""Sentence-transformers Dense projection head (pool -> dense -> L2).

Our extension over the reference, which drops non-BertModel module weights
entirely (convert-to-gguf.py skips them; its hard-coded mean+L2 is the
FIXME at bert.cpp:998).  Models like LaBSE project the pooled vector
through a tanh Dense layer before normalization.
"""
import dataclasses
import json

import numpy as np
import pytest

from conftest import tpu_atol

from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_params,
    random_state_dict,
)

BASE = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    name="dense-test",
)
DENSE = dataclasses.replace(BASE, dense_out=48, dense_activation="tanh")
F32 = ComputeOptions(dtype="float32")


def _ids_mask(rng, batch=4, seq=24):
    lens = rng.integers(3, seq + 1, size=batch)
    ids = np.zeros((batch, seq), np.int32)
    mask = np.zeros((batch, seq), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, BASE.n_vocab, size=l)
        mask[i, :l] = 1
    return ids, mask


@pytest.mark.parametrize("activation", ["tanh", "identity"])
def test_dense_head_math(activation):
    """forward(dense config) == l2(act(pooled @ W.T + b)) computed by hand
    from the base model's unnormalized pooled output."""
    cfg = dataclasses.replace(DENSE, dense_activation=activation)
    sd = random_state_dict(cfg, seed=0)
    from embedding_cpp_tpu.models.params import build_params, source_from_arrays

    params = build_params(source_from_arrays(sd), cfg)

    base_cfg = dataclasses.replace(BASE, normalize=False)
    base_params = build_params(
        source_from_arrays({k: v for k, v in sd.items()
                            if not k.startswith("dense.")}),
        base_cfg,
    )

    rng = np.random.default_rng(1)
    ids, mask = _ids_mask(rng)
    pooled = np.asarray(bert_embed_batch(base_params, ids, mask, base_cfg, F32))
    w = sd["dense.linear.weight"]  # [out, in]
    b = sd["dense.linear.bias"]
    y = pooled @ w.T + b
    if activation == "tanh":
        y = np.tanh(y)
    want = y / np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-12)

    got = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    assert got.shape == (ids.shape[0], cfg.dense_out)
    np.testing.assert_allclose(got, want, atol=tpu_atol(2e-5), rtol=1e-4)


def test_dense_gguf_roundtrip(tmp_path):
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.gguf import GGUFReader, Keys
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.models.params import load_params
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    sd = random_state_dict(DENSE, seed=2)
    path = tmp_path / "dense.gguf"
    write_bert_gguf(path, DENSE, sd, build_tokenizer_json(DENSE.n_vocab))
    with GGUFReader(path) as r:
        assert r.kv[Keys.DENSE_OUT] == DENSE.dense_out
        assert r.kv[Keys.DENSE_ACTIVATION] == "tanh"
        params, cfg = load_params(r)
    assert cfg.dense_out == DENSE.dense_out
    assert params["dense"]["w"].shape == (DENSE.n_embd, DENSE.dense_out)

    rng = np.random.default_rng(3)
    ids, mask = _ids_mask(rng)
    out = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))
    assert out.shape == (ids.shape[0], DENSE.dense_out)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_dense_packed_matches_unpacked():
    from embedding_cpp_tpu.models.bert import bert_embed_packed
    from embedding_cpp_tpu.models.params import build_params, source_from_arrays
    from embedding_cpp_tpu.runtime.batching import pack_segments

    sd = random_state_dict(DENSE, seed=4)
    params = build_params(source_from_arrays(sd), DENSE)
    rng = np.random.default_rng(5)
    toks = [list(rng.integers(1, DENSE.n_vocab, size=rng.integers(3, 15)))
            for _ in range(11)]
    (pb,) = pack_segments(toks, list(range(len(toks))), 0, seq_len=64, n_seg=16)
    vecs = np.asarray(
        bert_embed_packed(params, pb.ids, pb.seg, pb.pos, DENSE, F32,
                          n_seg=pb.n_seg)
    )
    for r, row in enumerate(pb.positions):
        for g, orig in enumerate(row):
            t = toks[orig]
            ids = np.asarray([t], np.int32)
            mask = np.ones_like(ids)
            want = np.asarray(bert_embed_batch(params, ids, mask, DENSE, F32))[0]
            np.testing.assert_allclose(vecs[r, g], want, atol=tpu_atol(2e-5),
                                       rtol=1e-4)


def test_convert_st_dense_dir(tmp_path):
    """A synthetic sentence-transformers layout with a 2_Dense module
    converts with the head attached."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.gguf import GGUFReader, Keys
    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    d = tmp_path / "model"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "architectures": ["BertModel"],
        "vocab_size": BASE.n_vocab, "hidden_size": BASE.n_embd,
        "num_hidden_layers": BASE.n_layer, "num_attention_heads": BASE.n_head,
        "intermediate_size": BASE.n_ff, "max_position_embeddings": BASE.n_ctx,
        "layer_norm_eps": 1e-12, "type_vocab_size": 2,
    }))
    (d / "tokenizer.json").write_bytes(build_tokenizer_json(BASE.n_vocab))
    sd = random_state_dict(BASE, seed=6)
    from safetensors.numpy import save_file

    save_file(sd, str(d / "model.safetensors"))

    dd = d / "2_Dense"
    dd.mkdir()
    (dd / "config.json").write_text(json.dumps({
        "in_features": BASE.n_embd, "out_features": 48, "bias": True,
        "activation_function": "torch.nn.modules.activation.Tanh",
    }))
    rng = np.random.default_rng(7)
    save_file({
        "linear.weight": rng.standard_normal((48, BASE.n_embd)).astype(np.float32),
        "linear.bias": np.zeros(48, np.float32),
    }, str(dd / "model.safetensors"))

    out = tmp_path / "out.gguf"
    convert_hf_dir(d, out, "f32")
    with GGUFReader(out) as r:
        assert r.kv[Keys.DENSE_OUT] == 48
        assert "dense.linear.weight" in r.tensors

    from embedding_cpp_tpu.runtime.engine import Engine

    eng = Engine.from_gguf(str(out))
    vecs = eng.encode(["a dense headed model", "second text"])
    assert vecs.shape == (2, 48)
