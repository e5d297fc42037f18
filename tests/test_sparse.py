"""SPLADE sparse encoding (models/bert.bert_sparse_batch,
Engine.encode_sparse, /v1/sparse_embeddings): MLM-head parity vs HF torch,
top-k packing, conversion with tied-decoder verification.  The reference is
dense-only (bert.h:41-92)."""
import asyncio
import http.client
import json
import socket
import threading

import numpy as np
import pytest

from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_sparse_batch,
    random_params,
    random_state_dict,
)
from embedding_cpp_tpu.models.bert import pack_sparse_topk, unpack_sparse_topk
from embedding_cpp_tpu.models.params import build_params, source_from_arrays

F32 = ComputeOptions(dtype="float32")

CFG = BertConfig(
    n_vocab=500, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    mlm_head=True, name="sparse-test",
)


def _splade_torch(model, ids, mask, torch):
    """Reference SPLADE-max on an HF ForMaskedLM model."""
    with torch.no_grad():
        logits = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    w = np.log1p(np.maximum(logits, 0.0)) * mask[..., None]
    return w.max(axis=1)


def _dense_from_topk(idx, val, n_vocab):
    out = np.zeros(idx.shape[:-1] + (n_vocab,), np.float32)
    np.put_along_axis(out, idx.astype(np.int64), val, axis=-1)
    return out


def _ids_and_mask(rng, b, s, n_vocab):
    ids = rng.integers(0, n_vocab, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[:, s - 4 :] = 0
    return ids, mask


def test_hf_parity_bert():
    """Full-vocab sparse vector matches HF torch BertForMaskedLM SPLADE-max
    with identical random weights (k = |V| reconstructs the dense vector)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    sd = random_state_dict(CFG, seed=11)
    hf_config = transformers.BertConfig(
        vocab_size=CFG.n_vocab, hidden_size=CFG.n_embd,
        num_hidden_layers=CFG.n_layer, num_attention_heads=CFG.n_head,
        intermediate_size=CFG.n_ff, max_position_embeddings=CFG.n_ctx,
        layer_norm_eps=CFG.layer_norm_eps, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        tie_word_embeddings=True,
    )
    model = transformers.BertForMaskedLM(hf_config)
    model.eval()
    hf_sd = {
        (k if k.startswith("cls.") else "bert." + k): torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(hf_sd, strict=False)
    assert not unexpected
    # tied decoder views / buffers are the only acceptable absences
    assert all(
        "position_ids" in m or "decoder" in m for m in missing
    ), missing
    model.tie_weights()

    rng = np.random.default_rng(12)
    ids, mask = _ids_and_mask(rng, 4, 20, CFG.n_vocab)
    expected = _splade_torch(model, ids, mask, torch)

    params = build_params(source_from_arrays(sd), CFG)
    packed = np.asarray(
        bert_sparse_batch(params, ids, mask, CFG, F32, k=CFG.n_vocab)
    )
    idx, val = unpack_sparse_topk(packed)
    got = _dense_from_topk(idx, val, CFG.n_vocab)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_hf_parity_distilbert():
    """DistilBERT MLM head (vocab_transform/vocab_layer_norm/
    vocab_projector) against HF DistilBertForMaskedLM."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = BertConfig(
        n_vocab=500, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="distilbert", mlm_head=True,
        name="sparse-distil-test",
    )
    sd = random_state_dict(cfg, seed=13)
    hf_config = transformers.DistilBertConfig(
        vocab_size=cfg.n_vocab, dim=cfg.n_embd, n_layers=cfg.n_layer,
        n_heads=cfg.n_head, hidden_dim=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx, dropout=0.0,
        attention_dropout=0.0, activation="gelu", tie_weights_=True,
    )
    model = transformers.DistilBertForMaskedLM(hf_config)
    model.eval()
    head = ("vocab_transform.", "vocab_layer_norm.", "vocab_projector.")
    hf_sd = {
        (k if k.startswith(head) else "distilbert." + k): torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(hf_sd, strict=False)
    assert not unexpected
    assert all(
        "position_ids" in m or "vocab_projector.weight" in m for m in missing
    ), missing
    model.tie_weights()

    rng = np.random.default_rng(14)
    ids, mask = _ids_and_mask(rng, 3, 18, cfg.n_vocab)
    expected = _splade_torch(model, ids, mask, torch)

    params = build_params(source_from_arrays(sd), cfg)
    packed = np.asarray(
        bert_sparse_batch(params, ids, mask, cfg, F32, k=cfg.n_vocab)
    )
    idx, val = unpack_sparse_topk(packed)
    got = _dense_from_topk(idx, val, cfg.n_vocab)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_hf_parity_roberta():
    """RoBERTa MLM head (lm_head.dense/layer_norm/bias) against HF
    RobertaForMaskedLM (pos_offset=2 positions + tied decoder)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = BertConfig(
        n_vocab=500, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        layer_norm_eps=1e-5, n_token_types=1, arch="roberta", pos_offset=2,
        mlm_head=True, name="sparse-roberta-test",
    )
    sd = random_state_dict(cfg, seed=15)
    hf_config = transformers.RobertaConfig(
        vocab_size=cfg.n_vocab, hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer, num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff,
        max_position_embeddings=cfg.n_ctx + cfg.pos_offset,
        type_vocab_size=1, layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=1, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        tie_word_embeddings=True,
    )
    model = transformers.RobertaForMaskedLM(hf_config)
    model.eval()
    hf_sd = {
        (k if k.startswith("lm_head.") else "roberta." + k):
            torch.from_numpy(v)
        for k, v in sd.items()
    }
    missing, unexpected = model.load_state_dict(hf_sd, strict=False)
    assert not unexpected
    assert all(
        "position_ids" in m or "token_type_ids" in m or "decoder" in m
        for m in missing
    ), missing
    model.tie_weights()

    rng = np.random.default_rng(16)
    # ids from [4, V): a random pad id (1) inside a sentence would skew HF
    # RoBERTa's id-derived positions (see test_model_families._ids_and_mask)
    ids = rng.integers(4, cfg.n_vocab, size=(3, 20)).astype(np.int32)
    mask = np.ones((3, 20), np.int32)
    mask[:, 16:] = 0
    expected = _splade_torch(model, ids, mask, torch)

    params = build_params(source_from_arrays(sd), cfg)
    packed = np.asarray(
        bert_sparse_batch(params, ids, mask, cfg, F32, k=cfg.n_vocab)
    )
    idx, val = unpack_sparse_topk(packed)
    got = _dense_from_topk(idx, val, cfg.n_vocab)
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_convert_sparse_roberta(tmp_path):
    """RobertaForMaskedLM dir (lm_head names + tied decoder dupes) converts
    with sparse=True and round-trips through Engine.encode_sparse."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    import torch

    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.tokenizer.testvocab import build_bpe_tokenizer_json

    tokenizer_json = build_bpe_tokenizer_json(300)
    spec = json.loads(tokenizer_json)
    ids = list(spec["model"]["vocab"].values()) + [
        t["id"] for t in spec.get("added_tokens", [])
    ]
    cfg = BertConfig(
        n_vocab=max(ids) + 1, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
        n_ff=64, layer_norm_eps=1e-5, n_token_types=1, arch="roberta",
        pos_offset=2, mlm_head=True, name="hf-roberta-splade",
    )
    sd = random_state_dict(cfg, seed=8)
    hf_sd = {}
    for k, v in sd.items():
        hf_sd[k if k.startswith("lm_head.") else "roberta." + k] = v
    hf_sd["lm_head.decoder.weight"] = sd["embeddings.word_embeddings.weight"]
    hf_sd["lm_head.decoder.bias"] = sd["lm_head.bias"]

    d = tmp_path / "hf-roberta"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "roberta",
            "architectures": ["RobertaForMaskedLM"],
            "vocab_size": cfg.n_vocab, "hidden_size": cfg.n_embd,
            "num_hidden_layers": cfg.n_layer,
            "num_attention_heads": cfg.n_head,
            "intermediate_size": cfg.n_ff,
            "max_position_embeddings": cfg.n_ctx + cfg.pos_offset,
            "layer_norm_eps": cfg.layer_norm_eps, "type_vocab_size": 1,
            "pad_token_id": 1,
        }, f)
    (d / "tokenizer.json").write_bytes(tokenizer_json)
    torch.save({k: torch.from_numpy(v) for k, v in hf_sd.items()},
               str(d / "pytorch_model.bin"))

    out = tmp_path / "roberta-splade.gguf"
    convert_hf_dir(str(d), str(out), sparse=True)
    eng = Engine.from_gguf(str(out))
    assert eng.config.mlm_head and eng.config.arch == "roberta"
    pairs = eng.encode_sparse(["hello world"], k=16)
    assert len(pairs[0][0]) > 0


def test_legacy_conversion_ignores_sparse_autodetect(tmp_path):
    """--legacy conversion of a SPLADE dir (modules.json present) writes a
    plain dense .bin: the legacy header has no mlm_head hparam."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models.convert import convert_hf_dir_to_legacy

    d, _ = _write_hf_mlm_dir(tmp_path)
    out = tmp_path / "legacy.bin"
    convert_hf_dir_to_legacy(str(d), str(out), "f32")
    from embedding_cpp_tpu.gguf.legacy import read_legacy_bin

    model = read_legacy_bin(str(out))
    assert not model.config.mlm_head
    assert not any(n.startswith("cls.") for n in model.tensors), (
        sorted(model.tensors)[:5]
    )


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 30522, size=(5, 32)).astype(np.int32)
    val = np.abs(rng.standard_normal((5, 32))).astype(np.float32)
    packed = np.asarray(pack_sparse_topk(idx, val))
    assert packed.dtype == np.uint32 and packed.shape == (5, 64)
    i2, v2 = unpack_sparse_topk(packed)
    np.testing.assert_array_equal(i2, idx)
    np.testing.assert_array_equal(v2, val)


def test_quantized_decoder_close_to_f32():
    """q8_0 file: the decoder matmul rides the packed word table; sparse
    weights stay within quantization-class tolerance of the f32 file."""
    from embedding_cpp_tpu.gguf import GGUFFileType

    rng = np.random.default_rng(3)
    ids, mask = _ids_and_mask(rng, 2, 16, CFG.n_vocab)
    dense = {}
    for ftype in (GGUFFileType.ALL_F32, GGUFFileType.MOSTLY_Q8_0):
        params = random_params(CFG, ftype, seed=5)
        packed = np.asarray(
            bert_sparse_batch(params, ids, mask, CFG, F32, k=CFG.n_vocab)
        )
        idx, val = unpack_sparse_topk(packed)
        dense[ftype] = _dense_from_topk(idx, val, CFG.n_vocab)
    err = np.abs(dense[GGUFFileType.ALL_F32] - dense[GGUFFileType.MOSTLY_Q8_0])
    assert err.max() < 0.05, err.max()


def test_non_mlm_model_raises():
    cfg = BertConfig(
        n_vocab=200, n_ctx=32, n_embd=32, n_layer=1, n_head=2, n_ff=64,
    )
    params = random_params(cfg, seed=0)
    ids = np.zeros((1, 8), np.int32)
    mask = np.ones((1, 8), np.int32)
    with pytest.raises(ValueError, match="MLM head"):
        bert_sparse_batch(params, ids, mask, cfg, F32, k=8)


def test_mlm_head_arch_gate():
    with pytest.raises(ValueError, match="mlm_head"):
        BertConfig(
            n_vocab=200, n_ctx=32, n_embd=32, n_layer=1, n_head=2, n_ff=64,
            n_token_types=0, arch="t5", mlm_head=True,
        )


def test_engine_encode_sparse(tmp_path):
    """tiny-splade GGUF end-to-end: trimmed, descending, k-clamped; dense
    encode still works on the same model; k validation."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine

    path = tmp_path / "splade.gguf"
    make_test_model(str(path), "tiny-splade", "f32")
    eng = Engine.from_gguf(str(path))
    assert eng.config.mlm_head

    texts = ["hello world", "a longer sentence with several more words"]
    out = eng.encode_sparse(texts, k=32)
    assert len(out) == 2
    for idx, val in out:
        assert idx.dtype == np.int32 and val.dtype == np.float32
        assert len(idx) == len(val) <= 32
        assert np.all(val > 0)
        assert np.all(np.diff(val) <= 1e-7)  # descending
        assert len(set(idx.tolist())) == len(idx)
    # k clamps to the vocab size rather than erroring
    big = eng.encode_sparse(["hello"], k=10**6)
    assert len(big[0][0]) <= eng.config.n_vocab
    with pytest.raises(ValueError, match="k must be positive"):
        eng.encode_sparse(["hello"], k=0)
    # same checkpoint still embeds densely
    v = eng.encode(["hello world"])
    assert v.shape == (1, eng.config.n_embd)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)

    # dense model rejects the sparse surface cleanly
    dense_path = tmp_path / "dense.gguf"
    make_test_model(str(dense_path), "tiny", "f32")
    dense_eng = Engine.from_gguf(str(dense_path))
    with pytest.raises(ValueError, match="MLM head"):
        dense_eng.encode_sparse(["hello"])


def _write_hf_mlm_dir(tmp_path, untied=False, modules_json=True):
    """Fake BertForMaskedLM checkpoint dir (canonical + tied-dupe names)."""
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    cfg = BertConfig(
        n_vocab=300, n_ctx=32, n_embd=32, n_layer=1, n_head=2, n_ff=64,
        mlm_head=True, name="hf-splade",
    )
    sd = random_state_dict(cfg, seed=7)
    hf_sd = {}
    for k, v in sd.items():
        hf_sd[k if k.startswith("cls.") else "bert." + k] = v
    word = sd["embeddings.word_embeddings.weight"]
    dec = word + 0.5 if untied else word
    hf_sd["cls.predictions.decoder.weight"] = dec
    hf_sd["cls.predictions.decoder.bias"] = sd["cls.predictions.bias"]

    d = tmp_path / ("hf-untied" if untied else "hf-splade")
    d.mkdir(parents=True)
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "bert", "architectures": ["BertForMaskedLM"],
            "vocab_size": cfg.n_vocab, "hidden_size": cfg.n_embd,
            "num_hidden_layers": cfg.n_layer,
            "num_attention_heads": cfg.n_head,
            "intermediate_size": cfg.n_ff,
            "max_position_embeddings": cfg.n_ctx,
            "layer_norm_eps": cfg.layer_norm_eps, "type_vocab_size": 2,
        }, f)
    (d / "tokenizer.json").write_bytes(build_tokenizer_json(cfg.n_vocab))
    if modules_json:
        with open(d / "modules.json", "w") as f:
            json.dump([
                {"idx": 0, "name": "0", "path": "",
                 "type": "sentence_transformers.sparse_encoder.models."
                         "MLMTransformer"},
                {"idx": 1, "name": "1", "path": "1_SpladePooling",
                 "type": "sentence_transformers.sparse_encoder.models."
                         "SpladePooling"},
            ], f)
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in hf_sd.items()},
               str(d / "pytorch_model.bin"))
    return d, sd


def test_convert_sparse_autodetect(tmp_path):
    """modules.json SpladePooling auto-detects sparse conversion; the tied
    decoder dupes are verified and dropped; the GGUF round-trips through
    Engine.encode_sparse."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.runtime.engine import Engine

    d, _ = _write_hf_mlm_dir(tmp_path)
    out = tmp_path / "splade-conv.gguf"
    convert_hf_dir(str(d), str(out))  # sparse auto-detected
    eng = Engine.from_gguf(str(out))
    assert eng.config.mlm_head
    pairs = eng.encode_sparse(["hello world"], k=16)
    assert len(pairs[0][0]) > 0

    # without modules.json the default conversion drops the head (dense)
    d2, _ = _write_hf_mlm_dir(tmp_path / "sub", modules_json=False)
    out2 = tmp_path / "dense-conv.gguf"
    convert_hf_dir(str(d2), str(out2))
    assert not Engine.from_gguf(str(out2)).config.mlm_head
    # ... unless sparse=True asks for it explicitly
    out3 = tmp_path / "sparse-conv.gguf"
    convert_hf_dir(str(d2), str(out3), sparse=True)
    assert Engine.from_gguf(str(out3)).config.mlm_head


def test_convert_sparse_untied_rejected(tmp_path):
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models.convert import convert_hf_dir

    d, _ = _write_hf_mlm_dir(tmp_path, untied=True)
    with pytest.raises(ValueError, match="not tied"):
        convert_hf_dir(str(d), str(tmp_path / "x.gguf"), sparse=True)


# --- HTTP surface -------------------------------------------------------------

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _serve_sparse_engine():
    """Generator body shared by the module- and function-scoped fixtures."""
    pytest.importorskip("tokenizers")
    from conftest import serve_in_thread
    from embedding_cpp_tpu.runtime.engine import Engine

    engine = Engine.synthetic(CFG, opts=F32)
    dense_cfg = BertConfig(
        n_vocab=200, n_ctx=32, n_embd=32, n_layer=1, n_head=2, n_ff=64,
        name="dense-sidecar",
    )
    dense_engine = Engine.synthetic(dense_cfg, opts=F32)
    http_port = _free_port()
    with serve_in_thread(engine, window_ms=2.0, http_port=http_port,
                         extra_engines={"dense-sidecar": dense_engine}):
        yield http_port, engine


@pytest.fixture(scope="module")
def sparse_http_server():
    yield from _serve_sparse_engine()


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    body = json.loads(r.read())
    conn.close()
    return r.status, body


def test_http_sparse_embeddings(sparse_http_server):
    port, engine = sparse_http_server
    status, body = _post(port, "/v1/sparse_embeddings",
                         {"input": ["hello world", "goodbye"], "k": 16,
                          "return_tokens": True})
    assert status == 200, body
    assert body["object"] == "list" and len(body["data"]) == 2
    row = body["data"][0]
    assert row["object"] == "sparse_embedding"
    assert len(row["indices"]) == len(row["values"]) == len(row["tokens"])
    assert all(v > 0 for v in row["values"])
    # matches the engine surface exactly
    idx, val = engine.encode_sparse(["hello world"], k=16)[0]
    assert row["indices"] == [int(i) for i in idx]
    np.testing.assert_allclose(row["values"], val, rtol=1e-6)

    status, body = _post(port, "/v1/sparse_embeddings",
                         {"input": "x", "k": 0})
    assert status == 400
    status, body = _post(port, "/v1/sparse_embeddings",
                         {"input": "x", "dimensions": 8})
    assert status == 400


def test_http_sparse_on_dense_model_400(sparse_http_server):
    """Routing a sparse request to a dense model is a clean client error,
    not a 500."""
    port, _ = sparse_http_server
    status, body = _post(port, "/v1/sparse_embeddings",
                         {"input": "x", "model": "dense-sidecar"})
    assert status == 400
    assert "MLM head" in body["error"]["message"]


# --- SparseIndex ----------------------------------------------------------------

def _brute_force(corpus_pairs, query_pairs, n_vocab):
    """Dense brute-force dot scores [Q, N] from (ids, vals) pairs."""
    def dense(pairs):
        out = np.zeros((len(pairs), n_vocab), np.float32)
        for i, (idx, val) in enumerate(pairs):
            out[i, np.asarray(idx, np.int64)] = val
        return out

    return dense(query_pairs) @ dense(corpus_pairs).T


def test_sparse_index_exact():
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    rng = np.random.default_rng(0)
    V = 400

    def rand_pairs(n, lo=5, hi=40):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(lo, hi))
            idx = rng.choice(V, size=nnz, replace=False).astype(np.int32)
            out.append((idx, np.abs(rng.standard_normal(nnz)).astype(np.float32)))
        return out

    corpus = rand_pairs(23)
    queries = rand_pairs(4)
    index = SparseIndex()
    assert index.add_vectors(corpus) == 23
    idx, scores = index.search_vectors(queries, k=5)
    expected = _brute_force(corpus, queries, V)
    for qi in range(4):
        order = np.argsort(-expected[qi], kind="stable")[:5]
        np.testing.assert_allclose(scores[qi], expected[qi][order], rtol=1e-5)
        # equal-score ties may permute ids; scores above pin correctness
        assert set(idx[qi]) <= set(np.where(
            expected[qi] >= expected[qi][order[-1]] - 1e-6)[0])

    # k past the corpus pads with -1 / -inf (dense VectorIndex contract)
    idx, scores = index.search_vectors(queries[:1], k=30)
    assert list(idx[0, 23:]) == [-1] * 7
    assert np.all(np.isneginf(scores[0, 23:]))


def test_sparse_index_empty_doc_and_errors():
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    index = SparseIndex()
    with pytest.raises(RuntimeError, match="empty index"):
        index.search_vectors([(np.array([0], np.int32),
                               np.array([1.0], np.float32))], k=1)
    # pad-marker ids (-1) are rejected at add time: storing them would
    # alias the last vocab term
    with pytest.raises(ValueError, match="negative term id"):
        index.add_vectors([(np.array([-1, 3], np.int32),
                            np.array([1.0, 2.0], np.float32))])
    # empty docs score 0, never crash the reduction (reduceat would)
    index.add_vectors([
        (np.zeros(0, np.int32), np.zeros(0, np.float32)),
        (np.array([3], np.int32), np.array([2.0], np.float32)),
    ])
    idx, scores = index.search_vectors(
        [(np.array([3], np.int32), np.array([1.0], np.float32))], k=2
    )
    assert list(idx[0]) == [1, 0]
    np.testing.assert_allclose(scores[0], [2.0, 0.0])
    with pytest.raises(ValueError, match="k must be positive"):
        index.search_vectors([(np.array([3], np.int32),
                               np.array([1.0], np.float32))], k=0)
    # out-of-vocab query terms contribute 0 (engine-less index sizes
    # n_vocab from the corpus), never crash
    idx, scores = index.search_vectors(
        [(np.array([3, 999], np.int32),
          np.array([1.0, 5.0], np.float32))], k=1
    )
    assert list(idx[0]) == [1] and scores[0, 0] == 2.0


def test_sparse_index_save_load(tmp_path):
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    rng = np.random.default_rng(1)
    corpus = [
        (rng.choice(200, size=9, replace=False).astype(np.int32),
         np.abs(rng.standard_normal(9)).astype(np.float32))
        for _ in range(7)
    ]
    a = SparseIndex()
    a.add_vectors(corpus)
    path = str(tmp_path / "sparse.npz")
    a.save(path)
    b = SparseIndex()
    assert b.load(path) == 7
    q = [corpus[3]]
    ia, sa = a.search_vectors(q, k=3)
    ib, sb = b.search_vectors(q, k=3)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb)
    assert ia[0, 0] == 3  # self-retrieval


def test_sparse_index_engine_backed(tmp_path):
    """Engine-backed add/search scores equal brute force over
    encode_sparse vectors; identical text self-retrieves."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    eng = Engine.synthetic(CFG, opts=F32)
    docs = ["the dog sat", "hello world", "partly cloudy skies"]
    index = SparseIndex(eng, k_encode=64)
    assert index.add(docs) == 3
    idx, scores = index.search(["hello world"], k=3)
    pairs = eng.encode_sparse(docs + ["hello world"], k=64)
    expected = _brute_force(pairs[:3], pairs[3:], CFG.n_vocab)[0]
    order = np.argsort(-expected, kind="stable")
    np.testing.assert_array_equal(idx[0], order)
    np.testing.assert_allclose(scores[0], expected[order], rtol=1e-5)

    dense_eng = Engine.synthetic(
        BertConfig(n_vocab=200, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
                   n_ff=64, name="dense"), opts=F32)
    with pytest.raises(ValueError, match="MLM head"):
        SparseIndex(dense_eng)


def test_http_sparse_index_search(sparse_http_server):
    port, engine = sparse_http_server
    status, body = _post(port, "/v1/sparse_search",
                         {"input": ["hello"], "k": 2})
    assert status == 400  # no index yet
    docs = ["the dog sat", "hello world", "partly cloudy skies"]
    status, body = _post(port, "/v1/sparse_index", {"input": docs})
    assert status == 200 and body["total"] == 3
    status, body = _post(port, "/v1/sparse_search",
                         {"input": ["hello world"], "k": 5})
    assert status == 200, body
    rows = body["results"]
    assert len(rows) == 1 and len(rows[0]) == 3  # -1 pads dropped
    scores = [r["score"] for r in rows[0]]
    assert scores == sorted(scores, reverse=True)
    status, body = _post(port, "/v1/sparse_index",
                         {"input": ["x"], "model": "dense-sidecar"})
    assert status == 400
    assert "MLM head" in body["error"]["message"]


def test_mesh_sparse_and_maxsim_match_single(eight_devices):
    """Mesh-constructed engine (dp=2 tp=4): encode_sparse and maxsim run
    over the sharded params (mlm subtree replicates via param_pspecs'
    default) and match the single-device engine exactly."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(
        n_vocab=500, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        mlm_head=True, name="mesh-splade",
    )
    opts = ComputeOptions(dtype="float32", q4_impl="xla")
    single = Engine.synthetic(cfg, opts=opts)
    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    meshed = Engine.synthetic(cfg, opts=opts, mesh=mesh)
    texts = ["hello world", "a longer sentence with many words", "third"]
    for (ia, va), (ib, vb) in zip(
        single.encode_sparse(texts, k=32), meshed.encode_sparse(texts, k=32)
    ):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(va, vb, atol=2e-5)
    np.testing.assert_allclose(
        single.maxsim("hello world", texts),
        meshed.maxsim("hello world", texts), atol=2e-4, rtol=1e-4,
    )


def test_rrf_fuse():
    from embedding_cpp_tpu.runtime.sparse_search import rrf_fuse

    a = np.array([[2, 0, 1]], np.int32)   # doc2 rank1, doc0 rank2, doc1 rank3
    b = np.array([[0, 2, -1]], np.int32)  # doc0 rank1, doc2 rank2, pad
    idx, scores = rrf_fuse([a, b], k=4, c=60.0)
    want = {
        2: 1 / 61 + 1 / 62,
        0: 1 / 62 + 1 / 61,
        1: 1 / 63,
    }
    # docs 0 and 2 tie exactly; ties break by doc id ascending
    assert idx[0, 0] == 0 and idx[0, 1] == 2 and idx[0, 2] == 1
    np.testing.assert_allclose(scores[0, 0], want[0], rtol=1e-6)
    np.testing.assert_allclose(scores[0, 2], want[1], rtol=1e-6)
    # pads past the fused candidate count
    assert idx[0, 3] == -1 and scores[0, 3] == 0.0
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="no rankings"):
        rrf_fuse([], k=1)


def test_http_hybrid_desync_rejected(sparse_http_server):
    """Mixing /v1/sparse_index with /v1/hybrid_index desyncs the corpora —
    hybrid calls detect it and 400 instead of fusing misaligned ids.
    (Runs on the shared fixture AFTER the sparse-only index test.)"""
    port, _ = sparse_http_server
    status, body = _post(port, "/v1/hybrid_index", {"input": ["x"]})
    if status == 200:  # sparse-only test didn't run first: force the skew
        _post(port, "/v1/sparse_index", {"input": ["y"]})
    status, body = _post(port, "/v1/hybrid_search",
                         {"input": ["hello"], "k": 2})
    assert status == 400
    assert "desync" in body["error"]["message"]


@pytest.fixture()
def hybrid_http_server():
    """Function-scoped server: hybrid tests need virgin index state."""
    yield from _serve_sparse_engine()


def test_http_hybrid_search(hybrid_http_server):
    port, engine = hybrid_http_server
    status, body = _post(port, "/v1/hybrid_search",
                         {"input": ["hello"], "k": 2})
    assert status == 400  # no indexes yet -> clean client error
    docs = ["the dog sat", "hello world", "partly cloudy skies"]
    status, body = _post(port, "/v1/hybrid_index", {"input": docs})
    assert status == 200 and body["total"] == 3
    status, body = _post(port, "/v1/hybrid_search",
                         {"input": ["hello world"], "k": 3})
    assert status == 200, body
    rows = body["results"]
    assert len(rows) == 1 and len(rows[0]) == 3
    # the identical document tops both rankings, so it tops the fusion
    assert rows[0][0]["index"] == 1
    scores = [r["score"] for r in rows[0]]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_index_concurrent_adds_stay_aligned():
    """Parallel hybrid_index_texts calls must assign the SAME doc id in
    both indexes (the _hybrid_lock spans the two adds — interleaved adds
    would silently fuse rankings of different documents)."""
    pytest.importorskip("tokenizers")
    import concurrent.futures

    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.server import ContinuousBatcher

    engine = Engine.synthetic(CFG, opts=F32)
    b = ContinuousBatcher(engine, 32, 1.0)
    batches = [[f"document number {i} about topic {i % 5}"] for i in range(12)]
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(b.hybrid_index_texts, batches))
    assert len(b.index) == len(b.sparse_index) == 12
    # both indexes must agree on which document each id names: for every
    # text, the dense index's top-1 self-retrieval gives its dense-side id;
    # the sparse vector stored AT THAT ID must equal a fresh sparse encode
    # of the same text (an interleaving bug would pair different docs)
    texts = [t for batch in batches for t in batch]
    for text in texts:
        d_idx, d_scores = b.index.search([text], k=1)
        doc_id = int(d_idx[0, 0])
        # bf16 corpus storage rounds the cosine slightly below 1.0
        assert d_scores[0, 0] > 0.995  # self-retrieval
        fresh_i, fresh_v = engine.encode_sparse([text], k=256)[0]
        np.testing.assert_array_equal(
            b.sparse_index._indices[doc_id], fresh_i
        )
        np.testing.assert_allclose(
            b.sparse_index._values[doc_id], fresh_v, rtol=1e-5
        )


def test_device_index_matches_host_and_mesh(eight_devices):
    """Device-backend SparseIndex == host CSR scoring exactly, and the
    dp=8-sharded variant == both (two-stage candidate merge)."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    rng = np.random.default_rng(3)

    def rand_pairs(n, v=4096, lo=10, hi=120):
        out = []
        for _ in range(n):
            nnz = int(rng.integers(lo, hi))
            idx = rng.choice(v, size=nnz, replace=False).astype(np.int32)
            val = rng.random(nnz).astype(np.float32)
            order = np.argsort(-val)
            out.append((idx[order], val[order]))
        return out

    docs = rand_pairs(300)
    qs = rand_pairs(5, lo=4, hi=30)
    host = SparseIndex(device=False)
    host.add_vectors(docs)
    dev = SparseIndex(device=True)
    dev.add_vectors(docs)
    mesh = make_mesh(dp=8, tp=1, devices=eight_devices)
    sharded = SparseIndex(device=True, mesh=mesh)
    sharded.add_vectors(docs)
    hi_, hs = host.search_vectors(qs, k=7)
    di_, ds = dev.search_vectors(qs, k=7)
    mi_, ms = sharded.search_vectors(qs, k=7)
    np.testing.assert_array_equal(hi_, di_)
    np.testing.assert_array_equal(hi_, mi_)
    np.testing.assert_allclose(hs, ds, atol=1e-5)
    np.testing.assert_allclose(hs, ms, atol=1e-5)


def test_device_index_nnz_width_truncation():
    """Documents with more active terms than nnz_width keep their heaviest
    terms on the device path (the padded-COO budget)."""
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    idx = np.arange(10, dtype=np.int32)
    val = np.linspace(1.0, 0.1, 10).astype(np.float32)
    dev = SparseIndex(device=True, nnz_width=4)
    dev.add_vectors([(idx, val)])
    # query hits only the lightest (dropped) terms -> device score 0
    q = [(np.array([8, 9], np.int32), np.array([1.0, 1.0], np.float32))]
    _, s = dev.search_vectors(q, k=1)
    assert s[0, 0] == 0.0
    # query on the heaviest terms matches the exact dot
    q = [(np.array([0, 1], np.int32), np.array([1.0, 1.0], np.float32))]
    _, s = dev.search_vectors(q, k=1)
    np.testing.assert_allclose(s[0, 0], val[0] + val[1], atol=1e-6)


def test_device_index_candidates_mode(eight_devices):
    """Two-stage candidates mode: C >= corpus equals exact; a narrow C
    still recovers the exact top results on an impact-concentrated corpus
    (stage 1 scores the weight prefix); returned scores are EXACT dots;
    host/mesh indexes reject the mode."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    rng = np.random.default_rng(17)
    v = 2048

    def impact_pairs(n, lo=10, hi=60):
        # SPLADE-like: weights decay fast, so the per-doc prefix carries
        # most of the mass (the regime the prefix prefilter targets)
        out = []
        for _ in range(n):
            nnz = int(rng.integers(lo, hi))
            idx = rng.choice(v, size=nnz, replace=False).astype(np.int32)
            val = np.sort(rng.random(nnz).astype(np.float32))[::-1]
            val *= np.exp(-0.3 * np.arange(nnz, dtype=np.float32))
            out.append((idx, np.ascontiguousarray(val)))
        return out

    docs = impact_pairs(300)
    qs = impact_pairs(5, lo=4, hi=20)
    dev = SparseIndex(device=True)
    dev.add_vectors(docs)

    ie, se = dev.search_vectors(qs, k=7)
    ia, sa = dev.search_vectors(qs, k=7, candidates=300)
    np.testing.assert_array_equal(ie, ia)
    np.testing.assert_allclose(se, sa, atol=1e-5)

    ia, sa = dev.search_vectors(qs, k=7, candidates=64)
    expected = _brute_force(docs, qs, v)
    for qi in range(5):
        # top-1 recovered, and every returned score is the exact dot
        assert ia[qi, 0] == ie[qi, 0]
        for j in range(7):
            if ia[qi, j] >= 0:
                np.testing.assert_allclose(
                    sa[qi, j], expected[qi][ia[qi, j]], rtol=1e-5, atol=1e-5
                )

    host = SparseIndex(device=False)
    host.add_vectors(docs)
    with pytest.raises(ValueError, match="device index"):
        host.search_vectors(qs, k=3, candidates=16)
    mesh = make_mesh(dp=8, tp=1, devices=eight_devices)
    sharded = SparseIndex(device=True, mesh=mesh)
    sharded.add_vectors(docs)
    with pytest.raises(ValueError, match="single-device"):
        sharded.search_vectors(qs, k=3, candidates=16)
