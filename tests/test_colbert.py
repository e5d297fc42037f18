"""ColBERT late-interaction checkpoint support.

Gates: framing + projection parity vs HF torch BertModel + the checkpoint's
bias-free per-token `linear` with identical random weights, ColBERT scoring
semantics (marker tokens, [MASK] query augmentation, punctuation skiplist —
colbert-ai colbert/modeling/colbert.py), conversion from an HF_ColBERT
checkpoint dir with artifact.metadata, and MaxSimIndex retrieval parity.
The reference engine has no token-level surface at all (bert.h:41-92).
"""
import dataclasses
import json

import numpy as np
import pytest

from embedding_cpp_tpu.models.config import BertConfig
from embedding_cpp_tpu.models.params import (
    build_params,
    random_state_dict,
    source_from_arrays,
)
from embedding_cpp_tpu.runtime.engine import Engine
from embedding_cpp_tpu.tokenizer import SpecialIds, load_tokenizer
from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

# the test vocab resolves [unused0]=242+? dynamically; build once
_TOK_JSON = build_tokenizer_json(300)


def _vocab_id(token):
    from embedding_cpp_tpu.models.convert import _vocab_token_id

    return _vocab_token_id(_TOK_JSON, token)


CFG = BertConfig(
    n_vocab=300, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    colbert_dim=32, query_maxlen=16, mask_punctuation=True,
    q_marker_id=_vocab_id("[unused0]"), d_marker_id=_vocab_id("[unused1]"),
    mask_id=_vocab_id("[MASK]"), name="tiny-colbert",
)


@pytest.fixture(scope="module")
def engine():
    pytest.importorskip("tokenizers")
    sd = random_state_dict(CFG, seed=7)
    params = build_params(source_from_arrays(sd), CFG)
    tok = load_tokenizer(_TOK_JSON)
    return Engine(params, CFG, tok, SpecialIds(cls=2, sep=3, pad=0, unk=1))


def _torch_colbert(sd):
    """HF torch reference: BertModel + the bias-free projection, loaded
    from the same random state dict."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_config = transformers.BertConfig(
        vocab_size=CFG.n_vocab, hidden_size=CFG.n_embd,
        num_hidden_layers=CFG.n_layer, num_attention_heads=CFG.n_head,
        intermediate_size=CFG.n_ff, max_position_embeddings=CFG.n_ctx,
        layer_norm_eps=CFG.layer_norm_eps, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_config, add_pooling_layer=False)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()
         if k != "linear.weight"},
        strict=False,
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing), missing
    lin = torch.from_numpy(sd["linear.weight"])  # [dim, E]

    def token_vectors(ids, attn):
        with torch.no_grad():
            h = model(
                input_ids=torch.from_numpy(ids).long(),
                attention_mask=torch.from_numpy(attn).long(),
            ).last_hidden_state
            return (h @ lin.T).numpy()

    return token_vectors


def test_query_vectors_match_torch(engine):
    """colbert_query_vectors == torch BertModel + linear over the SAME
    framed ids (markers + [MASK] augmentation, MASKs not attended)."""
    sd = random_state_dict(CFG, seed=7)
    fwd = _torch_colbert(sd)
    texts = ["where is the dog", "hello world"]
    q_ids, q_attn = engine.colbert_query_ids(texts)
    assert q_ids.shape == (2, CFG.query_maxlen)
    # framing invariants: [CLS] [Q] ... [SEP], [MASK] padding after
    assert q_ids[0, 0] == 2 and q_ids[0, 1] == CFG.q_marker_id
    lens = q_attn.sum(axis=1)
    for i in range(2):
        assert q_ids[i, lens[i] - 1] == 3  # [SEP] last attended
        assert np.all(q_ids[i, lens[i]:] == CFG.mask_id)
    expected = fwd(q_ids, q_attn)
    got = engine.colbert_query_vectors(texts)
    for i in range(2):
        np.testing.assert_allclose(got[i], expected[i], atol=5e-4, rtol=1e-3)


def test_maxsim_matches_torch_reference(engine):
    """Engine.maxsim on a ColBERT checkpoint == the colbert-ai scoring
    recipe computed with torch: normalized projected tokens, doc tokens
    trimmed to non-punctuation, sum-of-max cosine over ALL query slots."""
    import string

    sd = random_state_dict(CFG, seed=7)
    fwd = _torch_colbert(sd)
    query = "where is the dog"
    docs = ["the dog sat on the mat!", "hello, world.", "a quick brown fox"]

    got = engine.maxsim(query, docs)

    q_ids, q_attn = engine.colbert_query_ids([query])
    q = fwd(q_ids, q_attn)[0]
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    skip = engine.colbert_skiplist()
    assert skip, "test vocab tokenizes punctuation"
    d_tokens = engine.colbert_doc_tokens(docs)
    expected = []
    for toks in d_tokens:
        ids = np.zeros((1, len(toks)), np.int32)
        ids[0] = toks
        attn = np.ones_like(ids)
        d = fwd(ids, attn)[0]
        keep = np.array([t not in skip for t in toks], bool)
        d = d[keep]
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        expected.append((qn @ dn.T).max(axis=1).sum())
    np.testing.assert_allclose(got, np.asarray(expected), atol=2e-3,
                               rtol=1e-3)
    # punctuation must actually have been filtered somewhere
    assert any(
        any(t in skip for t in toks) for toks in d_tokens
    ), "test docs carry no punctuation tokens"


def test_maxsim_index_matches_rerank(engine):
    """MaxSimIndex retrieval over a ColBERT engine ranks exactly like
    Engine.maxsim (same framing, projection, skiplist)."""
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    docs = [f"document {i} about topic {i}!" for i in range(7)]
    query = "document 3 please"
    scores = engine.maxsim(query, docs)
    idx = MaxSimIndex(engine, doc_maxlen=32, dtype="float32")
    idx.add(docs)
    ids, s = idx.search([query], k=7)
    np.testing.assert_array_equal(ids[0], np.argsort(-scores, kind="stable"))
    np.testing.assert_allclose(np.sort(s[0])[::-1], np.sort(scores)[::-1],
                               rtol=1e-4, atol=1e-4)


def test_doc_maxlen_truncates_before_forward(engine):
    """ColBERT doc_maxlen semantics: tokens past the budget never enter
    attention (truncate-then-encode), so two docs sharing a prefix hash to
    the same vectors when the budget cuts before they diverge."""
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    base = "the quick brown fox jumps over"
    idx = MaxSimIndex(engine, doc_maxlen=6, dtype="float32")
    idx.add([base + " one extra tail", base + " totally different ending"])
    ids, s = idx.search(["quick brown"], k=2)
    assert abs(s[0, 0] - s[0, 1]) < 1e-5  # identical truncated content


def test_conversion_from_hf_colbert_dir(tmp_path, engine):
    """A local HF_ColBERT checkpoint dir (config.json + artifact.metadata +
    tokenizer.json + safetensors with bert.*-prefixed weights) converts and
    loads; query vectors match the directly-built engine."""
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from embedding_cpp_tpu.models.convert import convert_hf_dir

    sd = random_state_dict(CFG, seed=7)
    d = tmp_path / "colbert-ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "architectures": ["HF_ColBERT"], "model_type": "bert",
        "vocab_size": CFG.n_vocab, "hidden_size": CFG.n_embd,
        "num_hidden_layers": CFG.n_layer,
        "num_attention_heads": CFG.n_head,
        "intermediate_size": CFG.n_ff,
        "max_position_embeddings": CFG.n_ctx,
        "layer_norm_eps": CFG.layer_norm_eps,
    }))
    (d / "artifact.metadata").write_text(json.dumps({
        "query_maxlen": CFG.query_maxlen, "mask_punctuation": True,
        "dim": CFG.colbert_dim,
        "query_token_id": "[unused0]", "doc_token_id": "[unused1]",
    }))
    tok_json = _TOK_JSON if isinstance(_TOK_JSON, (bytes, bytearray)) \
        else _TOK_JSON.encode()
    (d / "tokenizer.json").write_bytes(tok_json)
    save_file(
        {("linear.weight" if k == "linear.weight" else f"bert.{k}"): v
         for k, v in sd.items()},
        str(d / "model.safetensors"),
    )
    out = tmp_path / "colbert.gguf"
    convert_hf_dir(d, out, "f32")
    loaded = Engine.from_gguf(str(out))
    assert loaded.config.colbert_dim == CFG.colbert_dim
    assert loaded.config.query_maxlen == CFG.query_maxlen
    assert loaded.config.q_marker_id == CFG.q_marker_id
    assert loaded.config.d_marker_id == CFG.d_marker_id
    assert loaded.config.mask_id == CFG.mask_id
    texts = ["hello world"]
    a = engine.colbert_query_vectors(texts)[0]
    b = loaded.colbert_query_vectors(texts)[0]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_config_validation():
    with pytest.raises(ValueError, match="q_marker_id"):
        BertConfig(n_vocab=100, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
                   n_ff=64, colbert_dim=16)
    with pytest.raises(ValueError, match="exclusive"):
        BertConfig(n_vocab=100, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
                   n_ff=64, colbert_dim=16, mlm_head=True,
                   q_marker_id=1, d_marker_id=2, mask_id=4)
    with pytest.raises(ValueError, match="not t5"):
        BertConfig(n_vocab=100, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
                   n_ff=64, arch="t5", n_token_types=0, colbert_dim=16,
                   q_marker_id=1, d_marker_id=2, mask_id=4)


def test_non_colbert_engine_rejects_colbert_surface(engine):
    plain = dataclasses.replace(CFG, colbert_dim=0, q_marker_id=-1,
                                d_marker_id=-1, mask_id=-1)
    sd = random_state_dict(plain, seed=1)
    e = Engine(build_params(source_from_arrays(sd), plain), plain,
               load_tokenizer(_TOK_JSON),
               SpecialIds(cls=2, sep=3, pad=0, unk=1))
    with pytest.raises(RuntimeError, match="not a ColBERT checkpoint"):
        e.colbert_query_vectors(["x"])
