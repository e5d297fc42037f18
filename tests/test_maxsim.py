"""Late-interaction MaxSim scoring (models/bert.maxsim_scores,
Engine.maxsim / maxsim_rerank): numpy parity over token states, ranking
sanity, family coverage.  The reference has no token-level surface
(bert.h:41-92)."""
import numpy as np
import pytest

from embedding_cpp_tpu.models import BertConfig, ComputeOptions
from embedding_cpp_tpu.runtime.engine import Engine

F32 = ComputeOptions(dtype="float32")

CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    name="maxsim-test",
)


@pytest.fixture(scope="module")
def engine():
    pytest.importorskip("tokenizers")
    return Engine.synthetic(CFG, opts=F32)


def _numpy_maxsim(q_states, doc_states):
    """Reference MaxSim from trimmed per-text token states."""
    qn = q_states / np.linalg.norm(q_states, axis=-1, keepdims=True)
    out = []
    for d in doc_states:
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        sim = qn @ dn.T  # [Sq, Sd]
        out.append(sim.max(axis=-1).sum())
    return np.array(out, np.float32)


def test_numpy_parity(engine):
    """Engine.maxsim == MaxSim computed host-side from
    encode_token_states (same states, same math)."""
    query = "where is the dog"
    docs = [
        "the dog sat on the mat",
        "quantum mechanics is hard",
        "a cat and a dog played",
        "where is the dog",
    ]
    got = engine.maxsim(query, docs)
    q_states = engine.encode_token_states([query])[0]
    doc_states = engine.encode_token_states(docs)
    expected = _numpy_maxsim(q_states, doc_states)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_identical_doc_wins(engine):
    """The query itself scores at least as high as any other document, and
    its score equals the query's real token count (cosine(t, t) = 1)."""
    query = "a very distinctive sentence about embeddings"
    docs = ["something else entirely", query, "another unrelated text"]
    scores = engine.maxsim(query, docs)
    assert int(np.argmax(scores)) == 1
    n_q = len(engine.tokenize(query))
    np.testing.assert_allclose(scores[1], n_q, rtol=1e-4)


def test_maxsim_rerank_shape(engine):
    docs = ["alpha beta", "gamma delta", "epsilon zeta"]
    ranked = engine.maxsim_rerank("alpha beta", docs, top_n=2)
    assert len(ranked) == 2
    assert set(ranked[0]) == {"index", "relevance_score"}
    scores = [r["relevance_score"] for r in ranked]
    assert scores == sorted(scores, reverse=True)
    all_ranked = engine.maxsim_rerank("alpha beta", docs)
    assert len(all_ranked) == 3


def test_empty_query_raises(engine):
    with pytest.raises(ValueError, match="empty query"):
        engine.maxsim_tokens([], [[1, 2, 3]])


def test_t5_family(tmp_path):
    """MaxSim runs on a non-BERT family (T5: no-CLS framing, RMSNorm) —
    the surface is family-generic."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model

    path = tmp_path / "t5.gguf"
    make_test_model(str(path), "tiny-t5", "f32")
    eng = Engine.from_gguf(str(path))
    query = "hello world"
    scores = eng.maxsim(query, [query, "the quick brown fox"])
    assert scores.shape == (2,)
    assert int(np.argmax(scores)) == 0
