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


# --- MaxSimIndex: on-device late-interaction retrieval ----------------------

DOCS = [
    "the dog sat on the mat",
    "quantum mechanics is hard",
    "a cat and a dog played in the yard",
    "where is the dog",
    "embeddings map text to vectors",
    "the weather is sunny today",
    "dogs and cats are pets",
    "a treatise on vector search",
]
QUERIES = ["where is the dog", "vector embeddings"]


def _expected_index_scores(engine, queries, docs, doc_maxlen=256):
    q_states = engine.encode_token_states(list(queries))
    d_states = engine.encode_token_states(list(docs))
    return np.stack([
        _numpy_maxsim(q, [d[:doc_maxlen] for d in d_states])
        for q in q_states
    ])


def test_index_matches_bruteforce(engine):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine, dtype="float32")
    assert idx.add(DOCS) == len(DOCS)
    ids, scores = idx.search(QUERIES, k=len(DOCS))
    expected = _expected_index_scores(engine, QUERIES, DOCS)
    for qi in range(len(QUERIES)):
        order = np.argsort(-expected[qi], kind="stable")
        np.testing.assert_array_equal(ids[qi], order)
        np.testing.assert_allclose(
            scores[qi], expected[qi][order], rtol=1e-4, atol=1e-4
        )


def test_index_doc_maxlen_truncates(engine):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    sd = 4  # shorter than every doc: scores must reflect the first 4 tokens
    idx = MaxSimIndex(engine, doc_maxlen=sd, dtype="float32")
    idx.add(DOCS)
    ids, scores = idx.search(QUERIES[:1], k=3)
    expected = _expected_index_scores(engine, QUERIES[:1], DOCS,
                                      doc_maxlen=sd)[0]
    order = np.argsort(-expected, kind="stable")[:3]
    np.testing.assert_array_equal(ids[0], order)
    np.testing.assert_allclose(scores[0], expected[order], rtol=1e-4,
                               atol=1e-4)


def test_index_padding_contract(engine):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine, dtype="float32")
    idx.add(DOCS[:3])
    ids, scores = idx.search(QUERIES[:1], k=10)
    assert ids.shape == (1, 10) and scores.shape == (1, 10)
    assert set(ids[0, 3:].tolist()) == {-1}
    assert np.all(np.isneginf(scores[0, 3:]))
    assert np.all(ids[0, :3] >= 0)


def test_index_save_load_roundtrip(engine, tmp_path):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine, dtype="float32")
    idx.add(DOCS)
    path = str(tmp_path / "maxsim.npz")
    idx.save(path)
    idx2 = MaxSimIndex(engine, dtype="float32")
    assert idx2.load(path) == len(DOCS)
    i1, s1 = idx.search(QUERIES, k=5)
    i2, s2 = idx2.search(QUERIES, k=5)
    np.testing.assert_array_equal(i1, i2)
    # save stores f16 states: scores match to f16 resolution
    np.testing.assert_allclose(s1, s2, rtol=2e-3, atol=2e-3)


def test_index_rejects_bad_inputs(engine):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine)
    with pytest.raises(ValueError, match="empty"):
        idx.search(QUERIES[:1], k=3)
    with pytest.raises(ValueError, match="expected"):
        idx.add_token_vectors([np.zeros((3, 7), np.float32)])
    with pytest.raises(ValueError, match="no token vectors"):
        idx.add_token_vectors([np.zeros((0, engine.config.n_embd),
                                        np.float32)])
    idx.add(DOCS[:2])
    with pytest.raises(ValueError, match="k must be positive"):
        idx.search(QUERIES[:1], k=0)


def test_index_device_ingest_equals_host(engine):
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    dev = MaxSimIndex(engine, dtype="float32")
    dev.add(DOCS)  # single-device engine: device-resident ingest
    host = MaxSimIndex(engine, dtype="float32")
    host.add_token_vectors(engine.encode_token_states(DOCS))
    i1, s1 = dev.search(QUERIES, k=4)
    i2, s2 = host.search(QUERIES, k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_index_mesh_matches_single(engine, eight_devices):
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    mesh = make_mesh(dp=8, tp=1, devices=eight_devices)
    plain = MaxSimIndex(engine, dtype="float32")
    sharded = MaxSimIndex(engine, dtype="float32", mesh=mesh)
    plain.add(DOCS)
    sharded.add(DOCS)
    i1, s1 = plain.search(QUERIES, k=6)
    i2, s2 = sharded.search(QUERIES, k=6)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_index_candidates_mode_exact_when_c_covers_corpus(engine):
    """candidates >= corpus size: the two-stage mode reduces to exact
    (every doc is a candidate) — ids and scores must match."""
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine, dtype="float32")
    idx.add(DOCS)
    i1, s1 = idx.search(QUERIES, k=4)
    i2, s2 = idx.search(QUERIES, k=4, candidates=len(DOCS))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_index_candidates_mode_agreement(engine):
    """A narrow candidate set still recovers the exact top-1 on a corpus
    where the pooled prefilter is informative (each doc's mean token vector
    tracks its tokens), and candidate scores are EXACT MaxSim values."""
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    idx = MaxSimIndex(engine, dtype="float32")
    idx.add(DOCS * 4)  # 24 docs
    ie, se = idx.search(QUERIES, k=3)
    ia, sa = idx.search(QUERIES, k=3, candidates=8)
    # top-1 agreement (the pooled prefilter must keep the best doc); the
    # duplicated corpus makes several ids score-equivalent, so compare
    # scores, not raw ids
    np.testing.assert_allclose(sa[:, 0], se[:, 0], rtol=1e-5, atol=1e-5)
    # every approx score is an exact MaxSim value for its id
    expected = _expected_index_scores(engine, QUERIES, DOCS * 4)
    for qi in range(len(QUERIES)):
        for j in range(3):
            if ia[qi, j] >= 0:
                np.testing.assert_allclose(
                    sa[qi, j], expected[qi][ia[qi, j]], rtol=1e-4, atol=1e-4
                )


def test_index_candidates_rejects_mesh(engine, eight_devices):
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    mesh = make_mesh(dp=8, tp=1, devices=eight_devices)
    idx = MaxSimIndex(engine, dtype="float32", mesh=mesh)
    idx.add(DOCS)
    with pytest.raises(ValueError, match="single-device"):
        idx.search(QUERIES, k=2, candidates=4)


def test_index_capacity_presize_and_growth_paths_agree(engine):
    """capacity= pre-sizing (no growth re-pads) must not change results;
    pooled prefilter rows survive growth."""
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    pre = MaxSimIndex(engine, dtype="float32", capacity=4096)
    grow = MaxSimIndex(engine, dtype="float32")
    pre.add(DOCS)
    grow.add(DOCS)
    for cand in (None, len(DOCS)):
        i1, s1 = pre.search(QUERIES, k=4, candidates=cand)
        i2, s2 = grow.search(QUERIES, k=4, candidates=cand)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
