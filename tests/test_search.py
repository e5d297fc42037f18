"""On-device vector search (runtime/search.py): exact top-k parity with a
numpy brute force, capacity growth, bucket padding.  The reference's
retrieval demo pulls every corpus vector to the client
(examples/sample_client.py:40-69); here only ids + scores leave the device.
"""
import numpy as np
import pytest

from embedding_cpp_tpu.models import BertConfig, ComputeOptions
from embedding_cpp_tpu.runtime.engine import Engine
from embedding_cpp_tpu.runtime.search import VectorIndex

CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128
)


@pytest.fixture(scope="module")
def engine():
    pytest.importorskip("tokenizers")
    return Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))


def test_search_matches_numpy(engine):
    corpus = [f"sentence number {i} about topic {i % 7}" for i in range(50)]
    queries = ["sentence about topic 3", "totally different words here"]
    idx = VectorIndex(engine, dtype="float32")
    assert idx.add(corpus) == 50
    got_idx, got_scores = idx.search(queries, k=5)

    cvecs = engine.encode(corpus)
    qvecs = engine.encode(queries)
    scores = qvecs @ cvecs.T
    ref_idx = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(got_idx, ref_idx)
    np.testing.assert_allclose(
        got_scores, np.take_along_axis(scores, ref_idx, axis=1), atol=1e-5
    )


def test_search_bf16_ranking_stable(engine):
    """bf16 corpus storage: top-1 must agree with the f32 ranking on a
    corpus with distinct topics."""
    corpus = [f"unique topic {i} word{i} token{i}" for i in range(20)]
    f32 = VectorIndex(engine, dtype="float32")
    b16 = VectorIndex(engine, dtype="bfloat16")
    f32.add(corpus)
    b16.add(corpus)
    queries = [corpus[3], corpus[17]]
    i32, _ = f32.search(queries, k=1)
    i16, _ = b16.search(queries, k=1)
    np.testing.assert_array_equal(i32, i16)
    np.testing.assert_array_equal(i32[:, 0], [3, 17])


def test_incremental_add_and_growth(engine):
    """Appends across the capacity boundary keep earlier vectors intact."""
    idx = VectorIndex(engine, dtype="float32")
    texts1 = [f"first batch {i}" for i in range(10)]
    texts2 = [f"second batch {i}" for i in range(10)]
    idx.add(texts1)
    total = idx.add(texts2)
    assert total == 20 and len(idx) == 20
    got, _ = idx.search([texts1[4]], k=1)
    assert got[0, 0] == 4
    got, _ = idx.search([texts2[7]], k=1)
    assert got[0, 0] == 17  # position 10 + 7 in the concatenated corpus


def test_add_vectors_shape_check(engine):
    idx = VectorIndex(engine)
    with pytest.raises(ValueError):
        idx.add_vectors(np.zeros((3, CFG.n_embd + 1), np.float32))
    with pytest.raises(ValueError):
        idx.search(["anything"], k=1)  # empty index


def test_k_clamped_to_corpus(engine):
    """k beyond the corpus size returns the REQUESTED width, the overflow
    slots explicitly marked (id -1, score -inf) — callers never infer the
    clamp from a shrunken shape."""
    idx = VectorIndex(engine, dtype="float32")
    idx.add(["only one", "and two"])
    got, scores = idx.search(["only one"], k=10)
    assert got.shape == (1, 10)
    assert scores.shape == (1, 10)
    assert set(got[0, :2]) == {0, 1}  # the two real docs rank first
    assert np.all(got[0, 2:] == -1)
    assert np.all(np.isneginf(scores[0, 2:]))
    assert np.all(np.isfinite(scores[0, :2]))


def test_save_load_roundtrip(engine, tmp_path):
    """Index persistence: saved vectors reload into an equivalent index."""
    corpus = [f"persisted doc {i}" for i in range(15)]
    idx = VectorIndex(engine, dtype="float32")
    idx.add(corpus)
    path = str(tmp_path / "index.npz")
    idx.save(path)

    idx2 = VectorIndex(engine, dtype="float32")
    assert idx2.load(path) == 15
    q = [corpus[8]]
    i1, s1 = idx.search(q, k=3)
    i2, s2 = idx2.search(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_sharded_index_matches_single(engine):
    """dp-sharded corpus + two-stage distributed top-k == single-device
    exact search (8 virtual devices; corpus rows shard over dp)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from embedding_cpp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1, devices=jax.devices()[:8])
    corpus = [f"shard doc {i} topic {i % 9}" for i in range(60)]
    queries = ["shard doc 17 topic 8", "something unrelated entirely"]

    single = VectorIndex(engine, dtype="float32")
    single.add(corpus)
    sharded = VectorIndex(engine, dtype="float32", mesh=mesh)
    sharded.add(corpus)

    i1, s1 = single.search(queries, k=7)
    i2, s2 = sharded.search(queries, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    # corpus rows really shard over dp
    shard_rows = sharded._corpus.sharding.shard_shape(sharded._corpus.shape)[0]
    assert shard_rows == sharded._corpus.shape[0] // 8


def test_empty_save_load_roundtrip(engine, tmp_path):
    """Empty-index save/load must not crash (add_vectors with 0 rows)."""
    idx = VectorIndex(engine)
    path = str(tmp_path / "empty.npz")
    idx.save(path)
    idx2 = VectorIndex(engine)
    assert idx2.load(path) == 0
    assert len(idx2) == 0


def test_unnormalized_vectors_rank_by_cosine(engine):
    """Raw (un-normalized) vectors are unit-normalized at add/search time —
    ranking is cosine, never magnitude (models with normalize=false return
    raw pooled vectors)."""
    rng = np.random.default_rng(0)
    E = engine.n_embd
    a = rng.normal(size=E).astype(np.float32)
    b = rng.normal(size=E).astype(np.float32)
    idx = VectorIndex(engine, dtype="float32")
    # corpus: a tiny copy of `a`, and a huge copy of `b`
    idx.add_vectors(np.stack([a * 1e-3, b * 1e6]))
    got, scores = idx.search_vectors(a[None, :], k=2)
    assert got[0, 0] == 0  # direction wins, not magnitude
    assert scores[0, 0] > 0.999


def test_two_stage_topk_exact():
    """The blocked two-stage selection is bit-exact vs plain lax.top_k
    (global top-k is a subset of the union of per-block top-ks)."""
    import jax.numpy as jnp

    from embedding_cpp_tpu.runtime.search import _TOPK_BLOCK, _select_topk

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(5, 8 * _TOPK_BLOCK)), jnp.float32)
    import jax

    s_ref, i_ref = jax.lax.top_k(scores, 7)
    s2, i2 = _select_topk(scores, 7, exact=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i2))
    # ties at block boundaries: duplicated values keep valid indices
    tied = jnp.zeros((2, 2 * _TOPK_BLOCK), jnp.float32)
    st, it = _select_topk(tied, 3, exact=True)
    assert np.asarray(st).shape == (2, 3)


def test_approx_search_recall(engine):
    """exact=False (lax.approx_max_k) finds the true top-1 on a corpus with
    distinct topics (falls back to exact off-TPU)."""
    corpus = [f"distinct topic {i} word{i}" for i in range(30)]
    idx = VectorIndex(engine, dtype="float32", exact=False)
    idx.add(corpus)
    got, _ = idx.search([corpus[11]], k=3)
    assert got[0, 0] == 11


def test_device_ingest_with_int8_transfer_engine():
    """An int8-TRANSFER engine still ingests on-device at full f32 fidelity
    (the device path uses a float32-output forward variant) — indexed
    vectors must match an f32 engine's, not carry transfer quantization."""
    import dataclasses

    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models import ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    opts_i8 = ComputeOptions(dtype="float32", output_dtype="int8")
    eng_i8 = Engine.synthetic(CFG, opts=opts_i8)
    eng_f32 = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    corpus = [f"int8 engine ingest doc {i}" for i in range(12)]
    idx = VectorIndex(eng_i8, dtype="float32")
    assert idx._device_ingest_ok()
    idx.add(corpus)
    ref = VectorIndex(eng_f32, dtype="float32")
    ref.add(corpus)
    # corpora bit-identical: the device path never saw int8 packing
    np.testing.assert_array_equal(
        np.asarray(idx._corpus[: len(corpus)]),
        np.asarray(ref._corpus[: len(corpus)]),
    )
    # while encode() (the transfer path) IS int8-quantized
    enc = eng_i8.encode([corpus[0]])
    assert not np.array_equal(enc, eng_f32.encode([corpus[0]]))


def test_device_ingest_matches_host_path(engine):
    """Single-device add() ingests embeddings without a host round trip
    (device scatter) — results identical to the host add_vectors path.
    40 short docs crosses the sequence-packing threshold, so the device
    path's PackedSegBatch position mapping is exercised too."""
    corpus = [f"zero fetch ingest doc {i}" for i in range(40)]
    dev = VectorIndex(engine, dtype="float32")
    assert dev._device_ingest_ok()
    dev.add(corpus[:5])
    dev.add(corpus[5:])  # second add is 35 short docs -> packed path
    host = VectorIndex(engine, dtype="float32")
    host.add_vectors(engine.encode(corpus))
    q = [corpus[5], corpus[23]]
    i1, s1 = dev.search(q, k=4)
    i2, s2 = host.search(q, k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
