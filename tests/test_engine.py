"""Engine end-to-end: GGUF -> tokenize -> batch -> embeddings; batching
correctness vs one-at-a-time; bucketing behavior."""
import numpy as np
import pytest

from embedding_cpp_tpu.models.bert import ComputeOptions
from embedding_cpp_tpu.runtime.batching import bucket_for, pack_batches
from embedding_cpp_tpu.runtime.engine import Engine

TEXTS = [
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "a",
    "time to buy an apple and a banana",
    "this is a test sentence for the embedding model",
    "go",
]


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model

    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    make_test_model(str(path), "tiny", "f32")
    return str(path)


@pytest.fixture(scope="module")
def engine(gguf_path):
    return Engine.from_gguf(gguf_path, opts=ComputeOptions(dtype="float32"))


def test_bucket_for():
    assert bucket_for(3, (16, 32)) == 16
    assert bucket_for(16, (16, 32)) == 16
    assert bucket_for(17, (16, 32)) == 32
    assert bucket_for(99, (16, 32)) == 32  # clamps to largest


def test_pack_batches_scatter():
    toks = [[1, 2], [3, 4, 5], [6], [7] * 20]
    batches = pack_batches(toks, pad_id=0, seq_buckets=(8, 32), batch_buckets=(4,))
    covered = sorted(i for b in batches for i in b.positions)
    assert covered == [0, 1, 2, 3]
    for b in batches:
        assert b.ids.shape == b.mask.shape
        for row, idx in enumerate(b.positions):
            n = len(toks[idx][: b.ids.shape[1]])
            assert b.mask[row, :n].all() and not b.mask[row, n:].any()
            np.testing.assert_array_equal(b.ids[row, :n], toks[idx][:n])


def test_encode_shape_and_norm(engine):
    out = engine.encode(TEXTS)
    assert out.shape == (len(TEXTS), engine.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_batched_equals_single(engine):
    batched = engine.encode(TEXTS)
    for i, t in enumerate(TEXTS):
        single = engine.encode([t])[0]
        np.testing.assert_allclose(batched[i], single, atol=2e-5, rtol=1e-4)


def test_single_string_input(engine):
    out = engine.encode("hello world")
    assert out.shape == (1, engine.n_embd)


def test_tokenize_framing(engine):
    ids = engine.tokenize("hello world")
    assert ids[0] == engine.special_ids.cls
    assert ids[-1] == engine.special_ids.sep
    assert engine.id_to_token(ids[0]) == "[CLS]"


def test_deterministic(engine):
    a = engine.encode(["hello world"])
    b = engine.encode(["hello world"])
    np.testing.assert_array_equal(a, b)


def test_similar_sentences_more_similar(engine):
    # even with random weights, identical sentences embed identically and
    # near-duplicates stay closer than unrelated ones in expectation;
    # just check the full pipeline orders exact duplicates first
    q = engine.encode(["the quick brown fox jumps over the lazy dog"])[0]
    c = engine.encode(
        ["the quick brown fox jumps over the lazy dog", "go", "hello world"]
    )
    sims = c @ q
    assert np.argmax(sims) == 0
    assert sims[0] > 0.999


def test_synthetic_engine_q4():
    from embedding_cpp_tpu.models.config import BertConfig

    cfg = BertConfig(
        n_vocab=1000, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128
    )
    eng = Engine.synthetic(cfg, ftype="q4_0")
    out = eng.encode(["hello world", "test sentence"])
    assert out.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_encode_dimensions(engine):
    full = engine.encode(TEXTS)
    cut = engine.encode(TEXTS, dimensions=16)
    assert cut.shape == (len(TEXTS), 16)
    np.testing.assert_allclose(np.linalg.norm(cut, axis=-1), 1.0, atol=1e-5)
    expected = full[:, :16] / np.linalg.norm(full[:, :16], axis=-1,
                                             keepdims=True)
    np.testing.assert_allclose(cut, expected, atol=1e-6)
    # full-width is a no-op; invalid values raise
    np.testing.assert_array_equal(
        engine.encode(TEXTS, dimensions=full.shape[1]), full
    )
    import pytest as _pytest

    for bad in (0, -1, full.shape[1] + 1):
        with _pytest.raises(ValueError):
            engine.encode(TEXTS, dimensions=bad)


def test_synthetic_engine_q8():
    from embedding_cpp_tpu.models.config import BertConfig

    cfg = BertConfig(
        n_vocab=1000, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128
    )
    eng = Engine.synthetic(cfg, ftype="q8_0")
    ref = Engine.synthetic(cfg, ftype="f32")
    out = eng.encode(["hello world", "test sentence"])
    assert out.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # 8-bit weights track f32 closely (same seed -> same base weights)
    cos = np.sum(out * ref.encode(["hello world", "test sentence"]), axis=-1)
    assert cos.min() > 0.999


def test_stats_accounting(engine):
    before = dict(engine.stats)
    engine.encode(TEXTS)
    assert engine.stats["sentences"] == before["sentences"] + len(TEXTS)
    assert engine.stats["tokens"] > before["tokens"]


def test_encode_empty_list():
    from embedding_cpp_tpu.models import BertConfig
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=64, n_layer=1, n_head=4,
                     n_ff=128)
    eng = Engine.synthetic(cfg, ftype="f32")
    out = eng.encode([])
    assert out.shape == (0, cfg.n_embd)


def test_encode_empty_and_whitespace_strings():
    """Empty text still frames to [CLS][SEP] and embeds (the reference's
    tokenizer path also yields a CLS/SEP-only sequence)."""
    from embedding_cpp_tpu.models import BertConfig
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=64, n_layer=1, n_head=4,
                     n_ff=128)
    eng = Engine.synthetic(cfg, ftype="f32")
    out = eng.encode(["", "   ", "hello"])
    assert out.shape == (3, cfg.n_embd)
    assert np.isfinite(out).all()
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_encode_mixed_lengths_packed_and_bucketed():
    """A mix spanning the packed path (short) and the bucketed path (long)
    in one call scatters results back to input order."""
    from embedding_cpp_tpu.models import BertConfig
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=64, n_layer=1, n_head=4,
                     n_ff=128)
    eng = Engine.synthetic(cfg, ftype="f32", packing="auto")
    ref = Engine.synthetic(cfg, ftype="f32", packing="never")
    texts = (["tiny"] * 40                         # packed
             + ["word " * 40] * 3                  # too long for auto-pack
             + ["medium length sentence here"] * 5)
    a = eng.encode(texts)
    b = ref.encode(texts)
    from conftest import tpu_atol

    np.testing.assert_allclose(a, b, atol=tpu_atol(2e-5), rtol=1e-4)


def test_int8_output_transfer(gguf_path):
    """output_dtype="int8" fetches (codes, scales) — a quarter of the f32
    device->host bytes — and decodes to f32 embeddings within quantization
    tolerance of the f32 path (per-vector symmetric scale: error <=
    scale/2 = amax/254 per element)."""
    f32 = Engine.from_gguf(gguf_path, opts=ComputeOptions(dtype="float32"))
    i8 = Engine.from_gguf(
        gguf_path,
        opts=ComputeOptions(dtype="float32", output_dtype="int8"),
    )
    a = f32.encode(TEXTS)
    b = i8.encode(TEXTS)
    assert b.dtype == np.float32
    # elementwise error bounded by half a quantization step
    amax = np.abs(a).max(axis=1, keepdims=True)
    assert np.all(np.abs(a - b) <= amax / 254 + 1e-7)
    # cosine scores essentially unchanged
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    assert np.all(cos > 0.9999)


def test_int8_output_packed(gguf_path):
    """int8 transfer through the sequence-packed path (packed forward
    returns the (codes, scales) pair through the compact gather)."""
    i8 = Engine.from_gguf(
        gguf_path,
        opts=ComputeOptions(dtype="float32", output_dtype="int8"),
        packing="always",
    )
    f32 = Engine.from_gguf(gguf_path, opts=ComputeOptions(dtype="float32"),
                           packing="never")
    texts = [f"short sentence {i}" for i in range(40)]
    a = f32.encode(texts)
    b = i8.encode(texts)
    amax = np.abs(a).max(axis=1, keepdims=True)
    assert np.all(np.abs(a - b) <= amax / 254 + 1e-5)


def test_pack_output_i8_roundtrip():
    """Device-side int8 pack -> host unpack roundtrip: error bounded by half
    a quantization step per element, any leading shape."""
    import jax.numpy as jnp

    from embedding_cpp_tpu.models.bert import pack_output_i8, unpack_output_i8

    rng = np.random.default_rng(0)
    for shape in [(5, 64), (2, 3, 32)]:
        x = rng.normal(size=shape).astype(np.float32)
        packed = np.asarray(pack_output_i8(jnp.asarray(x)))
        assert packed.dtype == np.uint8 and packed.shape[-1] == shape[-1] + 4
        back = unpack_output_i8(packed)
        amax = np.abs(x).max(axis=-1, keepdims=True)
        assert np.all(np.abs(back - x) <= amax / 254 + 1e-7)
    # zero vectors survive (scale guard)
    z = np.zeros((3, 16), np.float32)
    np.testing.assert_array_equal(unpack_output_i8(np.asarray(
        pack_output_i8(jnp.asarray(z)))), z)


def test_persistent_compile_cache_writes_entries(tmp_path, monkeypatch):
    """Engine construction enables the persistent XLA cache; a forward
    compile lands an entry on disk (so the next process skips the compile)."""
    import jax

    from embedding_cpp_tpu.utils import compile_cache
    from embedding_cpp_tpu.models.config import BertConfig

    if jax.config.jax_compilation_cache_dir:
        pytest.skip("cache dir already configured in this process")
    cache_dir = str(tmp_path / "xla-cache")
    monkeypatch.setenv("TPUEMBED_COMPILE_CACHE", cache_dir)
    monkeypatch.setattr(compile_cache, "_enabled", False)
    cfg = BertConfig(
        n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128
    )
    eng = Engine.synthetic(cfg, ftype="f32")
    assert jax.config.jax_compilation_cache_dir == cache_dir
    eng.encode(["cache me"])
    import os

    assert len(os.listdir(cache_dir)) >= 1


def test_persistent_compile_cache_opt_out(monkeypatch):
    import jax

    from embedding_cpp_tpu.utils import compile_cache

    monkeypatch.setenv("TPUEMBED_COMPILE_CACHE", "0")
    monkeypatch.setattr(compile_cache, "_enabled", False)
    assert compile_cache.enable() is None


def test_concat_combo_cap():
    """The single-fetch device concat admits only a bounded set of distinct
    batch-shape combos (each combo is a compiled executable; unbounded
    combos would mean unbounded slow remote compiles)."""
    from embedding_cpp_tpu.models import BertConfig

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=64, n_layer=1, n_head=4,
                     n_ff=128)
    eng = Engine.synthetic(cfg, ftype="f32")
    for i in range(16):
        assert eng._concat_combo_ok(((i, 64), "f32"))
    # seen combos stay admitted; new ones are refused past the cap
    assert eng._concat_combo_ok(((3, 64), "f32"))
    assert not eng._concat_combo_ok(((99, 64), "f32"))


def test_pack_batches_token_budget():
    """Long sequence buckets get proportionally fewer rows per dispatch
    (max_tokens bounds rows x seq bucket, keeping one compiled shape's
    activation footprint flat across bucket lengths)."""
    toks = [[1] * 1000 for _ in range(300)]
    batches = pack_batches(
        toks, pad_id=0, seq_buckets=(512, 1024), batch_buckets=(1, 8, 64, 512),
        max_tokens=1024 * 128,
    )
    assert all(b.ids.shape == (64, 1024) or b.ids.shape[0] < 64 for b in batches)
    assert max(b.ids.shape[0] for b in batches) == 64  # 128-row cap -> bucket 64
    covered = sorted(i for b in batches for i in b.positions)
    assert covered == list(range(300))
    # short buckets keep the full row cap (budget only binds past it)
    short = pack_batches(
        [[1] * 10 for _ in range(100)], pad_id=0, seq_buckets=(16,),
        batch_buckets=(1, 8, 64, 512), max_tokens=1024 * 128,
    )
    assert short[0].ids.shape == (512, 16)


def test_long_context_engine_no_truncation():
    """A long-context encoder (ModernBERT-style n_ctx) must batch texts past
    512 tokens at full length: the default seq buckets extend to n_ctx in
    power-of-two steps, and the result equals the direct full-length
    forward (truncation at 512 would change it)."""
    from embedding_cpp_tpu.models.bert import bert_embed_batch
    from embedding_cpp_tpu.models.config import BertConfig
    from embedding_cpp_tpu.models.params import random_params

    cfg = BertConfig(
        n_vocab=256, n_ctx=2048, n_embd=64, n_layer=2, n_head=2, n_ff=128,
        n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
        rope_theta=160000.0, local_rope_theta=10000.0,
        global_attn_every=3, local_window=64, name="long-ctx",
    )
    params = random_params(cfg, seed=11)
    opts = ComputeOptions(dtype="float32")
    eng = Engine(params, cfg, opts=opts)
    assert eng.seq_buckets[-1] == 2048 and 1024 in eng.seq_buckets

    rng = np.random.default_rng(12)
    long_ids = list(rng.integers(0, 256, size=700))
    short_ids = list(rng.integers(0, 256, size=20))
    out = eng.embed_tokens([long_ids, short_ids])

    s = 1024  # the bucket the 700-token text lands in
    ids = np.zeros((1, s), np.int32)
    mask = np.zeros((1, s), np.int32)
    ids[0, : len(long_ids)] = long_ids
    mask[0, : len(long_ids)] = 1
    direct = np.asarray(bert_embed_batch(params, ids, mask, cfg, opts))
    np.testing.assert_allclose(out[0], direct[0], atol=2e-5, rtol=1e-4)


def test_truncate_false_rejects_overlength():
    """encode(truncate=False) raises on inputs past the model context
    instead of silently cutting them (the reference always cuts,
    bert.cpp:756-780); truncate=True (default) keeps that behavior."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models.config import BertConfig

    cfg = BertConfig(
        n_vocab=256, n_ctx=16, n_embd=32, n_layer=1, n_head=2, n_ff=64,
        name="tiny-ctx16",
    )
    eng = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    long_text = " ".join(["tokenizers"] * 40)
    # default: silently truncated, embeds fine
    out = eng.encode([long_text, "short"])
    assert out.shape[0] == 2
    with pytest.raises(ValueError, match="over the model's 16-token"):
        eng.encode([long_text], truncate=False)
    # in-budget texts pass strict mode and match the default path
    strict = eng.encode(["short text"], truncate=False)
    np.testing.assert_allclose(strict, eng.encode(["short text"]), atol=1e-6)


def test_custom_batch_buckets_raise_token_budget():
    """An explicitly larger top batch bucket must actually be dispatchable:
    the per-dispatch token budget derives from the caller's buckets
    (floored at the default 2048x512)."""
    from embedding_cpp_tpu.models.config import BertConfig
    from embedding_cpp_tpu.models.params import random_params

    cfg = BertConfig(n_vocab=64, n_ctx=64, n_embd=32, n_layer=1, n_head=2,
                     n_ff=64)
    params = random_params(cfg, seed=1)
    eng = Engine(params, cfg, batch_buckets=(256, 4096))
    assert eng.max_batch_tokens == 4096 * 512
    small = Engine(params, cfg, batch_buckets=(8,))
    assert small.max_batch_tokens == 2048 * 512  # historical floor
