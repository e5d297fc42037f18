"""Byte-level BPE tokenizer (RoBERTa/GPT-2 family): pure-Python engine vs
the HF `tokenizers` library on a synthetic trained vocab.

The reference cannot load this family at all (WordPiece-only converter,
convert-to-gguf.py:133-136); parity here is held to the same standard as the
WordPiece engine (tests/test_tokenizer.py): exact id-sequence equality.
"""
import json

import pytest

from embedding_cpp_tpu.tokenizer.bpe import (
    ByteLevelBPETokenizer,
    bytes_to_unicode,
    gpt2_split,
)

FUZZ_CORPUS = [
    "hello world",
    "It's the quick brown fox; don't they'll we've I'm you're.",
    "  leading and trailing  ",
    "multi   space   runs",
    "tabs\tand\nnewlines\r\nmixed",
    "punct!!!??...--+==",
    "Café déjà vu — naïve résumé!",
    "日本語のテスト and ASCII",
    "emoji 😀🎉 test",
    "numbers 123 42.5 1,000,000",
    "x'y 'z ' lone'quotes",
    "CAPS MixedCase lowercase",
    "",
    " ",
    "   ",
    "a",
    "'s",
    "https://example.com/path?q=1&r=2",
    "snake_case kebab-case dot.case",
    " nbsp and em-space",
]


@pytest.fixture(scope="module")
def bpe_json():
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.testvocab import build_bpe_tokenizer_json

    return build_bpe_tokenizer_json(600)


@pytest.fixture(scope="module")
def hf_tok(bpe_json):
    from embedding_cpp_tpu.tokenizer.hf import HFTokenizer

    return HFTokenizer(bpe_json)


@pytest.fixture(scope="module")
def py_tok(bpe_json):
    return ByteLevelBPETokenizer(bpe_json)


def test_byte_map_is_reversible_and_total():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    # printable ascii maps to itself
    assert m[ord("A")] == "A"
    # space maps out of the ascii range (the famous Ġ)
    assert m[ord(" ")] == "Ġ"


def test_gpt2_split_semantics():
    # single space fuses onto the next word
    assert gpt2_split("hello world") == ["hello", " world"]
    # contractions split case-sensitively
    assert gpt2_split("it's") == ["it", "'s"]
    # whitespace runs leave exactly one space for the following token
    assert gpt2_split("a   b") == ["a", "  ", " b"]
    # trailing whitespace is one token
    assert gpt2_split("a  ") == ["a", "  "]
    # letters/numbers/punct split into separate pre-tokens
    assert gpt2_split("ab12!?") == ["ab", "12", "!?"]


@pytest.mark.parametrize("idx", range(len(FUZZ_CORPUS)))
def test_python_matches_hf(hf_tok, py_tok, idx):
    text = FUZZ_CORPUS[idx]
    assert py_tok.encode(text) == hf_tok.encode(text), repr(text)


def test_python_matches_hf_random_strings(hf_tok, py_tok):
    import random

    rng = random.Random(0)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n.,!?;:'\"()[]{}@#$%^&*-_+=~`|\\/<>"
        "àéîõüçñß日本語中文ｶﾀｶﾅ😀©«»  "
    )
    for _ in range(300):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert py_tok.encode(text) == hf_tok.encode(text), repr(text)


def test_decode_roundtrip(py_tok, hf_tok):
    for text in FUZZ_CORPUS:
        ids = py_tok.encode(text)
        assert py_tok.decode(ids) == hf_tok.decode(ids), repr(text)


def test_added_token_passthrough(py_tok, bpe_json):
    vocab_specials = {
        t["content"]: t["id"]
        for t in json.loads(bpe_json).get("added_tokens", [])
    }
    ids = py_tok.encode("a <mask> b")
    assert vocab_specials["<mask>"] in ids


def test_dispatch_by_model_type(bpe_json):
    """load_tokenizer picks the BPE engine from the json's model.type, not
    from the architecture."""
    from embedding_cpp_tpu.tokenizer import load_tokenizer

    tok = load_tokenizer(bpe_json, backend="auto")
    # whichever backend won, it must tokenize like HF
    from embedding_cpp_tpu.tokenizer.hf import HFTokenizer

    hf = HFTokenizer(bpe_json)
    assert tok.encode("hello world") == hf.encode("hello world")


def test_frame_ids_roberta_style(bpe_json):
    """<s> ids </s> framing via the generic frame_ids path (the engine's
    single-sequence post-processing; RobertaProcessing equivalent)."""
    from embedding_cpp_tpu.tokenizer import frame_ids
    from embedding_cpp_tpu.tokenizer.base import SpecialIds

    py = ByteLevelBPETokenizer(bpe_json)
    spec = json.loads(bpe_json)
    specials = {
        t["content"]: t["id"] for t in spec.get("added_tokens", [])
    }
    sp = SpecialIds(
        cls=specials["<s>"], sep=specials["</s>"], pad=specials["<pad>"],
        unk=specials["<unk>"],
    )
    ids = py.encode("hello world")
    framed = frame_ids(ids, sp, 16)
    assert framed[0] == sp.cls and framed[-1] == sp.sep
    assert framed[1:-1] == ids


@pytest.fixture(scope="module")
def native_tok(bpe_json):
    from pathlib import Path

    lib = Path(__file__).resolve().parents[1] / "native" / "build" / (
        "libtpuembed_tokenizer.so"
    )
    if not lib.exists():
        pytest.skip("native lib not built (run `make -C native`)")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    tok = NativeTokenizer(bpe_json)
    assert tok._kind == 1  # byte-level BPE engine selected
    return tok


@pytest.mark.parametrize("idx", range(len(FUZZ_CORPUS)))
def test_native_matches_hf(native_tok, hf_tok, idx):
    text = FUZZ_CORPUS[idx]
    assert native_tok.encode(text) == hf_tok.encode(text), repr(text)


def test_native_matches_hf_random_strings(native_tok, hf_tok):
    import random

    rng = random.Random(2)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n.,!?;:'\"()[]{}@#$%^&*-_+=~`|\\/<>"
        "àéîõüçñß日本語中文ｶﾀｶﾅ😀©«»  "
    )
    for _ in range(300):
        n = rng.randint(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert native_tok.encode(text) == hf_tok.encode(text), repr(text)


def test_native_decode_matches_hf(native_tok, hf_tok):
    for text in FUZZ_CORPUS + ["a <mask> b"]:
        ids = hf_tok.encode(text)
        assert native_tok.decode(ids) == hf_tok.decode(ids), repr(text)


def test_native_batch_threads_match(native_tok, hf_tok):
    texts = (FUZZ_CORPUS * 4)[:60]
    rows = native_tok.encode_batch(texts, n_threads=4)
    for t, ids in zip(texts, rows):
        assert list(ids) == hf_tok.encode(t), repr(t)


def test_native_long_input_buffer_growth(native_tok, hf_tok):
    text = "hello world test sentence " * 2000  # > 8192 tokens
    assert native_tok.encode(text) == hf_tok.encode(text)


def test_native_loader_prefers_native(bpe_json, native_tok):
    from embedding_cpp_tpu.tokenizer import load_tokenizer
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    tok = load_tokenizer(bpe_json, backend="auto")
    assert isinstance(tok, NativeTokenizer)


def test_native_unsupported_shapes_fall_back(bpe_json):
    """Pipeline shapes the native engine doesn't implement must reject the
    load (-> hf/python fallback), never silently mis-tokenize."""
    from pathlib import Path

    lib = Path(__file__).resolve().parents[1] / "native" / "build" / (
        "libtpuembed_tokenizer.so"
    )
    if not lib.exists():
        pytest.skip("native lib not built")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    rejected = [
        # NFC normalizer: not implemented natively
        json.dumps({
            "normalizer": {"type": "NFC"},
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []},
        }),
        # non-ByteLevel pre-tokenizer
        json.dumps({
            "pre_tokenizer": {"type": "Whitespace"},
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []},
        }),
        # missing pre-tokenizer (ByteLevel required, as in the python spec)
        json.dumps({
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []},
        }),
        # suffix-BPE is a different pipeline
        json.dumps({
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": [],
                      "end_of_word_suffix": "</w>"},
        }),
        # hostile ids must fail the load, not index out of bounds
        json.dumps({
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": -1}, "merges": []},
        }),
        json.dumps({
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": 999999999}, "merges": []},
        }),
        # malformed merges entries
        json.dumps({
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": [123]},
        }),
        json.dumps({
            "pre_tokenizer": {"type": "ByteLevel"},
            "model": {"type": "BPE", "vocab": {"a": 0}, "merges": ["nospace"]},
        }),
    ]
    for blob in rejected:
        with pytest.raises(ValueError):
            NativeTokenizer(blob.encode())


def test_native_lowercase_normalizer(native_tok):
    """Lowercase IS supported natively; verify against the python spec."""
    blob = json.dumps({
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "use_regex": True},
        "model": {"type": "BPE",
                  "vocab": {c: i for i, c in enumerate("helowrd ")},
                  "merges": []},
    })
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    nat = NativeTokenizer(blob.encode())
    py = ByteLevelBPETokenizer(blob)
    assert nat._kind == 1
    for text in ("HELLO World", "hello world", "HeLLo"):
        assert nat.encode(text) == py.encode(text), repr(text)


def test_no_unk_drops_unknown_symbol():
    """A BPE model without unk_token drops unresolvable symbols (HF
    behavior) instead of crashing."""
    blob = json.dumps({
        "model": {
            "type": "BPE",
            "vocab": {"a": 0, "b": 1},
            "merges": [],
        },
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "use_regex": True},
    })
    tok = ByteLevelBPETokenizer(blob)
    # "c" maps to a byte char not in the vocab -> dropped
    assert tok.encode("abc") == [0, 1]


def test_unsupported_shapes_raise():
    with pytest.raises(ValueError, match="model type"):
        ByteLevelBPETokenizer(json.dumps({"model": {"type": "Unigram"}}))
    with pytest.raises(ValueError, match="pre_tokenizer"):
        ByteLevelBPETokenizer(json.dumps({
            "model": {"type": "BPE", "vocab": {}, "merges": []},
            "pre_tokenizer": {"type": "Whitespace"},
        }))
