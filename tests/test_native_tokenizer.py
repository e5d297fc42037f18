"""Native C++ tokenizer parity vs the HF library and the pure-Python spec.

Builds the shared library on demand (`make -C native`); skips if no C++
toolchain is available.
"""
import shutil
import subprocess
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def native_tok():
    lib = ROOT / "native" / "build" / "libtpuembed_tokenizer.so"
    if not lib.exists():
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        r = subprocess.run(
            ["make", "-C", str(ROOT / "native")], capture_output=True, text=True
        )
        if r.returncode != 0:
            pytest.fail(f"native build failed:\n{r.stderr}")
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    blob = build_tokenizer_json(1000)
    return NativeTokenizer(blob), blob


@pytest.fixture(scope="module")
def hf_tok(native_tok):
    from embedding_cpp_tpu.tokenizer.hf import HFTokenizer

    return HFTokenizer(native_tok[1])


def _corpus():
    from corpus import FUZZ_CORPUS

    return FUZZ_CORPUS


def test_fuzz_corpus_matches_hf(native_tok, hf_tok):
    nat, _ = native_tok
    for text in _corpus():
        assert nat.encode(text) == hf_tok.encode(text), repr(text)


def test_random_strings_match_hf(native_tok, hf_tok):
    import random

    nat, _ = native_tok
    rng = random.Random(1)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n.,!?;:'\"()[]{}@#$%^&*-_+=~`|\\/<>"
        "àéîõüçñß日本語中文ｶﾀｶﾅ😀©«»"
    )
    for _ in range(300):
        n = rng.randint(0, 80)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert nat.encode(text) == hf_tok.encode(text), repr(text)


def test_id_to_token(native_tok):
    nat, _ = native_tok
    assert nat.id_to_token(2) == "[CLS]"
    assert nat.id_to_token(0) == "[PAD]"
    assert nat.id_to_token(999999) == ""


def test_long_input_buffer_growth(native_tok, hf_tok):
    nat, _ = native_tok
    text = "hello world test sentence " * 2000  # > 8192 tokens
    assert nat.encode(text) == hf_tok.encode(text)


def test_invalid_json_rejected():
    lib = ROOT / "native" / "build" / "libtpuembed_tokenizer.so"
    if not lib.exists():
        pytest.skip("native lib not built")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    with pytest.raises(ValueError):
        NativeTokenizer(b'{"model": {"type": "BPE"}}')


def test_invalid_utf8_does_not_crash(native_tok):
    nat, _ = native_tok
    import ctypes

    raw = b"hello \xff\xfe world"
    buf = (ctypes.c_int32 * 64)()
    n = nat._lib.tpuembed_encode(nat._handle, raw, len(raw), buf, 64)
    assert n >= 0  # garbage bytes become U+FFFD and are dropped/unk'd


def test_loader_prefers_native(native_tok):
    from embedding_cpp_tpu.tokenizer import load_tokenizer
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    tok = load_tokenizer(native_tok[1], backend="auto")
    assert isinstance(tok, NativeTokenizer)


def test_hostile_vocab_blobs_rejected_cleanly():
    """Untrusted GGUF blobs must fail the load, never corrupt memory:
    negative/absurd vocab ids previously wrote out of bounds
    (id_to_token[-1]) and added_tokens with a negative id resized the
    table to 0 then indexed it."""
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    hostile = [
        '{"model":{"type":"WordPiece","vocab":{"a":-1}}}',
        '{"model":{"type":"WordPiece","vocab":{"a":-2147483648}}}',
        '{"model":{"type":"WordPiece","vocab":{"a":999999999}}}',
        '{"added_tokens":[{"id":-5,"content":"x"}],'
        '"model":{"type":"WordPiece","vocab":{"[UNK]":0},"unk_token":"[UNK]"}}',
        '{"added_tokens":[{"content":"x"}],'
        '"model":{"type":"WordPiece","vocab":{"[UNK]":0},"unk_token":"[UNK]"}}',
        # number overflow must be a parse error, not a silent inf config
        '{"model":{"type":"WordPiece","vocab":{"a":0}},"x":1e999}',
        '{"model":{"type":"WordPiece","vocab":{"a":0}},"x":-1e999}',
    ]
    for blob in hostile:
        with pytest.raises(Exception):
            NativeTokenizer(blob.encode())


def test_added_token_content_preserved():
    """Regression: added-token content was read after std::move (always
    empty)."""
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    blob = ('{"added_tokens":[{"id":7,"content":"hello"}],'
            '"model":{"type":"WordPiece","vocab":{"[UNK]":0},'
            '"unk_token":"[UNK]"}}')
    t = NativeTokenizer(blob.encode())
    assert t.id_to_token(7) == "hello"


@pytest.mark.parametrize("family", ["wordpiece", "unigram"])
def test_mutation_fuzz_never_crashes(family):
    """Deterministic mini-fuzz of the untrusted tokenizer.json surface:
    structured mutations + raw garbage must load cleanly or raise — the
    process-killing classes this guards are in the two tests above."""
    import copy
    import json
    import random
    import string

    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import (
        build_tokenizer_json,
        build_unigram_tokenizer_json,
    )

    if family == "wordpiece":
        base = json.loads(build_tokenizer_json(300))
    else:
        base = json.loads(build_unigram_tokenizer_json(300))
    rng = random.Random(0)

    def mutate(obj):
        o = copy.deepcopy(obj)
        for _ in range(rng.randint(1, 4)):
            keys = list(o.keys()) if isinstance(o, dict) else []
            if not keys:
                break
            k = rng.choice(keys)
            action = rng.choice(["del", "type", "trunc", "junk"])
            if action == "del":
                o.pop(k, None)
            elif action == "type":
                o[k] = rng.choice([None, 123, [], "x", {"a": 1}])
            elif action == "trunc" and isinstance(o.get(k), dict) and o[k]:
                o[k].pop(next(iter(o[k])))
            else:
                o["zz_" + str(k)] = "\x00\xff" * 10
        return o

    cases = []
    for _ in range(60):
        m = mutate(base)
        if rng.random() < 0.5 and isinstance(m.get("model"), dict):
            m["model"] = mutate(m["model"])
        cases.append(json.dumps(m))
    for _ in range(30):
        n = rng.randint(0, 300)
        cases.append("".join(rng.choice(string.printable) for _ in range(n)))

    for blob in cases:
        try:
            t = NativeTokenizer(blob.encode())
            t.encode("hello world 中文 test")
            t.id_to_token(0)
        except Exception:
            pass  # clean rejection is the accepted outcome


# --- Unigram (SentencePiece) engine ------------------------------------------


@pytest.fixture(scope="module")
def native_unigram(native_tok):
    """Native Unigram on the trained synthetic XLM-R-style json (lib build
    + `tokenizers` availability piggyback on the native_tok fixture)."""
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import (
        build_unigram_tokenizer_json,
    )

    blob = build_unigram_tokenizer_json(600)
    return NativeTokenizer(blob), blob


@pytest.fixture(scope="module")
def hf_unigram(native_unigram):
    from tokenizers import Tokenizer

    return Tokenizer.from_str(native_unigram[1].decode())


def test_unigram_kind(native_unigram):
    assert native_unigram[0]._kind == 2


def test_unigram_fuzz_corpus_matches_hf(native_unigram, hf_unigram):
    from test_unigram_tokenizer import FUZZ_TEXTS

    nat, _ = native_unigram
    for text in FUZZ_TEXTS:
        want = hf_unigram.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)


def test_unigram_random_strings_match_hf(native_unigram, hf_unigram):
    import random

    nat, _ = native_unigram
    rng = random.Random(11)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDE 0123456789.,!?'\"- "
        "你好世界中文模型éüßñ▁ \t☃"
    )
    for _ in range(300):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 60))
        )
        want = hf_unigram.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)


def test_unigram_decode_matches_hf(native_unigram, hf_unigram):
    from test_unigram_tokenizer import FUZZ_TEXTS

    nat, _ = native_unigram
    for text in FUZZ_TEXTS:
        ids = hf_unigram.encode(text, add_special_tokens=False).ids
        assert nat.decode(ids) == hf_unigram.decode(
            ids, skip_special_tokens=False
        ), repr(text)


def test_unigram_manual_vocab_adversarial(native_tok):
    """Tie-breaking / unk-fusing vocab through the full native pipeline vs
    HF (mirrors test_unigram_tokenizer.test_unigram_vs_hf_manual_vocab)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from test_unigram_tokenizer import FUZZ_TEXTS

    vocab = [("<unk>", 0.0), ("▁", -2.5), ("a", -1.0), ("b", -1.1),
             ("ab", -2.1), ("ba", -2.0), ("▁ab", -3.0), ("aa", -1.9),
             ("abba", -4.0), ("c", -6.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    t.decoder = decoders.Metaspace(replacement="▁")
    nat = NativeTokenizer(t.to_str().encode())
    for text in ["abba ab", "aaab", "abc cba", "ab ab ab", "ba ab aab",
                 "ccc", "a b ab ba", *FUZZ_TEXTS]:
        ids = t.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == ids, repr(text)
        assert nat.decode(ids) == t.decode(
            ids, skip_special_tokens=False
        ), repr(text)


def test_unigram_byte_fallback(native_tok):
    from tokenizers import Tokenizer, models, pre_tokenizers

    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("a", -1.0)] + [
        (f"<0x{b:02X}>", -5.0) for b in range(256)
    ]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=True))
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    nat = NativeTokenizer(t.to_str().encode())
    for text in ["aé", "a é ☃", "héllo", "aaa"]:
        want = t.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)


def test_unigram_precompiled_charsmap_vs_hf(native_tok):
    """Native darts-trie charsmap reader through the full pipeline vs HF on
    the same serialized blob."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from test_unigram_tokenizer import _CHARSMAP, _NORM_TEXTS, build_charsmap_blob

    blob = build_charsmap_blob(_CHARSMAP)
    vocab = [("<unk>", 0.0), ("▁", -2.5), ("a", -1.0), ("b", -1.2),
             ("fi", -1.5), ("sh", -1.4), ("é", -1.3), ("1", -1.0),
             ("2", -1.0), ("B", -1.1), ("▁fish", -3.0), ("x", -1.0),
             ("e", -1.0), ("t", -1.0), ("u", -1.0), ("d", -1.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.normalizer = normalizers.Precompiled(blob)
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    nat = NativeTokenizer(t.to_str().encode())
    for text in _NORM_TEXTS + ["ﬁsh étude ａＢ"]:
        want = t.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)


def test_unigram_loader_prefers_native(native_unigram):
    from embedding_cpp_tpu.tokenizer import load_tokenizer
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    tok = load_tokenizer(native_unigram[1], backend="auto")
    assert isinstance(tok, NativeTokenizer)
    assert tok._kind == 2


def test_unigram_unsupported_shapes_fall_back():
    """Composing NFC/NFKC normalizers / general Regex Replace / multi-char
    Metaspace replacement reject natively (load_tokenizer then falls
    through to hf/python).  NFD/NFKD/StripAccents and the converters'
    " {2,}" Regex are handled natively — test_unigram_albert_chain."""
    lib = ROOT / "native" / "build" / "libtpuembed_tokenizer.so"
    if not lib.exists():
        pytest.skip("native lib not built")
    import json

    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    base = {
        "model": {"type": "Unigram", "unk_id": 0,
                  "vocab": [["<unk>", 0.0], ["a", -1.0]]},
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁"},
    }
    rejected = []
    m = json.loads(json.dumps(base))
    m["normalizer"] = {"type": "NFKC"}
    rejected.append(m)
    m = json.loads(json.dumps(base))
    m["normalizer"] = {"type": "Replace", "pattern": {"Regex": "a+"},
                       "content": "a"}
    rejected.append(m)
    m = json.loads(json.dumps(base))
    m["pre_tokenizer"]["replacement"] = "ab"
    rejected.append(m)
    m = json.loads(json.dumps(base))
    m["pre_tokenizer"] = {"type": "Whitespace"}
    rejected.append(m)
    for spec in rejected:
        with pytest.raises(ValueError):
            NativeTokenizer(json.dumps(spec).encode())


def test_unigram_hostile_blobs_rejected_cleanly():
    """Truncated/hostile charsmap blobs and malformed vocab entries must
    reject, never crash: the trie reader indexes untrusted offsets."""
    lib = ROOT / "native" / "build" / "libtpuembed_tokenizer.so"
    if not lib.exists():
        pytest.skip("native lib not built")
    import base64
    import json
    import struct

    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

    def spec(**kw):
        base = {
            "model": {"type": "Unigram", "unk_id": 0,
                      "vocab": [["<unk>", 0.0], ["a", -1.0]]},
            "pre_tokenizer": {"type": "Metaspace", "replacement": "▁"},
        }
        base.update(kw)
        return json.dumps(base).encode()

    hostile = [
        # vocab not a list of pairs
        b'{"model":{"type":"Unigram","vocab":{"a":0}},'
        b'"pre_tokenizer":{"type":"Metaspace"}}',
        b'{"model":{"type":"Unigram","vocab":[["a"]]},'
        b'"pre_tokenizer":{"type":"Metaspace"}}',
        # unk_id out of range
        spec(model={"type": "Unigram", "unk_id": 99,
                    "vocab": [["<unk>", 0.0]]}),
        # charsmap: bad base64 / truncated header / trie exceeding blob
        spec(normalizer={"type": "Precompiled",
                         "precompiled_charsmap": "!!notbase64!!"}),
        spec(normalizer={"type": "Precompiled",
                         "precompiled_charsmap":
                             base64.b64encode(b"\x01").decode()}),
        spec(normalizer={"type": "Precompiled",
                         "precompiled_charsmap": base64.b64encode(
                             struct.pack("<I", 4096) + b"\x00" * 8
                         ).decode()}),
    ]
    for blob in hostile:
        with pytest.raises(ValueError):
            NativeTokenizer(blob)
    # out-of-bounds trie offsets inside a well-formed header: encode must
    # not crash (probes clamp to the unit array)
    units = struct.pack("<4I", 0xFFFFFC00, 0x141, 0x241, 0x341)
    blob = base64.b64encode(struct.pack("<I", len(units)) + units).decode()
    t = NativeTokenizer(spec(normalizer={"type": "Precompiled",
                                         "precompiled_charsmap": blob}))
    t.encode("hello world a")


# --- ALBERT-style normalizer chain (NFKD / StripAccents / collapse) ----------

ALBERT_CHAIN_TEXTS = [
    "Café déjà vu",
    "``quoted''  twice",
    "ﬁne ﬂour ½ cup №5",
    "NAÏVE   Résumé — teST",
    "ｆｕｌｌ ｗｉｄｔｈ",
    "ạ́ unordered marks ẹ́",
    "hello   world",
    "½Ⅻ№ ㎒ ㎦ ㍍ ¼",
    "Ω Å ẛ ǅungla Ǆ ǈ",
    "ậ ằ ẳ precomposed",
    "  leading  and  trailing  ",
    # StripAccents drops ALL marks: Mc (Devanagari vowel sign) and
    # Me (combining enclosing circle), not just Mn
    "का कि x\u20dd y\u20de",
]


@pytest.fixture(scope="module")
def native_albert(native_tok):
    """Native Unigram on an ALBERT-style json: the full AlbertConverter
    normalizer chain (Replace quotes, NFKD, StripAccents, Lowercase,
    collapse-space Regex) must load NATIVELY, not fall back."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import (
        build_albert_tokenizer_json,
    )

    blob = build_albert_tokenizer_json(400)
    return NativeTokenizer(blob), blob


def test_unigram_albert_chain(native_albert):
    from tokenizers import Tokenizer

    nat, blob = native_albert
    hf = Tokenizer.from_str(blob.decode())
    for text in ALBERT_CHAIN_TEXTS:
        want = hf.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)


def test_unigram_albert_chain_fuzz(native_albert):
    """Random accent/ligature/combining-mark-heavy strings through the
    NFKD + StripAccents + Lowercase + collapse chain match HF exactly
    (exercises the canonical-ordering pass across concatenated
    decompositions)."""
    import random

    from tokenizers import Tokenizer

    nat, blob = native_albert
    hf = Tokenizer.from_str(blob.decode())
    rng = random.Random(13)
    alphabet = (
        "abcdeABCDE 012.,!?'\"- éüßñàÉÎÕÜ▁ ﬁﬂ½№Ⅻ㎒¼ΩÅ"
        "̣́̈̄ｆｕｌｌ"
    )
    for _ in range(300):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 50))
        )
        want = hf.encode(text, add_special_tokens=False).ids
        assert nat.encode(text) == want, repr(text)
