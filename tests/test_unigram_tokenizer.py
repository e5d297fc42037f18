"""Unigram (SentencePiece) tokenizer engine: parity vs the HF `tokenizers`
library on the same tokenizer.json, plus the Precompiled charsmap normalizer
against HF's spm_precompiled on the same binary blob.

The reference cannot load this family at all (convert-to-gguf.py:133-136
accepts only BertModel + WordPiece); XLM-R / paraphrase-multilingual-*
checkpoints all use it.
"""
import json
import struct

import pytest

pytest.importorskip("tokenizers")

from embedding_cpp_tpu.tokenizer.unigram import (
    PrecompiledCharsmap,
    UnigramModel,
    UnigramTokenizer,
)

FUZZ_TEXTS = [
    "hello world",
    "Hello World",
    "the quick brown fox jumps over the lazy dog",
    "It's the quick brown fox; don't they'll we've I'm you're 123 42.",
    "Café déjà vu — naïve résumé!",
    "你好世界 中文 模型",
    "日本語 テスト です",
    "  leading and   multiple   spaces  ",
    "",
    " ",
    "     ",
    "a",
    "▁already▁metaspaced",
    "tab\tand\nnewline",
    "mixed 中文 and english words",
    "punct!!! ... ??? ,,,",
    "number 3.14159 and -42 and 1e10",
    "ümlaut Über straße",
    "Ein schneller brauner Fuchs springt über den faulen Hund.",
    "Le renard brun rapide saute par-dessus le chien paresseux.",
    "unknownglyphs ☃❤ snowman heart",
    "ZAQWSXCDE rare uppercase run",
]


@pytest.fixture(scope="module")
def trained_json():
    from embedding_cpp_tpu.tokenizer.testvocab import build_unigram_tokenizer_json

    return build_unigram_tokenizer_json(600)


@pytest.fixture(scope="module")
def hf_tok(trained_json):
    from tokenizers import Tokenizer

    return Tokenizer.from_str(trained_json.decode())


def test_encode_parity_vs_hf(trained_json, hf_tok):
    ours = UnigramTokenizer(trained_json)
    for text in FUZZ_TEXTS:
        expected = hf_tok.encode(text, add_special_tokens=False).ids
        assert ours.encode(text) == expected, text


def test_decode_parity_vs_hf(trained_json, hf_tok):
    # skip_special_tokens=False matches the repo's backend contract
    # (tokenizer/hf.py decode): <unk> renders literally
    ours = UnigramTokenizer(trained_json)
    for text in FUZZ_TEXTS:
        ids = hf_tok.encode(text, add_special_tokens=False).ids
        assert ours.decode(ids) == hf_tok.decode(
            ids, skip_special_tokens=False
        ), text


def test_random_fuzz_vs_hf(trained_json, hf_tok):
    import random

    rng = random.Random(7)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDE 0123456789.,!?'\"- "
        "你好世界中文模型éüßñ▁ \t"
    )
    ours = UnigramTokenizer(trained_json)
    for _ in range(300):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 40))
        )
        expected = hf_tok.encode(text, add_special_tokens=False).ids
        assert ours.encode(text) == expected, repr(text)


def test_viterbi_beats_greedy():
    """Max-sum segmentation must pick 'abc' (-1.5) over greedy 'ab'+'c'
    (-4.0)."""
    vocab = [("<unk>", 0.0), ("ab", -1.0), ("abc", -1.5), ("c", -3.0),
             ("a", -2.0), ("b", -2.0)]
    m = UnigramModel(vocab, unk_id=0, byte_fallback=False)
    assert m.tokenize("abc") == [2]
    assert m.tokenize("ab") == [1]
    assert m.tokenize("abab") == [1, 1]


def test_unk_fusing():
    """Consecutive unknown chars fuse into ONE unk token (fuse_unk), and
    known pieces break the run."""
    vocab = [("<unk>", 0.0), ("a", -1.0)]
    m = UnigramModel(vocab, unk_id=0, byte_fallback=False)
    assert m.tokenize("xyz") == [0]
    assert m.tokenize("xaz") == [0, 1, 0]
    m2 = UnigramModel(vocab, unk_id=0, byte_fallback=False, fuse_unk=False)
    assert m2.tokenize("xyz") == [0, 0, 0]


def test_byte_fallback():
    vocab = [("<unk>", 0.0), ("a", -1.0)] + [
        (f"<0x{b:02X}>", -5.0) for b in range(256)
    ]
    m = UnigramModel(vocab, unk_id=0, byte_fallback=True)
    # 'é' = 0xC3 0xA9
    ids = m.tokenize("aé")
    assert ids == [1, m.vocab["<0xC3>"], m.vocab["<0xA9>"]]


def test_unigram_vs_hf_manual_vocab():
    """Hand-built vocab with adversarial scores through the full pipeline
    (tie-breaking, unk handling) vs HF on the same serialized json."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    vocab = [("<unk>", 0.0), ("▁", -2.5), ("a", -1.0), ("b", -1.1),
             ("ab", -2.1), ("ba", -2.0), ("▁ab", -3.0), ("aa", -1.9),
             ("abba", -4.0), ("c", -6.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    t.decoder = decoders.Metaspace(replacement="▁")
    spec = t.to_str()
    ours = UnigramTokenizer(spec)
    for text in ["abba ab", "aaab", "abc cba", "ab ab ab", "ba ab aab",
                 "ccc", "a b ab ba", *FUZZ_TEXTS]:
        assert ours.encode(text) == t.encode(
            text, add_special_tokens=False
        ).ids, repr(text)
        ids = t.encode(text, add_special_tokens=False).ids
        assert ours.decode(ids) == t.decode(
            ids, skip_special_tokens=False
        ), repr(text)


def test_added_tokens_and_specials():
    from tokenizers import Tokenizer, models, pre_tokenizers
    from tokenizers import AddedToken

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("a", -1.0), ("b", -1.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    t.add_special_tokens([AddedToken("<s>", special=True),
                          AddedToken("</s>", special=True)])
    spec = t.to_str()
    ours = UnigramTokenizer(spec)
    for text in ["<s>ab</s>", "a <s> b", "ab<s>ab"]:
        assert ours.encode(text) == t.encode(
            text, add_special_tokens=False
        ).ids, repr(text)


# --- Precompiled charsmap ----------------------------------------------------


class _Node:
    __slots__ = ("children", "value")

    def __init__(self):
        self.children: dict[int, _Node] = {}
        self.value = None


def build_charsmap_blob(mapping: dict[str, str]) -> bytes:
    """Build a sentencepiece precompiled_charsmap blob (darts double-array
    trie + NUL-separated replacement pool) for a source->replacement map.
    The encoding targets exactly the unit semantics spm_precompiled (and our
    reader) use; test_precompiled_vs_hf validates it against HF's Rust
    implementation, so a builder bug fails loudly there."""
    pool = bytearray()
    root = _Node()
    for src, dst in mapping.items():
        offset = len(pool)
        pool += dst.encode("utf-8") + b"\x00"
        node = root
        for byte in src.encode("utf-8"):
            node = node.children.setdefault(byte, _Node())
        node.value = offset

    units: dict[int, int] = {0: 0}
    used = {0}

    def alloc_base(node: _Node) -> int:
        base = 1
        while True:
            need = [base] if node.value is not None else []
            need += [base ^ c for c in node.children]
            if all(p not in used for p in need):
                used.update(need)
                return base
            base += 1

    def assign(node: _Node) -> int:
        base = alloc_base(node)
        if node.value is not None:
            units[base] = 0x80000000 | node.value
        for c, child in sorted(node.children.items()):
            pos = base ^ c
            child_base = assign(child)
            units[pos] = (
                c
                | (0x100 if child.value is not None else 0)
                | ((pos ^ child_base) << 10)
            )
        return base

    root_base = assign(root)
    units[0] = root_base << 10
    size = max(units) + 257  # headroom: label-mismatch probes stay in-bounds
    arr = [units.get(i, 0) for i in range(size)]
    return struct.pack("<I", size * 4) + struct.pack(f"<{size}I", *arr) + bytes(
        pool
    )


_CHARSMAP = {
    " ": " ",      # NBSP -> space (in the real spm map)
    "ａ": "a",      # fullwidth a
    "Ｂ": "B",      # fullwidth B
    "①": "1",      # circled one
    "ﬁ": "fi",          # ligature, multi-char replacement
    "é": "é",     # combining sequence (2-char source key)
    "　": " ",      # ideographic space
    "²": "2",
}

_NORM_TEXTS = [
    "hello world",
    "ﬁsh ﬁne",
    "étude caffé",
    "ａＢc ①　x",
    "plain ascii stays",
    "x² + y²",
    "mixed ﬁ ａé",
    "",
    "é already composed",
]


def test_precompiled_vs_hf():
    """Our charsmap reader vs HF's spm_precompiled on the same blob."""
    from tokenizers import normalizers

    blob = build_charsmap_blob(_CHARSMAP)
    theirs = normalizers.Precompiled(blob)
    ours = PrecompiledCharsmap(blob)
    for text in _NORM_TEXTS:
        assert ours.normalize(text) == theirs.normalize_str(text), repr(text)


def test_precompiled_inside_full_pipeline():
    """Precompiled normalizer + Metaspace + Unigram, full json vs HF."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    blob = build_charsmap_blob(_CHARSMAP)
    vocab = [("<unk>", 0.0), ("▁", -2.5), ("a", -1.0), ("b", -1.2),
             ("fi", -1.5), ("sh", -1.4), ("é", -1.3), ("1", -1.0),
             ("2", -1.0), ("B", -1.1), ("▁fish", -3.0), ("x", -1.0),
             ("e", -1.0), ("t", -1.0), ("u", -1.0), ("d", -1.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.normalizer = normalizers.Precompiled(blob)
    t.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    spec = t.to_str()
    # the blob survives json round-tripping (serialized as base64)
    assert "precompiled_charsmap" in json.loads(spec)["normalizer"]
    ours = UnigramTokenizer(spec)
    for text in _NORM_TEXTS + ["ﬁsh étude ａＢ"]:
        assert ours.encode(text) == t.encode(
            text, add_special_tokens=False
        ).ids, repr(text)


def test_prepend_scheme_never():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("a", -1.0), ("b", -1.0)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="never"
    )
    ours = UnigramTokenizer(t.to_str())
    for text in ["ab ab", "a", " a", "", "ab "]:
        assert ours.encode(text) == t.encode(
            text, add_special_tokens=False
        ).ids, repr(text)


def test_engine_end_to_end_unigram(tmp_path):
    """Synthetic Unigram GGUF -> Engine -> encode (XLM-R checkpoints ride
    the roberta graph, models/config.py from_hf_config)."""
    import dataclasses

    import numpy as np

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.models.params import random_state_dict
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.tokenizer.testvocab import build_unigram_tokenizer_json

    tokenizer_json = build_unigram_tokenizer_json(600)
    spec = json.loads(tokenizer_json)
    n_vocab = len(spec["model"]["vocab"])
    cfg = dataclasses.replace(
        PRESETS["tiny-roberta"], n_vocab=n_vocab, name="tiny-xlmr-test"
    )
    path = tmp_path / "xlmr.gguf"
    write_bert_gguf(path, cfg, random_state_dict(cfg, 0), tokenizer_json)
    eng = Engine.from_gguf(str(path))
    out = eng.encode(["hello world", "你好世界 中文 模型", "Café déjà vu"])
    assert out.shape == (3, cfg.n_embd)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    toks = eng.tokenize("hello world")
    assert toks[0] == eng.special_ids.cls and toks[-1] == eng.special_ids.sep


def test_prepend_scheme_first_added_token_sections():
    """HF PrependScheme::First prepends only to the section at text offset
    0 — a section after an added-token split gets no separator.  Both the
    pure-Python and (when built) native engines must match."""
    from tokenizers import AddedToken, Tokenizer, models, pre_tokenizers

    vocab = [("<unk>", 0.0), ("▁", -2.0), ("a", -1.0), ("b", -1.0),
             ("▁a", -1.5)]
    t = Tokenizer(models.Unigram(vocab, unk_id=0, byte_fallback=False))
    t.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first"
    )
    t.add_special_tokens([AddedToken("<s>", special=True)])
    spec = t.to_str()
    engines = [UnigramTokenizer(spec)]
    try:
        from embedding_cpp_tpu.tokenizer.native import NativeTokenizer

        engines.append(NativeTokenizer(spec.encode()))
    except ImportError:
        pass
    for text in ["a b", "<s>a b", "a<s>b", "ab <s> ab", " a", "", "<s>",
                 "b a<s> a b"]:
        want = t.encode(text, add_special_tokens=False).ids
        for eng in engines:
            assert eng.encode(text) == want, (type(eng).__name__, repr(text))


def test_albert_normalizer_chain_vs_hf():
    """The AlbertConverter normalizer chain (Replace quotes, NFKD,
    StripAccents, Lowercase, collapse-space Regex) through the pure-Python
    engine matches HF exactly — StripAccents (drop Mn) was the missing
    step; the rest compose from existing normalizers."""
    pytest.importorskip("tokenizers")
    import random

    from tokenizers import Tokenizer

    from embedding_cpp_tpu.tokenizer.testvocab import (
        build_albert_tokenizer_json,
    )

    blob = build_albert_tokenizer_json(400)
    hf = Tokenizer.from_str(blob.decode())
    ours = UnigramTokenizer(blob)
    texts = [
        "Café déjà vu", "``quoted''  twice", "ﬁne ﬂour ½ cup №5",
        "NAÏVE   Résumé — teST", "ｆｕｌｌ ｗｉｄｔｈ",
        "ạ́ unordered marks", "½Ⅻ№ ㎒ ㎦ ㍍ ¼", "Ω Å ẛ",
        "ậ ằ ẳ precomposed", "  leading  and  trailing  ",
        "का कि x\u20dd y\u20de",  # Mc + Me marks (StripAccents drops all M*)
    ]
    for t in texts:
        assert ours.encode(t) == hf.encode(t, add_special_tokens=False).ids, (
            repr(t)
        )
    rng = random.Random(17)
    alphabet = (
        "abcdeABCDE 012.,!?'\"- éüßñàÉÎÕÜ▁ ﬁﬂ½№Ⅻ㎒¼ΩẠ̊́̈"
    )
    for _ in range(200):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        assert ours.encode(t) == hf.encode(t, add_special_tokens=False).ids, (
            repr(t)
        )
