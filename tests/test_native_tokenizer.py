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


def test_mutation_fuzz_never_crashes():
    """Deterministic mini-fuzz of the untrusted tokenizer.json surface:
    structured mutations + raw garbage must load cleanly or raise — the
    process-killing classes this guards are in the two tests above."""
    import copy
    import json
    import random
    import string

    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.tokenizer.native import NativeTokenizer
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    base = json.loads(build_tokenizer_json(300))
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
