"""Multilingual / cased model support (the reference's m3e/e5/CJK configs:
tokenizer.json drives cased vs uncased and CJK behavior — README.md:23-28)."""
import json

import numpy as np
import pytest

pytest.importorskip("tokenizers")


def _cased_tokenizer_json(n_vocab=2000):
    """Cased (lowercase=False, strip_accents=False) WordPiece with CJK vocab."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    tokens += ["Hello", "hello", "World", "world", "Québec", "École"]
    tokens += list("你好世界中文日本語言模型嵌入向量")
    tokens += [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"]
    while len(tokens) < n_vocab:
        tokens.append(f"[unused{len(tokens)}]")
    vocab = {t: i for i, t in enumerate(tokens)}
    tok = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]", max_input_chars_per_word=100))
    tok.normalizer = normalizers.BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=False, lowercase=False
    )
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    return tok.to_str().encode(), vocab


@pytest.fixture(scope="module")
def cased():
    return _cased_tokenizer_json()


@pytest.mark.parametrize("backend", ["python", "hf", "native"])
def test_cased_preserves_case_and_accents(cased, backend):
    from embedding_cpp_tpu.tokenizer import load_tokenizer

    blob, vocab = cased
    try:
        tok = load_tokenizer(blob, backend)
    except ImportError:
        pytest.skip(f"{backend} backend unavailable")
    assert tok.encode("Hello World") == [vocab["Hello"], vocab["World"]]
    assert tok.encode("hello world") == [vocab["hello"], vocab["world"]]
    # accents survive (strip_accents=False)
    assert tok.encode("Québec") == [vocab["Québec"]]


@pytest.mark.parametrize("backend", ["python", "hf", "native"])
def test_cjk_chars_isolated(cased, backend):
    from embedding_cpp_tpu.tokenizer import load_tokenizer

    blob, vocab = cased
    try:
        tok = load_tokenizer(blob, backend)
    except ImportError:
        pytest.skip(f"{backend} backend unavailable")
    # every CJK char becomes its own token even with no whitespace
    assert tok.encode("你好世界") == [
        vocab["你"], vocab["好"], vocab["世"], vocab["界"]
    ]
    # "abc中文def": CJK isolation splits the latin runs into separate words,
    # which wordpiece as a ##b ##c / d ##e ##f around the isolated CJK chars
    assert tok.encode("abc中文def") == [
        vocab["a"], vocab["##b"], vocab["##c"],
        vocab["中"], vocab["文"],
        vocab["d"], vocab["##e"], vocab["##f"],
    ]


def test_backends_agree_on_cjk_corpus(cased):
    from embedding_cpp_tpu.tokenizer import load_tokenizer

    blob, _ = cased
    toks = {}
    for backend in ("python", "hf", "native"):
        try:
            toks[backend] = load_tokenizer(blob, backend)
        except ImportError:
            pass
    assert len(toks) >= 2
    corpus = [
        "模型嵌入向量 with English words",
        "日本語言 MIXED case Text École",
        "你好, 世界! Hello!",
    ]
    for text in corpus:
        results = {b: t.encode(text) for b, t in toks.items()}
        first = next(iter(results.values()))
        assert all(r == first for r in results.values()), (text, results)


def test_cased_model_end_to_end(cased, tmp_path):
    """Full GGUF round trip with a cased+CJK tokenizer blob."""
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import BertConfig, random_state_dict
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.runtime.engine import Engine

    blob, vocab = cased
    cfg = BertConfig(
        n_vocab=2000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128,
        name="cased-cjk-test",
    )
    path = tmp_path / "cased.gguf"
    write_bert_gguf(path, cfg, random_state_dict(cfg, 0), blob,
                    GGUFFileType.ALL_F32)
    eng = Engine.from_gguf(str(path), opts=ComputeOptions(dtype="float32"))
    out = eng.encode(["你好世界", "Hello World", "hello world"])
    assert out.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # cased: "Hello World" and "hello world" tokenize differently -> differ
    assert not np.allclose(out[1], out[2])
