"""Synthetic WordPiece tokenizer construction (for tests/benchmarks).

This zero-egress environment cannot download real tokenizer.json files, so we
build a genuine HF-format WordPiece tokenizer (BertNormalizer +
BertPreTokenizer + WordPiece model + TemplateProcessing post-processor) with
the `tokenizers` library and a synthetic vocab.  The serialized JSON is
byte-for-byte the format the reference embeds as `blob.tokenizer.json`.
"""
from __future__ import annotations

import string

_COMMON_WORDS = (
    "the of and a to in is you that it he was for on are as with his they i at "
    "be this have from or one had by word but not what all were we when your "
    "can said there use an each which she do how their if will up other about "
    "out many then them these so some her would make like him into time has "
    "look two more write go see number no way could people my than first water "
    "been call who oil its now find long down day did get come made may part "
    "store buy apple banana welcome along cloudy outside back soon anywhere "
    "going time partly hello world test sentence embedding model quick brown "
    "fox jumps over lazy dog"
).split()


def build_vocab(n_vocab: int = 1000) -> dict[str, int]:
    """Deterministic synthetic WordPiece vocab of exactly n_vocab entries."""
    tokens: list[str] = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = list(string.ascii_lowercase) + list(string.digits) + list(
        ".,!?;:'\"()[]{}<>-+*/=@#$%&_|\\~`^"
    )
    tokens += chars
    tokens += [f"##{c}" for c in string.ascii_lowercase + string.digits]
    for w in _COMMON_WORDS:
        if w not in tokens:
            tokens.append(w)
    # a few multi-char continuation pieces for realistic segmentations
    for piece in ("##ing", "##ed", "##er", "##ly", "##tion", "##re", "##es",
                  "##ll", "##ve", "##s", "##t", "##d", "##m"):
        if piece not in tokens:
            tokens.append(piece)
    if len(tokens) > n_vocab:
        raise ValueError(f"n_vocab {n_vocab} too small (need {len(tokens)})")
    i = 0
    while len(tokens) < n_vocab:
        tokens.append(f"[unused{i}]")
        i += 1
    return {t: i for i, t in enumerate(tokens)}


def build_bpe_tokenizer_json(
    n_vocab: int = 1000, add_prefix_space: bool = False
) -> bytes:
    """Serialize a real HF byte-level BPE pipeline (RoBERTa-style) to
    tokenizer.json: specials <s>/<pad>/</s>/<unk>/<mask>, ByteLevel
    pre-tokenizer/decoder, merges trained deterministically on the synthetic
    corpus (BPE training is deterministic for a fixed corpus)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=add_prefix_space, use_regex=True
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=n_vocab,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    corpus = [
        " ".join(_COMMON_WORDS),
        "It's the quick brown fox; don't they'll we've I'm you're 123 42.",
        "Café déjà vu — naïve résumé!",
    ]
    tok.train_from_iterator(corpus, trainer)
    return tok.to_str().encode("utf-8")


def build_unigram_tokenizer_json(n_vocab: int = 600) -> bytes:
    """Serialize a real HF Unigram pipeline (XLM-R-style: Metaspace
    pre-tokenizer/decoder, spm special-token order <s>/<pad>/</s>/<unk>)
    trained deterministically on the synthetic multilingual corpus."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    trainer = trainers.UnigramTrainer(
        vocab_size=n_vocab,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>",
        show_progress=False,
    )
    corpus = [
        " ".join(_COMMON_WORDS),
        "It's the quick brown fox; don't they'll we've I'm you're 123 42.",
        "Café déjà vu — naïve résumé!",
        "你好世界 中文 模型 嵌入 向量 日本語 テスト",
        "Ein schneller brauner Fuchs springt über den faulen Hund.",
        "Le renard brun rapide saute par-dessus le chien paresseux.",
    ]
    tok.train_from_iterator(corpus, trainer)
    return tok.to_str().encode("utf-8")


def build_albert_tokenizer_json(n_vocab: int = 600) -> bytes:
    """Serialize an ALBERT-style Unigram pipeline: the normalizer chain the
    HF AlbertConverter emits for keep_accents=False, do_lower_case=True
    checkpoints (Replace quotes, NFKD, StripAccents, Lowercase, collapse
    multi-space Regex) over Metaspace + Unigram, specials in ALBERT's order
    ([CLS]/[SEP] framing with <pad>/<unk>)."""
    from tokenizers import (
        Regex, Tokenizer, decoders, models, normalizers, pre_tokenizers,
        trainers,
    )

    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence(
        [
            normalizers.Replace("``", '"'),
            normalizers.Replace("''", '"'),
            normalizers.NFKD(),
            normalizers.StripAccents(),
            normalizers.Lowercase(),
            normalizers.Replace(Regex(" {2,}"), " "),
        ]
    )
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    trainer = trainers.UnigramTrainer(
        vocab_size=n_vocab,
        special_tokens=["<pad>", "<unk>", "[CLS]", "[SEP]"],
        unk_token="<unk>",
        show_progress=False,
    )
    corpus = [
        " ".join(_COMMON_WORDS),
        "It's the quick brown fox; don't they'll we've I'm you're 123 42.",
        "Café déjà vu — naïve résumé!",
        "ﬁne ﬂour ½ cup №5 Ⅻ ℕ ｆｕｌｌｗｉｄｔｈ",
        "Ein schneller brauner Fuchs springt über den faulen Hund.",
        "Le renard brun rapide saute par-dessus le chien paresseux.",
    ]
    tok.train_from_iterator(corpus, trainer)
    return tok.to_str().encode("utf-8")


def build_tokenizer_json(n_vocab: int = 1000, lowercase: bool = True) -> bytes:
    """Serialize a real HF tokenizers WordPiece pipeline to tokenizer.json."""
    from tokenizers import (
        Tokenizer, decoders, models, normalizers, pre_tokenizers, processors,
    )

    vocab = build_vocab(n_vocab)
    tok = Tokenizer(
        models.WordPiece(vocab, unk_token="[UNK]", max_input_chars_per_word=100)
    )
    tok.normalizer = normalizers.BertNormalizer(
        clean_text=True,
        handle_chinese_chars=True,
        strip_accents=None,
        lowercase=lowercase,
    )
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    tok.decoder = decoders.WordPiece(prefix="##")  # real BERT jsons set this
    return tok.to_str().encode("utf-8")
