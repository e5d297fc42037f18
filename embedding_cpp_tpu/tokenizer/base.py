"""Tokenizer interface + the reference's framing semantics.

The reference's `bert_tokenize` (bert.cpp:738-781) runs the tokenizer.json
pipeline *without* template special tokens, strips any padding the json
config injects (stops at the first pad id), then frames the ids itself:
prepend CLS, append SEP, truncate to n_max_tokens with SEP overwriting the
last slot on overflow.  `frame_ids` reproduces that behavior exactly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, Sequence


@dataclass(frozen=True)
class SpecialIds:
    cls: int
    sep: int
    pad: int
    unk: int

    @classmethod
    def from_gguf_kv(cls, kv: dict) -> "SpecialIds":
        from ..gguf.constants import Keys

        return cls(
            cls=int(kv.get(Keys.TOKENIZER_CLS_ID, 101)),
            sep=int(kv.get(Keys.TOKENIZER_SEP_ID, 102)),
            pad=int(kv.get(Keys.TOKENIZER_PAD_ID, 0)),
            unk=int(kv.get(Keys.TOKENIZER_UNK_ID, 100)),
        )


class Tokenizer(Protocol):
    """Raw tokenizer.json pipeline: text -> ids, NO special tokens added."""

    def encode(self, text: str) -> list[int]: ...

    def encode_batch(self, texts: Sequence[str]) -> list[list[int]]: ...

    def id_to_token(self, token_id: int) -> str: ...


# --- added-token matching (shared by every pure-Python engine) ---------------

# Unicode White_Space, exactly Rust's char::is_whitespace (what the
# tokenizers crate strips for AddedToken lstrip/rstrip).  NOT str.isspace():
# python adds 0x1C-0x1F, which the property excludes.
_ADDED_WS = frozenset(
    "\t\n\x0b\x0c\r \x85\xa0\u1680\u2028\u2029\u202f\u205f\u3000"
) | frozenset(chr(c) for c in range(0x2000, 0x200B))


def _is_word_char(ch: str) -> bool:
    """Word char for AddedToken single_word boundaries (regex \\w-like:
    letters, marks, numbers, connector punctuation, join controls — '_ab'
    and '́ab' block a single_word match in HF, '-ab' doesn't)."""
    import unicodedata

    cat = unicodedata.category(ch)
    return cat[0] in "LMN" or cat == "Pc" or ch in "\u200c\u200d"


def parse_added_tokens(spec: dict) -> list[dict]:
    """added_tokens entries (content/id/lstrip/rstrip/single_word), sorted
    longest-first for the leftmost-longest scan.  `normalized` is ignored:
    all engines match added tokens on raw text (exact for specials, which
    serialize normalized=false; a known deviation for non-special added
    tokens under a non-identity normalizer)."""
    toks = [
        {
            "content": t["content"],
            "id": int(t["id"]),
            "lstrip": bool(t.get("lstrip", False)),
            "rstrip": bool(t.get("rstrip", False)),
            "single_word": bool(t.get("single_word", False)),
        }
        for t in spec.get("added_tokens", [])
    ]
    toks.sort(key=lambda t: -len(t["content"]))
    return toks


def split_added_tokens(
    text: str, added: list[dict]
) -> list[tuple[str, int | None]]:
    """Split raw text on added tokens with the tokenizers crate's
    AddedVocabulary semantics: leftmost-longest match; single_word rejects
    matches flanked by word chars; lstrip consumes the whitespace run
    before the match (back to the previous segment boundary), rstrip the
    run after — the consumed whitespace belongs to the token match and
    reaches no segment (so Metaspace never sees it).  Returns
    [(segment, None) | (token_content, id)]."""
    if not added:
        return [(text, None)] if text else []
    n = len(text)
    segments: list[tuple[str, int | None]] = []
    pos = 0
    seg_start = 0
    while pos < n:
        hit = None
        for t in added:
            c = t["content"]
            if not c or not text.startswith(c, pos):
                continue
            end = pos + len(c)
            if t["single_word"]:
                if pos > 0 and _is_word_char(text[pos - 1]):
                    continue
                if end < n and _is_word_char(text[end]):
                    continue
            start = pos
            if t["lstrip"]:
                while start > seg_start and text[start - 1] in _ADDED_WS:
                    start -= 1
            if t["rstrip"]:
                while end < n and text[end] in _ADDED_WS:
                    end += 1
            hit = (start, end, c, t["id"])
            break
        if hit is None:
            pos += 1
            continue
        start, end, content, tid = hit
        if start > seg_start:
            segments.append((text[seg_start:start], None))
        segments.append((content, tid))
        pos = end
        seg_start = end
    if seg_start < n:
        segments.append((text[seg_start:], None))
    return segments


# HF WordPiece decoder cleanup=True rules, applied PER PIECE (a piece is
# " "+token or a ##-stripped continuation) — exactly the Rust decoder's
# `cleanup()`; applying them to the joined string would fuse patterns
# across token boundaries that HF never fuses.
_WP_CLEANUP = (
    (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","), (" ' ", "'"),
    (" n't", "n't"), (" 'm", "'m"), (" do not", " don't"), (" 's", "'s"),
    (" 've", "'ve"), (" 're", "'re"),
)


def decode_wordpiece(id_to_token, ids: Sequence[int]) -> str:
    """Token ids -> text, HF tokenizers WordPiece-decoder semantics (the
    reference's `bert_tokenizer::decode`, tokenizer.cpp:39-48): "##"
    continuations fuse onto the previous token, other tokens join with a
    space, and the cleanup rules de-space punctuation piece by piece."""
    pieces: list[str] = []
    for i in ids:
        tok = id_to_token(int(i))
        if not tok:
            continue
        if not pieces:
            piece = tok
        elif tok.startswith("##"):
            piece = tok[2:]
        else:
            piece = " " + tok
        for a, b in _WP_CLEANUP:
            piece = piece.replace(a, b)
        pieces.append(piece)
    return "".join(pieces)


def frame_ids(
    ids: Sequence[int], special: SpecialIds, n_max_tokens: int,
    add_cls: bool = True,
) -> list[int]:
    """[CLS] + ids (pad-stripped) + [SEP], truncated (bert.cpp:756-780).

    add_cls=False frames ``ids + [SEP]`` only — T5's convention (its
    vocabulary has no CLS; sentence-t5/gtr append </s>, which the sep slot
    carries)."""
    out = [special.cls] if add_cls else []
    for i in ids:
        if i == special.pad:  # padding from the json config: stop here
            break
        out.append(i)
        if len(out) >= n_max_tokens:
            break
    if len(out) >= n_max_tokens:
        out[n_max_tokens - 1] = special.sep
        del out[n_max_tokens:]
    else:
        out.append(special.sep)
    return out


def _strip_pad(ids: Sequence[int], pad: int) -> list[int]:
    """Stop at the first pad id (padding injected by the json config) —
    the same sanitization frame_ids applies (bert.cpp:752-755)."""
    out = []
    for i in ids:
        if i == pad:
            break
        out.append(int(i))
    return out


def truncate_longest_first(
    la: int, lb: int, budget: int
) -> tuple[int, int]:
    """HF tokenizers LongestFirst truncation: kept lengths for a pair.

    Verified against tokenizers.Tokenizer.enable_truncation(strategy=
    "longest_first"): the longest sequence is trimmed down to the other's
    length, then the remaining budget splits ceil-to-longest; on equal
    input lengths the SECOND sequence counts as the longest (so it keeps
    the ceil half).  `budget` is the token budget excluding specials."""
    budget = max(0, budget)
    if la + lb <= budget:
        return la, lb
    a_longest = la > lb
    lng, oth = (la, lb) if a_longest else (lb, la)
    to_remove = lng + oth - budget
    if lng - oth >= to_remove:  # trimming the longest alone suffices
        lng -= to_remove
    else:
        lng = budget - budget // 2
        oth = budget // 2
    return (lng, oth) if a_longest else (oth, lng)


def frame_pair_ids(
    a_ids: Sequence[int],
    b_ids: Sequence[int],
    special: SpecialIds,
    n_max_tokens: int,
    *,
    double_sep: bool = False,
) -> tuple[list[int], list[int]]:
    """Cross-encoder pair framing: (ids, token_type_ids).

    BERT/DistilBERT template: [CLS] a [SEP] b [SEP] with segment ids
    0...0 1...1 (the [SEP] after `a` belongs to segment 0, exactly HF's
    create_token_type_ids_from_sequences).  RoBERTa/XLM-R/MPNet
    (`double_sep=True`): <s> a </s></s> b </s>, all segment 0 (their
    token-type table has a single row).  Truncation is HF's
    longest_first over the pair (see truncate_longest_first); the
    reference has no pair surface at all (bert_tokenize is
    single-sequence, bert.cpp:738-781)."""
    a = _strip_pad(a_ids, special.pad)
    b = _strip_pad(b_ids, special.pad)
    n_special = 4 if double_sep else 3
    la, lb = truncate_longest_first(len(a), len(b), n_max_tokens - n_special)
    a, b = a[:la], b[:lb]
    if double_sep:
        ids = [special.cls, *a, special.sep, special.sep, *b, special.sep]
        types = [0] * len(ids)
    else:
        ids = [special.cls, *a, special.sep, *b, special.sep]
        types = [0] * (la + 2) + [1] * (lb + 1)
    return ids, types
