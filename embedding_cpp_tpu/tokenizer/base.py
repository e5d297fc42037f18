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
    ids: Sequence[int], special: SpecialIds, n_max_tokens: int
) -> list[int]:
    """[CLS] + ids (pad-stripped) + [SEP], truncated (bert.cpp:756-780)."""
    out = [special.cls]
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
