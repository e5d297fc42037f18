"""Tokenizer backend on the HF `tokenizers` library (Rust, in-process).

Same engine the reference links through tokenizers-cpp (tokenizer.cpp:36-53),
loaded from the in-memory `blob.tokenizer.json` kv.  Special-token templating
is disabled to match tokenizers-cpp's `Encode` (see golden vectors in
examples/test_tokenizer.cpp — no duplicated CLS/SEP).
"""
from __future__ import annotations

from typing import Sequence


class HFTokenizer:
    def __init__(self, tokenizer_json: bytes | str):
        from tokenizers import Tokenizer as _Tok

        if isinstance(tokenizer_json, bytes):
            tokenizer_json = tokenizer_json.decode("utf-8")
        self._tok = _Tok.from_str(tokenizer_json)
        # disable any padding/truncation the json configures — the engine
        # does its own batching/padding (and the reference strips pads anyway)
        self._tok.no_padding()
        self._tok.no_truncation()

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def encode_batch(self, texts: Sequence[str]) -> list[list[int]]:
        encs = self._tok.encode_batch(list(texts), add_special_tokens=False)
        return [e.ids for e in encs]

    def id_to_token(self, token_id: int) -> str:
        return self._tok.id_to_token(token_id) or ""

    def decode(self, ids) -> str:
        """Ids -> text (the reference bridge's decode, tokenizer.cpp:39-48)."""
        return self._tok.decode(list(map(int, ids)), skip_special_tokens=False)

    def token_to_id(self, token: str) -> int | None:
        return self._tok.token_to_id(token)
