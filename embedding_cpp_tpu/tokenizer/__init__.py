"""Tokenizer subsystem.

Backends (all loading the same `blob.tokenizer.json` GGUF kv):
- "native": C++ WordPiece engine via ctypes (native/tokenizer) — the
  production host-side path;
- "hf": HF `tokenizers` (Rust) library;
- "python": dependency-free pure-Python engine (executable spec).
"auto" picks native > hf > python.
"""
from __future__ import annotations

from .base import SpecialIds, Tokenizer, frame_ids
from .wordpiece import WordPieceTokenizer

__all__ = [
    "SpecialIds",
    "Tokenizer",
    "frame_ids",
    "WordPieceTokenizer",
    "load_tokenizer",
]


def load_tokenizer(tokenizer_json: bytes | str, backend: str = "auto"):
    if backend in ("auto", "native"):
        try:
            from .native import NativeTokenizer

            return NativeTokenizer(tokenizer_json)
        except Exception:
            if backend == "native":
                raise
    if backend in ("auto", "hf"):
        try:
            from .hf import HFTokenizer

            return HFTokenizer(tokenizer_json)
        except Exception:
            if backend == "hf":
                raise
    return WordPieceTokenizer(tokenizer_json)
