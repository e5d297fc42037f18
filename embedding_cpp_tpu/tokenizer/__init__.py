"""Tokenizer subsystem.

Backends (all loading the same `blob.tokenizer.json` GGUF kv):
- "native": C++ engine via ctypes (native/tokenizer) — the production
  host-side path (WordPiece and byte-level BPE);
- "hf": HF `tokenizers` (Rust) library;
- "python": dependency-free pure-Python engines (executable specs) —
  wordpiece.py for BERT-family jsons, bpe.py for RoBERTa/GPT-2-family,
  unigram.py for SentencePiece-Unigram (XLM-R/multilingual) jsons.
"auto" picks native > hf > python.  The model family is dispatched on the
json's model.type, never on the architecture — tokenizer and encoder are
independently pluggable, exactly as in HF checkpoints.
"""
from __future__ import annotations

import json as _json

from .base import SpecialIds, Tokenizer, frame_ids, frame_pair_ids
from .bpe import ByteLevelBPETokenizer
from .unigram import UnigramTokenizer
from .wordpiece import WordPieceTokenizer

__all__ = [
    "SpecialIds",
    "Tokenizer",
    "frame_ids",
    "frame_pair_ids",
    "WordPieceTokenizer",
    "ByteLevelBPETokenizer",
    "UnigramTokenizer",
    "load_tokenizer",
]


def _model_type(tokenizer_json: bytes | str) -> str:
    if isinstance(tokenizer_json, bytes):
        tokenizer_json = tokenizer_json.decode("utf-8", errors="replace")
    try:
        return str((_json.loads(tokenizer_json).get("model") or {}).get("type"))
    except Exception:
        return ""


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
    mtype = _model_type(tokenizer_json)
    if mtype == "BPE":
        return ByteLevelBPETokenizer(tokenizer_json)
    if mtype == "Unigram":
        return UnigramTokenizer(tokenizer_json)
    return WordPieceTokenizer(tokenizer_json)
