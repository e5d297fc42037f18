"""ctypes binding to the native C++ tokenizer engines (native/tokenizer):
WordPiece (BERT family), byte-level BPE (RoBERTa/GPT-2 family) and
SentencePiece Unigram (XLM-R family).

C ABI (see native/tokenizer/tokenizer.cpp):
    void*  tpuembed_tokenizer_new(const char* json, size_t len);
    void   tpuembed_tokenizer_free(void*);
    int    tpuembed_model_kind(void*);              // 0=WP, 1=BPE, 2=Unigram
    int    tpuembed_encode(void*, const char* text, size_t len,
                           int32_t* out, int32_t cap);       // -> n or -needed
    int    tpuembed_id_to_token(void*, int32_t id, char* out, int32_t cap);
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Sequence

_LIB_NAMES = ("libtpuembed_tokenizer.so",)


def _find_library() -> str:
    env = os.environ.get("TPUEMBED_TOKENIZER_LIB")
    if env and Path(env).is_file():
        return env
    root = Path(__file__).resolve().parents[2]
    for name in _LIB_NAMES:
        for cand in (root / "native" / "build" / name, root / name):
            if cand.is_file():
                return str(cand)
    raise ImportError(
        "native tokenizer library not built (run `make -C native`)"
    )


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_find_library())
        lib.tpuembed_tokenizer_new.restype = ctypes.c_void_p
        lib.tpuembed_tokenizer_new.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.tpuembed_tokenizer_free.argtypes = [ctypes.c_void_p]
        lib.tpuembed_encode.restype = ctypes.c_int32
        lib.tpuembed_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.tpuembed_id_to_token.restype = ctypes.c_int32
        lib.tpuembed_id_to_token.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.tpuembed_model_kind.restype = ctypes.c_int32
        lib.tpuembed_model_kind.argtypes = [ctypes.c_void_p]
        lib.tpuembed_encode_batch.restype = ctypes.c_int64
        lib.tpuembed_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    return _lib


class NativeTokenizer:
    def __init__(self, tokenizer_json: bytes | str):
        if isinstance(tokenizer_json, str):
            tokenizer_json = tokenizer_json.encode("utf-8")
        lib = _load()
        self._lib = lib
        self._handle = lib.tpuembed_tokenizer_new(tokenizer_json, len(tokenizer_json))
        if not self._handle:
            raise ValueError("native tokenizer rejected tokenizer.json")
        self._buf = (ctypes.c_int32 * 8192)()
        self._kind = lib.tpuembed_model_kind(self._handle)
        self._blob = tokenizer_json  # kept for lazy decode metadata
        self._added_ids: set[int] | None = None

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.tpuembed_tokenizer_free(self._handle)
            self._handle = None

    def encode(self, text: str) -> list[int]:
        raw = text.encode("utf-8")
        n = self._lib.tpuembed_encode(
            self._handle, raw, len(raw), self._buf, len(self._buf)
        )
        if n < 0:  # buffer too small: grow and retry
            self._buf = (ctypes.c_int32 * (-n))()
            n = self._lib.tpuembed_encode(
                self._handle, raw, len(raw), self._buf, len(self._buf)
            )
        return list(self._buf[:n])

    def encode_batch(
        self, texts: Sequence[str], n_threads: int | None = None
    ) -> list[list[int]]:
        """Multithreaded batch encode (GIL released inside the C++ pool)."""
        n = len(texts)
        if n == 0:
            return []
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        raws = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * n)(*raws)
        lens = (ctypes.c_int64 * n)(*[len(r) for r in raws])
        offsets = (ctypes.c_int64 * (n + 1))()
        cap = max(8192, sum(len(r) for r in raws) + 2 * n)
        out = (ctypes.c_int32 * cap)()
        total = self._lib.tpuembed_encode_batch(
            self._handle, arr, lens, n, n_threads, out, cap, offsets
        )
        if total < 0:
            cap = -total
            out = (ctypes.c_int32 * cap)()
            total = self._lib.tpuembed_encode_batch(
                self._handle, arr, lens, n, n_threads, out, cap, offsets
            )
        import numpy as np

        flat = np.ctypeslib.as_array(out, shape=(cap,))[:total].copy()
        offs = np.ctypeslib.as_array(offsets, shape=(n + 1,))
        return [flat[offs[i] : offs[i + 1]] for i in range(n)]

    def id_to_token(self, token_id: int) -> str:
        out = ctypes.create_string_buffer(512)
        n = self._lib.tpuembed_id_to_token(self._handle, token_id, out, 512)
        if n <= 0:
            return ""
        return out.raw[:n].decode("utf-8", errors="replace")

    def decode(self, ids) -> str:
        if self._kind == 1:  # byte-level BPE: invert the byte remap
            return self._decode_byte_level(ids)
        if self._kind == 2:  # Unigram: Metaspace decoder
            return self._decode_metaspace(ids)
        from .base import decode_wordpiece

        return decode_wordpiece(self.id_to_token, ids)

    def _decode_metaspace(self, ids) -> str:
        """Metaspace decoder (mirrors unigram.py decode): replacement char
        -> space, leading separator of the first token stripped unless
        prepend_scheme == never."""
        if not hasattr(self, "_metaspace"):
            import json

            try:
                pre = json.loads(self._blob).get("pre_tokenizer") or {}
            except Exception:
                pre = {}
            rep = pre.get("replacement", "▁")
            scheme = pre.get("prepend_scheme")
            if scheme is None:
                scheme = (
                    "always" if pre.get("add_prefix_space", True) else "never"
                )
            self._metaspace = (rep, scheme)
        rep, scheme = self._metaspace
        out: list[str] = []
        first = True
        for i in ids:
            piece = self.id_to_token(int(i)).replace(rep, " ")
            if first and scheme != "never" and piece.startswith(" "):
                piece = piece[1:]
            first = False
            out.append(piece)
        return "".join(out)

    def _decode_byte_level(self, ids) -> str:
        """ByteLevel decoder (mirrors bpe.py decode): map token chars back
        to bytes; added tokens pass through literally."""
        from .bpe import unicode_to_bytes

        if self._added_ids is None:
            import json

            try:
                spec = json.loads(self._blob)
            except Exception:
                spec = {}
            self._added_ids = {
                int(t["id"]) for t in spec.get("added_tokens", [])
            }
        u2b = unicode_to_bytes()
        out: list[str] = []
        raw = bytearray()
        for i in ids:
            i = int(i)
            tok = self.id_to_token(i)
            if i in self._added_ids:
                if raw:
                    out.append(raw.decode("utf-8", errors="replace"))
                    raw = bytearray()
                out.append(tok)
                continue
            for ch in tok:
                b = u2b.get(ch)
                if b is not None:
                    raw.append(b)
                else:  # not a byte-mapped char (malformed vocab): utf-8 it
                    raw.extend(ch.encode("utf-8"))
        if raw:
            out.append(raw.decode("utf-8", errors="replace"))
        return "".join(out)
