"""Legacy pre-GGUF `ggml` model format (magic 0x67676D6C) read/write.

The reference ships a converter for this older bert.cpp format
(models/convert-to-ggml.py:56-123): int32 magic, eight int32 hparams
(vocab_size, max_position_embeddings, hidden_size, intermediate_size,
num_attention_heads, num_hidden_layers, type_vocab_size, ftype), the whole
tokenizer.json blob (int32 length + bytes), vocab_size length-prefixed token
strings, then tensors as (n_dims, name_len, dtype) headers with dims in
reversed (ggml ne) order followed by raw data.

The reference *engine* only loads GGUF, so old .bin files need its separate
legacy build; here they are first-class: read directly, or upgraded to GGUF.
ftype 0 = f32, 1 = f16 (the legacy converter never wrote quantized files —
convert-to-ggml.py:27-33).
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

from ..models.config import BertConfig

LEGACY_MAGIC = 0x67676D6C  # "ggml"

_DTYPE = {0: np.float32, 1: np.float16}
_DTYPE_CODE = {np.dtype(np.float32): 0, np.dtype(np.float16): 1}


@dataclass
class LegacyModel:
    config: BertConfig
    ftype: int  # 0 = f32, 1 = f16
    tokenizer_json: bytes
    vocab: list[bytes]
    tensors: dict[str, np.ndarray]


def _read_i32(f) -> int:
    raw = f.read(4)
    if len(raw) != 4:
        raise EOFError("truncated legacy ggml file")
    return struct.unpack("<i", raw)[0]


def read_legacy_bin(path: str | os.PathLike) -> LegacyModel:
    """Parse a legacy ggml-model*.bin into hparams + tokenizer + tensors."""
    with open(path, "rb") as f:
        magic = _read_i32(f)
        if magic != LEGACY_MAGIC:
            raise ValueError(
                f"{path}: bad magic 0x{magic & 0xFFFFFFFF:08x} "
                f"(want 0x{LEGACY_MAGIC:08x} 'ggml'; GGUF files start with 'GGUF')"
            )
        n_vocab = _read_i32(f)
        n_ctx = _read_i32(f)
        n_embd = _read_i32(f)
        n_ff = _read_i32(f)
        n_head = _read_i32(f)
        n_layer = _read_i32(f)
        _read_i32(f)  # type_vocab_size: present in the table, always 2 in BERT
        ftype = _read_i32(f)
        if ftype not in _DTYPE:
            raise ValueError(f"{path}: unsupported legacy ftype {ftype}")

        if not (0 < n_vocab < 1 << 24) or not (0 < n_ctx <= 1 << 20):
            raise ValueError(f"{path}: implausible hparams "
                             f"(n_vocab={n_vocab}, n_ctx={n_ctx})")
        blob_len = _read_i32(f)
        if not (0 <= blob_len < 1 << 30):
            raise ValueError(f"{path}: bad tokenizer blob length {blob_len}")
        tokenizer_json = f.read(blob_len)
        if len(tokenizer_json) != blob_len:
            raise EOFError("truncated tokenizer.json blob")

        vocab = []
        for _ in range(n_vocab):
            tok_len = _read_i32(f)
            if not (0 <= tok_len < 1 << 20):
                raise ValueError(f"{path}: bad vocab token length {tok_len}")
            tok = f.read(tok_len)
            if len(tok) != tok_len:
                raise EOFError("truncated vocab entry")
            vocab.append(tok)

        tensors: dict[str, np.ndarray] = {}
        while True:
            head = f.read(12)
            if not head:
                break
            if len(head) != 12:
                raise EOFError("truncated tensor header")
            n_dims, name_len, dtype_code = struct.unpack("<iii", head)
            if not (1 <= n_dims <= 4):
                raise ValueError(f"{path}: bad tensor rank {n_dims}")
            if not (0 < name_len < 1 << 16):
                raise ValueError(f"{path}: bad tensor name length {name_len}")
            if dtype_code not in _DTYPE:
                raise ValueError(f"{path}: unsupported tensor dtype {dtype_code}")
            # dims stored innermost-first (ggml ne order) — reverse to numpy
            ne = struct.unpack(f"<{n_dims}i", f.read(4 * n_dims))
            if any(not (0 < d < 1 << 28) for d in ne):
                raise ValueError(f"{path}: bad tensor dims {ne}")
            name = f.read(name_len).decode("utf-8")
            shape = tuple(reversed(ne))
            dt = np.dtype(_DTYPE[dtype_code])
            count = int(np.prod(shape))
            data = np.fromfile(f, dtype=dt, count=count)
            if data.size != count:
                raise EOFError(f"truncated tensor data for {name}")
            tensors[name] = data.reshape(shape)

    config = BertConfig(
        n_vocab=n_vocab, n_ctx=n_ctx, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, n_ff=n_ff,
    )
    return LegacyModel(
        config=config, ftype=ftype, tokenizer_json=tokenizer_json,
        vocab=vocab, tensors=tensors,
    )


def write_legacy_bin(
    path: str | os.PathLike,
    config: BertConfig,
    state_dict: dict[str, np.ndarray],
    tokenizer_json: bytes,
    ftype: str = "f16",
) -> None:
    """Write the legacy format (parity with models/convert-to-ggml.py:56-123:
    2-D `.weight` tensors cast to f16 when ftype is f16, everything else f32;
    `embeddings.position_ids` and `pooler.dense.*` skipped)."""
    from ..models.schema import SKIPPED_TENSORS

    code = {"f32": 0, "f16": 1}.get(ftype)
    if code is None:
        raise ValueError(f"legacy format supports f32/f16 only, got {ftype!r}")
    if getattr(config, "dense_out", 0):
        raise ValueError(
            "the legacy .bin format has no dense-head hparams; a Dense "
            "projection model would silently lose its head — write GGUF "
            "instead"
        )

    import json

    tok = json.loads(tokenizer_json)
    vocab_map = dict(tok["model"]["vocab"])
    for added in tok.get("added_tokens", []):
        vocab_map.setdefault(added["content"], int(added["id"]))
    id_to_token = {int(i): t for t, i in vocab_map.items()}

    with open(path, "wb") as f:
        f.write(struct.pack("<i", LEGACY_MAGIC))
        for v in (config.n_vocab, config.n_ctx, config.n_embd, config.n_ff,
                  config.n_head, config.n_layer, 2, code):
            f.write(struct.pack("<i", v))
        f.write(struct.pack("<i", len(tokenizer_json)))
        f.write(tokenizer_json)
        for i in range(config.n_vocab):
            if i not in id_to_token:
                raise ValueError(f"vocab has no token for id {i}")
            raw = id_to_token[i].encode("utf-8")
            f.write(struct.pack("<i", len(raw)))
            f.write(raw)
        for name, data in state_dict.items():
            if name in SKIPPED_TENSORS:
                continue
            arr = np.squeeze(np.ascontiguousarray(np.asarray(data), np.float32))
            if code == 1 and name.endswith(".weight") and arr.ndim == 2:
                arr = arr.astype(np.float16)
            raw_name = name.encode("utf-8")
            f.write(struct.pack("<iii", arr.ndim, len(raw_name),
                                _DTYPE_CODE[arr.dtype]))
            for d in reversed(arr.shape):
                f.write(struct.pack("<i", d))
            f.write(raw_name)
            arr.tofile(f)


def upgrade_legacy_bin(
    src: str | os.PathLike, dst: str | os.PathLike, ftype: str | None = None
) -> None:
    """Legacy .bin -> GGUF, preserving dtype by default (or requantizing
    when `ftype` is given: f32/f16/q4_0/q4_1)."""
    from ..models.convert import FTYPE_NAMES, write_bert_gguf

    m = read_legacy_bin(src)
    if ftype is None:
        ftype = "f16" if m.ftype == 1 else "f32"
    write_bert_gguf(
        dst, m.config, m.tensors, m.tokenizer_json, FTYPE_NAMES[ftype]
    )
