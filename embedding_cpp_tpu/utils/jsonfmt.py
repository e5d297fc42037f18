"""Fast JSON rendering of embedding matrices (native/jsonfmt/jsonfmt.cpp).

The HTTP float mode (`encoding_format: "float"`, the OpenAI default) must
embed every f32 as a JSON number.  `v.tolist()` + json.dumps boxes each
value and runs shortest-roundtrip dtoa in Python — measured 5x slower than
the base64 mode end-to-end on the 1-core serving host
(benchmarks/results/serving_v5e.json).  The native path renders the whole
`data` array in one std::to_chars loop — shortest-roundtrip f32, so values
parse back bit-identical as float32 AND the payload is ~45% smaller than
Python's f64-widened reprs (measured 12x faster rendering at [1024, 384]).

Falls back to the pure-Python rendering when the native lib isn't built
(same values at f32 precision; Python renders the exact f64 widening).
"""
from __future__ import annotations

import ctypes
import json
import os
from pathlib import Path

import numpy as np

_lib = None
_lib_failed = False


def _find_library() -> str:
    env = os.environ.get("TPUEMBED_JSONFMT_LIB")
    if env in ("off", "0"):
        raise ImportError("native jsonfmt disabled via TPUEMBED_JSONFMT_LIB")
    if env and Path(env).is_file():
        return env
    root = Path(__file__).resolve().parents[2]
    cand = root / "native" / "build" / "libtpuembed_jsonfmt.so"
    if cand.is_file():
        return str(cand)
    raise ImportError("native jsonfmt library not built (make -C native)")


def _load():
    global _lib, _lib_failed
    if _lib is None and not _lib_failed:
        try:
            lib = ctypes.CDLL(_find_library())
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.tpuembed_json_embedding_data.restype = ctypes.c_int64
            lib.tpuembed_json_embedding_data.argtypes = [
                f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.tpuembed_json_data_cap.restype = ctypes.c_int64
            lib.tpuembed_json_data_cap.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
            ]
            _lib = lib
        except (ImportError, OSError):
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _py_embedding_data(vecs: np.ndarray, index_base: int = 0) -> bytes:
    return json.dumps(
        [
            {"object": "embedding", "index": index_base + i,
             "embedding": v.tolist()}
            for i, v in enumerate(vecs)
        ],
        separators=(",", ":"),
    ).encode("utf-8")


def embedding_data_json(vecs: np.ndarray, index_base: int = 0) -> bytes:
    """[n, d] f32 -> the rendered bytes of the OpenAI-style `data` array:
    `[{"object":"embedding","index":i,"embedding":[...]}, ...]`."""
    vecs = np.ascontiguousarray(vecs, dtype=np.float32)
    if vecs.ndim != 2:
        raise ValueError(f"expected [n, d] matrix, got shape {vecs.shape}")
    lib = _load()
    if lib is None or vecs.shape[1] == 0:
        return _py_embedding_data(vecs, index_base)
    n, d = vecs.shape
    cap = lib.tpuembed_json_data_cap(n, d)
    buf = ctypes.create_string_buffer(cap)
    written = lib.tpuembed_json_embedding_data(
        vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, d, index_base, buf, cap,
    )
    if written < 0:  # sizing bug guard — never wrong output, just slower
        return _py_embedding_data(vecs, index_base)
    return buf.raw[:written]
