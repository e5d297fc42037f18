"""GGUF v1 (u32 lengths) and v3 files must parse; hand-crafted minimal files."""
import struct

import numpy as np

from embedding_cpp_tpu.gguf import GGMLType, GGUFReader


def _string_v1(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _string_v2(s: bytes) -> bytes:
    return struct.pack("<Q", len(s)) + s


def test_v1_file(tmp_path):
    # v1: u32 tensor/kv counts, u32 string lengths, u32 dims
    data = np.arange(32, dtype=np.float32)
    buf = b"GGUF" + struct.pack("<I", 1)
    buf += struct.pack("<I", 1)  # n_tensors
    buf += struct.pack("<I", 1)  # n_kv
    buf += _string_v1(b"general.architecture") + struct.pack("<I", 8) + _string_v1(b"bert")
    # tensor dir: name, n_dims, dims(u32), type, offset(u64)
    buf += _string_v1(b"t") + struct.pack("<I", 1) + struct.pack("<I", 32)
    buf += struct.pack("<I", int(GGMLType.F32)) + struct.pack("<Q", 0)
    pad = (-len(buf)) % 32
    buf += b"\0" * pad + data.tobytes()
    p = tmp_path / "v1.gguf"
    p.write_bytes(buf)

    with GGUFReader(p) as r:
        assert r.version == 1
        assert r.kv["general.architecture"] == "bert"
        np.testing.assert_array_equal(r.tensor_f32("t"), data)


def test_v3_file(tmp_path):
    # v3 layout is v2 with the same little-endian encoding
    data = np.arange(64, dtype=np.float32)
    buf = b"GGUF" + struct.pack("<I", 3)
    buf += struct.pack("<Q", 1)  # n_tensors
    buf += struct.pack("<Q", 2)  # n_kv
    buf += _string_v2(b"general.architecture") + struct.pack("<I", 8) + _string_v2(b"bert")
    buf += _string_v2(b"general.alignment") + struct.pack("<I", 4) + struct.pack("<I", 64)
    buf += _string_v2(b"x") + struct.pack("<I", 2) + struct.pack("<Q", 32) + struct.pack("<Q", 2)
    buf += struct.pack("<I", int(GGMLType.F32)) + struct.pack("<Q", 0)
    pad = (-len(buf)) % 64
    buf += b"\0" * pad + data.tobytes()
    p = tmp_path / "v3.gguf"
    p.write_bytes(buf)

    with GGUFReader(p) as r:
        assert r.version == 3
        assert r.alignment == 64
        assert r.tensors["x"].shape == (2, 32)  # reversed ne
        np.testing.assert_array_equal(r.tensor_f32("x"), data.reshape(2, 32))
