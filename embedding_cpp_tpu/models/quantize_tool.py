"""GGUF -> GGUF requantization (the reference's `bert_model_quantize`,
bert.cpp:1313-1599, as a streaming numpy pipeline).

Semantics preserved:
- every kv pair is copied, `general.file_type` is updated
  (bert.cpp:1373-1378);
- a tensor is (re)quantized iff its name ends with "weight" and it is 2-D
  (bert.cpp:1430-1436) — anything already quantized or f16 is first
  dequantized to f32 (bert.cpp:1459-1475);
- all other tensors pass through unchanged;
- a 16-bin |q| histogram per quantized tensor and total size stats are
  reported (bert.cpp:1536-1597).
"""
from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import numpy as np

from ..gguf.constants import GGMLType, GGUFFileType, FTYPE_TO_GGML, QK4
from ..gguf.quant import dequantize, quantize, unpack_nibbles
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter, _SCALAR_FMT  # noqa: F401
from ..gguf.constants import GGUFValueType


@dataclass
class QuantizeStats:
    n_quantized: int = 0
    n_kept: int = 0
    total_in_bytes: int = 0
    total_out_bytes: int = 0
    hist_all: np.ndarray = field(default_factory=lambda: np.zeros(16, np.int64))


def _kv_type_of(value):
    if isinstance(value, bool):
        return GGUFValueType.BOOL
    if isinstance(value, int):
        return GGUFValueType.UINT32 if 0 <= value < 2**32 else GGUFValueType.INT64
    if isinstance(value, float):
        return GGUFValueType.FLOAT32
    if isinstance(value, (str, bytes)):
        return GGUFValueType.STRING
    return None


def _copy_kv(reader: GGUFReader, writer: GGUFWriter, ftype: GGUFFileType):
    for key, value in reader.kv.items():
        if key == "general.file_type":
            continue
        if isinstance(value, list):  # string array
            writer.add_array(key, value, GGUFValueType.STRING)
        elif isinstance(value, np.ndarray):
            np_kind_to_type = {
                "f": GGUFValueType.FLOAT32,
                "i": GGUFValueType.INT32,
                "u": GGUFValueType.UINT32,
            }
            elem = np_kind_to_type[value.dtype.kind]
            writer.add_array(key, [v.item() for v in value], elem)
        else:
            t = _kv_type_of(value)
            if t is None:
                raise TypeError(f"cannot copy kv {key!r} of type {type(value)}")
            writer.add_kv(key, value, t)
    writer.add_uint32("general.file_type", int(ftype))


def _q_histogram(raw: np.ndarray, qtype: GGMLType) -> np.ndarray:
    """16-bin histogram of quantized code values.

    Q4: one bin per nibble value.  Q8_0: the signed int8 range folded into
    16 even bins ((q + 128) >> 4) so the report shape stays uniform.
    """
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    if qtype == GGMLType.Q8_0:
        q = rec.reshape(-1, 34)[:, 2:].view(np.int8)
        bins = (q.astype(np.int32) + 128) >> 4
        return np.bincount(bins.reshape(-1), minlength=16).astype(np.int64)
    rec_bytes = 18 if qtype == GGMLType.Q4_0 else 20
    head = 2 if qtype == GGMLType.Q4_0 else 4
    rec = rec.reshape(-1, rec_bytes)
    q = unpack_nibbles(rec[:, head:])
    return np.bincount(q.reshape(-1), minlength=16).astype(np.int64)


def _convert(raw, src_type, n_elements, target) -> np.ndarray:
    """Requantize one tensor, preferring the multithreaded native codec
    (bit-exact with the numpy path; see tests/test_native_codec.py)."""
    from ..gguf import native_codec

    if native_codec.available():
        return native_codec.requantize(raw, src_type, n_elements, target)
    f32 = dequantize(raw, src_type, n_elements)
    return quantize(f32, target)


def quantize_gguf(
    in_path: str,
    out_path: str,
    ftype: GGUFFileType | str,
    verbose: bool = True,
) -> QuantizeStats:
    if isinstance(ftype, str):
        from .convert import FTYPE_NAMES

        ftype = FTYPE_NAMES[ftype]
    target = FTYPE_TO_GGML[ftype]
    if target not in (
        GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0,
        GGMLType.F16, GGMLType.F32,
    ):
        raise ValueError(f"unsupported quantization target {target}")

    stats = QuantizeStats()
    t0 = time.time()
    with GGUFReader(in_path) as r:
        w = GGUFWriter(alignment=r.alignment)
        _copy_kv(r, w, ftype)

        for name, info in r.tensors.items():
            raw = r.tensor_raw(name)
            stats.total_in_bytes += info.nbytes
            eligible = name.endswith("weight") and len(info.shape) == 2
            # block quants need the contraction axis divisible by block size
            if eligible and target in (
                GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q8_0
            ):
                eligible = info.shape[-1] % QK4 == 0
            if eligible and info.ggml_type != target:
                out = _convert(raw, info.ggml_type, info.n_elements, target)
                if target == GGMLType.F16:
                    w.add_tensor(
                        name,
                        out.view(np.float16).reshape(info.shape),
                    )
                else:
                    w.add_tensor_raw(name, info.shape, target, out)
                    hist = _q_histogram(out, target)
                    stats.hist_all += hist
                stats.n_quantized += 1
                stats.total_out_bytes += out.nbytes
                if verbose:
                    print(
                        f"{name:60s} {info.ggml_type.name:5s} -> {target.name:5s}"
                        f" {info.nbytes/1e6:8.2f} MB -> {out.nbytes/1e6:8.2f} MB",
                        file=sys.stderr,
                    )
            else:
                w.add_tensor_raw(name, info.shape, info.ggml_type, np.asarray(raw))
                stats.n_kept += 1
                stats.total_out_bytes += info.nbytes
        w.write(out_path)

    if verbose:
        print(
            f"quantized {stats.n_quantized} tensors, kept {stats.n_kept}; "
            f"{stats.total_in_bytes/1e6:.2f} MB -> {stats.total_out_bytes/1e6:.2f} MB "
            f"in {time.time()-t0:.2f}s",
            file=sys.stderr,
        )
        if stats.hist_all.sum():
            h = stats.hist_all / stats.hist_all.sum()
            print("hist:", " ".join(f"{x:.3f}" for x in h), file=sys.stderr)
    return stats
