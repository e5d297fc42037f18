"""Quantize CLI: `python -m embedding_cpp_tpu.cli.quantize in.gguf out.gguf q4_0`.

The reference's `quantize` binary (models/quantize.cpp:17-66) accepted numeric
type codes 2=q4_0, 3=q4_1; both those and the names are accepted here.
q8_0 (numeric 7, matching llama_ftype) is our extension beyond the
reference's targets.
"""
from __future__ import annotations

import argparse

from ..models.quantize_tool import quantize_gguf

_NUMERIC = {"2": "q4_0", "3": "q4_1", "7": "q8_0"}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("type", help="q4_0 | q4_1 | q8_0 | f16 | f32 (or 2 | 3 | 7)")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args()
    ftype = _NUMERIC.get(args.type, args.type)
    quantize_gguf(args.input, args.output, ftype, verbose=not args.quiet)


if __name__ == "__main__":
    main()
