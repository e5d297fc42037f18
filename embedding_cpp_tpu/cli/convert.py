"""Convert CLI: `python -m embedding_cpp_tpu.cli.convert <hf_model_dir> out.gguf --ftype f16`.

TPU-native equivalent of the reference's models/convert-to-gguf.py (plus
direct one-step q4_0/q4_1 output).  Also covers the legacy pre-GGUF format
(models/convert-to-ggml.py): `--legacy` writes a .bin, and a .bin input is
upgraded to GGUF.
"""
from __future__ import annotations

import argparse

from ..models.convert import FTYPE_NAMES, convert_hf_dir, convert_hf_dir_to_legacy


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_dir", help="local HF checkpoint directory, or a "
                                     "legacy ggml-model*.bin to upgrade to GGUF")
    p.add_argument("output", help="output .gguf path; with --all-ftypes, a "
                                  "directory receiving ggml-model-<ftype>.gguf")
    p.add_argument("--ftype", choices=sorted(FTYPE_NAMES), default=None,
                   help="default: f32 (gguf), f16 (--legacy), preserve (upgrade)")
    p.add_argument("--all-ftypes", action="store_true",
                   help="write f32+f16+q4_0+q4_1+q8_0 (the reference's "
                        "run_conversions.sh pipeline)")
    p.add_argument("--legacy", action="store_true",
                   help="write the legacy pre-GGUF .bin format "
                        "(convert-to-ggml.py; f32/f16 only)")
    p.add_argument("--sparse", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="keep the MLM head for SPLADE sparse encoding "
                        "(default: auto-detect from modules.json)")
    p.add_argument("--colbert", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="keep the ColBERT per-token projection and framing "
                        "config (default: auto-detect from architectures / "
                        "artifact.metadata)")
    args = p.parse_args()
    if args.sparse and (args.legacy or args.model_dir.endswith(".bin")):
        p.error("--sparse applies to HF-dir -> GGUF conversion only")
    if args.colbert and (args.legacy or args.model_dir.endswith(".bin")):
        p.error("--colbert applies to HF-dir -> GGUF conversion only")
    if args.all_ftypes and (args.legacy or args.model_dir.endswith(".bin")):
        p.error("--all-ftypes applies to HF-dir -> GGUF conversion only "
                "(not --legacy output or .bin upgrades)")
    if args.legacy:
        convert_hf_dir_to_legacy(args.model_dir, args.output,
                                 args.ftype or "f16")
        print(f"wrote {args.output}")
    elif args.model_dir.endswith(".bin"):
        from ..gguf.legacy import upgrade_legacy_bin

        upgrade_legacy_bin(args.model_dir, args.output, args.ftype)
        print(f"upgraded {args.model_dir} -> {args.output}")
    elif args.all_ftypes:
        import os

        os.makedirs(args.output, exist_ok=True)
        for ftype in ("f32", "f16", "q4_0", "q4_1", "q8_0"):
            out = os.path.join(args.output, f"ggml-model-{ftype}.gguf")
            convert_hf_dir(args.model_dir, out, ftype, sparse=args.sparse,
                           colbert=args.colbert)
            print(f"wrote {out}")
    else:
        convert_hf_dir(args.model_dir, args.output, args.ftype or "f32",
                       sparse=args.sparse, colbert=args.colbert)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
