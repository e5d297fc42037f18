"""Model hub helpers: list / download / upload GGUF models.

Equivalent of the reference's models/download-ggml.py and upload-to-hf.py;
`repo_id` defaults to the same `skeskinen/ggml` prebuilt-model repo the
reference pins (download-ggml.py:5 MODELS_REPO), so `hub list` with no
arguments shows the reference's catalog.  Requires network access and
`huggingface_hub`; degrades to a clear message otherwise.

    python -m embedding_cpp_tpu.cli.hub list     [repo_id]
    python -m embedding_cpp_tpu.cli.hub get      <filename> [repo_id] [-o DIR]
    python -m embedding_cpp_tpu.cli.hub put      <local.gguf> [repo_id]
    python -m embedding_cpp_tpu.cli.hub download <repo_id> <dir>
"""
from __future__ import annotations

import argparse
import sys

# the reference's prebuilt-model repo (models/download-ggml.py:5)
DEFAULT_REPO = "skeskinen/ggml"


def _api():
    try:
        from huggingface_hub import HfApi

        return HfApi()
    except Exception as e:  # pragma: no cover - import/env dependent
        print(f"huggingface_hub unavailable: {e}", file=sys.stderr)
        sys.exit(2)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list")
    p_list.add_argument("repo_id", nargs="?", default=DEFAULT_REPO)
    p_get = sub.add_parser("get")
    p_get.add_argument("filename")
    p_get.add_argument("repo_id", nargs="?", default=DEFAULT_REPO)
    p_get.add_argument("-o", "--outdir", default=".")
    p_put = sub.add_parser("put")
    p_put.add_argument("path")
    p_put.add_argument("repo_id", nargs="?", default=DEFAULT_REPO)
    p_dl = sub.add_parser(
        "download", help="snapshot a whole HF checkpoint into a local dir "
                         "(for run_eval.py --hf-dir / Engine.from_hf_dir)"
    )
    p_dl.add_argument("repo_id")
    p_dl.add_argument("outdir")
    args = p.parse_args()

    api = _api()
    try:
        if args.cmd == "list":
            files = api.list_repo_files(args.repo_id)
            for f in files:
                if f.endswith((".gguf", ".bin")):
                    print(f)
        elif args.cmd == "get":
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(
                args.repo_id, args.filename, local_dir=args.outdir
            )
            print(path)
        elif args.cmd == "download":
            from huggingface_hub import snapshot_download

            path = snapshot_download(args.repo_id, local_dir=args.outdir)
            print(path)
        elif args.cmd == "put":
            import os

            api.upload_file(
                path_or_fileobj=args.path,
                path_in_repo=os.path.basename(args.path),
                repo_id=args.repo_id,
            )
            print(f"uploaded {args.path} to {args.repo_id}")
    except Exception as e:
        print(f"hub operation failed (network required): {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
