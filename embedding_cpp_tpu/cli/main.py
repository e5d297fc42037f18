"""CLI demo: load a GGUF model, embed a prompt, print tokens + embedding.

Mirrors the reference's examples/main.cpp surface: `-m/--model`,
`-p/--prompt`, plus load/eval timings.  (`-t/--threads` is accepted for
drop-in compatibility but XLA manages its own parallelism.)
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True, help="path to GGUF model")
    p.add_argument("-p", "--prompt", default="Hello world", help="prompt to embed")
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="(accepted for compatibility; XLA manages threads)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--prompt-name", default=None,
                   help="named prompt prefix from the model's converted "
                        "config_sentence_transformers.json prompts "
                        "(e.g. query/passage); '' disables the default")
    p.add_argument("--prompt-prefix", default=None,
                   help="literal prefix prepended to the prompt "
                        "(overrides --prompt-name)")
    args = p.parse_args()

    from ..models.bert import ComputeOptions
    from .engine_io import format_embedding
    from ..runtime.engine import Engine

    t0 = time.perf_counter()
    engine = Engine.from_gguf(args.model, opts=ComputeOptions(dtype=args.dtype))
    t_load = time.perf_counter() - t0

    prefix = engine.resolve_prompt(args.prompt_name, args.prompt_prefix)
    text = prefix + args.prompt
    if prefix:
        print(f"prompt prefix: {prefix!r}")

    ids = engine.tokenize(text)
    print(f"{len(ids)} tokens:")
    print("ids:", ids)
    print("tokens:", [engine.id_to_token(i) for i in ids])

    t1 = time.perf_counter()
    vec = engine.encode([text], prompt="")[0]
    t_eval = time.perf_counter() - t1

    print(format_embedding(vec))
    print(f"load time   = {t_load*1000:8.2f} ms")
    print(f"eval time   = {t_eval*1000:8.2f} ms (includes compile on first call)")

    t2 = time.perf_counter()
    engine.encode([text], prompt="")
    print(f"eval cached = {(time.perf_counter()-t2)*1000:8.2f} ms")


if __name__ == "__main__":
    main()
