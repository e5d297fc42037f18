"""Semantic search demo: embed a corpus once, answer queries by cosine.

The in-process analog of the reference's examples/sample_client.py flow
(embed sample_client_texts.txt, then interactive top-k), using the Engine
directly — the corpus embeds in one packed call instead of a socket
round-trip per sentence.

Usage:
    python examples/semantic_search.py <model.gguf> [corpus.txt] [-k 5]
    echo "how do plants make food" | python examples/semantic_search.py m.gguf
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CORPUS = os.path.join(os.path.dirname(__file__),
                              "sample_client_texts.txt")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help="GGUF model path")
    p.add_argument("corpus", nargs="?", default=DEFAULT_CORPUS,
                   help="one sentence per line")
    p.add_argument("-k", type=int, default=5, help="results per query")
    args = p.parse_args()

    from embedding_cpp_tpu import Engine

    engine = Engine.from_gguf(args.model)
    with open(args.corpus) as f:
        corpus = [line.strip() for line in f if line.strip()]

    t0 = time.perf_counter()
    vecs = engine.encode(corpus)  # packed: one dispatch per shape class
    dt = time.perf_counter() - t0
    print(f"embedded {len(corpus)} sentences in {dt:.2f}s "
          f"({len(corpus) / dt:.0f}/s), dim {vecs.shape[1]}", file=sys.stderr)

    interactive = sys.stdin.isatty()
    if interactive:
        print("query (empty line to quit):", file=sys.stderr)
    for line in sys.stdin:
        q = line.strip()
        if not q:
            break
        qv = engine.encode([q])[0]
        # cosine (models converted with normalize=false return raw vectors)
        def _unit(x):
            return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                                  1e-12)

        sims = _unit(vecs) @ _unit(qv)
        for rank, idx in enumerate(np.argsort(-sims)[: args.k], 1):
            print(f"{rank}. [{sims[idx]:+.4f}] {corpus[idx]}")
        if interactive:
            print("query (empty line to quit):", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
