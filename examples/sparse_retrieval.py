"""Sparse (SPLADE) + hybrid retrieval demo over an MLM-head model.

Shows the three sparse surfaces the reference has no analog for
(bert.h:41-92 is dense pooled vectors only):

- Engine.encode_sparse: |V|-dim sparse lexical vectors as (term id, weight)
  pairs, with the vocab terms resolved so the expansion is readable;
- SparseIndex: exact sparse dot-product top-k over a corpus (host-side CSR
  — sparse scoring is gather-bound, not MXU-shaped);
- hybrid retrieval: dense cosine + sparse SPLADE rankings fused by
  reciprocal rank (rrf_fuse), no score calibration needed.

Usage:
    python -m embedding_cpp_tpu.cli.make_test_model /tmp/splade.gguf --preset tiny-splade
    python examples/sparse_retrieval.py /tmp/splade.gguf [corpus.txt] [-k 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_CORPUS = os.path.join(os.path.dirname(__file__),
                              "sample_client_texts.txt")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help="GGUF model path (MLM-head / SPLADE)")
    p.add_argument("corpus", nargs="?", default=DEFAULT_CORPUS,
                   help="one document per line")
    p.add_argument("-k", type=int, default=3, help="results per query")
    p.add_argument("--terms", type=int, default=8,
                   help="expansion terms to print per text")
    args = p.parse_args()

    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.search import VectorIndex
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex, rrf_fuse

    engine = Engine.from_gguf(args.model)
    if not engine.config.mlm_head:
        print("model has no MLM head — convert with --sparse "
              "(needs a *ForMaskedLM / SPLADE checkpoint)", file=sys.stderr)
        return 1
    with open(args.corpus) as f:
        docs = [line.strip() for line in f if line.strip()]
    print(f"corpus: {len(docs)} documents")

    # 1. readable sparse expansion of the first document
    (ids, weights), = engine.encode_sparse(docs[:1], k=args.terms)
    expansion = ", ".join(
        f"{engine.id_to_token(int(t))}:{w:.2f}" for t, w in zip(ids, weights)
    )
    print(f"\nsparse expansion of {docs[0]!r}:\n  {expansion}")

    # 2. build both indexes over the same corpus (identical doc ids)
    dense = VectorIndex(engine)
    dense.add(docs)
    sparse = SparseIndex(engine)
    sparse.add(docs)

    for query in (sys.stdin if not sys.stdin.isatty()
                  else ["what do plants eat"]):
        query = query.strip()
        if not query:
            continue
        d_idx, d_scores = dense.search([query], args.k)
        s_idx, s_scores = sparse.search([query], args.k)
        f_idx, f_scores = rrf_fuse([d_idx, s_idx], args.k)
        print(f"\nquery: {query!r}")
        for name, idx, scores in (("dense", d_idx, d_scores),
                                  ("sparse", s_idx, s_scores),
                                  ("hybrid", f_idx, f_scores)):
            rows = "; ".join(
                f"[{int(i)}] {docs[int(i)][:40]!r} ({float(s):.3f})"
                for i, s in zip(idx[0], scores[0]) if i >= 0
            )
            print(f"  {name:6s}: {rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
