"""On-device vector-search benchmark: brute-force exact top-k cost.

Two numbers:

- **kernel**: chained in-device iterations of the search computation
  (scores matmul + lax.top_k) — the pure device cost per query batch,
  independent of the host link;
- **end_to_end**: wall time of VectorIndex.search_vectors including the
  [Q, k] fetch — on relay-attached hosts this is RTT-dominated (~25 ms),
  which is the point: only ids + scores cross the link, so latency is one
  round trip regardless of corpus size.

    python benchmarks/search.py [--corpus 131072] [--queries 64] [--k 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kernels import _dispatch_floor  # noqa: E402 (canonical relay floor)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", type=int, default=131072)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--dim", type=int, default=384)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--json-out")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.runtime.search import _select_topk

    n, q_n, e, k = args.corpus, args.queries, args.dim, args.k
    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(n, e)), dtype=jnp.bfloat16)
    qs = jnp.asarray(rng.normal(size=(q_n, e)), dtype=jnp.bfloat16)

    def measure(exact: bool) -> float:
        @jax.jit
        def loop(corpus, q):
            def body(i, carry):
                q, acc = carry
                scores = jnp.matmul(
                    q, corpus.T, preferred_element_type=jnp.float32
                )
                s, idx = _select_topk(scores, k, exact)
                # data dependency: perturb q by the top score
                q = q + (s[:, :1] * 1e-20).astype(q.dtype)
                return q, acc + jnp.sum(s[0, 0])

            _, acc = jax.lax.fori_loop(0, args.iters, body,
                                       (q, jnp.float32(0)))
            return acc

        float(np.asarray(loop(corpus, qs)))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(corpus, qs)))
            best = min(best, time.perf_counter() - t0)
        return max((best - _dispatch_floor()) / args.iters, 1e-9)

    per = measure(exact=True)
    per_approx = measure(exact=False)
    qps_kernel = q_n / per

    # end-to-end through VectorIndex (includes the [Q, k] fetch / RTT)
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.search import VectorIndex

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=e, n_layer=1, n_head=4,
                     n_ff=4 * e)
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))

    # zero-fetch ingest rate (device scatter; embeddings never leave HBM)
    try:
        from embedding_cpp_tpu.tokenizer.testvocab import _COMMON_WORDS

        words = np.array(_COMMON_WORDS)
        docs = [" ".join(rng.choice(words, size=9)) for _ in range(2048)]
        VectorIndex(engine).add(docs[:256])  # warm shapes
        best_ing = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            VectorIndex(engine).add(docs)
            best_ing = min(best_ing, time.perf_counter() - t0)
        ingest_dps = round(len(docs) / best_ing, 1)
    except Exception:  # no tokenizer backend available
        ingest_dps = None

    index = VectorIndex(engine)
    index.add_vectors(np.asarray(rng.normal(size=(n, e)), np.float32))
    qhost = np.asarray(rng.normal(size=(q_n, e)), np.float32)
    index.search_vectors(qhost, k)  # compile
    best_e2e = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        index.search_vectors(qhost, k)
        best_e2e = min(best_e2e, time.perf_counter() - t0)

    result = {
        "metric": "search_queries_per_sec_device",
        "value": round(qps_kernel, 1),
        "unit": "queries/s",
        "corpus": n,
        "dim": e,
        "k": k,
        "kernel_us_per_batch_exact": round(per * 1e6, 1),
        "kernel_us_per_batch_approx": round(per_approx * 1e6, 1),
        "approx_queries_per_sec": round(q_n / per_approx, 1),
        "end_to_end_ms_per_batch": round(best_e2e * 1e3, 2),
        "ingest_docs_per_sec": ingest_dps,
        "platform": jax.devices()[0].platform,
    }
    print(f"# corpus {n} x {e}: exact {per*1e6:.0f} us / {q_n} queries "
          f"({qps_kernel:,.0f} q/s); approx_max_k {per_approx*1e6:.0f} us "
          f"({q_n/per_approx:,.0f} q/s); end-to-end {best_e2e*1e3:.1f} ms "
          f"(link RTT included)", file=sys.stderr)
    print(json.dumps(result))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
