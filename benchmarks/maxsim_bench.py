"""On-device late-interaction (MaxSim) retrieval benchmark.

Corpus token states resident in HBM (runtime/maxsim_search.MaxSimIndex);
one dispatch scores a whole query batch against every document.  Reports:

- **kernel**: chained in-device iterations of the blocked MaxSim search
  (sim matmul -> masked max -> sum -> exact top-k) — pure device cost;
- **end_to_end**: MaxSimIndex.search_token_vectors wall time including the
  packed [Q, 2k] fetch (RTT-dominated on relay hosts, by design).

Defaults index 4096 docs x up to 128 tokens (~0.5M corpus tokens — 5x the
VERDICT r4 bar) at ColBERT-width 128-dim token vectors.

    python benchmarks/maxsim_bench.py [--docs 4096] [--doc-maxlen 128]
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
    p.add_argument("--docs", type=int, default=4096)
    p.add_argument("--doc-maxlen", type=int, default=128)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--queries", type=int, default=16)
    p.add_argument("--q-tokens", type=int, default=32)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--json-out")
    p.add_argument("--big-docs", type=int, default=0,
                   help=">= 100k-doc two-stage (candidates) section: "
                        "clustered corpus, exact-vs-approx agreement")
    p.add_argument("--big-doc-maxlen", type=int, default=48)
    p.add_argument("--candidates", type=int, nargs="+",
                   default=[128, 512])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.runtime.maxsim_search import (
        _doc_block, _maxsim_search_kernel,
    )

    rng = np.random.default_rng(0)
    n, sd, e = args.docs, args.doc_maxlen, args.dim
    # realistic variable doc lengths: half to full doc_maxlen
    lens = rng.integers(sd // 2, sd + 1, size=n)
    corpus = rng.normal(size=(n, sd, e)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    cmask = np.arange(sd)[None, :] < lens[:, None]
    corpus[~cmask] = 0.0
    corpus_tokens = int(lens.sum())

    q = rng.normal(size=(args.queries, args.q_tokens, e)).astype(np.float32)
    qm = np.ones((args.queries, args.q_tokens), np.int32)

    corpus_d = jnp.asarray(corpus, jnp.bfloat16)
    cmask_d = jnp.asarray(cmask)
    q_d = jnp.asarray(q)
    qm_d = jnp.asarray(qm)
    nb = _doc_block(args.queries, args.q_tokens, sd, n)

    # --- chained in-device kernel cost --------------------------------------
    @jax.jit
    def loop(corpus, cmask, q, qm):
        def body(i, carry):
            qq, acc = carry
            packed = _maxsim_search_kernel(corpus, cmask, qq, qm, n,
                                           args.k, nb)
            acc = acc + jnp.sum(packed[:, : args.k])
            qq = qq * (1 + (acc > 1e30).astype(qq.dtype))
            return qq, acc

        return jax.lax.fori_loop(0, args.iters, body, (q, jnp.float32(0)))[1]

    float(np.asarray(loop(corpus_d, cmask_d, q_d, qm_d)))  # compile
    best = min(
        (lambda t0: (float(np.asarray(loop(corpus_d, cmask_d, q_d, qm_d))),
                     time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    per = max((best - _dispatch_floor()) / args.iters, 1e-9)
    # the sim matmul dominates: Qb * Sq * E * (N * Sd) MACs
    flops = 2 * args.queries * args.q_tokens * e * n * sd

    # --- end to end through the index ---------------------------------------
    from embedding_cpp_tpu.models.config import BertConfig
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    class _Holder:
        config = BertConfig(n_vocab=32, n_ctx=sd, n_embd=e, n_layer=1,
                            n_head=1, n_ff=8)
        mesh = None

    idx = MaxSimIndex(_Holder(), doc_maxlen=sd)
    docs = [corpus[i, : lens[i]] for i in range(n)]
    t0 = time.perf_counter()
    idx.add_token_vectors(docs)
    add_s = time.perf_counter() - t0
    q_list = [q[i] for i in range(args.queries)]
    idx.search_token_vectors(q_list, k=args.k)  # compile
    t0 = time.perf_counter()
    ids, scores = idx.search_token_vectors(q_list, k=args.k)
    e2e = time.perf_counter() - t0
    assert ids.shape == (args.queries, args.k)

    result = {
        "platform": jax.devices()[0].platform,
        "docs": n, "doc_maxlen": sd, "corpus_tokens": corpus_tokens,
        "dim": e, "queries": args.queries, "q_tokens": args.q_tokens,
        "k": args.k,
        "kernel_ms_per_batch": round(per * 1e3, 3),
        "kernel_tflops": round(flops / per / 1e12, 2),
        "queries_per_sec": round(args.queries / per),
        "end_to_end_ms": round(e2e * 1e3, 2),
        "index_add_s": round(add_s, 2),
        "ingest_docs_per_sec": round(n / add_s),
    }
    print(json.dumps(result))

    if args.big_docs:
        result["big"] = bench_big(args, _Holder)
        print(json.dumps({"big": result["big"]}))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=1))


def bench_big(args, holder_cls) -> dict:
    """>= 100k-doc section: two-stage candidates mode vs exact, with
    agreement stats (VERDICT r4 #6b).  The corpus is CLUSTERED (tokens =
    unit(center + noise)) so the pooled prefilter is informative, like real
    embeddings; pure-random token vectors would make any prefilter blind.
    Also times ingest through the donated host-commit path."""
    import time

    import jax
    import numpy as np

    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    from kernels import _dispatch_floor

    rng = np.random.default_rng(1)
    n, sd, e = args.big_docs, args.big_doc_maxlen, args.dim
    # ~10 docs per cluster: a query's exact top-k IS its cluster, so
    # approx-vs-exact agreement measures the prefilter, not which of ~100
    # near-tied same-cluster docs happened to edge into the top-k
    n_centers = max(1, n // 10)
    centers = rng.normal(size=(n_centers, e)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    assign = rng.integers(0, n_centers, size=n)
    lens = rng.integers(sd // 2, sd + 1, size=n)

    def tokens_near(center, m):
        # UNIT noise: raw gaussian rows have norm ~sqrt(E) and would drown
        # the center signal (cross-cluster noise maxima then beat
        # same-cluster cosines and even the EXACT top-k becomes arbitrary)
        nz = rng.normal(size=(m, e))
        nz /= np.linalg.norm(nz, axis=-1, keepdims=True)
        t = 0.8 * center[None] + 0.6 * nz
        return (t / np.linalg.norm(t, axis=-1, keepdims=True)
                ).astype(np.float32)

    idx = MaxSimIndex(holder_cls(), doc_maxlen=sd, capacity=n)
    docs = [tokens_near(centers[assign[i]], lens[i]) for i in range(n)]
    t0 = time.perf_counter()
    idx.add_token_vectors(docs)
    add_s = time.perf_counter() - t0

    # queries near random centers: the exact top docs share the center
    q = [tokens_near(centers[rng.integers(n_centers)], args.q_tokens)
         for _ in range(args.queries)]
    k = args.k
    floor = _dispatch_floor()  # searches are ONE dispatch; subtract the RTT

    def timed_search(**kw):
        idx.search_token_vectors(q, k=k, **kw)  # compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            ids, scores = idx.search_token_vectors(q, k=k, **kw)
            best = min(best, time.perf_counter() - t0)
        return ids, scores, max(best - floor, 1e-9)

    ie, se, exact_s = timed_search()
    out = {"docs": n, "doc_maxlen": sd,
           "ingest_s": round(add_s, 2),
           "ingest_docs_per_sec": round(n / add_s),
           "exact_search_ms_minus_rtt": round(exact_s * 1e3, 2)}
    for c in args.candidates:
        ia, sa, approx_s = timed_search(candidates=c)
        overlap = np.mean([
            len(set(ie[i][ie[i] >= 0]) & set(ia[i][ia[i] >= 0])) / k
            for i in range(len(q))
        ])
        top1 = float(np.mean(ia[:, 0] == ie[:, 0]))
        out[f"candidates_{c}"] = {
            "search_ms_minus_rtt": round(approx_s * 1e3, 2),
            "recall_at_k_vs_exact": round(float(overlap), 4),
            "top1_agreement": round(top1, 4),
        }

    # ingest through a real (tiny) engine: forward + DONATED commit, token
    # states never leaving the device — the path the r4 516 docs/s number
    # (host add_token_vectors) did not measure
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(n_vocab=512, n_ctx=64, n_embd=128, n_layer=2,
                     n_head=4, n_ff=256, name="ingest-bench")
    eng = Engine.synthetic(cfg, ftype="f32",
                           opts=ComputeOptions(dtype="bfloat16"))
    texts = [f"document number {i} about topic {i % 97}"
             for i in range(16384)]
    didx = MaxSimIndex(eng, doc_maxlen=16, capacity=2 * len(texts))
    didx.add(texts)  # compile the 2048-row chunk shapes (steady state)
    t0 = time.perf_counter()
    didx.add(texts)
    dev_s = time.perf_counter() - t0
    out["device_ingest_docs_per_sec"] = round(len(texts) / dev_s)
    return out


if __name__ == "__main__":
    main()
