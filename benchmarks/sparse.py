"""SPLADE sparse-encoding + MaxSim benchmark at splade-base geometry.

Two layers of numbers, mirroring benchmarks/search.py:

- **kernel**: chained in-device iterations of the full sparse forward
  (encoder + chunked MLM-logits scan + top-k + bit-packing) — the pure
  device cost per batch.  The loop carries a REAL data dependency (the
  packed output's value bytes feed the next iteration's ids; see
  CLAUDE.md's hoisting traps) and fetches a scalar per timing.
- **end_to_end**: Engine.encode_sparse wall time including the packed
  top-k fetch (~8 KB/sentence-batch — the transfer-compression story:
  a dense 30522-float row would be 120 KB/sentence).

    python benchmarks/sparse.py [--batch 32] [--seq 128] [--k 256]
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


def bench_search(docs: int, nnz: int, n_vocab: int, queries: int,
                 k: int, iters: int, json_out: str | None) -> None:
    """Device sparse retrieval at scale (VERDICT r3 weak #4): the
    dp-shardable padded-COO device index vs the single-core host CSR
    baseline, same corpus, same queries, exact same scores."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.runtime.sparse_search import (
        SparseIndex, _doc_block, _make_sparse_search_kernel,
    )

    rng = np.random.default_rng(0)
    # vectorized synthetic corpus: fixed-nnz docs, weight-descending
    didx = rng.integers(0, n_vocab, size=(docs, nnz)).astype(np.int32)
    dval = np.sort(rng.random((docs, nnz)).astype(np.float32), axis=1)[:, ::-1]
    # SPLADE-like impact concentration: log1p(relu(logits)) puts most of a
    # document's mass in a few dominant terms (the regime the candidates
    # mode's weight-prefix prefilter targets; near-uniform profiles are its
    # worst case and measured recall 0.28 — keep exact search for those)
    dval *= np.exp(-0.08 * np.arange(nnz, dtype=np.float32))[None, :]
    q_pairs = []
    for _ in range(queries):
        qn = int(rng.integers(8, 48))
        q_pairs.append((
            rng.choice(n_vocab, size=qn, replace=False).astype(np.int32),
            rng.random(qn).astype(np.float32),
        ))

    # --- host CSR baseline (the exact SparseIndex host math, inlined on
    # the flat arrays so 1M-doc corpus build stays vectorized) -------------
    flat_idx = didx.reshape(-1).astype(np.int64)
    flat_val = dval.reshape(-1)
    doc_ids = np.repeat(np.arange(docs, dtype=np.int64), nnz)
    qd = np.zeros(n_vocab, np.float32)
    t0 = time.perf_counter()
    host_scores = []
    for idx, val in q_pairs:
        qd[idx] = val
        per = flat_val * qd[flat_idx]
        host_scores.append(
            np.bincount(doc_ids, weights=per, minlength=docs)
        )
        qd[idx] = 0.0
    host_s = time.perf_counter() - t0
    host_top = np.argsort(-np.asarray(host_scores), axis=1)[:, :k]

    # --- device index (through the production class) ----------------------
    index = SparseIndex(device=True, nnz_width=nnz)
    pairs = [(didx[i], dval[i]) for i in range(docs)]
    t0 = time.perf_counter()
    step = 65536
    for lo in range(0, docs, step):
        index.add_vectors(pairs[lo : lo + step])
    ingest_s = time.perf_counter() - t0
    ids, scores = index.search_vectors(q_pairs, k=k)  # compile
    t0 = time.perf_counter()
    ids, scores = index.search_vectors(q_pairs, k=k)
    e2e_s = time.perf_counter() - t0
    agree = float(np.mean(ids == host_top))

    # --- chained in-device kernel cost ------------------------------------
    kernel = _make_sparse_search_kernel()
    kq = 64
    q_idx = np.full((queries, kq), -1, np.int32)
    q_val = np.zeros((queries, kq), np.float32)
    for i, (qi, qv) in enumerate(q_pairs):
        q_idx[i, : len(qi)] = qi
        q_val[i, : len(qv)] = qv
    cap = index._didx.shape[0]
    nb = _doc_block(queries, nnz, cap)
    di_d, dv_d = index._didx, index._dval
    qi_d, qv_d = jnp.asarray(q_idx), jnp.asarray(q_val)

    @jax.jit
    def loop(di, dv, qi, qv):
        def body(i, carry):
            qvv, acc = carry
            packed = kernel(di, dv, qi, qvv, docs, k, nb, n_vocab)
            acc = acc + jnp.sum(packed[:, :k])
            qvv = qvv * (1 + (acc > 1e30).astype(qvv.dtype))
            return qvv, acc

        return jax.lax.fori_loop(0, iters, body, (qv, jnp.float32(0)))[1]

    float(np.asarray(loop(di_d, dv_d, qi_d, qv_d)))  # compile
    best = min(
        (lambda t: (float(np.asarray(loop(di_d, dv_d, qi_d, qv_d))),
                    time.perf_counter() - t)[1])(time.perf_counter())
        for _ in range(3)
    )
    per = max((best - _dispatch_floor()) / iters, 1e-9)

    result = {
        "platform": jax.devices()[0].platform,
        "docs": docs, "nnz": nnz, "n_vocab": n_vocab,
        "queries": queries, "k": k,
        "host_s_per_batch": round(host_s, 3),
        "device_kernel_ms_per_batch": round(per * 1e3, 3),
        "speedup_vs_host": round(host_s / per, 1),
        "device_end_to_end_ms": round(e2e_s * 1e3, 2),
        "ingest_s": round(ingest_s, 2),
        "topk_agreement": agree,
    }

    # --- two-stage candidates mode (r5): impact-prefix prefilter + exact
    # rescore.  Concentrate the synthetic weights (exp decay) so the prefix
    # carries most of the mass, the regime SPLADE weights live in.
    for c in (256, 1024):
        index.search_vectors(q_pairs, k=k, candidates=c)  # compile
        t0 = time.perf_counter()
        ia, sa = index.search_vectors(q_pairs, k=k, candidates=c)
        approx_s = time.perf_counter() - t0
        overlap = float(np.mean([
            len(set(ids[i][ids[i] >= 0]) & set(ia[i][ia[i] >= 0])) / k
            for i in range(queries)
        ]))
        result[f"candidates_{c}"] = {
            "end_to_end_ms": round(approx_s * 1e3, 2),
            "recall_at_k_vs_exact": round(overlap, 4),
            "top1_agreement": round(
                float(np.mean(ia[:, 0] == ids[:, 0])), 4),
        }
    print(json.dumps(result))
    if json_out:
        Path(json_out).write_text(json.dumps(result, indent=1))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq", type=int, default=128)
    p.add_argument("--k", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ftype", default="q4_0")
    p.add_argument("--json-out")
    p.add_argument("--search", action="store_true",
                   help="device sparse retrieval at --docs scale vs the "
                        "host CSR baseline")
    p.add_argument("--docs", type=int, default=1048576)
    p.add_argument("--nnz", type=int, default=128)
    p.add_argument("--vocab", type=int, default=30522)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--search-k", type=int, default=10)
    args = p.parse_args()
    if args.search:
        bench_search(args.docs, args.nnz, args.vocab, args.queries,
                     args.search_k, args.iters, args.json_out)
        return

    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.models import BertConfig, ComputeOptions, random_params
    from embedding_cpp_tpu.models.bert import bert_sparse_batch

    # naver/splade-cocondenser-* geometry: bert-base + full WordPiece vocab
    cfg = BertConfig(
        n_vocab=30522, n_ctx=512, n_embd=768, n_layer=12, n_head=12,
        n_ff=3072, mlm_head=True, name="splade-base-synthetic",
    )
    opts = ComputeOptions(dtype="bfloat16", q4_impl="auto")
    from embedding_cpp_tpu.models.convert import FTYPE_NAMES

    params = random_params(cfg, FTYPE_NAMES[args.ftype], seed=0,
                           dense_dtype=jnp.bfloat16)
    b, s, k = args.batch, args.seq, args.k
    rng = np.random.default_rng(0)
    ids0 = rng.integers(0, cfg.n_vocab, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)

    @jax.jit
    def loop(ids, mask):
        def body(i, carry):
            ids, acc = carry
            packed = bert_sparse_batch(params, ids, mask, cfg, opts, k=k)
            # real data dependency on the FULL packed output — summing only
            # the value half would let XLA dead-code the index half of the
            # top-k/bit-packing (CLAUDE.md column-slicing trap); u32 sum
            # wraps, which is fine: only the dependency matters
            total_u = jnp.sum(packed, dtype=jnp.uint32)
            ids = ids + (total_u > jnp.uint32(0xFFFFFFF0)).astype(ids.dtype)
            vals = jax.lax.bitcast_convert_type(
                packed[..., k:], jnp.float32
            )
            return ids, acc + jnp.sum(vals)
        _, acc = jax.lax.fori_loop(0, args.iters, body,
                                   (ids, jnp.float32(0)))
        return acc

    float(np.asarray(loop(ids0, mask)))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(ids0, mask)))
        best = min(best, time.perf_counter() - t0)
    per_batch = max((best - _dispatch_floor()) / args.iters, 1e-9)
    sps_kernel = b / per_batch

    # end-to-end through the engine (tokenize + dispatch + packed fetch)
    from embedding_cpp_tpu.runtime.engine import Engine

    result = {
        "metric": "sparse_sentences_per_sec_device",
        "value": round(sps_kernel, 1),
        "unit": "sentences/s",
        "batch": b, "seq": s, "k": k, "ftype": args.ftype,
        "kernel_ms_per_batch": round(per_batch * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }
    try:
        from embedding_cpp_tpu.tokenizer.testvocab import _COMMON_WORDS

        eng = Engine.synthetic(cfg, args.ftype, opts=opts)
        words = np.array(_COMMON_WORDS)
        texts = [" ".join(rng.choice(words, size=12)) for _ in range(256)]
        # warm the EXACT shapes the timed runs hit (the batch planner may
        # split 256 texts into smaller buckets under the sparse row cap)
        eng.encode_sparse(texts, k=k)
        best_e2e = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.encode_sparse(texts, k=k)
            best_e2e = min(best_e2e, time.perf_counter() - t0)
        result["end_to_end_sentences_per_sec"] = round(
            len(texts) / best_e2e, 1
        )
        # MaxSim: one query against the same texts (doc forward dominates)
        eng.maxsim(texts[0], texts)  # warm the exact chunk shapes
        best_ms = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.maxsim(texts[0], texts)
            best_ms = min(best_ms, time.perf_counter() - t0)
        result["maxsim_docs_per_sec"] = round(len(texts) / best_ms, 1)
    except Exception as e:  # no tokenizer backend available
        result["end_to_end_error"] = str(e)

    print(f"# sparse [{b}, {s}] k={k} {args.ftype}: "
          f"{per_batch*1e3:.1f} ms/batch ({sps_kernel:,.0f} sent/s device); "
          f"e2e {result.get('end_to_end_sentences_per_sec')} sent/s; "
          f"maxsim {result.get('maxsim_docs_per_sec')} docs/s")
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
