"""Evaluation harness: modes x tasks -> results/<model>_<mode>/<task>.json.

Mirror of the reference's benchmarks/run_mteb.py loop (modes
[q4_0, q4_1, f32, f16, sbert, sbert-batchless] x tasks
[STSBenchmark, EmotionClassification], run_mteb.py:23-28,104-123), writing
the same results layout so print_tables.py output is directly comparable to
the reference's published numbers (BASELINE.md).

Model sources:
  --hf-dir DIR     local HF checkpoint: converted to GGUF per ftype first
  --gguf PATH      a prebuilt GGUF (single mode)
  --synthetic      random-weight synthetic model + synthetic datasets
                   (hermetic pipeline test; scores are only meaningful
                   relative to each other)

Usage:
  python benchmarks/run_eval.py --synthetic
  python benchmarks/run_eval.py --hf-dir /path/to/all-MiniLM-L6-v2 \
      --modes f32 q4_0 sbert --tasks STSBenchmark
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tasks  # noqa: E402

RESULTS = Path(__file__).parent / "results"
# q8_0 is our extension beyond the reference's four modes (run_mteb.py:23-28)
ENGINE_MODES = ("f32", "f16", "q4_0", "q4_1", "q8_0")
ALL_MODES = ENGINE_MODES + ("sbert", "sbert-batchless")
ALL_TASKS = ("STSBenchmark", "EmotionClassification")

# Pinned reference scores (BASELINE.md; reference benchmarks/results/
# <model>_<mode>/<task>.json).  --assert-baseline gates a real-model run
# against these: STSB = Spearman of cosine, Emotion = main accuracy score.
# Tolerance matches the reference's own quantization delta class (~±0.01
# Spearman, README.origin.md:143) plus bf16-activation headroom.
EXPECTED_SCORES = {
    # (model, mode, task): score
    ("all-MiniLM-L6-v2", "f32", "STSBenchmark"): 0.8201,
    ("all-MiniLM-L6-v2", "f16", "STSBenchmark"): 0.8201,
    ("all-MiniLM-L6-v2", "q4_0", "STSBenchmark"): 0.8175,
    ("all-MiniLM-L6-v2", "q4_1", "STSBenchmark"): 0.8223,
    ("all-MiniLM-L6-v2", "f32", "EmotionClassification"): 0.4082,
    ("all-MiniLM-L6-v2", "f16", "EmotionClassification"): 0.4085,
    ("all-MiniLM-L6-v2", "q4_0", "EmotionClassification"): 0.3911,
    ("all-MiniLM-L6-v2", "q4_1", "EmotionClassification"): 0.4027,
    ("all-MiniLM-L12-v2", "f32", "STSBenchmark"): 0.8306,
    ("all-MiniLM-L12-v2", "f16", "STSBenchmark"): 0.8306,
    ("all-MiniLM-L12-v2", "q4_0", "STSBenchmark"): 0.8310,
    ("all-MiniLM-L12-v2", "q4_1", "STSBenchmark"): 0.8325,
    ("bert-base-uncased", "f32", "STSBenchmark"): 0.4738,
    ("bert-base-uncased", "f16", "STSBenchmark"): 0.4739,
    ("bert-base-uncased", "q4_0", "STSBenchmark"): 0.4940,
    ("bert-base-uncased", "q4_1", "STSBenchmark"): 0.4612,
}
SCORE_TOLERANCE = 0.015


def check_baseline(model_name: str, mode: str, task: str, score: float):
    """Return (ok, expected) — ok=None when no pinned number exists."""
    exp = EXPECTED_SCORES.get((model_name, mode, task))
    if exp is None:
        return None, None
    return abs(score - exp) <= SCORE_TOLERANCE, exp


def make_engine_encoder(gguf_path: str, dtype: str = "bfloat16",
                        output_dtype: str = "float32",
                        sparse: bool = False):
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    engine = Engine.from_gguf(
        gguf_path,
        opts=ComputeOptions(dtype=dtype, output_dtype=output_dtype),
    )
    if sparse:
        # SPLADE mode (needs an MLM-head model, e.g. --preset tiny-splade):
        # the eval similarity runs over densified sparse lexical vectors —
        # cosine over SPLADE vectors is the standard STS proxy for sparse
        # encoders (sentence-transformers SparseEncoder evaluators)
        import numpy as np

        def encode(texts):
            pairs = engine.encode_sparse(list(texts))
            out = np.zeros((len(pairs), engine.config.n_vocab), np.float32)
            for i, (idx, val) in enumerate(pairs):
                out[i, idx] = val
            return out

        return encode
    return engine.encode


def make_sbert_encoder(model_name_or_dir: str, batch_size: int = 32):
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(model_name_or_dir)

    def encode(texts):
        return model.encode(texts, batch_size=batch_size)

    return encode


def get_datasets(synthetic: bool, sts_json: str | None):
    if synthetic:
        return tasks.synthetic_sts(), tasks.synthetic_classification()
    sts = None
    clf = None
    if sts_json:
        sts = tasks.load_sts_local(sts_json)
    else:
        try:
            sts = tasks.load_stsbenchmark_hf()
        except Exception as e:
            print(f"! STSBenchmark unavailable ({e}); skipping", file=sys.stderr)
    try:
        clf = tasks.load_emotion_hf()
    except Exception as e:
        print(f"! EmotionClassification unavailable ({e}); skipping",
              file=sys.stderr)
    return sts, clf


def run_mode(mode: str, model_name: str, encoder, sts, clf, task_names,
             warmup: bool = False) -> dict[str, float]:
    """Run the selected tasks; returns {task: score} for baseline gating."""
    scores: dict[str, float] = {}
    outdir = RESULTS / f"{model_name}_{mode}"
    outdir.mkdir(parents=True, exist_ok=True)
    if warmup:
        # pre-compile every batch shape the SELECTED tasks will hit, so
        # reported times measure steady-state throughput (XLA compiles once
        # per shape; the reference's CPU path has no compile step to
        # exclude, but it does warm up at load, bert.cpp:804-816).  Each
        # corpus list separately — the batch planner derives dispatch
        # shapes from the list it is given, so warming a concatenation
        # would compile different shapes than the timed per-list calls.
        if sts is not None and "STSBenchmark" in task_names:
            encoder(list(sts.sentences1))
            encoder(list(sts.sentences2))
        if clf is not None and "EmotionClassification" in task_names:
            encoder(list(clf.train_texts))
            encoder(list(clf.test_texts))
    for task_name in task_names:
        if task_name == "STSBenchmark" and sts is not None:
            result = tasks.eval_sts(encoder, sts)
        elif task_name == "EmotionClassification" and clf is not None:
            result = tasks.eval_classification(encoder, clf)
        else:
            continue
        path = outdir / f"{task_name}.json"
        path.write_text(json.dumps(result, indent=2))
        t = result["test"]
        score = t.get("cos_sim", {}).get("spearman", t.get("main_score"))
        scores[task_name] = score
        print(
            f"{model_name}_{mode:16s} {task_name:24s} "
            f"score={score:.4f} time={t['evaluation_time']}s"
        )
    return scores


def _gate_baseline(failures: list, model_name: str, mode: str,
                   scores: dict, enabled: bool) -> None:
    if not enabled:
        return
    for task, score in scores.items():
        ok, exp = check_baseline(model_name, mode, task, score)
        if ok is None:
            print(f"! no pinned baseline for ({model_name}, {mode}, {task})",
                  file=sys.stderr)
        elif ok:
            print(f"baseline OK: {model_name}_{mode} {task} "
                  f"{score:.4f} vs {exp} (±{SCORE_TOLERANCE})",
                  file=sys.stderr)
        else:
            failures.append(
                f"{model_name}_{mode} {task}: got {score:.4f}, "
                f"expected {exp} ±{SCORE_TOLERANCE}"
            )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--hf-dir")
    src.add_argument("--gguf")
    src.add_argument("--server", metavar="HOST:PORT",
                     help="evaluate through a running embedding server "
                          "(the reference's run_mteb_server.py mode)")
    src.add_argument("--synthetic", action="store_true")
    p.add_argument("--modes", nargs="+", default=list(ALL_MODES))
    p.add_argument("--tasks", nargs="+", default=list(ALL_TASKS))
    p.add_argument("--sts-json", help="local STS dataset JSON")
    p.add_argument("--synthetic-data", action="store_true",
                   help="use synthetic datasets with any model source")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output-dtype", default="float32",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="engine embedding transfer dtype (int8 = packed "
                        "codes+scale; scores shift ~1e-4)")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile all batch shapes before timing "
                        "(reported times then measure steady-state; in "
                        "--server mode this warms the server's compiles "
                        "through the socket)")
    p.add_argument("--assert-baseline", action="store_true",
                   help="gate scores against the pinned reference numbers "
                        "(EXPECTED_SCORES / BASELINE.md); exits nonzero on "
                        "a miss.  Use with a real checkpoint, e.g. "
                        "--hf-dir .../all-MiniLM-L6-v2")
    p.add_argument("--model-name")
    p.add_argument("--sparse-encode", action="store_true",
                   help="evaluate SPLADE sparse vectors (MLM-head model, "
                        "e.g. --preset tiny-splade) instead of dense "
                        "embeddings")
    p.add_argument("--preset", default="minilm-l6",
                   help="synthetic-mode model preset (make_test_model): "
                        "covers every encoder/tokenizer family, e.g. "
                        "tiny-xlmr (Unigram), tiny-mpnet (relative bias)")
    args = p.parse_args()

    sts, clf = get_datasets(args.synthetic or args.synthetic_data, args.sts_json)
    if sts is None and clf is None:
        print("no datasets available; nothing to do", file=sys.stderr)
        sys.exit(1)
    failures: list[str] = []

    if args.synthetic:
        print(
            "# NOTE: synthetic random weights + synthetic datasets — this "
            "exercises the full pipeline but proves NO score parity; the "
            "pinned reference baselines are unverified in a zero-egress "
            "environment.  Run `make validate-real` on a networked host.",
            file=sys.stderr,
        )
        from embedding_cpp_tpu.cli.make_test_model import make_test_model

        model_name = args.model_name or f"synthetic-{args.preset}"
        with tempfile.TemporaryDirectory() as td:
            for mode in args.modes:
                if mode not in ENGINE_MODES:
                    continue  # no sbert for synthetic weights
                path = f"{td}/model-{mode}.gguf"
                make_test_model(path, args.preset, mode)
                scores = run_mode(
                    mode, model_name,
                    make_engine_encoder(path, args.dtype, args.output_dtype,
                                        sparse=args.sparse_encode),
                    sts, clf, args.tasks, warmup=args.warmup)
                _gate_baseline(failures, model_name, mode, scores,
                               args.assert_baseline)
    elif args.server:
        from embedding_cpp_tpu.runtime.client import EmbeddingClient

        host, _, port = args.server.rpartition(":")
        client = EmbeddingClient(host or "127.0.0.1", int(port))
        model_name = args.model_name or "server"
        scores = run_mode("server", model_name, client.embed, sts, clf,
                          args.tasks, warmup=args.warmup)
        _gate_baseline(failures, model_name, "server", scores,
                       args.assert_baseline)
        client.close()
    elif args.gguf:
        model_name = args.model_name or Path(args.gguf).stem
        scores = run_mode(
            "gguf", model_name,
            make_engine_encoder(args.gguf, args.dtype, args.output_dtype,
                                sparse=args.sparse_encode),
            sts, clf, args.tasks, warmup=args.warmup)
        _gate_baseline(failures, model_name, "gguf", scores,
                       args.assert_baseline)
    else:
        # HF dir: convert once per requested engine mode, plus sbert modes
        from embedding_cpp_tpu.models.convert import convert_hf_dir

        model_name = args.model_name or Path(args.hf_dir).name
        with tempfile.TemporaryDirectory() as td:
            for mode in args.modes:
                if mode in ENGINE_MODES:
                    path = f"{td}/model-{mode}.gguf"
                    # --sparse-encode implies the MLM head must survive
                    # conversion (a SPLADE checkpoint without modules.json
                    # would otherwise auto-detect as dense)
                    convert_hf_dir(args.hf_dir, path, mode,
                                   sparse=True if args.sparse_encode
                                   else None)
                    scores = run_mode(
                        mode, model_name,
                        make_engine_encoder(path, args.dtype,
                                            args.output_dtype,
                                            sparse=args.sparse_encode),
                        sts, clf, args.tasks, warmup=args.warmup)
                    _gate_baseline(failures, model_name, mode, scores,
                                   args.assert_baseline)
                elif mode == "sbert":
                    run_mode(mode, model_name,
                             make_sbert_encoder(args.hf_dir, 32),
                             sts, clf, args.tasks)
                elif mode == "sbert-batchless":
                    run_mode(mode, model_name,
                             make_sbert_encoder(args.hf_dir, 1),
                             sts, clf, args.tasks)

    if failures:
        print("BASELINE ASSERTION FAILURES:", file=sys.stderr)
        for f in failures:
            print(f"  {f}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
