"""Throughput benchmark: sentences/sec/chip on the reference's headline
workload (all-MiniLM-L6-v2 shapes, Q4_0 weights, STSB-like sentence lengths).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's q4_0 MiniLM-L6 STSBenchmark eval — 5.45 s for the
2758-sentence test split (BASELINE.md; benchmarks/results/
all-MiniLM-L6-v2_q4_0/STSBenchmark.json) ≈ 506 sentences/s on CPU.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# shared timing/geometry helpers live with the A/B harnesses — one source so
# the headline metrics and the committed A/B artifacts can never drift apart
sys.path.insert(0, str(Path(__file__).resolve().parent / "benchmarks"))
from kernels import _timed  # noqa: E402

# Reference q4_0 STSBenchmark eval times (BASELINE.md) over the 2758-sentence
# test split -> sentences/s on the reference's CPU.
BASELINES = {
    "minilm-l6": 2758 / 5.45,  # ≈ 506
    "minilm-l12": 2758 / 11.27,  # ≈ 245
    "bert-base": 2758 / 33.93,  # ≈ 81
}
BASELINE_SENTENCES_PER_SEC = BASELINES["minilm-l6"]


LENGTH_PROFILES = {
    # (mean words, std): STSB sentences are short; "long" models doc-style
    # inputs that exercise the S>=128 attention-kernel path
    "stsb": (11, 4),
    "long": (200, 60),
}


def synthetic_sentences(n: int, seed: int = 0, profile: str = "stsb") -> list[str]:
    """Synthetic corpus with a controlled length distribution."""
    from embedding_cpp_tpu.tokenizer.testvocab import _COMMON_WORDS

    mean, std = LENGTH_PROFILES[profile]
    rng = np.random.default_rng(seed)
    words = np.array(_COMMON_WORDS)
    out = []
    for _ in range(n):
        k = max(3, int(rng.normal(mean, std)))
        out.append(" ".join(rng.choice(words, size=k)))
    return out


def run_bench(
    preset: str = "minilm-l6",
    ftype: str = "q4_0",
    dtype: str = "bfloat16",
    q4_impl: str = "auto",
    n_sentences: int = 2758,
    repeats: int = 5,
    verbose: bool = True,
    length_profile: str = "stsb",
    packing: str = "auto",
    output_dtype: str = "float32",
):
    import jax

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    # q4_impl "auto" resolves in the model layer (models/bert.resolve_impls):
    # fused Pallas dequant+bias+GELU kernels on a local TPU (r3: forward A/B
    # 6.93 vs 8.26 ms), XLA dequant under GSPMD meshes / CPU.
    config = PRESETS[preset]
    opts = ComputeOptions(dtype=dtype, q4_impl=q4_impl, output_dtype=output_dtype)
    engine = Engine.synthetic(config, ftype=ftype, opts=opts, packing=packing)

    texts = synthetic_sentences(n_sentences, profile=length_profile)
    token_lists = engine.tokenize_batch(texts)
    n_tokens = sum(len(t) for t in token_lists)

    # warmup: compile every bucket shape this workload will hit
    engine.embed_tokens(token_lists)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = engine.embed_tokens(token_lists)
        out[0].sum()  # numpy result; already host-synced
        times.append(time.perf_counter() - t0)
    best = min(times)
    sps = n_sentences / best

    if verbose:
        print(
            f"# {preset} {ftype} {dtype} q4_impl={q4_impl}: "
            f"{n_sentences} sentences ({n_tokens} tokens) in {best:.3f}s "
            f"(runs: {[f'{t:.3f}' for t in times]}) on "
            f"{jax.devices()[0].platform}",
            file=sys.stderr,
        )
    baseline = BASELINES.get(preset, BASELINE_SENTENCES_PER_SEC)
    suffix = "" if length_profile == "stsb" else f"_{length_profile}"
    return {
        "metric": f"sentences_per_sec_chip_{preset.replace('-', '_')}_{ftype}{suffix}",
        "value": round(sps, 1),
        "unit": "sentences/s",
        "vs_baseline": round(sps / baseline, 2),
    }


def _in_device_forward_ms(
    preset: str,
    ftype: str,
    b: int = 32,
    s: int = 512,
    iters: int = 20,
    packed: bool = False,
    dtype: str = "bfloat16",
) -> float:
    """Relay-independent compute metric: ms per full forward batch, measured
    as N chained in-device iterations per host fetch (kernels.py
    methodology: real data dependency between iterations so XLA can't hoist
    the forward; a SCALAR fetched per timing; the per-call dispatch floor
    subtracted).  Engine sentences/s is dominated by the relay's ~25 ms RTT
    and ~30 MB/s fetch and drifts ~2x minute-to-minute — this number
    measures the code, so round-over-round comparisons use IT, not the
    serving figure (r4's 25,961/s vs r3's 29,049/s was pure drift hiding a
    31% forward improvement)."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import ComputeOptions, random_params
    from embedding_cpp_tpu.models.bert import bert_embed_batch, bert_embed_packed

    from packed_bse_ab import _serving_segments

    config = PRESETS[preset]
    ftypes = {"f32": GGUFFileType.ALL_F32, "f16": GGUFFileType.MOSTLY_F16,
              "q4_0": GGUFFileType.MOSTLY_Q4_0,
              "q4_1": GGUFFileType.MOSTLY_Q4_1,
              "q8_0": GGUFFileType.MOSTLY_Q8_0}
    params = random_params(config, ftypes[ftype], seed=0,
                           dense_dtype=jnp.bfloat16)
    opts = ComputeOptions(dtype=dtype)
    rng = np.random.default_rng(0)

    floor_fn = jax.jit(lambda x: x + 1.0)
    float(np.asarray(floor_fn(jnp.float32(0.0))))
    floor = min(
        _timed(lambda: float(np.asarray(floor_fn(jnp.float32(i)))))
        for i in range(5)
    )

    if packed:
        # serving geometry: 512-token rows packed with ~12.6-token sentences
        seg_np, pos_np = _serving_segments(rng, b, s)
        ids_np = rng.integers(1, config.n_vocab, size=(b, s)).astype(np.int32)
        ids_np[seg_np < 0] = 0
        args = (params, jnp.asarray(ids_np), jnp.asarray(seg_np),
                jnp.asarray(pos_np))

        @jax.jit
        def loop(params, ids, seg, pos):
            def body(i, carry):
                ids_i = ids + (carry > 1e30).astype(jnp.int32)
                y = bert_embed_packed(params, ids_i, seg, pos, config, opts,
                                      n_seg=64)
                return carry + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)
    else:
        ids = jnp.asarray(rng.integers(0, config.n_vocab, size=(b, s)),
                          dtype=jnp.int32)
        mask = jnp.ones((b, s), jnp.int32)
        args = (params, ids, mask)

        @jax.jit
        def loop(params, ids, mask):
            def body(i, carry):
                ids_i = ids + (carry > 1e30).astype(jnp.int32)
                y = bert_embed_batch(params, ids_i, mask, config, opts)
                return carry + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)

    float(np.asarray(loop(*args)))  # compile
    best = min(_timed(lambda: float(np.asarray(loop(*args)))) for _ in range(3))
    return max((best - floor) / iters, 1e-9) * 1e3


def run_headline(
    preset: str = "minilm-l6",
    ftype: str = "q4_0",
    dtype: str = "bfloat16",
    n_sentences: int = 2758,
    repeats: int = 8,
    length_profile: str = "stsb",
    packing: str = "auto",
):
    """The scoreboard run: ONE interleaved measurement of the best shipping
    transfer mode (packed int8 — the serving default) AND the reference-
    compatible f32 mode, plus the measured int8-vs-f32 cosine agreement, all
    in one JSON line.  Interleaving within a single run is mandatory: relay
    throughput drifts ~2x minute-to-minute (CLAUDE.md), so two sequential
    runs cannot be compared honestly.

    The headline `value` is the int8 figure because that is what the server
    ships by default; f32 (the reference's wire dtype, bert.h:46) rides
    alongside with its own vs_baseline."""
    import jax

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    config = PRESETS[preset]
    engines = {
        od: Engine.synthetic(
            config, ftype=ftype,
            opts=ComputeOptions(dtype=dtype, q4_impl="auto", output_dtype=od),
            packing=packing,
        )
        for od in ("float32", "int8")
    }
    texts = synthetic_sentences(n_sentences, profile=length_profile)
    token_lists = engines["float32"].tokenize_batch(texts)
    n_tokens = sum(len(t) for t in token_lists)

    outs = {}
    for od, eng in engines.items():  # compile + cosine inputs
        outs[od] = eng.embed_tokens(token_lists)
    # int8 transfer fidelity: embeddings are unit vectors, so the dot IS the
    # cosine; report the worst and mean agreement over the whole corpus
    cos = np.sum(outs["float32"] * outs["int8"], axis=-1)
    best = {od: float("inf") for od in engines}
    for _ in range(repeats):
        for od, eng in engines.items():  # interleave
            t0 = time.perf_counter()
            eng.embed_tokens(token_lists)
            best[od] = min(best[od], time.perf_counter() - t0)
    sps = {od: n_sentences / t for od, t in best.items()}
    baseline = BASELINES.get(preset, BASELINE_SENTENCES_PER_SEC)
    print(
        f"# {preset} {ftype} {dtype}: {n_sentences} sentences "
        f"({n_tokens} tokens) interleaved on "
        f"{jax.devices()[0].platform}: int8 {sps['int8']:.0f}/s, "
        f"f32 {sps['float32']:.0f}/s; int8 cosine vs f32 "
        f"mean {float(cos.mean()):.6f} min {float(cos.min()):.6f}",
        file=sys.stderr,
    )
    suffix = "" if length_profile == "stsb" else f"_{length_profile}"
    result = {
        "metric": f"sentences_per_sec_chip_{preset.replace('-', '_')}_{ftype}{suffix}",
        "value": round(sps["int8"], 1),
        "unit": "sentences/s",
        "vs_baseline": round(sps["int8"] / baseline, 2),
        "transfer": "int8_packed (serving default)",
        "f32_sentences_per_sec": round(sps["float32"], 1),
        "f32_vs_baseline": round(sps["float32"] / baseline, 2),
        "int8_cosine_vs_f32_mean": round(float(cos.mean()), 6),
        "int8_cosine_vs_f32_min": round(float(cos.min()), 6),
    }
    if jax.devices()[0].platform == "tpu":
        # relay-drift-proof compute metrics (see _in_device_forward_ms):
        # THESE are the authoritative round-over-round numbers; sentences/s
        # above rides the relay's 2x drift.  Plain [32,512] tracks the r3/r4
        # breakdown artifacts; packed is the geometry the engine serves.
        plain_ms = _in_device_forward_ms(preset, ftype)
        packed_ms = _in_device_forward_ms(preset, ftype, packed=True)
        result["forward_ms_in_device_b32_s512"] = round(plain_ms, 3)
        result["packed_forward_ms_in_device_b32_s512"] = round(packed_ms, 3)
        print(
            f"# in-device forward (authoritative round-over-round): plain "
            f"{plain_ms:.3f} ms/batch, packed {packed_ms:.3f} ms/batch",
            file=sys.stderr,
        )
    return result


def run_ab_transfer(
    preset: str = "minilm-l6",
    ftype: str = "q4_0",
    dtype: str = "bfloat16",
    n_sentences: int = 2758,
    repeats: int = 5,
    length_profile: str = "stsb",
    packing: str = "auto",
    output_dtypes=("float32", "float16", "int8"),
):
    """Interleaved A/B of embedding transfer dtypes within ONE run (relay
    throughput drifts ~2x minute-to-minute — CLAUDE.md — so sequential runs
    cannot be compared; round-robin timing can)."""
    import jax

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    config = PRESETS[preset]
    engines = {
        od: Engine.synthetic(
            config, ftype=ftype,
            opts=ComputeOptions(dtype=dtype, q4_impl="auto", output_dtype=od),
            packing=packing,
        )
        for od in output_dtypes
    }
    texts = synthetic_sentences(n_sentences, profile=length_profile)
    token_lists = engines[output_dtypes[0]].tokenize_batch(texts)

    best = {od: float("inf") for od in output_dtypes}
    for eng in engines.values():  # compile
        eng.embed_tokens(token_lists)
    for _ in range(repeats):
        for od, eng in engines.items():  # interleave
            t0 = time.perf_counter()
            eng.embed_tokens(token_lists)
            best[od] = min(best[od], time.perf_counter() - t0)
    results = {od: round(n_sentences / t, 1) for od, t in best.items()}
    for od, sps in results.items():
        print(f"# transfer {od}: {sps} sentences/s "
              f"({results[od] / results['float32']:.2f}x vs f32)",
              file=sys.stderr)
    return {
        "metric": f"transfer_ab_{preset.replace('-', '_')}_{ftype}",
        "value": results.get("int8", 0.0),
        "unit": "sentences/s",
        "vs_baseline": round(
            results.get("int8", 0.0) / BASELINES.get(preset, 506.0), 2
        ),
        "platform": jax.devices()[0].platform,
        "per_output_dtype": results,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="minilm-l6")
    p.add_argument("--ftype", default="q4_0")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--q4-impl", default="auto", choices=["auto", "xla", "pallas"])
    p.add_argument("--sentences", type=int, default=2758)
    # relay throughput drifts ~2x minute-to-minute (CLAUDE.md); more repeats
    # make the min-of-N robust to a noisy window
    p.add_argument("--repeats", type=int, default=8)
    p.add_argument("--length-profile", default="stsb", choices=sorted(LENGTH_PROFILES))
    p.add_argument("--packing", default="auto", choices=["auto", "always", "never"])
    p.add_argument("--output-dtype", default=None,
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="force ONE embedding transfer dtype (default: the "
                        "headline run measures packed int8 — the serving "
                        "default — and f32 interleaved, with the cosine "
                        "agreement, in one JSON line)")
    p.add_argument("--ab-transfer", action="store_true",
                   help="interleaved A/B of f32/f16/int8 embedding transfer "
                        "within one run (immune to relay drift)")
    args = p.parse_args()
    print(
        "# NOTE: synthetic random weights (zero-egress env) — throughput is "
        "real, MTEB score parity is pinned but unverified here; run "
        "`make validate-real` on a networked host (README)",
        file=sys.stderr,
    )
    if args.ab_transfer:
        result = run_ab_transfer(
            args.preset, args.ftype, args.dtype,
            args.sentences, args.repeats, length_profile=args.length_profile,
            packing=args.packing,
        )
    elif args.output_dtype is None and args.q4_impl == "auto":
        result = run_headline(
            args.preset, args.ftype, args.dtype,
            args.sentences, args.repeats, length_profile=args.length_profile,
            packing=args.packing,
        )
    else:
        result = run_bench(
            args.preset, args.ftype, args.dtype, args.q4_impl,
            args.sentences, args.repeats, length_profile=args.length_profile,
            packing=args.packing, output_dtype=args.output_dtype or "float32",
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
