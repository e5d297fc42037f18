"""Packed-attention layout A/B: projection-layout (BSE) kernel vs the
transposed [B,H,S,d] kernel, at the geometry the engine actually serves.

Packing is the engine's DEFAULT path for short sentences (engine.py
packing="auto", DEFAULT_PACK_SEQ=512) — the r4 BSE win (-31% full forward,
q4_forward_breakdown.md) only covered plain batches.  This records whether
carrying the lane-slice layout to the segment-masked kernel pays on the
serving shape, interleaved within one run (relay drift is ~2x minute to
minute, CLAUDE.md).

    python benchmarks/packed_bse_ab.py            # on the TPU
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kernels import _dispatch_floor, _sync, _timed  # noqa: E402


def _serving_segments(rng, b: int, s: int, mean_len: float = 12.6):
    """Packed rows with the headline-corpus sentence-length profile
    (~12.6 tokens/sentence, geometric-ish spread), seg=-1 padded tail."""
    seg = np.full((b, s), -1, np.int32)
    pos = np.zeros((b, s), np.int32)
    for i in range(b):
        c, g = 0, 0
        while True:
            l = int(np.clip(rng.geometric(1.0 / mean_len), 3, 64))
            if c + l > s:
                break
            seg[i, c:c + l] = g
            pos[i, c:c + l] = np.arange(l)
            c += l
            g += 1
    return seg, pos


def bench_kernel_ab(b: int = 32, s: int = 512, h: int = 12, d: int = 32,
                    iters: int = 50) -> dict:
    """Chained in-device loops over BOTH kernels, interleaved; the carry is
    the FULL [B, S, E] output (no DCE escape hatch, CLAUDE.md).  The old
    variant includes its [B,S,H,d]<->[B,H,S,d] transposes — that is how the
    model invokes it, and the transposes are the cost under test."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import (
        flash_attention_packed,
        flash_attention_packed_bse,
    )

    rng = np.random.default_rng(0)
    e = h * d
    q = jnp.asarray(rng.normal(size=(b, s, e)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, e)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, e)), dtype=jnp.bfloat16)
    seg_np, _ = _serving_segments(rng, b, s)
    seg = jnp.asarray(seg_np)
    flops = 4 * b * h * s * s * d

    def old(qq, k, v, seg):
        qt = qq.reshape(b, s, h, d)
        out = flash_attention_packed(
            qt, k.reshape(b, s, h, d), v.reshape(b, s, h, d), seg
        )
        return out.reshape(b, s, e)

    def new(qq, k, v, seg):
        return flash_attention_packed_bse(qq, k, v, seg, h)

    # parity first (real TPU: Mosaic dots round like each other; the two
    # kernels share the masked-softmax order so valid rows must match)
    a = np.asarray(old(q, k, v, seg)).astype(np.float32)
    bb = np.asarray(new(q, k, v, seg)).astype(np.float32)
    valid = seg_np >= 0
    max_err = float(np.max(np.abs(a[valid] - bb[valid])))

    out = {"max_err_valid": max_err}
    times: dict[str, list] = {"bhsd": [], "bse": []}
    loops = {}
    for name, f in (("bhsd", old), ("bse", new)):
        @jax.jit
        def loop(q, k, v, seg, f=f):
            def body(i, qq):
                return f(qq, k, v, seg).astype(qq.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
            )

        _sync(loop(q, k, v, seg))  # compile
        loops[name] = loop
    for _ in range(3):  # interleave rounds
        for name, loop in loops.items():
            times[name].append(_timed(lambda: _sync(loop(q, k, v, seg))))
    for name in loops:
        per = max((min(times[name]) - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1),
                     "tflops": round(flops / per / 1e12, 2)}
    return out


def bench_forward_ab(b: int = 32, s: int = 512, iters: int = 20,
                     preset: str = "minilm-l6") -> dict:
    """FULL q4_0 packed forward, new route (packed BSE kernel) vs old
    (transposed packed kernel), interleaved.  The old route is restored by
    forcing the dispatch gate off — same graph otherwise."""
    import jax
    import jax.numpy as jnp

    import embedding_cpp_tpu.ops.attention as attn_mod
    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import ComputeOptions, random_params
    from embedding_cpp_tpu.models.bert import bert_embed_packed

    config = PRESETS[preset]
    params = random_params(config, GGUFFileType.MOSTLY_Q4_0, seed=0,
                           dense_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    seg_np, pos_np = _serving_segments(rng, b, s)
    ids_np = rng.integers(1, config.n_vocab, size=(b, s)).astype(np.int32)
    ids_np[seg_np < 0] = 0
    ids = jnp.asarray(ids_np)
    seg = jnp.asarray(seg_np)
    pos = jnp.asarray(pos_np)
    n_seg = 64
    opts = ComputeOptions(dtype="bfloat16")
    n_sent = int(sum(seg_np[i].max() + 1 for i in range(b)))
    n_tokens = int((seg_np >= 0).sum())

    real_gate = attn_mod.packed_bse_applies
    out = {"sentences_per_row": n_sent / b, "real_tokens": n_tokens}
    loops = {}
    try:
        for name, gate in (("bse", real_gate),
                           ("bhsd", lambda *a: False)):
            attn_mod.packed_bse_applies = gate

            @jax.jit
            def loop(params, ids, seg, pos):
                def body(i, carry):
                    ids_i = ids + (carry > 1e30).astype(jnp.int32)
                    y = bert_embed_packed(params, ids_i, seg, pos, config,
                                          opts, n_seg=n_seg)
                    return carry + jnp.sum(y.astype(jnp.float32))

                return jax.lax.fori_loop(0, iters, body, 0.0)

            _sync(loop(params, ids, seg, pos))  # compile (gate reads at trace)
            loops[name] = loop
    finally:
        attn_mod.packed_bse_applies = real_gate

    times: dict[str, list] = {n: [] for n in loops}
    for _ in range(3):
        for name, loop in loops.items():
            times[name].append(
                _timed(lambda: _sync(loop(params, ids, seg, pos)))
            )
    for name in loops:
        per = max((min(times[name]) - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"ms": round(per * 1e3, 3),
                     "sentences_per_sec": round(n_sent / per)}
    return out


def bench_bias_forward_ab(b: int = 32, s: int = 512, iters: int = 10,
                          preset: str = "mpnet-base") -> dict:
    """FULL packed forward for the bias families (MPNet/T5), three variants
    interleaved:

    - ``bse``:           resident-bias + in-kernel segment mask kernel
                         (flash_attention_bias_packed_bse) — the new route;
    - ``xla_toeplitz``:  XLA einsum with the batch-invariant [H, S, S] bias
                         (the new bias formulation, kernel gated off);
    - ``xla_per_row``:   XLA einsum with the naive [B, H, S, S] per-row bias
                         — byte-for-byte the r4 production path, kept on
                         record as the baseline this change replaces.
    """
    import jax
    import jax.numpy as jnp

    import embedding_cpp_tpu.models.bert as bert_mod
    import embedding_cpp_tpu.ops.attention as attn_mod
    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import ComputeOptions, random_params
    from embedding_cpp_tpu.models.bert import bert_embed_packed

    config = PRESETS[preset]
    params = random_params(config, GGUFFileType.MOSTLY_Q4_0, seed=0,
                           dense_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    seg_np, pos_np = _serving_segments(rng, b, s)
    ids_np = rng.integers(1, config.n_vocab, size=(b, s)).astype(np.int32)
    ids_np[seg_np < 0] = 0
    ids, seg, pos = (jnp.asarray(a) for a in (ids_np, seg_np, pos_np))
    opts = ComputeOptions(dtype="bfloat16")
    n_sent = int(sum(seg_np[i].max() + 1 for i in range(b)))

    real_gate = attn_mod.packed_bse_applies
    real_bias = bert_mod._rel_attn_bias
    jpos = jnp.asarray(pos_np)

    def per_row_bias(table, s_, max_distance=128):
        return bert_mod._rel_attn_bias_packed(table, jpos,
                                              max_distance=max_distance)

    variants = {
        "bse": (real_gate, real_bias),
        "xla_toeplitz": (lambda *a: False, real_bias),
        "xla_per_row": (lambda *a: False, per_row_bias),
    }
    out = {"sentences_per_row": n_sent / b}
    loops = {}
    try:
        for name, (gate, bias_fn) in variants.items():
            attn_mod.packed_bse_applies = gate
            bert_mod._rel_attn_bias = bias_fn

            @jax.jit
            def loop(params, ids, seg, pos):
                def body(i, carry):
                    ids_i = ids + (carry > 1e30).astype(jnp.int32)
                    y = bert_embed_packed(params, ids_i, seg, pos, config,
                                          opts, n_seg=64)
                    return carry + jnp.sum(y.astype(jnp.float32))

                return jax.lax.fori_loop(0, iters, body, 0.0)

            _sync(loop(params, ids, seg, pos))  # compile at trace-time gate
            loops[name] = loop
    finally:
        attn_mod.packed_bse_applies = real_gate
        bert_mod._rel_attn_bias = real_bias

    times: dict[str, list] = {n: [] for n in loops}
    for _ in range(3):
        for name, loop in loops.items():
            times[name].append(
                _timed(lambda: _sync(loop(params, ids, seg, pos)))
            )
    for name in loops:
        per = max((min(times[name]) - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"ms": round(per * 1e3, 3),
                     "sentences_per_sec": round(n_sent / per)}
    return out


def main() -> None:
    import jax

    results = {"platform": jax.devices()[0].platform}
    r = bench_kernel_ab()
    results["packed_kernel_b32_s512_minilm_geom"] = r
    print(f"packed kernel A/B (B=32 S=512 h=12 d=32): "
          f"bse {r['bse']['us']}us | bhsd {r['bhsd']['us']}us | "
          f"max_err {r['max_err_valid']:.2e}", file=sys.stderr)
    r = bench_forward_ab()
    results["q4_forward_packed_b32_s512"] = r
    print(f"q4_0 packed forward A/B (B=32 S=512): "
          f"bse {r['bse']['ms']}ms | bhsd {r['bhsd']['ms']}ms", file=sys.stderr)
    r = bench_forward_ab(preset="nomic-embed-text")
    results["nomic_forward_packed_b32_s512"] = r
    print(f"nomic packed forward A/B (B=32 S=512): "
          f"bse {r['bse']['ms']}ms | bhsd {r['bhsd']['ms']}ms",
          file=sys.stderr)
    for preset in ("mpnet-base", "gtr-base"):
        r = bench_bias_forward_ab(preset=preset)
        results[f"{preset}_forward_packed_b32_s512"] = r
        print(f"{preset} packed forward A/B (B=32 S=512): "
              f"bse {r['bse']['ms']}ms | xla_toeplitz "
              f"{r['xla_toeplitz']['ms']}ms | xla_per_row (r4) "
              f"{r['xla_per_row']['ms']}ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
