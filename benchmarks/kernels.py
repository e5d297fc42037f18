"""Kernel microbenchmarks: fused Q4 matmul and fused attention vs XLA.

Methodology (important on relay-attached TPUs): dispatch N chained
iterations inside one jit (true data dependency between iterations), sync by
fetching a scalar to host, subtract the per-call dispatch floor, divide by N.
`block_until_ready` alone does NOT wait under remote-relay backends.

    python benchmarks/kernels.py            # on the TPU
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Per-call dispatch+fetch floor, MEASURED at import of the first bench (a
# trivial jit round trip): ~23 ms under the axon relay, ~100 us on a
# locally-attached TPU.  A hardcoded relay constant would inflate every
# local-TPU number by the full RTT.
DISPATCH_FLOOR_S: float | None = None


def _dispatch_floor() -> float:
    global DISPATCH_FLOOR_S
    if DISPATCH_FLOOR_S is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        float(np.asarray(f(jnp.float32(0.0))))  # compile
        DISPATCH_FLOOR_S = min(
            _timed(lambda: float(np.asarray(f(jnp.float32(i)))))
            for i in range(5)
        )
        print(f"# dispatch floor: {DISPATCH_FLOOR_S * 1e3:.1f} ms",
              file=sys.stderr)
    return DISPATCH_FLOOR_S


def _sync(y) -> float:
    return float(np.asarray(y))


def _make_ffn_pair(m: int, e: int, f: int, weight_scale: float,
                   qtype: str = "q4_0"):
    import jax.numpy as jnp

    from embedding_cpp_tpu.gguf import GGMLType
    from embedding_cpp_tpu.gguf.quant import quantize_q4_0, quantize_q8_0
    from embedding_cpp_tpu.ops.qtensor import pack_q4_matmul, pack_q8_matmul

    rng = np.random.default_rng(0)
    w_up = (rng.normal(size=(f, e)) * weight_scale).astype(np.float32)
    w_dn = (rng.normal(size=(e, f)) * weight_scale).astype(np.float32)
    if qtype == "q8_0":
        q_up = pack_q8_matmul(quantize_q8_0(w_up), (f, e))
        q_dn = pack_q8_matmul(quantize_q8_0(w_dn), (e, f))
    else:
        q_up = pack_q4_matmul(quantize_q4_0(w_up), (f, e), GGMLType.Q4_0)
        q_dn = pack_q4_matmul(quantize_q4_0(w_dn), (e, f), GGMLType.Q4_0)
    x0 = jnp.asarray(rng.normal(size=(m, e)), dtype=jnp.bfloat16)
    return q_up, q_dn, x0


def _bench_pair(q_up, q_dn, x0, up_impl: str, dn_impl: str, iters: int,
                epilogue: bool) -> float:
    """Best-of time per FFN-pair iteration for the chosen impl combo.
    With epilogue=True a `* 1e-3` elementwise sits between the matmuls —
    XLA fuses it into its matmul, a pallas_call cannot absorb it."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.q4_matmul import q4_matmul
    from embedding_cpp_tpu.ops.qtensor import Q4Tensor, dequantize

    def mm(x, t, impl):
        if impl == "pallas":
            return q4_matmul(x, t)  # already x.dtype out
        return jnp.matmul(
            x, dequantize(t, dtype=x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)

    @jax.jit
    def loop(x, a_qs, a_s, b_qs, b_s):
        ta = Q4Tensor(qs=a_qs, scales=a_s, mins=None, shape=q_up.shape,
                      qtype=q_up.qtype)
        tb = Q4Tensor(qs=b_qs, scales=b_s, mins=None, shape=q_dn.shape,
                      qtype=q_dn.qtype)

        def body(i, x):
            h = mm(x, ta, up_impl)
            if epilogue:
                h = (h * 1e-3).astype(x.dtype)
            y = mm(h, tb, dn_impl)
            if epilogue:
                y = (y * 1e-3).astype(x.dtype)
            return y

        return jnp.sum(
            jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32)
        )

    args = (x0, q_up.qs, q_up.scales, q_dn.qs, q_dn.scales)
    _sync(loop(*args))
    best = min(_timed(lambda: _sync(loop(*args))) for _ in range(3))
    return max((best - _dispatch_floor()) / iters, 1e-9)


def bench_q4_ffn(m: int, e: int = 384, f: int = 1536, iters: int = 300) -> dict:
    """Pure fused-dequant matmul throughput: the FFN pair chained with NO
    elementwise between matmuls (weights pre-scaled so activations stay
    finite).  Measures the dot + dequant, not epilogue fusion — see
    bench_q4_epilogue for that."""
    q_up, q_dn, x0 = _make_ffn_pair(m, e, f, weight_scale=2e-2)
    flops = 2 * m * e * f * 2
    out = {}
    for impl in ("pallas", "xla"):
        per = _bench_pair(q_up, q_dn, x0, impl, impl, iters, epilogue=False)
        out[impl] = {"us": round(per * 1e6, 1),
                     "tflops": round(flops / per / 1e12, 1)}
    return out


def bench_q4_epilogue(m: int, e: int = 384, f: int = 1536,
                      iters: int = 100) -> dict:
    """Epilogue-fusion control (benchmarks/results/q4_kernel_analysis.md):
    the same pair with a `* 1e-3` cast between the matmuls.  XLA absorbs the
    elementwise into its matmul epilogue; after a pallas_call it becomes a
    separate full-array HBM pass — this, not the Mosaic dot, was the r1
    "pallas loses at M=32k" gap.  Mixed combos isolate per-matmul cost."""
    q_up, q_dn, x0 = _make_ffn_pair(m, e, f, weight_scale=1.0)
    flops = 2 * m * e * f * 2
    out = {}
    for up, dn in (("pallas", "pallas"), ("pallas", "xla"),
                   ("xla", "pallas"), ("xla", "xla")):
        per = _bench_pair(q_up, q_dn, x0, up, dn, iters, epilogue=True)
        out[f"{up[0]}{dn[0]}"] = {"us": round(per * 1e6, 1),
                                  "tflops": round(flops / per / 1e12, 1)}
    return out


def bench_q4_fused_epilogue(m: int, e: int = 384, f: int = 1536,
                            iters: int = 100, qtype: str = "q4_0") -> dict:
    """The production FFN pattern with its real epilogues:
    y = (gelu(x @ W_up + b_up)) @ W_dn + b_dn.  XLA fuses bias+GELU into its
    matmuls; the Pallas kernel now computes them in its own epilogue
    (ops/q4_matmul.py _epilogue) — this measures whether the r2 fusion
    asymmetry (q4_kernel_analysis.md) is closed.  qtype="q8_0" runs the same
    pattern on int8 codes (the Q8 branch of the same kernel)."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.q4_matmul import q4_matmul
    from embedding_cpp_tpu.ops.qtensor import Q4Tensor, dequantize

    q_up, q_dn, x0 = _make_ffn_pair(m, e, f, weight_scale=2e-2, qtype=qtype)
    rng = np.random.default_rng(7)
    b_up = jnp.asarray(rng.normal(size=(f,)) * 1e-2, dtype=jnp.float32)
    b_dn = jnp.asarray(rng.normal(size=(e,)) * 1e-2, dtype=jnp.float32)
    flops = 2 * m * e * f * 2

    def make_loop(impl):
        @jax.jit
        def loop(x, a_qs, a_s, b_qs, b_s):
            ta = Q4Tensor(qs=a_qs, scales=a_s, mins=None, shape=q_up.shape,
                          qtype=q_up.qtype)
            tb = Q4Tensor(qs=b_qs, scales=b_s, mins=None, shape=q_dn.shape,
                          qtype=q_dn.qtype)

            def body(i, x):
                if impl == "pallas":
                    h = q4_matmul(x, ta, bias=b_up, activation="gelu_erf")
                    y = q4_matmul(h, tb, bias=b_dn)
                else:
                    h = jax.nn.gelu(
                        jnp.matmul(x, dequantize(ta, dtype=x.dtype),
                                   preferred_element_type=jnp.float32)
                        + b_up, approximate=False).astype(x.dtype)
                    y = (jnp.matmul(h, dequantize(tb, dtype=x.dtype),
                                    preferred_element_type=jnp.float32)
                         + b_dn).astype(x.dtype)
                return y

            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32)
            )
        return loop

    args = (x0, q_up.qs, q_up.scales, q_dn.qs, q_dn.scales)
    out = {}
    for impl in ("pallas", "xla"):
        loop = make_loop(impl)
        _sync(loop(*args))
        best = min(_timed(lambda: _sync(loop(*args))) for _ in range(3))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[impl] = {"us": round(per * 1e6, 1),
                     "tflops": round(flops / per / 1e12, 1)}
    return out


def bench_attention_headpack(b: int = 32, s: int = 512, h: int = 12,
                             d: int = 32, hb: int = 4,
                             iters: int = 50) -> dict:
    """MXU-occupancy experiment (VERDICT r2 weak #5): pack `hb` heads into
    ONE dot per stage via block-diagonal K/V so the contraction runs at
    hb*d = 128 lanes instead of d = 32.

    Pass-count analysis says this CANNOT win on MXU cycles: a [TQ, 32]x
    [32, S] dot costs ceil(32/128)=1 weight-row pass per [128-lane] output
    tile, so 4 heads cost 4*(S/128) passes; the packed [TQ, 128]x[128, 4S]
    dot costs 1*(4S/128) = the same — zero-padding the contraction to 128
    is implicit either way, and the block-diagonal zeros still occupy MXU
    rows.  The experiment exists to confirm that empirically (plus the
    scratch-construction overhead it adds).  See
    benchmarks/results/attention_occupancy.md.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from embedding_cpp_tpu.ops.attention import _flash_attention

    scale = 1.0 / (d**0.5)

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, kbd, vbd):
        bias = bias_ref[0, 0]
        kbd[:] = jnp.zeros_like(kbd)
        vbd[:] = jnp.zeros_like(vbd)
        for hh in range(hb):
            kbd[pl.ds(hh * s, s), hh * d:(hh + 1) * d] = k_ref[0, hh]
            vbd[pl.ds(hh * s, s), hh * d:(hh + 1) * d] = v_ref[0, hh]
        qcat = jnp.concatenate(
            [q_ref[0, hh] for hh in range(hb)], axis=1
        )  # [TQ, hb*d]
        scores = jax.lax.dot_general(  # ONE dot, contraction hb*d = 128
            qcat, kbd[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, hb*S]
        parts = []
        for hh in range(hb):  # per-head softmax (VPU work, unchanged)
            sc = scores[:, hh * s:(hh + 1) * s] * scale + bias[None, :]
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            parts.append(e / jnp.sum(e, axis=-1, keepdims=True))
        pcat = jnp.concatenate(parts, axis=1).astype(v_ref.dtype)  # [TQ,hb*S]
        out = jnp.dot(  # ONE PV dot, contraction hb*S, lanes hb*d = 128
            pcat, vbd[:], preferred_element_type=jnp.float32
        )  # [TQ, hb*d]
        for hh in range(hb):
            o_ref[0, hh] = out[:, hh * d:(hh + 1) * d].astype(o_ref.dtype)

    @jax.jit
    def packed(q, k, v, bias):
        grid = (b, h // hb)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, s, d), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, s, d), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, s, d), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, s, d), lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((hb * s, hb * d), q.dtype),
                            pltpu.VMEM((hb * s, hb * d), q.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=jax.devices()[0].platform != "tpu",
        )(q, k, v, bias[:, None, :])

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype=jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    flops = 4 * b * h * s * s * d

    # correctness vs the production kernel first
    ref = np.asarray(_flash_attention(q, k, v, bias, tq=s, hb=h)
                     ).astype(np.float32)
    got = np.asarray(packed(q, k, v, bias)).astype(np.float32)
    max_err = float(np.max(np.abs(got - ref)))

    def chain(fn):
        @jax.jit
        def loop(q, k, v, bias):
            def body(i, qq):
                return fn(qq, k, v, bias).astype(qq.dtype)
            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
            )
        _sync(loop(q, k, v, bias))
        best = min(_timed(lambda: _sync(loop(q, k, v, bias)))
                   for _ in range(3))
        return max((best - _dispatch_floor()) / iters, 1e-9)

    out = {}
    per = chain(packed)
    out["headpack"] = {"us": round(per * 1e6, 1),
                       "tflops": round(flops / per / 1e12, 1)}
    per = chain(functools.partial(_flash_attention, tq=s, hb=h))
    out["per_head"] = {"us": round(per * 1e6, 1),
                       "tflops": round(flops / per / 1e12, 1)}
    out["max_err_vs_per_head"] = round(max_err, 5)
    return out


def bench_attention(b: int = 32, s: int = 512, h: int = 12, d: int = 32,
                    iters: int = 50) -> dict:
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    bias_np = np.zeros((b, s), np.float32)
    bias_np[:, (s * 3) // 4:] = -1e9
    bias = jnp.asarray(bias_np)
    flops = 4 * b * h * s * s * d

    def xla_attn(q, k, v, bias):
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        sc = sc * (1.0 / d**0.5) + bias[:, None, None, :]
        p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    out = {}
    for name, f in (("pallas", flash_attention), ("xla", xla_attn)):
        @jax.jit
        def loop(q, k, v, bias):
            def body(i, acc):
                o = f(q + (acc * 1e-20).astype(q.dtype), k, v, bias)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        _sync(loop(q, k, v, bias))
        best = min(_timed(lambda: _sync(loop(q, k, v, bias))) for _ in range(2))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1), "tflops": round(flops / per / 1e12, 2)}
    return out


def bench_forward_attn_impl(b: int = 32, s: int = 512, iters: int = 20,
                            preset: str = "mpnet-base") -> dict:
    """FULL MPNet forward chained in-device: attn_impl='pallas' (fused
    position-bias attention kernel) vs 'xla' (einsum + materialized
    [B, H, S, S] scores).  The family-level analog of
    bench_forward_q4_impl — decides whether the bias kernel carries the
    auto default for MPNet plain batches."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models import (
        ComputeOptions, bert_embed_batch, random_params,
    )

    config = PRESETS[preset]
    params = random_params(config, seed=0, dense_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, config.n_vocab, size=(b, s)), dtype=jnp.int32
    )
    mask = jnp.ones((b, s), jnp.int32)
    n_tokens = b * s

    out = {}
    for impl in ("pallas", "xla"):
        opts = ComputeOptions(dtype="bfloat16", attn_impl=impl)

        @jax.jit
        def loop(params, ids, mask):
            def body(i, carry):
                # fake data dependency so XLA cannot hoist the
                # loop-invariant forward out of the fori_loop
                ids_i = ids + (carry > 1e30).astype(jnp.int32)
                y = bert_embed_batch(params, ids_i, mask, config, opts)
                return carry + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        args = (params, ids, mask)
        _sync(loop(*args))
        best = min(_timed(lambda: _sync(loop(*args))) for _ in range(3))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[impl] = {"ms": round(per * 1e3, 3),
                     "tokens_per_sec": round(n_tokens / per)}
    return out


def bench_attention_bias(b: int = 32, s: int = 512, h: int = 12, d: int = 64,
                         iters: int = 50) -> dict:
    """Additive [H, S, S] position-bias attention (MPNet relative attention,
    all-mpnet-base-v2 shapes): fused bias kernel (batch-innermost grid, bias
    DMA'd once per (head, q-tile)) vs the XLA einsum path."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    bias_np = np.zeros((b, s), np.float32)
    bias_np[:, (s * 3) // 4:] = -1e9
    bias = jnp.asarray(bias_np)
    pos_bias = jnp.asarray(rng.normal(size=(h, s, s)).astype(np.float32))
    flops = 4 * b * h * s * s * d

    def xla_attn(q, k, v, bias):
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
        sc = sc * (1.0 / d**0.5) + bias[:, None, None, :] + pos_bias
        p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def pallas_attn(q, k, v, bias):
        return flash_attention(q, k, v, bias, pos_bias=pos_bias)

    out = {}
    for name, f in (("pallas", pallas_attn), ("xla", xla_attn)):
        # full output fed back as the next q: no column-slicing/DCE escape
        # hatch for XLA (see CLAUDE.md chained-loop traps)
        @jax.jit
        def loop(q, k, v, bias):
            def body(i, qq):
                return f(qq, k, v, bias).astype(qq.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
            )

        _sync(loop(q, k, v, bias))
        best = min(_timed(lambda: _sync(loop(q, k, v, bias))) for _ in range(2))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1),
                     "tflops": round(flops / per / 1e12, 2)}
    return out


def bench_deberta_attention(b: int = 16, s: int = 512, h: int = 12,
                            d: int = 64, span: int = 256,
                            iters: int = 30) -> dict:
    """Disentangled attention at deberta-v3-base geometry: fused kernel
    (skewed matmuls + barrel-shift diagonal alignment, everything in VMEM)
    vs the XLA path (materialized [B, H, S, S]-class score + c2p + p2c
    tensors in HBM)."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.models.deberta import (
        _gather_indices, deberta_log_bucket,
    )
    from embedding_cpp_tpu.ops.deberta_attention import disentangled_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    pos_k = jnp.asarray(rng.normal(size=(2 * span, h, d)), dtype=jnp.bfloat16)
    pos_q = jnp.asarray(rng.normal(size=(2 * span, h, d)), dtype=jnp.bfloat16)
    bias_np = np.zeros((b, s), np.float32)
    bias_np[:, (s * 3) // 4:] = -1e9
    bias = jnp.asarray(bias_np)
    max_dist = 2 * span
    # qk + pv dots plus the two delta-table dots ([S, 2S] each)
    flops = b * h * s * d * (4 * s + 4 * 2 * s)

    rel = deberta_log_bucket(
        np.arange(s)[:, None] - np.arange(s)[None, :], span, max_dist, xp=np
    )
    c2p_pos, p2c_pos = _gather_indices(rel, span, xp=np)
    c2p_pos, p2c_pos = jnp.asarray(c2p_pos), jnp.asarray(p2c_pos)
    scale = 1.0 / float(np.sqrt(d * 3))

    def xla_attn(q, k, v, bias):
        # the exact einsum/gather sequence of models/deberta.py _attention
        qt, kt = q, k
        scores = jnp.einsum("bqhd,bkhd->bhqk", qt, kt,
                            preferred_element_type=jnp.float32) * scale
        c2p = jnp.einsum("bqhd,rhd->bhqr", qt, pos_k,
                         preferred_element_type=jnp.float32)
        scores = scores + jnp.take_along_axis(
            c2p, c2p_pos[None, None], axis=-1
        ) * scale
        p2c = jnp.einsum("bkhd,rhd->bhkr", kt, pos_q,
                         preferred_element_type=jnp.float32)
        gathered = jnp.take_along_axis(p2c, p2c_pos[None, None], axis=-1)
        scores = scores + jnp.swapaxes(gathered, -1, -2) * scale
        scores = scores + bias[:, None, None, :]
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    def pallas_attn(q, k, v, bias):
        return disentangled_attention(q, k, v, bias, pos_k, pos_q, span,
                                      max_dist)

    out = {}
    for name, f in (("pallas", pallas_attn), ("xla", xla_attn)):
        # full output fed back as the next q: no column-slicing/DCE escape
        # hatch for XLA (see CLAUDE.md chained-loop traps)
        @jax.jit
        def loop(q, k, v, bias):
            def body(i, qq):
                return f(qq, k, v, bias).astype(qq.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, q).astype(jnp.float32)
            )

        _sync(loop(q, k, v, bias))
        best = min(_timed(lambda: _sync(loop(q, k, v, bias))) for _ in range(2))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1),
                     "tflops": round(flops / per / 1e12, 2)}
    return out


def bench_packed_attention(b: int = 64, s: int = 512, h: int = 12, d: int = 32,
                           seg_len: int = 16, iters: int = 50) -> dict:
    """Segment-masked (sequence-packed) attention: pallas kernel vs the XLA
    einsum path with a materialized [B, S, S] block-diagonal bias."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import flash_attention_packed

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    seg = jnp.asarray(
        np.repeat(np.arange(s // seg_len), seg_len)[None, :].repeat(b, 0)
        .astype(np.int32)
    )
    flops = 4 * b * h * s * s * d

    def xla_attn(q, k, v, seg):
        allowed = seg[:, :, None] == seg[:, None, :]
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)
        sc = sc * (1.0 / d**0.5) + bias[:, None, :, :]
        p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    out = {}
    for name, f in (("pallas", flash_attention_packed), ("xla", xla_attn)):
        @jax.jit
        def loop(q, k, v, seg):
            def body(i, acc):
                o = f(q + (acc * 1e-20).astype(q.dtype), k, v, seg)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        _sync(loop(q, k, v, seg))
        best = min(_timed(lambda: _sync(loop(q, k, v, seg))) for _ in range(2))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1), "tflops": round(flops / per / 1e12, 2)}
    return out


def bench_windowed_attention(b: int = 8, s: int = 2048, h: int = 12,
                             d: int = 32, seg_len: int = 64,
                             iters: int = 20) -> dict:
    """Long packed rows (S >= 1024): the windowed kernel's score tiles are
    [TQ, wmax] instead of [TQ, S] — attention cost tracks the max segment
    length, not S^2."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import flash_attention_packed

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
    seg = jnp.asarray(
        np.repeat(np.arange(s // seg_len), seg_len)[None, :].repeat(b, 0)
        .astype(np.int32)
    )

    out = {}
    for name, msl in (("windowed", seg_len), ("full", None)):
        @jax.jit
        def loop(q, k, v, seg):
            def body(i, acc):
                o = flash_attention_packed(
                    q + (acc * 1e-20).astype(q.dtype), k, v, seg,
                    max_seg_len=msl,
                )
                return acc + o[0, 0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        _sync(loop(q, k, v, seg))
        best = min(_timed(lambda: _sync(loop(q, k, v, seg))) for _ in range(2))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1)}
    return out


def bench_forward_q4_impl(b: int = 32, s: int = 512, iters: int = 20,
                          preset: str = "minilm-l6",
                          ftype=None) -> dict:
    """FULL encoder forward chained in-device: q4_impl='pallas' (fused
    dequant+bias+GELU kernels) vs 'xla' (compiler-fused dequant path).

    The engine-level A/B cannot resolve this — under the relay the
    device->host fetch is ~10-30x the compute per batch (CLAUDE.md), so
    kernel differences vanish in transfer noise.  This is the decisive
    number for the q4_impl production default.  ftype defaults to Q4_0;
    pass GGUFFileType.MOSTLY_Q8_0 for the int8-codes variant."""
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import (
        ComputeOptions, bert_embed_batch, random_params,
    )

    config = PRESETS[preset]
    params = random_params(
        config, ftype or GGUFFileType.MOSTLY_Q4_0, seed=0,
        dense_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, config.n_vocab, size=(b, s)), dtype=jnp.int32
    )
    mask = jnp.ones((b, s), jnp.int32)
    n_tokens = b * s

    out = {}
    for impl in ("pallas", "xla"):
        opts = ComputeOptions(dtype="bfloat16", q4_impl=impl)

        @jax.jit
        def loop(params, ids, mask):
            def body(i, carry):
                # fake data dependency so XLA cannot hoist the
                # loop-invariant forward out of the fori_loop
                ids_i = ids + (carry > 1e30).astype(jnp.int32)
                y = bert_embed_batch(params, ids_i, mask, config, opts)
                return carry + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        args = (params, ids, mask)
        _sync(loop(*args))
        best = min(_timed(lambda: _sync(loop(*args))) for _ in range(3))
        per = max((best - _dispatch_floor()) / iters, 1e-9)
        out[impl] = {"ms": round(per * 1e3, 3),
                     "tokens_per_sec": round(n_tokens / per)}
    return out


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import jax

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--m", type=int, nargs="+", default=[512, 4096, 32768])
    p.add_argument("--attn", action="store_true", default=True)
    p.add_argument("--forward-only", action="store_true",
                   help="only the full-forward q4_impl A/B")
    p.add_argument("--mpnet-forward", action="store_true",
                   help="only the MPNet full-forward attn_impl A/B")
    p.add_argument("--bias-ab", action="store_true",
                   help="bias/local kernel A/B across the gated families "
                        "(mpnet, gtr/t5, modernbert) — the record that "
                        "decides the attn_impl='auto' routing")
    p.add_argument("--nomic-ab", action="store_true",
                   help="nomic-embed-text full-forward attn A/B at [32,512] "
                        "(BSE kernel envelope) and the dynamic-NTK [2,8192] "
                        "shape (past the S<=1024 BSE envelope: the "
                        "transposed tq=128 kernel vs XLA) — the record for "
                        "the nomic attn routing at real geometry")
    p.add_argument("--deberta-ab", action="store_true",
                   help="disentangled-attention kernel A/B (deberta-v3-base "
                        "geometry) + full deberta forward A/B — the record "
                        "that decides the deberta attn_impl='auto' routing")
    args = p.parse_args()

    platform = jax.devices()[0].platform
    if args.nomic_ab:
        results = {"platform": platform}
        # B=1 at S=8192: the XLA comparator materializes a [B, H, S, S] f32
        # score tensor (3.2 GB at B=1; B=2 crashed the TPU worker)
        for b, s, iters in ((32, 512, 20), (1, 8192, 5)):
            r = bench_forward_attn_impl(b, s, iters=iters,
                                        preset="nomic-embed-text")
            results[f"nomic_forward_b{b}_s{s}"] = r
            print(f"nomic-embed forward attn A/B b={b} s={s}: "
                  f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
                  file=sys.stderr)
        print(json.dumps(results))
        return
    if args.deberta_ab:
        results = {"platform": platform}
        r = bench_deberta_attention()
        results["deberta_attention_b16_s512_d64"] = r
        print(f"deberta attn B=16 S=512 d=64: pallas {r['pallas']['us']}us | "
              f"xla {r['xla']['us']}us", file=sys.stderr)
        for b, s in ((32, 512), (32, 256)):
            r = bench_forward_attn_impl(b, s, preset="deberta-base")
            results[f"deberta-base_forward_b{b}_s{s}"] = r
            print(f"deberta-base forward attn A/B b={b} s={s}: "
                  f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
                  file=sys.stderr)
        print(json.dumps(results))
        return
    if args.bias_ab:
        results = {"platform": platform}
        r = bench_attention_bias()
        results["attention_bias_b32_s512_d64"] = r
        print(f"bias kernel B=32 S=512 d=64: pallas {r['pallas']['us']}us | "
              f"xla {r['xla']['us']}us", file=sys.stderr)
        for preset, (b, s) in (("mpnet-base", (32, 512)),
                               ("gtr-base", (32, 512)),
                               ("modernbert-base", (32, 512)),
                               ("modernbert-base", (8, 1024))):
            r = bench_forward_attn_impl(b, s, preset=preset)
            results[f"{preset}_forward_b{b}_s{s}"] = r
            print(f"{preset} forward attn A/B b={b} s={s}: "
                  f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
                  file=sys.stderr)
        print(json.dumps(results))
        return
    if args.mpnet_forward:
        results = {"platform": platform}
        r = bench_forward_attn_impl()
        results["mpnet_forward_b32_s512"] = r
        print(f"mpnet forward attn A/B b=32 s=512: "
              f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
              file=sys.stderr)
        print(json.dumps(results))
        return
    if args.forward_only:
        results = {"platform": platform}
        for b, s in ((32, 512), (128, 128)):
            r = bench_forward_q4_impl(b, s)
            results[f"forward_b{b}_s{s}"] = r
            print(f"forward q4 A/B b={b} s={s}: "
                  f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
                  file=sys.stderr)
        print(json.dumps(results))
        return
    results = {"platform": platform, "q4_ffn": {}, "attention": {}}
    for m in args.m:
        r = bench_q4_ffn(m)
        results["q4_ffn"][m] = r
        print(f"q4 ffn M={m:6d}: pallas {r['pallas']['us']:8.1f}us "
              f"{r['pallas']['tflops']:6.1f} TF/s | xla {r['xla']['us']:8.1f}us "
              f"{r['xla']['tflops']:6.1f} TF/s", file=sys.stderr)
    r = bench_q4_epilogue(max(args.m))
    results["q4_epilogue"] = {max(args.m): r}
    print("q4 epilogue combos (up,dn) M="
          f"{max(args.m)}: " + "  ".join(
              f"{k}={v['us']}us/{v['tflops']}TF" for k, v in r.items()),
          file=sys.stderr)
    results["q4_fused_epilogue"] = {}
    for m in args.m:
        r = bench_q4_fused_epilogue(m)
        results["q4_fused_epilogue"][m] = r
        print(f"q4 fused bias+gelu M={m:6d}: "
              f"pallas {r['pallas']['us']:8.1f}us "
              f"{r['pallas']['tflops']:6.1f} TF/s | "
              f"xla {r['xla']['us']:8.1f}us "
              f"{r['xla']['tflops']:6.1f} TF/s", file=sys.stderr)
    results["q8_fused_epilogue"] = {}
    for m in args.m:
        r = bench_q4_fused_epilogue(m, qtype="q8_0")
        results["q8_fused_epilogue"][m] = r
        print(f"q8 fused bias+gelu M={m:6d}: "
              f"pallas {r['pallas']['us']:8.1f}us "
              f"{r['pallas']['tflops']:6.1f} TF/s | "
              f"xla {r['xla']['us']:8.1f}us "
              f"{r['xla']['tflops']:6.1f} TF/s", file=sys.stderr)
    r = bench_attention()
    results["attention"]["b32_s512"] = r
    print(f"attention B=32 S=512: pallas {r['pallas']['us']:8.1f}us | "
          f"xla {r['xla']['us']:8.1f}us", file=sys.stderr)
    r = bench_attention_bias()
    results["attention_bias"] = {"b32_s512_d64": r}
    print(f"attention+pos-bias B=32 S=512 d=64 (mpnet): "
          f"pallas {r['pallas']['us']:8.1f}us | "
          f"xla {r['xla']['us']:8.1f}us", file=sys.stderr)
    r = bench_attention_headpack()
    results["attention_headpack"] = {"b32_s512_hb4": r}
    print(f"attention head-pack B=32 S=512 hb=4: "
          f"headpack {r['headpack']['us']:8.1f}us | "
          f"per-head {r['per_head']['us']:8.1f}us | "
          f"max_err {r['max_err_vs_per_head']}", file=sys.stderr)
    r = bench_packed_attention()
    results["packed_attention"] = {"b64_s512_w16": r}
    print(f"packed attention B=64 S=512: pallas {r['pallas']['us']:8.1f}us | "
          f"xla {r['xla']['us']:8.1f}us", file=sys.stderr)
    r = bench_windowed_attention()
    results["windowed_attention"] = {"b8_s2048_w64": r}
    print(f"windowed attention B=8 S=2048 W=64: windowed "
          f"{r['windowed']['us']:8.1f}us | full {r['full']['us']:8.1f}us",
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
