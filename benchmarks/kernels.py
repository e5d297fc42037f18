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

DISPATCH_FLOOR_S = 0.023  # measured axon relay round trip; 0 on local TPU


def _sync(y) -> float:
    return float(np.asarray(y))


def _make_ffn_pair(m: int, e: int, f: int, weight_scale: float):
    import jax.numpy as jnp

    from embedding_cpp_tpu.gguf import GGMLType
    from embedding_cpp_tpu.gguf.quant import quantize_q4_0
    from embedding_cpp_tpu.ops.qtensor import pack_q4_matmul

    rng = np.random.default_rng(0)
    q_up = pack_q4_matmul(
        quantize_q4_0((rng.normal(size=(f, e)) * weight_scale).astype(np.float32)),
        (f, e), GGMLType.Q4_0,
    )
    q_dn = pack_q4_matmul(
        quantize_q4_0((rng.normal(size=(e, f)) * weight_scale).astype(np.float32)),
        (e, f), GGMLType.Q4_0,
    )
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
    return max((best - DISPATCH_FLOOR_S) / iters, 1e-9)


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
        per = max((best - DISPATCH_FLOOR_S) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1), "tflops": round(flops / per / 1e12, 2)}
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
        per = max((best - DISPATCH_FLOOR_S) / iters, 1e-9)
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
        per = max((best - DISPATCH_FLOOR_S) / iters, 1e-9)
        out[name] = {"us": round(per * 1e6, 1)}
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
    args = p.parse_args()

    platform = jax.devices()[0].platform
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
    r = bench_attention()
    results["attention"]["b32_s512"] = r
    print(f"attention B=32 S=512: pallas {r['pallas']['us']:8.1f}us | "
          f"xla {r['xla']['us']:8.1f}us", file=sys.stderr)
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
