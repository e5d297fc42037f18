"""Per-op accounting of the q4_0 MiniLM full forward at [32, 512].

VERDICT r3 weak #3: the full forward measured 6.89 ms while the same q4
kernels hit 185 TF/s at M=32k — is the gap shape-imposed roofline (per-layer
M=16k matmuls, d=32 attention) or fixable dispatch/layout overhead?  This
script times every component of the layer at its EXACT production shape,
chained in-device (kernels.py methodology: real data dependency between
iterations, scalar fetch, dispatch floor subtracted), in the SAME run as the
full forward, and reports the roofline sum vs the measured whole.

    python benchmarks/forward_breakdown.py        # on the TPU

Results -> benchmarks/results/q4_forward_breakdown.{json,md}.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kernels import _dispatch_floor, _sync, _timed  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import (
        ComputeOptions, bert_embed_batch, random_params,
    )
    from embedding_cpp_tpu.models.bert import (
        _cast_output, _output_head, embed_tokens, pool_normalize,
        resolve_impls,
    )
    from embedding_cpp_tpu.models.config import MINILM_L6
    from embedding_cpp_tpu.ops.attention import (
        flash_attention, flash_attention_bse,
    )
    from embedding_cpp_tpu.ops.linear import linear

    config = MINILM_L6
    opts = resolve_impls(ComputeOptions(dtype="bfloat16"))
    b, s = 32, 512
    e, f, h = config.n_embd, config.n_ff, config.n_head
    d = e // h
    m = b * s
    iters = 30

    params = random_params(
        config, GGUFFileType.MOSTLY_Q4_0, seed=0, dense_dtype=jnp.bfloat16
    )
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, config.n_vocab, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    mask_bias = jnp.zeros((b, s), jnp.float32)
    x_bse = jnp.asarray(rng.normal(size=(b, s, e)) * 0.1, jnp.bfloat16)
    x_me = x_bse.reshape(m, e)
    q0 = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)

    def chain_same_shape(fn, x0, n=iters):
        """fn: x -> y of x's shape; feed the FULL output back (no DCE)."""

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

    def chain_reduce(fn, x0, n=iters):
        """fn: x -> y of any shape; dependency via a full-sum perturbation
        of x (sum needs every element of y, so fn cannot be elided)."""

        @jax.jit
        def loop(x):
            def body(i, carry):
                xx, acc = carry
                y = fn(xx)
                acc = acc + jnp.sum(y.astype(jnp.float32))
                bump = (acc > 1e30).astype(xx.dtype)
                xx = xx + bump if jnp.issubdtype(xx.dtype, jnp.integer) \
                    else xx * (1 + bump)
                return xx, acc

            return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))[1]

        _sync(loop(x0))
        best = min(_timed(lambda: _sync(loop(x0))) for _ in range(3))
        return max((best - _dispatch_floor()) / n, 1e-9)

    results: dict = {"platform": jax.devices()[0].platform,
                     "shape": {"b": b, "s": s, "model": config.name,
                               "ftype": "q4_0", "dtype": "bfloat16"}}
    pieces: dict[str, dict] = {}

    def record(name, sec, flops=None, count=1.0):
        pieces[name] = {
            "us": round(sec * 1e6, 1),
            "per_layer_count": count,
            "tflops": round(flops / sec / 1e12, 1) if flops else None,
        }
        print(f"{name:>14}: {sec * 1e6:8.1f} us"
              + (f"  {flops / sec / 1e12:6.1f} TF/s" if flops else ""),
              file=sys.stderr)

    # --- full forward (the number being accounted for) ---------------------
    @jax.jit
    def fwd_loop(params, ids, mask):
        def body(i, carry):
            ids_i = ids + (carry > 1e30).astype(jnp.int32)
            y = bert_embed_batch(params, ids_i, mask, config, opts)
            return carry + jnp.sum(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    _sync(fwd_loop(params, ids, mask))
    best = min(_timed(lambda: _sync(fwd_loop(params, ids, mask)))
               for _ in range(3))
    full = max((best - _dispatch_floor()) / iters, 1e-9)
    results["full_forward_us"] = round(full * 1e6, 1)
    print(f"  full forward: {full * 1e6:8.1f} us", file=sys.stderr)

    # --- per-op pieces at exact shapes --------------------------------------
    t = chain_reduce(lambda i: embed_tokens(params, i, config, opts),
                     ids.astype(jnp.int32), n=200)
    record("embed+ln", t, count=0)  # once per forward

    t = chain_same_shape(
        lambda x: linear(x, lp["q_w"], lp["q_b"], q4_impl=opts.q4_impl), x_me,
        n=600,
    )
    record("qkv_proj", t, flops=2 * m * e * e, count=3)

    t = chain_same_shape(
        lambda q: flash_attention(q, q0, q0, mask_bias), q0, n=100
    )
    record("attention_bhsd", t, flops=4 * b * h * s * s * d)

    t = chain_same_shape(
        lambda q: flash_attention_bse(q, x_bse, x_bse, mask_bias, h),
        x_bse, n=100,
    )
    record("attention", t, flops=4 * b * h * s * s * d)

    t = chain_same_shape(
        lambda a: linear(
            a, lp["o_w"], lp["o_b"], q4_impl=opts.q4_impl, residual=x_bse,
            ln=(lp["ln_att_scale"], lp["ln_att_bias"], config.layer_norm_eps),
        ),
        x_bse,
        n=400,
    )
    record("o_proj+add&ln", t, flops=2 * m * e * e)

    t = chain_same_shape(
        lambda x: linear(
            linear(x, lp["ffn_up_w"], lp["ffn_up_b"], q4_impl=opts.q4_impl,
                   activation="gelu_erf"),
            lp["ffn_down_w"], lp["ffn_down_b"], q4_impl=opts.q4_impl,
            residual=x,
            ln=(lp["ln_out_scale"], lp["ln_out_bias"], config.layer_norm_eps),
        ),
        x_bse,
        n=150,
    )
    record("ffn_pair+add&ln", t, flops=4 * m * e * f)

    t = chain_reduce(
        lambda x: _cast_output(
            _output_head(pool_normalize(x, mask, config.pooling,
                                        normalize=False), params, config),
            opts,
        ),
        x_bse,
        n=600,
    )
    record("pool+head", t, count=0)

    # --- composition levels: one whole layer, then the 6-layer scan --------
    from embedding_cpp_tpu.models.bert import _run_layers, encoder_layer

    t = chain_same_shape(
        lambda x: encoder_layer(x, lp, mask_bias, config, opts), x_bse, n=40
    )
    record("whole_layer", t)

    t = chain_same_shape(
        lambda x: _run_layers(
            x, params["layers"], config,
            lambda hh, lpp: encoder_layer(hh, lpp, mask_bias, config, opts),
        ),
        x_bse,
        n=10,
    )
    record("layers_scan_x6", t, count=0)

    per_layer = (3 * pieces["qkv_proj"]["us"] + pieces["attention"]["us"]
                 + pieces["o_proj+add&ln"]["us"]
                 + pieces["ffn_pair+add&ln"]["us"])
    accounted = (pieces["embed+ln"]["us"] + pieces["pool+head"]["us"]
                 + config.n_layer * per_layer)
    results["pieces"] = pieces
    results["per_layer_us"] = round(per_layer, 1)
    results["accounted_us"] = round(accounted, 1)
    results["accounted_pct"] = round(100 * accounted
                                     / results["full_forward_us"], 1)
    print(f"     per layer: {per_layer:8.1f} us x {config.n_layer}",
          file=sys.stderr)
    print(f"     accounted: {accounted:8.1f} us of "
          f"{results['full_forward_us']} us "
          f"({results['accounted_pct']}%)", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
