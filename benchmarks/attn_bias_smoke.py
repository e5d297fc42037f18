"""Real-TPU smoke + parity for the bias / local-window attention kernels.

Pallas `interpret=True` (CPU tests) checks none of Mosaic's tiling
constraints (CLAUDE.md), so before `attn_impl="auto"` may route a family to
a kernel, that kernel needs (a) a real-TPU run at the family's production
geometry that compiles and executes, and (b) numerical parity vs the XLA
einsum path.  This script is that record:

  - [H, S, S] additive bias (MPNet relative attention, gtr/t5 position
    bias) at mpnet-base / gtr-base geometry (h=12, d=64, S=512)
  - [1, S, S] head-invariant bias (ModernBERT's windowed global fallback)
  - local sliding-window kernel (ModernBERT local layers) at S=1024/2048,
    window=128

Run on the TPU: python benchmarks/attn_bias_smoke.py
Results land in benchmarks/results/attn_bias_smoke_v5e.json.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _xla_attn(q, k, v, mask_bias, pos_bias=None, window=None):
    import jax
    import jax.numpy as jnp

    d = q.shape[-1]
    sc = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32)
    sc = sc * (1.0 / d**0.5) + mask_bias[:, None, None, :]
    if pos_bias is not None:
        sc = sc + pos_bias
    if window is not None:
        s = q.shape[1]
        pos = np.arange(s)
        dist_ok = np.abs(pos[:, None] - pos[None, :]) <= window // 2
        sc = sc + jnp.asarray(np.where(dist_ok, 0.0, -1e9), jnp.float32)
    p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _mae(a, b, valid_q: int | None = None) -> float:
    """Max |a-b| over VALID query rows.  Padded query positions attend only
    masked keys (every score -1e9): both paths emit garbage there, differing
    garbage is not a kernel bug, and pooling drops those rows anyway."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if valid_q is not None:
        a, b = a[:, :valid_q], b[:, :valid_q]
    return float(np.max(np.abs(a - b)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from embedding_cpp_tpu.ops.attention import (
        flash_attention, flash_attention_local,
    )

    platform = jax.devices()[0].platform
    results = {"platform": platform, "cases": {}}
    rng = np.random.default_rng(0)

    def qkv(b, s, h, d):
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), dtype=jnp.bfloat16)
        mb = np.zeros((b, s), np.float32)
        mb[:, (s * 3) // 4:] = -1e9
        return q, k, v, jnp.asarray(mb)

    # --- [H, S, S] bias: mpnet-base / gtr-base geometry -------------------
    for name, (b, s, h, d) in {
        "bias_h_mpnet_base": (8, 512, 12, 64),
        "bias_h_mpnet_base_s384": (8, 384, 12, 64),
        "bias_h_minilm_d32": (8, 512, 12, 32),
    }.items():
        q, k, v, mb = qkv(b, s, h, d)
        pb = jnp.asarray(rng.normal(size=(h, s, s)).astype(np.float32))
        got = flash_attention(q, k, v, mb, pos_bias=pb)
        ref = _xla_attn(q, k, v, mb, pos_bias=pb)
        results["cases"][name] = {"max_abs_err": _mae(got, ref)}
        print(f"{name}: max|err| {results['cases'][name]['max_abs_err']:.5f}",
              file=sys.stderr)

    # --- projection-layout bias kernel (r4: no transposes, resident bias) --
    from embedding_cpp_tpu.ops.attention import flash_attention_bias_bse

    for name, (b, s, h, d) in {
        "bias_bse_mpnet_base": (8, 512, 12, 64),
        "bias_bse_s384": (8, 384, 12, 64),
    }.items():
        q, k, v, mb = qkv(b, s, h, d)
        pb = jnp.asarray(rng.normal(size=(h, s, s)).astype(np.float32))
        got = flash_attention_bias_bse(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d),
            v.reshape(b, s, h * d), mb, pb, h,
        )
        ref = _xla_attn(q, k, v, mb, pos_bias=pb).reshape(b, s, h * d)
        results["cases"][name] = {"max_abs_err": _mae(got, ref)}
        print(f"{name}: max|err| {results['cases'][name]['max_abs_err']:.5f}",
              file=sys.stderr)

    # --- [1, S, S] head-invariant bias (ModernBERT global-window path) ----
    b, s, h, d = 8, 512, 12, 64
    q, k, v, mb = qkv(b, s, h, d)
    win = np.where(
        np.abs(np.arange(s)[:, None] - np.arange(s)[None, :]) <= 64,
        0.0, -1e9).astype(np.float32)
    pb1 = jnp.asarray(win[None])
    got = flash_attention(q, k, v, mb, pos_bias=pb1)
    ref = _xla_attn(q, k, v, mb, pos_bias=pb1)
    results["cases"]["bias_1_head_invariant"] = {"max_abs_err": _mae(got, ref)}
    print(f"bias_1_head_invariant: max|err| {_mae(got, ref):.5f}",
          file=sys.stderr)

    # --- local sliding-window kernel (ModernBERT local layers) ------------
    for name, (b, s, h, d, w) in {
        "local_s1024_w128": (4, 1024, 12, 64, 128),
        "local_s2048_w128": (2, 2048, 12, 64, 128),
    }.items():
        q, k, v, mb = qkv(b, s, h, d)
        got = flash_attention_local(q, k, v, mb, w)
        ref = _xla_attn(q, k, v, mb, window=w)
        results["cases"][name] = {"max_abs_err": _mae(got, ref, (s * 3) // 4)}
        print(f"{name}: max|err| {results['cases'][name]['max_abs_err']:.5f}",
              file=sys.stderr)

    # --- disentangled attention (DeBERTa-v2/v3) ----------------------------
    from embedding_cpp_tpu.models.deberta import (
        _gather_indices, deberta_log_bucket,
    )
    from embedding_cpp_tpu.ops.deberta_attention import disentangled_attention

    for name, (b, s, h, d, span, max_dist) in {
        "deberta_v3_base_s512": (4, 512, 12, 64, 256, 512),
        "deberta_v3_base_s384": (4, 384, 12, 64, 256, 512),
        "deberta_small_span_s128": (4, 128, 12, 64, 32, 128),
    }.items():
        q, k, v, mb = qkv(b, s, h, d)
        pos_k = jnp.asarray(rng.normal(size=(2 * span, h, d)),
                            dtype=jnp.bfloat16)
        pos_q = jnp.asarray(rng.normal(size=(2 * span, h, d)),
                            dtype=jnp.bfloat16)
        got = disentangled_attention(q, k, v, mb, pos_k, pos_q, span,
                                     max_dist)
        # the exact einsum/gather sequence of models/deberta.py _attention
        rel = deberta_log_bucket(
            np.arange(s)[:, None] - np.arange(s)[None, :], span, max_dist,
            xp=np,
        )
        c2p_pos, p2c_pos = _gather_indices(rel, span, xp=np)
        scale = 1.0 / float(np.sqrt(d * 3))
        sc = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
        c2p = jnp.einsum("bqhd,rhd->bhqr", q, pos_k,
                         preferred_element_type=jnp.float32)
        sc = sc + jnp.take_along_axis(
            c2p, jnp.asarray(c2p_pos)[None, None], axis=-1) * scale
        p2c = jnp.einsum("bkhd,rhd->bhkr", k, pos_q,
                         preferred_element_type=jnp.float32)
        gathered = jnp.take_along_axis(
            p2c, jnp.asarray(p2c_pos)[None, None], axis=-1)
        sc = sc + jnp.swapaxes(gathered, -1, -2) * scale
        sc = sc + mb[:, None, None, :]
        p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
        ref = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        results["cases"][name] = {"max_abs_err": _mae(got, ref, (s * 3) // 4)}
        print(f"{name}: max|err| {results['cases'][name]['max_abs_err']:.5f}",
              file=sys.stderr)

    tol = 0.06  # bf16 PV dot over S<=2048 keys: |err| ~ sqrt(S) * 2^-8
    ok = all(c["max_abs_err"] < tol for c in results["cases"].values())
    results["tolerance"] = tol
    results["ok"] = bool(ok)
    print(json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
