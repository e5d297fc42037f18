"""nomic-bert encoder forward pass (pure JAX).

HF NomicBertModel (trust_remote_code modeling_hf_nomic_bert.py — the
flash-attn BERT rewrite behind nomic-embed-text-v1/v1.5 and
nomic-bert-2048), the most-downloaded sentence-transformers architecture
the r3 build did not yet cover (VERDICT r3 next #7):

- **embeddings**: word + token-type tables, no absolute positions
  (rotary_emb_fraction = 1.0), then the "emb_ln" LayerNorm
  (NomicBertEmbeddings.forward + NomicBertModel.emb_ln);
- **post-norm blocks** exactly like BERT: norm1(x + attn(x)),
  norm2(x + mlp(x)) (NomicBertBlock.forward, prenorm=False path);
- **RoPE** on q/k (rotate-half, NOT interleaved;
  rotary_emb_interleaved=false in every published config), base
  rotary_emb_base (1000), with optional **dynamic-NTK scaling** past the
  trained length: for (static) S > max_trained_positions the base becomes
  base * ((factor * S / max_trained) - (factor - 1)) ** (d / (d - 2))
  (NomicBertDynamicNTKRotaryEmbedding._update_cos_sin_cache —
  nomic-embed-text-v1.5's 8192-token extension);
- **SwiGLU MLP**: fc2(fc11(x) * silu(fc12(x))) (NomicBertGatedMLP with
  flash-attn GatedMlp's half order: the FIRST projection is the raw
  multiplicand, the SECOND is activated).  In this repo's gated-FFN
  convention (ffn_up_w carries the activation — models/t5.py _ffn) that
  maps fc12 -> ffn_up_w and fc11 -> ffn_gate_w (models/schema.py
  NOMIC_LAYER_TENSORS);
- attention/FFN linears are **bias-free** in every published checkpoint
  (qkv_proj_bias = mlp_fc1_bias = mlp_fc2_bias = false); config.attn_bias /
  config.ffn_bias carry the checkpoint's actual layout (conversion
  verifies them against the state dict).

Same extensions as models/bert.py: padded-batch masking, sequence packing
(positions restart per segment — RoPE depends on positions only through
q/k rotation, so packed outputs equal the per-sentence results), f32
accumulation, and the fused projection-layout attention kernel
(ops/attention.flash_attention_bse) on plain TPU batches.  The reference
engine loads none of this family (convert-to-gguf.py:133-136 accepts
BertModel only).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.linear import _layer_norm, linear
from ..ops.qtensor import QTensor, gather_rows
from .config import BertConfig
from .modernbert import _apply_rope, _rope_cos_sin

Array = jax.Array

_MASK_BIAS = -1e9


def _inv_freq(config: BertConfig, s: int) -> np.ndarray:
    """RoPE inverse frequencies [d/2] for a STATIC sequence length,
    including the dynamic-NTK base scaling past the trained length."""
    d = config.head_dim
    base = float(config.rope_theta or 1000.0)
    if (
        config.rope_scaling_factor > 0
        and config.rope_max_trained > 0
        and s > config.rope_max_trained
    ):
        f = config.rope_scaling_factor
        base = base * (
            (f * s / config.rope_max_trained) - (f - 1.0)
        ) ** (d / (d - 2.0))
    exponents = np.arange(0, d, 2, dtype=np.float64) / d
    return (base ** -exponents).astype(np.float32)


def _embed(params, ids, config, opts, type_ids=None):
    """LN(word[ids] + token_type) — no absolute position table."""
    emb = params["embeddings"]
    word = emb["word"]
    if isinstance(word, QTensor):
        x = gather_rows(word, ids, dtype=jnp.float32)
    else:
        x = word[ids].astype(jnp.float32)
    if "token_type" in emb:
        tt = emb["token_type"]
        x = x + (tt[0] if type_ids is None else tt[type_ids]).astype(
            jnp.float32
        )
    return _layer_norm(
        x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps, opts.jdtype
    )


def _attention(x, lp, mask_bias, pos, inv_freq, config, opts, seg=None,
               max_seg_len=None):
    """RoPE multi-head attention over a padded (or packed) batch."""
    b, s, _ = x.shape
    d = config.head_dim
    q = linear(x, lp["q_w"], lp.get("q_b"), q4_impl=opts.q4_impl)
    h = q.shape[-1] // d  # tp-local head count
    k = linear(x, lp["k_w"], lp.get("k_b"), q4_impl=opts.q4_impl)
    v = linear(x, lp["v_w"], lp.get("v_b"), q4_impl=opts.q4_impl)

    cos, sin = _rope_cos_sin(pos, inv_freq, q.dtype)
    q = _apply_rope(q.reshape(b, s, h, d), cos, sin)
    k = _apply_rope(k.reshape(b, s, h, d), cos, sin)
    v = v.reshape(b, s, h, d)

    impl = opts.attn_impl
    if impl == "auto":
        local = jax.device_count() == 1 or opts.inside_shard_map
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "pallas" if (on_tpu and local) else "xla"
    if impl == "pallas" and s % 8 == 0 and d % 8 == 0:
        if seg is None and 128 <= s <= 1024:
            # plain padded batches: the projection-layout kernel (heads as
            # lane slices, no [B,S,H,d]<->[B,H,S,d] transposes — see
            # models/bert.py and q4_forward_breakdown.md); RoPE already
            # rotated per head, the reshape back to [B, S, H*d] is free
            from ..ops.attention import flash_attention_bse

            return flash_attention_bse(
                q.reshape(b, s, h * d), k.reshape(b, s, h * d),
                v.reshape(b, s, h * d), mask_bias, h,
            )
        if seg is not None:
            from ..ops.attention import (
                flash_attention_packed,
                flash_attention_packed_bse,
                packed_bse_applies,
            )

            if packed_bse_applies(s, d, max_seg_len):
                # packed rows in the projection layout (RoPE already
                # rotated per head; the reshape back to [B, S, H*d] merges
                # minor dims — free, unlike the [B,H,S,d] transpose)
                return flash_attention_packed_bse(
                    q.reshape(b, s, h * d), k.reshape(b, s, h * d),
                    v.reshape(b, s, h * d), seg, h,
                )
            att = flash_attention_packed(q, k, v, seg,
                                         max_seg_len=max_seg_len)
            return att.reshape(b, s, h * d)
        if s >= 128:
            from ..ops.attention import flash_attention

            return flash_attention(q, k, v, mask_bias).reshape(b, s, h * d)

    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if seg is not None:
        allowed = seg[:, :, None] == seg[:, None, :]
        bias = jnp.where(allowed, 0.0, _MASK_BIAS).astype(jnp.float32)
        scores = scores * (1.0 / d**0.5) + bias[:, None, :, :]
    else:
        scores = scores * (1.0 / d**0.5) + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return att.reshape(b, s, h * d)


def _encoder_layer(x, lp, mask_bias, pos, inv_freq, config, opts, seg=None,
                   max_seg_len=None):
    """Post-norm block (NomicBertBlock.forward, prenorm=False):
    x = norm1(x + attn(x)); x = norm2(x + fc2(fc11 * silu(fc12)))."""
    att = _attention(x, lp, mask_bias, pos, inv_freq, config, opts, seg=seg,
                     max_seg_len=max_seg_len)
    x = linear(
        att, lp["o_w"], lp.get("o_b"), q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
        ln=(lp["ln_att_scale"], lp["ln_att_bias"], config.layer_norm_eps),
    )
    u = linear(x, lp["ffn_up_w"], lp.get("ffn_up_b"), q4_impl=opts.q4_impl,
               activation="silu")
    g = linear(x, lp["ffn_gate_w"], lp.get("ffn_gate_b"),
               q4_impl=opts.q4_impl)
    # the SwiGLU gate multiply fuses into the down-projection's prologue —
    # a separate u * g op is a full [M, F] HBM pass between pallas_calls
    return linear(
        u, lp["ffn_down_w"], lp.get("ffn_down_b"), q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x, prologue_mul=g,
        ln=(lp["ln_out_scale"], lp["ln_out_bias"], config.layer_norm_eps),
    )


def _run_layers(x, params, mask_bias, pos, inv_freq, config, opts, seg=None,
                max_seg_len=None):
    def body(x, lp):
        return _encoder_layer(x, lp, mask_bias, pos, inv_freq, config, opts,
                              seg=seg, max_seg_len=max_seg_len), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def nomic_embed_batch(params, ids, mask, config, opts, gather_idx=None,
                      token_states=False):
    """Token ids [B, S] + validity mask [B, S] -> embeddings [B, n_embd]
    (same contract as models.bert.bert_embed_batch, dispatched through it
    when config.arch == "nomic-bert")."""
    from .bert import (
        _cast_output,
        _output_head,
        pool_normalize,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    mask_bias = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(
        jnp.float32
    )
    pos = jnp.arange(s, dtype=jnp.int32)
    inv_freq = jnp.asarray(_inv_freq(config, s))
    x = _run_layers(x, params, mask_bias, pos, inv_freq, config, opts)
    if token_states:
        return x.astype(jnp.float32)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out[gather_idx]
    return _cast_output(out, opts)


def nomic_embed_packed(params, ids, seg, pos, config, opts, *, n_seg,
                       gather_idx=None, max_seg_len=None):
    """Sequence-packed forward: [B, S] packed rows -> [B, n_seg, n_embd]
    (same contract as models.bert.bert_embed_packed).  Positions restart
    at 0 per segment; RoPE rotates q/k by their own positions so attention
    depends only on within-segment offsets — packed == unpacked.  The
    NTK-scaled base keys off the PACKED row length S (static), matching a
    plain forward of the same padded length."""
    from .bert import (
        _cast_output,
        _output_head,
        pool_normalize_packed,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    inv_freq = jnp.asarray(_inv_freq(config, s))
    x = _run_layers(x, params, None, pos, inv_freq, config, opts, seg=seg,
                    max_seg_len=max_seg_len)
    pooled = pool_normalize_packed(
        x, seg, pos, n_seg, config.pooling, normalize=False
    )
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out.reshape(-1, out.shape[-1])[gather_idx]
    return _cast_output(out, opts)
