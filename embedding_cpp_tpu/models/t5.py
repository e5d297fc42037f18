"""T5 encoder forward pass (pure JAX).

The encoder stack of HF T5EncoderModel — the base of the sentence-t5 and
GTR dense-retriever families (gtr-t5-base/large/xl, sentence-t5-*: T5
encoder -> mean pooling -> Dense projection -> L2 norm; the Dense module
rides ``params["dense"]`` like every other family).  Deltas from the BERT
graph (models/bert.py):

- **pre-norm** residual blocks with **RMSNorm** (HF T5LayerNorm: no mean
  subtraction, no bias, f32 accumulate, eps 1e-6) and a final RMSNorm
  after the stack (T5Stack.final_layer_norm);
- **unscaled attention**: no 1/sqrt(d) factor — T5 folds it into the
  initialization (T5Attention.forward applies none);
- ONE relative-position bias table [buckets, n_head] on block 0 shared by
  every layer (T5Attention.compute_bias; ``has_relative_attention_bias``
  is True only for the first block) — the same bucketing MPNet borrowed
  (models.bert.t5_relative_bucket), with a configurable far-field cap;
- per-head width **d_kv decoupled from d_model**: q/k/v map
  [d_model -> n_head * d_kv] (t5-3b/xl: 1024 -> 4096);
- bias-free linears everywhere; FFN is relu (v1.0 — every published
  sentence-t5/gtr) or gated gelu_new (v1.1/flan) per config.ffn_act /
  ffn_gated;
- no token-type or absolute-position tables; inputs frame as
  ``ids + [</s>]`` with no CLS (tokenizer.frame_ids add_cls=False).

Same extensions as models/bert.py: attention masking over padded batches,
sequence packing (the bias is rebuilt from per-segment restart positions,
so packed outputs equal the per-sentence results), and the f32-accumulation
dtype policy.  The reference engine loads none of this family
(convert-to-gguf.py:133-136 accepts BertModel only).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.linear import linear
from ..ops.qtensor import QTensor, gather_rows
from .config import BertConfig

Array = jax.Array

_MASK_BIAS = -1e9  # additive bias for masked keys (applied in f32)


def rms_norm(x: Array, scale: Array, eps: float, out_dtype) -> Array:
    """HF T5LayerNorm: x * rsqrt(mean(x²) + eps) * scale — no mean
    subtraction, no bias; variance accumulates in f32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale).astype(out_dtype)


def _embed(params, ids, config, opts):
    """shared[ids] — T5 applies no embedding scale or norm (T5Stack.forward
    goes embed -> dropout -> blocks)."""
    word = params["embeddings"]["word"]
    if isinstance(word, QTensor):
        x = gather_rows(word, ids, dtype=jnp.float32)
    else:
        x = word[ids].astype(jnp.float32)
    return x.astype(opts.jdtype)


def _attention(xn, lp, pos_bias, mask_bias, config: BertConfig, opts,
               seg=None, max_seg_len=None):
    """Pre-normed input -> attention output (pre-residual).

    ``pos_bias``: the shared relative-position bias, [H, S, S],
    batch-invariant — for PACKED rows too: within a segment the restart
    positions are consecutive, so k_pos - q_pos equals the absolute row
    offset, and cross-segment pairs are masked to -1e9 regardless (see
    models/bert.bert_embed_packed).  ``mask_bias``: [B, S] key-padding bias
    (plain batches; None when ``seg`` carries the packed segment ids).
    Biases stay separate so no [B, H, S, S] tensor materializes in HBM —
    XLA fuses the adds into the softmax region.  Added to the RAW q·k
    scores: T5 applies no 1/sqrt(d) scaling (folded into init)."""
    b, s, _ = xn.shape
    d = config.head_dim
    q = linear(xn, lp["q_w"], q4_impl=opts.q4_impl)
    h = q.shape[-1] // d  # tp-local head count
    q = q.reshape(b, s, h, d)
    k = linear(xn, lp["k_w"], q4_impl=opts.q4_impl).reshape(b, s, h, d)
    v = linear(xn, lp["v_w"], q4_impl=opts.q4_impl).reshape(b, s, h, d)

    if pos_bias.shape[-3] != h:
        # manual-TP shard_map body: the bias replicates while the head axis
        # is device-local — take this device's head slice
        i = jax.lax.axis_index(opts.tp_axis)
        pos_bias = jax.lax.dynamic_slice_in_dim(
            pos_bias, i * h, h, axis=pos_bias.ndim - 3
        )

    # fused bias-attention kernel (the MPNet kernel, ops/attention.py) for
    # plain batches: it applies 1/sqrt(d) internally and T5 attention is
    # UNSCALED, so q is pre-multiplied by sqrt(d) to cancel the factor.
    # auto takes it on a local TPU: real-TPU parity + A/B on record
    # (attn_bias_ab_v5e.json: gtr-base forward 20.0 ms BSE / 24.9 transposed
    # kernel / 30.3 XLA at [32,512]).
    # A forced "pallas" trusts the caller about locality (pallas cannot be
    # GSPMD-partitioned); auto requires single-device or a shard_map body.
    impl = opts.attn_impl
    if impl == "auto":
        local = jax.device_count() == 1 or opts.inside_shard_map
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "pallas" if (on_tpu and local and s >= 128) else "xla"
    if (
        impl == "pallas" and pos_bias.ndim == 3
        and s % 8 == 0 and d % 8 == 0
    ):
        from ..ops.attention import (
            fits_bias_bse,
            flash_attention,
            flash_attention_bias_bse,
            flash_attention_bias_packed_bse,
            packed_bse_applies,
        )

        if (seg is not None and packed_bse_applies(s, d, max_seg_len)
                and fits_bias_bse(s, h * d, pos_bias.shape[0],
                                  q.dtype.itemsize)):
            # packed rows: bias VMEM-resident across the batch grid, the
            # segment mask computed in-kernel (packed_bias_ab_v5e.json)
            return flash_attention_bias_packed_bse(
                (q * math.sqrt(d)).astype(q.dtype).reshape(b, s, h * d),
                k.reshape(b, s, h * d), v.reshape(b, s, h * d),
                seg, pos_bias, h,
            )
        if seg is None and 128 <= s <= 1024 and fits_bias_bse(
            s, h * d, pos_bias.shape[0], q.dtype.itemsize
        ):
            # projection-layout variant: no [B,S,H,d]<->[B,H,S,d]
            # transposes, bias resident across the batch grid (gtr-base
            # forward 20.0 ms vs 24.9 with the transposed bias kernel and
            # 30.3 XLA, attn_bias_ab_v5e.json)
            att = flash_attention_bias_bse(
                (q * math.sqrt(d)).astype(q.dtype).reshape(b, s, h * d),
                k.reshape(b, s, h * d), v.reshape(b, s, h * d),
                mask_bias, pos_bias, h,
            )
            return att
        if seg is None:
            att = flash_attention(
                (q * math.sqrt(d)).astype(q.dtype), k, v, mask_bias,
                pos_bias=pos_bias,
            )
            return att.reshape(b, s, h * d)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores + pos_bias  # [H,S,S] broadcasts over batch
    if mask_bias.ndim == 3:
        # packed XLA fallback: the [B, Sq, Sk] segment bias is computed
        # ONCE outside the layer scan (t5_embed_packed), not per layer
        scores = scores + mask_bias[:, None, :, :]
    else:
        scores = scores + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(xn.dtype)
    att = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(xn.dtype)
    return att.reshape(b, s, h * d)


def _ffn(xn, lp, config: BertConfig, opts):
    """T5DenseActDense (wi -> act -> wo's input) or T5DenseGatedActDense
    (act(wi_0) * wi_1).  ffn_act: "relu" | "gelu_erf" (HF dense_act_fn
    "gelu") | "gelu_tanh" (gelu_new / the "gated-gelu" back-compat).
    Returns (h, gate): gate is None ungated, else the raw wi_1 projection —
    the caller folds the multiply into the down-projection's prologue
    (ops/linear prologue_mul; a separate u * g op is a full [M, F] HBM
    pass between pallas_calls)."""
    act = config.ffn_act or "relu"
    gelu = act if act in ("gelu_tanh", "gelu_erf") else None
    u = linear(xn, lp["ffn_up_w"], q4_impl=opts.q4_impl, activation=gelu)
    if act == "relu":
        u = jax.nn.relu(u)
    if config.ffn_gated:
        return u, linear(xn, lp["ffn_gate_w"], q4_impl=opts.q4_impl)
    return u, None


def _encoder_layer(x, lp, pos_bias, mask_bias, config: BertConfig, opts,
                   seg=None, max_seg_len=None):
    """One pre-norm block (T5Block.forward, encoder side):
    x += o(attn(rms(x))); x += wo(ffn(rms(x)))."""
    eps = config.layer_norm_eps
    att = _attention(rms_norm(x, lp["ln_att_scale"], eps, x.dtype),
                     lp, pos_bias, mask_bias, config, opts, seg=seg,
                     max_seg_len=max_seg_len)
    x = linear(att, lp["o_w"], q4_impl=opts.q4_impl,
               reduce_axis=opts.tp_axis, residual=x)
    h, gate = _ffn(rms_norm(x, lp["ln_out_scale"], eps, x.dtype), lp,
                   config, opts)
    return linear(h, lp["ffn_down_w"], q4_impl=opts.q4_impl,
                  reduce_axis=opts.tp_axis, residual=x, prologue_mul=gate)


def _run_layers(x, params, pos_bias, mask_bias, config, opts, seg=None,
                max_seg_len=None):
    def body(x, lp):
        return _encoder_layer(x, lp, pos_bias, mask_bias, config, opts,
                              seg=seg, max_seg_len=max_seg_len), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return rms_norm(x, params["final_ln_scale"], config.layer_norm_eps,
                    jnp.float32)


def t5_embed_batch(params, ids, mask, config, opts, gather_idx=None,
                   token_states=False):
    """Token ids [B, S] + validity mask [B, S] -> embeddings [B, n_embd]
    (same contract as models.bert.bert_embed_batch, dispatched through it
    when config.arch == "t5")."""
    from .bert import (
        _cast_output,
        _output_head,
        _rel_attn_bias,
        pool_normalize,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    pos_bias = _rel_attn_bias(
        params["rel_attn_bias"], s, max_distance=config.rel_attn_max_dist
    )  # [H, S, S], batch-invariant
    pad = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    x = _run_layers(x, params, pos_bias, pad, config, opts)
    if token_states:
        return x  # final-RMSNorm output, already f32 (HF last_hidden_state)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out[gather_idx]
    return _cast_output(out, opts)


def t5_embed_packed(params, ids, seg, pos, config, opts, *, n_seg,
                    gather_idx=None, max_seg_len=None):
    """Sequence-packed forward: [B, S] packed rows -> [B, n_seg, n_embd]
    (same contract as models.bert.bert_embed_packed).

    The bias stays the BATCH-INVARIANT [H, S, S] table: per-segment restart
    positions are consecutive, so within a segment k_pos - q_pos equals the
    absolute row offset k - q; cross-segment pairs get an arbitrary bucket
    but are masked to -1e9 (softmax-exact zero) by segment regardless."""
    from .bert import (
        _cast_output,
        _output_head,
        _rel_attn_bias,
        pool_normalize_packed,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    x = _embed(params, ids, config, opts)
    pos_bias = _rel_attn_bias(
        params["rel_attn_bias"], ids.shape[-1],
        max_distance=config.rel_attn_max_dist,
    )  # [H, S, S], batch-invariant (valid within segments — see docstring)
    allowed = seg[:, :, None] == seg[:, None, :]  # [B, Sq, Sk]
    key_ok = (seg >= 0)[:, None, :]
    seg_bias = jnp.where(allowed & key_ok, 0.0, _MASK_BIAS).astype(
        jnp.float32
    )  # built once; only the XLA fallback reads it (the kernel path uses seg)
    x = _run_layers(x, params, pos_bias, seg_bias, config, opts, seg=seg,
                    max_seg_len=max_seg_len)
    pooled = pool_normalize_packed(
        x, seg, pos, n_seg, config.pooling, normalize=False
    )
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out.reshape(-1, out.shape[-1])[gather_idx]
    return _cast_output(out, opts)
