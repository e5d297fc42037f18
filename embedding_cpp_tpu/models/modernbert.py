"""ModernBERT encoder forward pass (pure JAX).

The current-generation encoder family (HF ModernBertModel — the base of
gte-modernbert-base / nomic-modernbert embedders), which differs from the
BERT graph (models/bert.py) in every block-level choice:

- **pre-norm** residual blocks (x + f(LN(x))), with layer 0's attention
  norm being the identity (ModernBertEncoderLayer.__init__: ``nn.Identity``
  when ``layer_id == 0`` — the embedding LayerNorm directly feeds it);
- **RoPE** instead of an absolute position table (rotate-half convention,
  cos/sin from ``concat(freqs, freqs)`` — modeling_modernbert.py
  ``apply_rotary_pos_emb``), with a **per-layer theta**: global layers use
  ``global_rope_theta`` (160k), local layers ``local_rope_theta`` (10k);
- **alternating global/local attention**: layer i attends globally when
  ``i % global_attn_every_n_layers == 0``, otherwise only within
  ``|q_pos - k_pos| <= local_attention // 2`` (ModernBertModel.
  _update_attention_mask builds exactly this distance mask);
- **GeGLU MLP**: ``Wo(gelu(in) * gate)`` where ``in, gate`` are the two
  halves of one fused ``Wi`` projection (ModernBertMLP.forward);
- **bias-free** linears and LayerNorms throughout (attention_bias =
  mlp_bias = norm_bias = False in every published checkpoint), and a final
  LayerNorm after the layer stack (ModernBertModel.final_norm).

Same deliberate extensions as models/bert.py: attention masking over padded
batches, sequence packing (block-diagonal by segment with per-segment
positions — RoPE depends on positions only through q/k rotation, so
restarting positions per segment reproduces the unpacked math exactly), and
the f32-accumulation dtype policy.

The layer loop is one ``lax.scan`` whose xs carry the stacked layer params
plus three tiny per-layer arrays (is_first, is_local, inv_freq) — one
compiled body for all 22 layers despite the global/local alternation.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.linear import linear, _layer_norm
from ..ops.qtensor import QTensor, gather_rows
from .config import BertConfig

Array = jax.Array

_MASK_BIAS = -1e9  # additive bias for masked keys (applied in f32)


def _layer_aux(config: BertConfig) -> dict:
    """Per-layer scan constants: is_first [L], is_local [L], inv_freq
    [L, D/2].  Folded into the compiled graph (shape/config-static)."""
    L, d = config.n_layer, config.head_dim
    every = config.global_attn_every
    is_global = np.array(
        [every <= 0 or (i % every == 0) for i in range(L)], dtype=bool
    )
    local_theta = config.local_rope_theta or config.rope_theta
    thetas = np.where(is_global, config.rope_theta, local_theta)
    # default RoPE inv_freq: theta ** -(2j/d) for j in 0..d/2 (HF
    # ROPE_INIT_FUNCTIONS["default"]; attention_scaling = 1)
    exponents = np.arange(0, d, 2, dtype=np.float64) / d
    inv_freq = thetas[:, None] ** -exponents[None, :]
    return {
        "is_first": jnp.asarray(np.arange(L) == 0),
        "is_local": jnp.asarray(~is_global),
        "inv_freq": jnp.asarray(inv_freq, dtype=jnp.float32),
    }


def _rope_cos_sin(pos: Array, inv_freq: Array, dtype):
    """cos/sin tables for rotate-half RoPE: pos [..., S] x inv_freq [D/2]
    -> ([..., S, D], [..., S, D]).  Computed in f32, cast to the activation
    dtype (HF forces f32 trig then casts to q.dtype)."""
    freqs = pos.astype(jnp.float32)[..., None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _apply_rope(t: Array, cos: Array, sin: Array) -> Array:
    """t [B, S, H, D] rotated by cos/sin [S, D] or [B, S, D] (rotate-half:
    the first D/2 dims pair with the last D/2, NOT interleaved)."""
    if cos.ndim == 2:  # plain batch: positions shared across rows
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # broadcast over heads
    d2 = t.shape[-1] // 2
    rot = jnp.concatenate([-t[..., d2:], t[..., :d2]], axis=-1)
    return t * cos + rot * sin


def _window_bias(s: int, window: int) -> np.ndarray:
    """[S, S] f32: 0 within |q - k| <= window // 2, masked outside (the
    sliding-window mask of ModernBertModel._update_attention_mask)."""
    pos = np.arange(s)
    dist = np.abs(pos[None, :] - pos[:, None])
    return np.where(dist <= window // 2, 0.0, _MASK_BIAS).astype(np.float32)


def _ln(x: Array, scale: Array, eps: float, out_dtype) -> Array:
    """Bias-free LayerNorm (norm_bias=False)."""
    return _layer_norm(x, scale, 0.0, eps, out_dtype)


def _attention(x, lp, aux, bias_global, bias_local, pos, config, opts,
               pad=None, seg=None):
    """Pre-normed input -> attention output (pre-residual).  bias_global /
    bias_local are the full additive score biases ([B, 1|S, S]-broadcastable
    f32) for the two layer kinds; `aux["is_local"]` selects per layer.

    `pad` ([B, S] f32 additive key-padding bias, plain batches) or `seg`
    ([B, S] int32 segment ids, packed batches) enables the fused Pallas
    path.  Inside the BSE envelope (128 <= S <= 1024) BOTH layer kinds run
    one projection-layout kernel with a head-invariant [1, S, S] bias that
    is zero for global layers and the sliding-window distance mask for
    local ones — the bias rides VMEM-resident across the batch grid and
    `where(is_local, ...)` folds the per-layer select into the traced scan
    body (modernbert_breakdown_v5e.json: this beat both the r4 cond
    local-window/global kernel pair and XLA at [32, 512]).  The window
    mask is valid for packed rows too: within a segment the restart
    positions are consecutive, so |pos_q - pos_k| equals the absolute row
    distance, and cross-segment pairs are masked by segment in-kernel.
    Past the envelope (S > 1024), local layers take the sliding-window
    kernel (out-of-window key tiles are never loaded — attention FLOPs
    scale with the window, not S², ModernBERT's whole point at its 8192
    context) under a `lax.cond` against the plain global kernel."""
    b, s, _ = x.shape
    d = config.head_dim
    q = linear(x, lp["q_w"], q4_impl=opts.q4_impl)
    h = q.shape[-1] // d  # tp-local head count
    q = q.reshape(b, s, h, d)
    k = linear(x, lp["k_w"], q4_impl=opts.q4_impl).reshape(b, s, h, d)
    v = linear(x, lp["v_w"], q4_impl=opts.q4_impl).reshape(b, s, h, d)

    cos, sin = _rope_cos_sin(pos, aux["inv_freq"], q.dtype)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    impl = opts.attn_impl
    # pallas needs per-device local arrays (single-device jit or a
    # shard_map body) and sublane-aligned tiles
    fusable = (
        (pad is not None or seg is not None)
        and s >= 128 and s % 8 == 0 and d % 8 == 0
        and (jax.device_count() == 1 or opts.inside_shard_map)
    )
    from ..ops.attention import fits_bias_bse

    bse_ok = fusable and s <= 1024 and fits_bias_bse(s, h * d, 1,
                                                     q.dtype.itemsize)
    if impl == "auto":
        # real-TPU record: the r4 transposed cond-kernel pair LOST 6% at
        # [32,512] (attn_bias_ab_v5e.json) so auto used to require
        # S >= 1024; the r5 resident-bias BSE route wins at [32,512]
        # (modernbert_breakdown_v5e.json), so auto now takes pallas
        # whenever fusable (BSE inside its envelope, windowed cond past it)
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "pallas" if (on_tpu and fusable and (bse_ok or s >= 1024)) \
            else "xla"
    elif impl == "pallas" and not fusable:
        impl = "xla"

    if impl == "pallas" and bse_ok:
        from ..ops.attention import (
            flash_attention_bias_bse,
            flash_attention_bias_packed_bse,
        )

        win_bias = jnp.asarray(_window_bias(s, config.local_window))
        qk_bias = jnp.where(aux["is_local"], win_bias, 0.0)[None]  # [1,S,S]
        qb = q.reshape(b, s, h * d)  # minor-dims merge: free, no transpose
        kb = k.reshape(b, s, h * d)
        vb = v.reshape(b, s, h * d)
        if seg is not None:
            att = flash_attention_bias_packed_bse(qb, kb, vb, seg, qk_bias,
                                                  h)
        else:
            att = flash_attention_bias_bse(qb, kb, vb, pad, qk_bias, h)
        return att
    if impl == "pallas" and seg is not None:
        # long packed rows: the segment kernels (windowed when max_seg_len
        # bounds the sentences) — no additive window bias support, so only
        # correct when the local window covers every in-segment distance;
        # callers guarantee that by routing here only for such shapes.
        # Today packed rows are <= 1024 (engine geometry), so this branch
        # is unreachable; fall through to XLA for safety.
        impl = "xla"
    if impl == "pallas":
        from ..ops.attention import (
            flash_attention,
            flash_attention_local,
            local_window_tiles,
        )

        win = config.local_window
        _, wmax = local_window_tiles(s, win)
        if wmax is not None:
            att = jax.lax.cond(
                aux["is_local"],
                lambda q, k, v: flash_attention_local(q, k, v, pad, win),
                lambda q, k, v: flash_attention(q, k, v, pad),
                q, k, v,
            )
        else:
            win_bias = jnp.asarray(_window_bias(s, win))  # [S, S] constant
            qk_bias = jnp.where(aux["is_local"], win_bias, 0.0)[None]
            att = flash_attention(q, k, v, pad, pos_bias=qk_bias)
    else:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        bias = jnp.where(aux["is_local"], bias_local, bias_global)
        scores = scores * (1.0 / d**0.5) + bias[:, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        att = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return att.reshape(b, s, h * d)


def _encoder_layer(x, lp, aux, bias_global, bias_local, pos, config, opts,
                   pad=None, seg=None):
    """One pre-norm block (ModernBertEncoderLayer.forward):
    x += Wo(attn(attn_norm(x))); x += Wo_mlp(gelu(in) * gate) over
    mlp_norm(x)."""
    eps = config.layer_norm_eps
    ln_x = _ln(x, lp["ln_att_scale"], eps, x.dtype)
    # layer 0's attn_norm is Identity; both branches are cheap next to the
    # matmuls and `where` keeps the scan body layer-invariant
    xn = jnp.where(aux["is_first"], x, ln_x)
    att = _attention(xn, lp, aux, bias_global, bias_local, pos, config, opts,
                     pad=pad, seg=seg)
    x = linear(
        att, lp["o_w"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
    )
    hn = _ln(x, lp["ln_out_scale"], eps, x.dtype)
    gelu = "gelu_tanh" if config.gelu == "tanh" else "gelu_erf"
    u = linear(hn, lp["ffn_up_w"], q4_impl=opts.q4_impl, activation=gelu)
    g = linear(hn, lp["ffn_gate_w"], q4_impl=opts.q4_impl)
    # the GeGLU gate multiply fuses into the down-projection's prologue —
    # a separate u * g op is a full [M, F] HBM pass between pallas_calls
    return linear(
        u, lp["ffn_down_w"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x, prologue_mul=g,
    )


def _embed(params, ids, config, opts):
    """LN(tok_embeddings[ids]) — no token-type or position table
    (ModernBertEmbeddings.forward)."""
    emb = params["embeddings"]
    word = emb["word"]
    if isinstance(word, QTensor):
        x = gather_rows(word, ids, dtype=jnp.float32)
    else:
        x = word[ids].astype(jnp.float32)
    return _ln(x, emb["ln_scale"], config.layer_norm_eps, opts.jdtype)


def _run_layers(x, params, aux, bias_global, bias_local, pos, config, opts,
                pad=None, seg=None):
    def body(x, xs):
        lp, a = xs
        return (
            _encoder_layer(x, lp, a, bias_global, bias_local, pos, config,
                           opts, pad=pad, seg=seg),
            None,
        )

    x, _ = jax.lax.scan(body, x, (params["layers"], aux))
    return _ln(x, params["final_ln_scale"], config.layer_norm_eps,
               jnp.float32)


def modernbert_embed_batch(params, ids, mask, config, opts,
                           gather_idx=None, token_states=False):
    """Token ids [B, S] + validity mask [B, S] -> embeddings [B, n_embd].

    Same contract as models.bert.bert_embed_batch (invoked through it when
    config.arch == "modernbert").  Positions are absolute ``arange(S)`` for
    every row — HF uses them regardless of padding; padded keys are masked.
    """
    from .bert import resolve_impls, pool_normalize, _output_head, _cast_output

    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    pad = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    bias_global = pad[:, None, :]  # [B, 1, S] broadcasts over queries
    win = jnp.asarray(_window_bias(s, config.local_window))
    bias_local = bias_global + win[None, :, :]
    pos = jnp.arange(s, dtype=jnp.int32)
    aux = _layer_aux(config)
    x = _run_layers(x, params, aux, bias_global, bias_local, pos, config,
                    opts, pad=pad)
    if token_states:
        return x  # final-norm output, already f32 (HF last_hidden_state)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out[gather_idx]
    return _cast_output(out, opts)


def modernbert_score_batch(params, ids, mask, config, opts):
    """Sequence-classification forward (cross-encoder rerankers, e.g.
    gte-reranker-modernbert-base): [B, S] ids -> [B, n_labels] f32 logits.

    HF ModernBertForSequenceClassification.forward: pool the final-norm
    hidden states per ``classifier_pooling`` (cls or mean — carried in
    config.pooling), then PredictionHead ``norm(gelu(dense(x)))`` with
    bias-free dense and LayerNorm, then a biased classifier.  ModernBERT
    pairs frame [CLS] a [SEP] b [SEP] with no token-type table, so there
    are no segment embeddings to add.
    """
    from .bert import resolve_impls, pool_normalize

    if "head" not in params:
        raise ValueError("model has no classification head (n_labels == 0)")
    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    pad = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    bias_global = pad[:, None, :]
    win = jnp.asarray(_window_bias(s, config.local_window))
    bias_local = bias_global + win[None, :, :]
    pos = jnp.arange(s, dtype=jnp.int32)
    aux = _layer_aux(config)
    x = _run_layers(x, params, aux, bias_global, bias_local, pos, config,
                    opts, pad=pad)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    head = params["head"]
    y = pooled.astype(jnp.float32) @ head["dense_w"]  # classifier_bias=False
    y = jax.nn.gelu(y, approximate=False)
    y = _ln(y, head["norm_scale"], config.layer_norm_eps, jnp.float32)
    return y @ head["out_w"] + head["out_b"]


def modernbert_embed_packed(params, ids, seg, pos, config, opts, *,
                            n_seg, gather_idx=None, max_seg_len=None):
    """Sequence-packed forward: [B, S] packed rows -> [B, n_seg, n_embd]
    (same contract as models.bert.bert_embed_packed).

    Positions restart at 0 per segment; RoPE rotates q and k by their own
    positions so attention scores depend only on within-segment relative
    offsets — packed outputs equal the unpacked per-sentence results.  The
    local-attention window compares per-segment positions (equal to the
    per-sentence absolute distances); cross-segment pairs are masked by the
    block-diagonal segment mask regardless.
    """
    from .bert import (
        resolve_impls,
        pool_normalize_packed,
        _output_head,
        _cast_output,
    )

    opts = resolve_impls(opts)
    x = _embed(params, ids, config, opts)
    allowed = seg[:, :, None] == seg[:, None, :]  # [B, Sq, Sk]
    key_ok = (seg >= 0)[:, None, :]  # padded KEYS mask for every query
    bias_global = jnp.where(
        allowed & key_ok, 0.0, _MASK_BIAS
    ).astype(jnp.float32)
    dist = jnp.abs(pos[:, None, :] - pos[:, :, None])
    bias_local = jnp.where(
        dist <= config.local_window // 2, bias_global, _MASK_BIAS
    )
    aux = _layer_aux(config)
    x = _run_layers(x, params, aux, bias_global, bias_local, pos, config,
                    opts, seg=seg)
    pooled = pool_normalize_packed(
        x, seg, pos, n_seg, config.pooling, normalize=False
    )
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out.reshape(-1, out.shape[-1])[gather_idx]
    return _cast_output(out, opts)
