"""DeBERTa-v2/v3 encoder forward pass (pure JAX).

HF DebertaV2Model with the v3-generation feature set (deberta-v3-*,
mdeberta-v3-*, and the cross-encoder rerankers built on them — mxbai-rerank
v1, nli-deberta-v3): validated at config construction
(models/config.py from_hf_config "deberta-v2").  The block is BERT's
post-norm layout (attention + add&norm, GELU FFN + add&norm); everything
distinctive lives in the **disentangled attention**
(HF DisentangledSelfAttention.forward / disentangled_attention_bias):

- relative positions are **log-bucketed**: linear within ±bucket_size/2,
  log-spaced out to max_relative_positions (make_log_bucket_position);
- ONE relative-position embedding table [2*buckets, E]
  (encoder.rel_embeddings) shared by every layer, LayerNormed once
  (norm_rel_ebd="layer_norm", encoder.LayerNorm);
- each layer adds, to the content-content scores, a content->position term
  (q against key_proj(rel_emb), gathered at bucket(q-k)) and a
  position->content term (k against query_proj(rel_emb), gathered at
  bucket(k-q) and transposed) — share_att_key=True reuses the layer's own
  q/k projections, so the table adds NO per-layer parameters;
- all three terms divide by sqrt(3·d) (scale_factor = 1 + |{c2p,p2c}|).

v3 has no absolute-position table (position_biased_input=False) and no
token-type table (type_vocab_size=0); embeddings are LN(word[ids]) with
eps 1e-7.  Same extensions as models/bert.py: padded-batch masking,
sequence packing (buckets rebuilt from per-segment positions), f32
accumulation.  The reference engine loads none of this family
(convert-to-gguf.py:133-136 accepts BertModel only).
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.linear import linear
from ..ops.qtensor import QTensor, gather_rows
from .config import BertConfig

Array = jax.Array

_MASK_BIAS = -1e9


def deberta_log_bucket(rel, bucket_size: int, max_position: int, xp=np):
    """HF make_log_bucket_position: identity within ±bucket_size/2,
    sign-preserving log-spaced buckets out to max_position.  `rel` is
    q_pos - k_pos (NOTE: the opposite sign convention from T5's bucketing).
    Works on numpy (static positions, trace-time constant) or jnp (packed
    rows) via `xp`."""
    sign = xp.sign(rel)
    mid = bucket_size // 2
    abs_pos = xp.where((rel < mid) & (rel > -mid), mid - 1, xp.abs(rel))
    log_pos = (
        xp.ceil(
            xp.log(abs_pos.astype(xp.float32) / mid)
            / math.log((max_position - 1) / mid)
            * (mid - 1)
        )
        + mid
    )
    return xp.where(
        abs_pos <= mid, rel, (log_pos * sign).astype(xp.int32)
    ).astype(xp.int32)


def _gather_indices(rel, span: int, xp=np):
    """(c2p_pos, p2c_pos): clamped gather indices into the 2*span table.
    rel[q, k] (or [B, q, k]) = bucket(q_pos - k_pos)."""
    c2p = xp.clip(rel + span, 0, span * 2 - 1)
    p2c = xp.clip(-rel + span, 0, span * 2 - 1)
    return c2p, p2c


def _embed(params, ids, config, opts, type_ids=None):
    """LN(word[ids]) — v3 adds no position embeddings
    (position_biased_input=False); a token-type table participates only
    when the checkpoint carries one (type_vocab_size > 0)."""
    from ..ops.linear import _layer_norm

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


def _rel_table(params, config, opts):
    """LayerNormed shared relative-position embedding table [2*span, E]
    (DebertaV2Encoder.get_rel_embedding), computed once per forward."""
    from ..ops.linear import _layer_norm

    span = config.rel_attn_buckets
    table = params["rel_emb"][: span * 2]
    return _layer_norm(
        table, params["rel_ln_scale"], params["rel_ln_bias"],
        config.layer_norm_eps, opts.jdtype,
    )


def _attention(x, lp, rel_table, c2p_pos, p2c_pos, mask_bias, config, opts,
               seg=None):
    """Disentangled self-attention.  c2p_pos/p2c_pos: int32 gather indices,
    [S, S] (plain; trace-time constants) or [B, S, S] (packed XLA rows);
    mask_bias: [B, S] key-padding bias or [B, Sq, Sk] segment bias; `seg`
    ([B, S] int32, packed rows) routes the fused segment kernel."""
    b, s, e = x.shape
    d = config.head_dim
    q = linear(x, lp["q_w"], lp["q_b"], q4_impl=opts.q4_impl)
    h = q.shape[-1] // d  # tp-local head count
    q = q.reshape(b, s, h, d)
    k = linear(x, lp["k_w"], lp["k_b"], q4_impl=opts.q4_impl).reshape(b, s, h, d)
    v = linear(x, lp["v_w"], lp["v_b"], q4_impl=opts.q4_impl).reshape(b, s, h, d)

    # share_att_key: the rel table goes through THIS layer's q/k
    # projections (bias included) — under tp the projections are already
    # column-sharded, so pos_q/pos_k come out head-local with no slicing
    span2 = rel_table.shape[0]
    pos_q = linear(rel_table, lp["q_w"], lp["q_b"],
                   q4_impl=opts.q4_impl).reshape(span2, h, d)
    pos_k = linear(rel_table, lp["k_w"], lp["k_b"],
                   q4_impl=opts.q4_impl).reshape(span2, h, d)

    impl = opts.attn_impl
    if impl == "auto":
        # pallas needs per-device local arrays: single-device jit, or inside
        # a shard_map body (GSPMD jit cannot partition a pallas_call)
        local = jax.device_count() == 1 or opts.inside_shard_map
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "pallas" if (on_tpu and local) else "xla"
    if impl == "pallas" and (
        (seg is None and mask_bias.ndim != 2)  # legacy [B,S,S] bias callers
        or s % 64 or d % 8 or s > 512  # whole-sequence kernel tiles
    ):
        impl = "xla"
    if impl == "pallas":
        from ..ops.deberta_attention import (
            disentangled_attention,
            disentangled_attention_packed,
        )

        if seg is not None:
            # packed rows: the segment twin of the fused kernel — plain
            # absolute-offset delta tables (within a segment the restart
            # positions are consecutive, so bucket(pos_q - pos_k) equals
            # bucket(q - k) on every unmasked pair; cross-segment pairs
            # mask to exact softmax zero), block-diagonal mask in-kernel
            # (deberta_packed_ab_v5e.json)
            att = disentangled_attention_packed(
                q, k, v, seg, pos_k, pos_q,
                config.rel_attn_buckets, config.rel_attn_max_dist,
            )
        else:
            att = disentangled_attention(
                q, k, v, mask_bias, pos_k, pos_q,
                config.rel_attn_buckets, config.rel_attn_max_dist,
            )
        return att.reshape(b, s, h * d)

    scale = 1.0 / math.sqrt(d * 3)  # scale_factor = 1 + |{c2p, p2c}|
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    # content -> position: q against the projected table, gathered at
    # bucket(q_pos - k_pos)
    c2p = jnp.einsum(
        "bqhd,rhd->bhqr", q, pos_k, preferred_element_type=jnp.float32
    )  # [B, H, S, 2*span]
    idx = c2p_pos if c2p_pos.ndim == 3 else c2p_pos[None]
    scores = scores + jnp.take_along_axis(
        c2p, idx[:, None, :, :], axis=-1
    ) * scale

    # position -> content: k against the projected table, gathered at
    # bucket(k_pos - q_pos) then transposed back to [q, k]
    p2c = jnp.einsum(
        "bkhd,rhd->bhkr", k, pos_q, preferred_element_type=jnp.float32
    )
    idx = p2c_pos if p2c_pos.ndim == 3 else p2c_pos[None]
    gathered = jnp.take_along_axis(p2c, idx[:, None, :, :], axis=-1)
    scores = scores + jnp.swapaxes(gathered, -1, -2) * scale

    if mask_bias.ndim == 2:
        scores = scores + mask_bias[:, None, None, :]
    else:
        scores = scores + mask_bias[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return att.reshape(b, s, h * d)


def _encoder_layer(x, lp, rel_table, c2p_pos, p2c_pos, mask_bias, config,
                   opts, seg=None):
    """Post-norm block (DebertaV2Layer.forward): attn + add&norm, GELU FFN
    + add&norm — identical residual layout to BERT (models/bert.py
    encoder_layer), only the attention differs."""
    att = _attention(x, lp, rel_table, c2p_pos, p2c_pos, mask_bias, config,
                     opts, seg=seg)
    x = linear(
        att, lp["o_w"], lp["o_b"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
        ln=(lp["ln_att_scale"], lp["ln_att_bias"], config.layer_norm_eps),
    )
    h = linear(
        x, lp["ffn_up_w"], lp["ffn_up_b"], q4_impl=opts.q4_impl,
        activation="gelu_tanh" if config.gelu == "tanh" else "gelu_erf",
    )
    return linear(
        h, lp["ffn_down_w"], lp["ffn_down_b"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
        ln=(lp["ln_out_scale"], lp["ln_out_bias"], config.layer_norm_eps),
    )


def _run_layers(x, params, rel_table, c2p_pos, p2c_pos, mask_bias, config,
                opts, seg=None):
    def body(x, lp):
        return _encoder_layer(x, lp, rel_table, c2p_pos, p2c_pos, mask_bias,
                              config, opts, seg=seg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def _plain_indices(s: int, config: BertConfig):
    rel = deberta_log_bucket(
        np.arange(s)[:, None] - np.arange(s)[None, :],
        config.rel_attn_buckets, config.rel_attn_max_dist, xp=np,
    )
    c2p, p2c = _gather_indices(rel, config.rel_attn_buckets, xp=np)
    return jnp.asarray(c2p), jnp.asarray(p2c)


def deberta_embed_batch(params, ids, mask, config, opts, gather_idx=None,
                        token_states=False):
    """Token ids [B, S] + validity mask [B, S] -> embeddings [B, n_embd]
    (same contract as models.bert.bert_embed_batch, dispatched through it
    when config.arch == "deberta")."""
    from .bert import (
        _cast_output,
        _output_head,
        pool_normalize,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts)
    rel_table = _rel_table(params, config, opts)
    c2p_pos, p2c_pos = _plain_indices(s, config)
    pad = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    x = _run_layers(x, params, rel_table, c2p_pos, p2c_pos, pad, config, opts)
    if token_states:
        return x.astype(jnp.float32)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out[gather_idx]
    return _cast_output(out, opts)


def deberta_score_batch(params, ids, mask, config, opts, type_ids=None):
    """Cross-encoder forward: [B, S] ids -> [B, n_labels] f32 logits.

    HF DebertaV2ForSequenceClassification: ContextPooler
    (dense + pooler_hidden_act on the FIRST token) then classifier — the
    generic head math (models.bert.classifier_head) with head_activation
    "gelu" by default."""
    from .bert import classifier_head, resolve_impls

    if "head" not in params:
        raise ValueError("model has no classification head (n_labels == 0)")
    opts = resolve_impls(opts)
    s = ids.shape[-1]
    x = _embed(params, ids, config, opts, type_ids=type_ids)
    rel_table = _rel_table(params, config, opts)
    c2p_pos, p2c_pos = _plain_indices(s, config)
    pad = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    x = _run_layers(x, params, rel_table, c2p_pos, p2c_pos, pad, config, opts)
    h = x[..., 0, :].astype(jnp.float32)
    return classifier_head(h, params["head"], config.head_activation)


def deberta_embed_packed(params, ids, seg, pos, config, opts, *, n_seg,
                         gather_idx=None, max_seg_len=None):
    """Sequence-packed forward: [B, S] packed rows -> [B, n_seg, n_embd]
    (same contract as models.bert.bert_embed_packed).  The gather indices
    rebuild from per-segment restart positions (within a segment
    q_pos - k_pos equals the absolute difference); cross-segment pairs get
    arbitrary buckets but are masked block-diagonal."""
    from .bert import (
        _cast_output,
        _output_head,
        pool_normalize_packed,
        resolve_impls,
    )

    opts = resolve_impls(opts)
    x = _embed(params, ids, config, opts)
    rel_table = _rel_table(params, config, opts)
    rel = deberta_log_bucket(
        pos[:, :, None] - pos[:, None, :],
        config.rel_attn_buckets, config.rel_attn_max_dist, xp=jnp,
    )
    c2p_pos, p2c_pos = _gather_indices(rel, config.rel_attn_buckets, xp=jnp)
    allowed = seg[:, :, None] == seg[:, None, :]
    key_ok = (seg >= 0)[:, None, :]
    seg_bias = jnp.where(allowed & key_ok, 0.0, _MASK_BIAS).astype(jnp.float32)
    x = _run_layers(x, params, rel_table, c2p_pos, p2c_pos, seg_bias, config,
                    opts, seg=seg)
    pooled = pool_normalize_packed(
        x, seg, pos, n_seg, config.pooling, normalize=False
    )
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out.reshape(-1, out.shape[-1])[gather_idx]
    return _cast_output(out, opts)
