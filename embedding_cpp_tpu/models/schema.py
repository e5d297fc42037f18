"""GGUF tensor-name schemas for the supported encoder families.

The reference stores tensors under verbatim HF BertModel names
(bert.cpp:623-652, convert-to-gguf.py keeps `state_dict()` names) and
accepts ONLY the BertModel architecture (convert-to-gguf.py:133-136).  We
keep the verbatim-HF-names convention and extend it to the sibling encoder
families sentence-transformers users actually deploy:

- "bert"        — HF BertModel names (the reference schema, unchanged);
- "roberta"     — HF RobertaModel/XLMRobertaModel: module structure and
                  therefore state-dict names are identical to BertModel;
                  only the shapes differ (position table carries
                  `pos_offset` extra rows, token-type table has 1 row);
- "distilbert"  — HF DistilBertModel: no token-type table, and the encoder
                  uses its own module names (transformer.layer.N.attention.
                  {q,k,v,out}_lin, sa_layer_norm, ffn.lin1/lin2,
                  output_layer_norm);
- "mpnet"       — HF MPNetModel: no token-type table, RoBERTa position
                  numbering (padding_idx 1), self-attention modules at
                  attention.attn.{q,k,v,o}, the attention LayerNorm directly
                  under attention, plus ONE encoder-global
                  relative_attention_bias table [buckets, n_head] shared by
                  every layer (MPNetEncoder.__init__).

This module is the single source of truth mapping those names to our param
tree; the param keys (q_w, ffn_up_w, ln_att_scale, ...) are arch-invariant
so the forward pass never branches on names.
"""
from __future__ import annotations

# --- BERT (and RoBERTa: identical names, shapes parameterized) --------------

# Embedding-level tensors: GGUF name -> (param key, expected shape fn).
# Shapes use c.emb_width (= n_embd unless factorized): ALBERT and
# ELECTRA-small share these names but store narrow tables (HF
# embedding_size, e.g. 128) projected up by an emb_proj linear (below).
EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.emb_width)),
    "embeddings.token_type_embeddings.weight": (
        "token_type",
        lambda c: (c.n_token_types, c.emb_width),
    ),
    "embeddings.position_embeddings.weight": (
        "position",
        # RoBERTa position tables carry pos_offset (= padding_idx + 1 = 2)
        # unused leading rows (HF create_position_ids_from_input_ids numbers
        # real tokens from padding_idx + 1)
        lambda c: (c.n_ctx + c.pos_offset, c.emb_width),
    ),
    "embeddings.LayerNorm.weight": ("ln_scale", lambda c: (c.emb_width,)),
    "embeddings.LayerNorm.bias": ("ln_bias", lambda c: (c.emb_width,)),
}

# Factorized-embedding projection: maps the LayerNormed emb_width embeddings
# to n_embd before layer 0.  ALBERT always has it (HF AlbertTransformer.
# embedding_hidden_mapping_in); ELECTRA only when embedding_size !=
# hidden_size (HF ElectraModel.embeddings_project).
_ALBERT_EMB_PROJ_TENSORS = {
    "encoder.embedding_hidden_mapping_in.weight": (
        "emb_proj_w", lambda c: (c.n_embd, c.emb_width),
    ),
    "encoder.embedding_hidden_mapping_in.bias": (
        "emb_proj_b", lambda c: (c.n_embd,),
    ),
}
_ELECTRA_EMB_PROJ_TENSORS = {
    "embeddings_project.weight": ("emb_proj_w", lambda c: (c.n_embd, c.emb_width)),
    "embeddings_project.bias": ("emb_proj_b", lambda c: (c.n_embd,)),
}

# Per-layer tensors: name template -> (param key, expected shape fn).
# Weight matrices are stored [out, in] (HF/numpy row-major convention).
LAYER_TENSORS = {
    "encoder.layer.{i}.attention.self.query.weight": ("q_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.query.bias": ("q_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.self.key.weight": ("k_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.key.bias": ("k_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.self.value.weight": ("v_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.value.bias": ("v_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.dense.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.output.dense.bias": ("o_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.LayerNorm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.LayerNorm.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.intermediate.dense.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    "encoder.layer.{i}.intermediate.dense.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    "encoder.layer.{i}.output.dense.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    "encoder.layer.{i}.output.dense.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
}

# --- ALBERT ------------------------------------------------------------------
# HF AlbertModel: ONE parameter set serves every layer (every published
# checkpoint has num_hidden_groups = inner_group_num = 1, validated at
# config construction), so the names carry no layer index and the param
# stack has leading dim 1 (the scan reuses it n_layer times).  Block math
# is exactly BERT's post-norm graph: attention + LayerNorm(x + attn), then
# ffn/ffn_output + full_layer_layer_norm(attn_out + ffn_out)
# (HF AlbertLayer.forward).  Embeddings use the BERT names at emb_width
# plus the encoder.embedding_hidden_mapping_in projection above.
_ALBERT_PREFIX = "encoder.albert_layer_groups.0.albert_layers.0."
ALBERT_LAYER_TENSORS = {
    _ALBERT_PREFIX + "attention.query.weight": ("q_w", lambda c: (c.n_embd, c.n_embd)),
    _ALBERT_PREFIX + "attention.query.bias": ("q_b", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "attention.key.weight": ("k_w", lambda c: (c.n_embd, c.n_embd)),
    _ALBERT_PREFIX + "attention.key.bias": ("k_b", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "attention.value.weight": ("v_w", lambda c: (c.n_embd, c.n_embd)),
    _ALBERT_PREFIX + "attention.value.bias": ("v_b", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "attention.dense.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    _ALBERT_PREFIX + "attention.dense.bias": ("o_b", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "attention.LayerNorm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "attention.LayerNorm.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "ffn.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    _ALBERT_PREFIX + "ffn.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    _ALBERT_PREFIX + "ffn_output.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    _ALBERT_PREFIX + "ffn_output.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "full_layer_layer_norm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    _ALBERT_PREFIX + "full_layer_layer_norm.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
}

# --- DistilBERT --------------------------------------------------------------

DISTILBERT_EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.position_embeddings.weight": (
        "position",
        lambda c: (c.n_ctx, c.n_embd),
    ),
    "embeddings.LayerNorm.weight": ("ln_scale", lambda c: (c.n_embd,)),
    "embeddings.LayerNorm.bias": ("ln_bias", lambda c: (c.n_embd,)),
}

DISTILBERT_LAYER_TENSORS = {
    "transformer.layer.{i}.attention.q_lin.weight": ("q_w", lambda c: (c.n_embd, c.n_embd)),
    "transformer.layer.{i}.attention.q_lin.bias": ("q_b", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.attention.k_lin.weight": ("k_w", lambda c: (c.n_embd, c.n_embd)),
    "transformer.layer.{i}.attention.k_lin.bias": ("k_b", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.attention.v_lin.weight": ("v_w", lambda c: (c.n_embd, c.n_embd)),
    "transformer.layer.{i}.attention.v_lin.bias": ("v_b", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.attention.out_lin.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    "transformer.layer.{i}.attention.out_lin.bias": ("o_b", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.sa_layer_norm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.sa_layer_norm.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.ffn.lin1.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    "transformer.layer.{i}.ffn.lin1.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    "transformer.layer.{i}.ffn.lin2.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    "transformer.layer.{i}.ffn.lin2.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.output_layer_norm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    "transformer.layer.{i}.output_layer_norm.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
}

# --- MPNet -------------------------------------------------------------------

MPNET_EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.position_embeddings.weight": (
        "position",
        # MPNet numbers positions RoBERTa-style from padding_idx + 1 = 2
        # (MPNetEmbeddings hard-codes padding_idx = 1)
        lambda c: (c.n_ctx + c.pos_offset, c.n_embd),
    ),
    "embeddings.LayerNorm.weight": ("ln_scale", lambda c: (c.n_embd,)),
    "embeddings.LayerNorm.bias": ("ln_bias", lambda c: (c.n_embd,)),
}

MPNET_LAYER_TENSORS = {
    "encoder.layer.{i}.attention.attn.q.weight": ("q_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.attn.q.bias": ("q_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.attn.k.weight": ("k_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.attn.k.bias": ("k_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.attn.v.weight": ("v_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.attn.v.bias": ("v_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.attn.o.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.attn.o.bias": ("o_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.LayerNorm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.LayerNorm.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.intermediate.dense.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    "encoder.layer.{i}.intermediate.dense.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    "encoder.layer.{i}.output.dense.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    "encoder.layer.{i}.output.dense.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
}

# Encoder-global tensors outside the embeddings/layers trees.  MPNet's
# relative-attention-bias table ([buckets, n_head], ONE table shared by all
# layers — MPNetEncoder.__init__ relative_attention_bias) is the only one.
MPNET_EXTRA_TENSORS = {
    "encoder.relative_attention_bias.weight": (
        "rel_attn_bias",
        lambda c: (c.rel_attn_buckets, c.n_head),
    ),
}

# --- ModernBERT --------------------------------------------------------------
# HF ModernBertModel state-dict names verbatim.  Everything is bias-free
# (attention_bias = mlp_bias = norm_bias = False in every published
# checkpoint); there is no token-type or absolute-position table (RoPE).
# Two tensors stay FUSED on disk exactly as HF stores them and are split at
# load time (models/params.py):
#   attn.Wqkv [3E, E]  -> q_w / k_w / v_w   (out-row thirds; a fused QKV
#                         projection measured 30% slower on v5e — see the
#                         fused-QKV adjudication commit)
#   mlp.Wi   [2F, E]   -> ffn_up_w / ffn_gate_w (GeGLU halves; split tensors
#                         keep Megatron column-parallel TP local: each
#                         device's gelu(up)*gate needs matching columns)
MODERNBERT_EMBEDDING_TENSORS = {
    "embeddings.tok_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.norm.weight": ("ln_scale", lambda c: (c.n_embd,)),
}

MODERNBERT_LAYER_TENSORS = {
    # attn_norm is ABSENT for layer 0 (nn.Identity — ModernBertEncoderLayer
    # .__init__); layer_tensor_names() drops it there and params.py
    # synthesizes a never-used ones row so the scan stack stays rectangular
    "layers.{i}.attn_norm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    "layers.{i}.attn.Wqkv.weight": ("wqkv", lambda c: (3 * c.n_embd, c.n_embd)),
    "layers.{i}.attn.Wo.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    "layers.{i}.mlp_norm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    "layers.{i}.mlp.Wi.weight": ("wi", lambda c: (2 * c.n_ff, c.n_embd)),
    "layers.{i}.mlp.Wo.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
}

MODERNBERT_EXTRA_TENSORS = {
    "final_norm.weight": ("final_ln_scale", lambda c: (c.n_embd,)),
}

# --- nomic-bert ----------------------------------------------------------------
# HF NomicBertModel state-dict names verbatim (modeling_hf_nomic_bert.py —
# the flash-attn bert rewrite behind nomic-embed-text-v1/v1.5 and
# nomic-bert-2048): fused attn.Wqkv [3E, E] (out-row thirds like ModernBERT),
# post-norm blocks (norm1 after attention, norm2 after the MLP), SwiGLU MLP
# split across fc11 (raw half) / fc12 (activated half) / fc2 — mapped so the
# framework's "ffn_up_w carries the activation" convention (models/t5.py
# _ffn, ModernBERT's Wi split) reproduces fc2(fc11(x) * silu(fc12(x))).
# Published checkpoints are bias-free on Wqkv/out_proj/fc* (config
# qkv_proj_bias = mlp_fc1_bias = mlp_fc2_bias = false); the bias rows join
# the schema only when config.attn_bias / config.ffn_bias say so.
NOMIC_EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.token_type_embeddings.weight": (
        "token_type", lambda c: (c.n_token_types, c.n_embd),
    ),
    "emb_ln.weight": ("ln_scale", lambda c: (c.n_embd,)),
    "emb_ln.bias": ("ln_bias", lambda c: (c.n_embd,)),
}

_NOMIC_PREFIX = "encoder.layers.{i}."
NOMIC_LAYER_TENSORS = {
    _NOMIC_PREFIX + "attn.Wqkv.weight": ("wqkv", lambda c: (3 * c.n_embd, c.n_embd)),
    _NOMIC_PREFIX + "attn.out_proj.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    _NOMIC_PREFIX + "norm1.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    _NOMIC_PREFIX + "norm1.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    _NOMIC_PREFIX + "norm2.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    _NOMIC_PREFIX + "norm2.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
    _NOMIC_PREFIX + "mlp.fc11.weight": ("ffn_gate_w", lambda c: (c.n_ff, c.n_embd)),
    _NOMIC_PREFIX + "mlp.fc12.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    _NOMIC_PREFIX + "mlp.fc2.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
}
_NOMIC_ATTN_BIAS_TENSORS = {
    _NOMIC_PREFIX + "attn.Wqkv.bias": ("wqkv_b", lambda c: (3 * c.n_embd,)),
    _NOMIC_PREFIX + "attn.out_proj.bias": ("o_b", lambda c: (c.n_embd,)),
}
_NOMIC_FFN_BIAS_TENSORS = {
    _NOMIC_PREFIX + "mlp.fc11.bias": ("ffn_gate_b", lambda c: (c.n_ff,)),
    _NOMIC_PREFIX + "mlp.fc12.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    _NOMIC_PREFIX + "mlp.fc2.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
}

# --- T5 encoder ----------------------------------------------------------------
# HF T5EncoderModel state-dict names verbatim (sentence-t5 / GTR dense
# retrievers).  Everything is bias-free; the word table is the `shared`
# embedding (encoder.embed_tokens ties to it and is skipped); ONE
# relative-attention-bias table lives on block 0 and is shared by every
# layer (HF T5Attention.compute_bias, has_relative_attention_bias only for
# the first block); RMSNorm scales only (T5LayerNorm has no bias).  The
# q/k/v projections map d_model -> attn_inner (= n_head * d_kv, which
# differs from d_model on t5-3b/xl-class checkpoints).
T5_EMBEDDING_TENSORS = {
    "shared.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
}

_T5L = "encoder.block.{i}.layer."
T5_LAYER_TENSORS = {
    _T5L + "0.SelfAttention.q.weight": ("q_w", lambda c: (c.attn_inner, c.n_embd)),
    _T5L + "0.SelfAttention.k.weight": ("k_w", lambda c: (c.attn_inner, c.n_embd)),
    _T5L + "0.SelfAttention.v.weight": ("v_w", lambda c: (c.attn_inner, c.n_embd)),
    _T5L + "0.SelfAttention.o.weight": ("o_w", lambda c: (c.n_embd, c.attn_inner)),
    _T5L + "0.layer_norm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    _T5L + "1.DenseReluDense.wo.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    _T5L + "1.layer_norm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
}
# v1.0 FFN: wi + act; v1.1 gated: act(wi_0) * wi_1 (HF T5DenseGatedActDense)
_T5_WI = {
    _T5L + "1.DenseReluDense.wi.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
}
_T5_WI_GATED = {
    _T5L + "1.DenseReluDense.wi_0.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    _T5L + "1.DenseReluDense.wi_1.weight": ("ffn_gate_w", lambda c: (c.n_ff, c.n_embd)),
}

T5_EXTRA_TENSORS = {
    "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight": (
        "rel_attn_bias",
        lambda c: (c.rel_attn_buckets, c.n_head),
    ),
    "encoder.final_layer_norm.weight": ("final_ln_scale", lambda c: (c.n_embd,)),
}

# --- DeBERTa-v2/v3 -------------------------------------------------------------
# HF DebertaV2Model state-dict names verbatim (the v3 feature set: no
# absolute-position or token-type tables, shared att key, log-bucketed
# relative positions).  The q/k/v projections are *_proj; the block is
# otherwise BERT's post-norm layout.  Encoder-global: the shared relative
# position embedding table [2*buckets, E] plus its LayerNorm
# (norm_rel_ebd="layer_norm" — encoder.LayerNorm).
DEBERTA_EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.LayerNorm.weight": ("ln_scale", lambda c: (c.n_embd,)),
    "embeddings.LayerNorm.bias": ("ln_bias", lambda c: (c.n_embd,)),
}

DEBERTA_LAYER_TENSORS = {
    "encoder.layer.{i}.attention.self.query_proj.weight": ("q_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.query_proj.bias": ("q_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.self.key_proj.weight": ("k_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.key_proj.bias": ("k_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.self.value_proj.weight": ("v_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.self.value_proj.bias": ("v_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.dense.weight": ("o_w", lambda c: (c.n_embd, c.n_embd)),
    "encoder.layer.{i}.attention.output.dense.bias": ("o_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.LayerNorm.weight": ("ln_att_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.attention.output.LayerNorm.bias": ("ln_att_bias", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.intermediate.dense.weight": ("ffn_up_w", lambda c: (c.n_ff, c.n_embd)),
    "encoder.layer.{i}.intermediate.dense.bias": ("ffn_up_b", lambda c: (c.n_ff,)),
    "encoder.layer.{i}.output.dense.weight": ("ffn_down_w", lambda c: (c.n_embd, c.n_ff)),
    "encoder.layer.{i}.output.dense.bias": ("ffn_down_b", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.weight": ("ln_out_scale", lambda c: (c.n_embd,)),
    "encoder.layer.{i}.output.LayerNorm.bias": ("ln_out_bias", lambda c: (c.n_embd,)),
}

DEBERTA_EXTRA_TENSORS = {
    "encoder.rel_embeddings.weight": (
        "rel_emb",
        lambda c: (2 * c.rel_attn_buckets, c.n_embd),
    ),
    "encoder.LayerNorm.weight": ("rel_ln_scale", lambda c: (c.n_embd,)),
    "encoder.LayerNorm.bias": ("rel_ln_bias", lambda c: (c.n_embd,)),
}

# Optional sentence-transformers Dense head (our extension; present only
# when config.dense_out > 0): pooled @ W.T + b between pooling and L2 norm.
DENSE_TENSORS = {
    "dense.linear.weight": ("dense_w", lambda c: (c.dense_out, c.n_embd)),
    "dense.linear.bias": ("dense_b", lambda c: (c.dense_out,)),
}

# ColBERT per-token projection (our extension; present only when
# config.colbert_dim > 0): the bias-free `linear` of HF_ColBERT applied to
# every final hidden state (token vectors L2-normalize downstream).
COLBERT_TENSORS = {
    "linear.weight": ("colbert_w", lambda c: (c.colbert_dim, c.n_embd)),
}

# --- sequence-classification heads (cross-encoder rerankers) ------------------
# Present only when config.n_labels > 0.  Every family computes
# logits = out(act(dense(h_cls))); only the HF state-dict names differ:
#   bert        — BertPooler (tanh) + classifier
#                 (HF BertForSequenceClassification.forward);
#   roberta     — RobertaClassificationHead: dense + tanh + out_proj on the
#                 first token (XLM-R rerankers, e.g. bge-reranker, share it);
#   mpnet       — MPNetClassificationHead, identical names to roberta;
#   distilbert  — pre_classifier + ReLU + classifier
#                 (HF DistilBertForSequenceClassification.forward).
# The reference has no classification support at all (bert.h:41-92 is
# embeddings-only); this is a framework extension.
_BERT_HEAD_TENSORS = {
    "pooler.dense.weight": ("head_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "pooler.dense.bias": ("head_dense_b", lambda c: (c.n_embd,)),
    "classifier.weight": ("head_out_w", lambda c: (c.n_labels, c.n_embd)),
    "classifier.bias": ("head_out_b", lambda c: (c.n_labels,)),
}
_ROBERTA_HEAD_TENSORS = {
    "classifier.dense.weight": ("head_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "classifier.dense.bias": ("head_dense_b", lambda c: (c.n_embd,)),
    "classifier.out_proj.weight": ("head_out_w", lambda c: (c.n_labels, c.n_embd)),
    "classifier.out_proj.bias": ("head_out_b", lambda c: (c.n_labels,)),
}
_DISTILBERT_HEAD_TENSORS = {
    "pre_classifier.weight": ("head_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "pre_classifier.bias": ("head_dense_b", lambda c: (c.n_embd,)),
    "classifier.weight": ("head_out_w", lambda c: (c.n_labels, c.n_embd)),
    "classifier.bias": ("head_out_b", lambda c: (c.n_labels,)),
}
# ModernBertPredictionHead: bias-free dense + gelu + bias-free LayerNorm
# (classifier_bias = norm_bias = False, the only published configuration),
# then a biased classifier; pooling per classifier_pooling (cls|mean) runs
# BEFORE the head (ModernBertForSequenceClassification.forward).
_MODERNBERT_HEAD_TENSORS = {
    "head.dense.weight": ("head_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "head.norm.weight": ("head_norm_scale", lambda c: (c.n_embd,)),
    "classifier.weight": ("head_out_w", lambda c: (c.n_labels, c.n_embd)),
    "classifier.bias": ("head_out_b", lambda c: (c.n_labels,)),
}
# AlbertModel's pooler is a bare nn.Linear (pooler.weight, not
# pooler.dense.weight) + tanh; AlbertForSequenceClassification then applies
# classifier on the pooled output.
_ALBERT_HEAD_TENSORS = {
    "pooler.weight": ("head_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "pooler.bias": ("head_dense_b", lambda c: (c.n_embd,)),
    "classifier.weight": ("head_out_w", lambda c: (c.n_labels, c.n_embd)),
    "classifier.bias": ("head_out_b", lambda c: (c.n_labels,)),
}
_HEAD_TENSORS_BY_ARCH = {
    "bert": _BERT_HEAD_TENSORS,
    "roberta": _ROBERTA_HEAD_TENSORS,
    "mpnet": _ROBERTA_HEAD_TENSORS,
    "distilbert": _DISTILBERT_HEAD_TENSORS,
    "modernbert": _MODERNBERT_HEAD_TENSORS,
    "albert": _ALBERT_HEAD_TENSORS,
    # ElectraClassificationHead: dense + gelu + out_proj on the first token
    # (same state-dict names as RobertaClassificationHead; activation
    # differs — config.head_activation carries "gelu")
    "electra": _ROBERTA_HEAD_TENSORS,
    # DebertaV2 ContextPooler: pooler.dense + pooler_hidden_act (gelu) on
    # the first token, then classifier — the BERT head names verbatim
    "deberta": _BERT_HEAD_TENSORS,
}


def head_tensors(config) -> dict:
    """Classification-head tensor map (empty for embedding models)."""
    if not getattr(config, "n_labels", 0):
        return {}
    return _HEAD_TENSORS_BY_ARCH[config.arch]


# --- MLM prediction heads (SPLADE sparse encoders) -----------------------------
# Present only when config.mlm_head.  Every family computes
# logits = LayerNorm(gelu(dense(h))) @ word_embeddingsᵀ + bias — the decoder
# projection is TIED to the word table (HF ties them by default; conversion
# rejects untied checkpoints), so only the transform linear, its LayerNorm
# and the |V| output bias are stored.  HF state-dict names per family:
#   bert        — BertLMPredictionHead: cls.predictions.transform.* +
#                 cls.predictions.bias (decoder.weight/bias are tied views);
#   roberta     — RobertaLMHead: lm_head.dense/layer_norm + lm_head.bias;
#   distilbert  — vocab_transform + vocab_layer_norm + vocab_projector.bias.
# The reference has no MLM/sparse surface at all (bert.h:41-92).
_BERT_MLM_TENSORS = {
    "cls.predictions.transform.dense.weight": (
        "mlm_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "cls.predictions.transform.dense.bias": (
        "mlm_dense_b", lambda c: (c.n_embd,)),
    "cls.predictions.transform.LayerNorm.weight": (
        "mlm_ln_scale", lambda c: (c.n_embd,)),
    "cls.predictions.transform.LayerNorm.bias": (
        "mlm_ln_bias", lambda c: (c.n_embd,)),
    "cls.predictions.bias": ("mlm_bias", lambda c: (c.n_vocab,)),
}
_ROBERTA_MLM_TENSORS = {
    "lm_head.dense.weight": ("mlm_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "lm_head.dense.bias": ("mlm_dense_b", lambda c: (c.n_embd,)),
    "lm_head.layer_norm.weight": ("mlm_ln_scale", lambda c: (c.n_embd,)),
    "lm_head.layer_norm.bias": ("mlm_ln_bias", lambda c: (c.n_embd,)),
    "lm_head.bias": ("mlm_bias", lambda c: (c.n_vocab,)),
}
_DISTILBERT_MLM_TENSORS = {
    "vocab_transform.weight": ("mlm_dense_w", lambda c: (c.n_embd, c.n_embd)),
    "vocab_transform.bias": ("mlm_dense_b", lambda c: (c.n_embd,)),
    "vocab_layer_norm.weight": ("mlm_ln_scale", lambda c: (c.n_embd,)),
    "vocab_layer_norm.bias": ("mlm_ln_bias", lambda c: (c.n_embd,)),
    "vocab_projector.bias": ("mlm_bias", lambda c: (c.n_vocab,)),
}
_MLM_TENSORS_BY_ARCH = {
    "bert": _BERT_MLM_TENSORS,
    "roberta": _ROBERTA_MLM_TENSORS,
    "distilbert": _DISTILBERT_MLM_TENSORS,
}


def mlm_tensors(config) -> dict:
    """MLM prediction-head tensor map (empty unless config.mlm_head)."""
    if not getattr(config, "mlm_head", False):
        return {}
    return _MLM_TENSORS_BY_ARCH[config.arch]


# Tied views of the MLM decoder projection that ForMaskedLM state dicts may
# carry alongside the canonical names above — the converter verifies the tie
# and drops these (the decoder IS the word table / cls.predictions.bias).
MLM_TIED_TENSORS = frozenset(
    {
        "cls.predictions.decoder.weight",
        "cls.predictions.decoder.bias",
        "lm_head.decoder.weight",
        "lm_head.decoder.bias",
        "vocab_projector.weight",
    }
)

# Tensors the converter intentionally drops (convert-to-gguf.py:294-321),
# plus the same-role buffers of the sibling families (token_type_ids is a
# registered non-persistent buffer in newer transformers checkpoints).
SKIPPED_TENSORS = frozenset(
    {
        "embeddings.position_ids",
        "embeddings.token_type_ids",
        "pooler.dense.weight",
        "pooler.dense.bias",
        # ALBERT's pooler is a bare linear (pooler.weight); embedding
        # models drop it like BERT's pooler.dense
        "pooler.weight",
        "pooler.bias",
        # T5's encoder.embed_tokens ties to shared (the schema loads
        # "shared.weight"); state dicts carry both names for one tensor
        "encoder.embed_tokens.weight",
    }
)

def embedding_tensors(config) -> dict:
    """Embedding-level tensor map for the config's architecture.  RoBERTa,
    ALBERT and ELECTRA reuse the BERT names (the latter two at emb_width,
    plus their projection linear); DistilBERT and MPNet have no token-type
    table."""
    if config.arch == "distilbert":
        return DISTILBERT_EMBEDDING_TENSORS
    if config.arch == "mpnet":
        return MPNET_EMBEDDING_TENSORS
    if config.arch == "modernbert":
        return MODERNBERT_EMBEDDING_TENSORS
    if config.arch == "t5":
        return T5_EMBEDDING_TENSORS
    if config.arch == "nomic-bert":
        return NOMIC_EMBEDDING_TENSORS
    if config.arch == "deberta":
        base = DEBERTA_EMBEDDING_TENSORS
        if config.n_token_types:
            # v3 checkpoints have type_vocab_size=0; some v2 fine-tunes
            # carry a table (DebertaV2Embeddings adds it when > 0)
            base = dict(base)
            base["embeddings.token_type_embeddings.weight"] = (
                "token_type",
                lambda c: (c.n_token_types, c.n_embd),
            )
        return base
    base = EMBEDDING_TENSORS
    if config.n_token_types == 0:
        # defensive: a bert-schema config without token types drops the row
        base = {k: v for k, v in base.items() if v[0] != "token_type"}
    if getattr(config, "n_embd_emb", 0):
        base = dict(base)
        base.update(
            _ALBERT_EMB_PROJ_TENSORS
            if config.arch == "albert"
            else _ELECTRA_EMB_PROJ_TENSORS
        )
    return base


def _layer_templates(config) -> dict:
    if config.arch == "distilbert":
        return DISTILBERT_LAYER_TENSORS
    if config.arch == "mpnet":
        return MPNET_LAYER_TENSORS
    if config.arch == "modernbert":
        return MODERNBERT_LAYER_TENSORS
    if config.arch == "albert":
        return ALBERT_LAYER_TENSORS
    if config.arch == "t5":
        return {**T5_LAYER_TENSORS,
                **(_T5_WI_GATED if config.ffn_gated else _T5_WI)}
    if config.arch == "deberta":
        return DEBERTA_LAYER_TENSORS
    if config.arch == "nomic-bert":
        t = dict(NOMIC_LAYER_TENSORS)
        if config.attn_bias:
            t.update(_NOMIC_ATTN_BIAS_TENSORS)
        if config.ffn_bias:
            t.update(_NOMIC_FFN_BIAS_TENSORS)
        return t
    return LAYER_TENSORS


def extra_tensors(config) -> dict:
    """Encoder-global tensors (outside embeddings/layers): MPNet's shared
    relative-attention-bias table when rel_attn_buckets > 0; ModernBERT's
    final LayerNorm scale; T5's block-0 bias table + final RMSNorm."""
    arch = getattr(config, "arch", "bert")
    if arch == "t5":
        return T5_EXTRA_TENSORS
    if arch == "deberta":
        return DEBERTA_EXTRA_TENSORS
    if getattr(config, "rel_attn_buckets", 0):
        return MPNET_EXTRA_TENSORS
    if arch == "modernbert":
        return MODERNBERT_EXTRA_TENSORS
    return {}


def layer_tensor_names(i: int, config=None) -> dict[str, tuple[str, object]]:
    templates = LAYER_TENSORS if config is None else _layer_templates(config)
    named = {t.format(i=i): v for t, v in templates.items()}
    if config is not None and config.arch == "modernbert" and i == 0:
        # layer 0's attn_norm is nn.Identity — the tensor does not exist
        named = {k: v for k, v in named.items() if v[0] != "ln_att_scale"}
    return named


def all_tensor_names(n_layer: int, config=None) -> list[str]:
    names = (
        list(EMBEDDING_TENSORS)
        if config is None
        else list(embedding_tensors(config))
    )
    if config is not None and getattr(config, "shared_layers", False):
        n_layer = 1  # ALBERT: one parameter set serves every layer
    for i in range(n_layer):
        names.extend(layer_tensor_names(i, config))
    if config is not None:
        names.extend(extra_tensors(config))
        names.extend(head_tensors(config))
        names.extend(mlm_tensors(config))
        if getattr(config, "colbert_dim", 0):
            names.extend(COLBERT_TENSORS)
    return names
