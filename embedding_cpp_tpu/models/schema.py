"""GGUF tensor-name schema for BERT-family models.

The reference stores tensors under verbatim HF BertModel names
(bert.cpp:623-652, convert-to-gguf.py keeps `state_dict()` names).  This
module is the single source of truth mapping those names to our param tree.
"""
from __future__ import annotations

# Embedding-level tensors: GGUF name -> (param key, expected shape fn)
EMBEDDING_TENSORS = {
    "embeddings.word_embeddings.weight": ("word", lambda c: (c.n_vocab, c.n_embd)),
    "embeddings.token_type_embeddings.weight": (
        "token_type",
        lambda c: (c.n_token_types, c.n_embd),
    ),
    "embeddings.position_embeddings.weight": (
        "position",
        lambda c: (c.n_ctx, c.n_embd),
    ),
    "embeddings.LayerNorm.weight": ("ln_scale", lambda c: (c.n_embd,)),
    "embeddings.LayerNorm.bias": ("ln_bias", lambda c: (c.n_embd,)),
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

# Optional sentence-transformers Dense head (our extension; present only
# when config.dense_out > 0): pooled @ W.T + b between pooling and L2 norm.
DENSE_TENSORS = {
    "dense.linear.weight": ("dense_w", lambda c: (c.dense_out, c.n_embd)),
    "dense.linear.bias": ("dense_b", lambda c: (c.dense_out,)),
}

# Tensors the converter intentionally drops (convert-to-gguf.py:294-321).
SKIPPED_TENSORS = frozenset(
    {"embeddings.position_ids", "pooler.dense.weight", "pooler.dense.bias"}
)

# 2-D weight matrices eligible for quantization — same filter the reference
# quantizer applies: name ends with "weight" and n_dims == 2
# (bert.cpp:1430-1436). Note this includes the embedding tables.
QUANTIZABLE_KEYS = frozenset(
    {"word", "token_type", "position", "q_w", "k_w", "v_w", "o_w",
     "ffn_up_w", "ffn_down_w"}
)


def layer_tensor_names(i: int) -> dict[str, tuple[str, object]]:
    return {t.format(i=i): v for t, v in LAYER_TENSORS.items()}


def all_tensor_names(n_layer: int) -> list[str]:
    names = list(EMBEDDING_TENSORS)
    for i in range(n_layer):
        names.extend(layer_tensor_names(i))
    return names
