"""GGUF format constants for the TPU-native embedding engine.

Mirrors the *format semantics* (not the code) of the reference implementation:
key names come from /root/reference/gguf.h:259-302 (LLM_KV_NAMES) and the
HF->GGUF converter /root/reference/models/convert-to-gguf.py:175-257; tensor
value types come from ggml's GGUF spec (ggml_type enum) as consumed by the
reference loader (/root/reference/bert.cpp:209-252).
"""
from __future__ import annotations

import enum

GGUF_MAGIC = b"GGUF"
GGUF_DEFAULT_ALIGNMENT = 32

# GGUF versions we can read; we write v2 (what the reference's pinned ggml and
# gguf==0.5.1 python package speak).
GGUF_SUPPORTED_VERSIONS = (1, 2, 3)
GGUF_WRITE_VERSION = 2


class GGUFValueType(enum.IntEnum):
    """Metadata (kv) value types — GGUF spec."""

    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


class GGMLType(enum.IntEnum):
    """Tensor dtypes (ggml_type values as stored in GGUF tensor directory).

    Only the subset the reference engine supports (f32/f16/q4_0/q4_1,
    bert.cpp:209-252) plus integer types that can appear in metadata tensors.
    """

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5 were removed q4_2/q4_3
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    I8 = 24
    I16 = 25
    I32 = 26


# Block geometry: (elements per block, bytes per block).
QK4 = 32  # elements per Q4 block
QK8 = 32  # elements per Q8 block
GGML_TYPE_SIZES: dict[GGMLType, tuple[int, int]] = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.Q4_0: (QK4, 2 + QK4 // 2),  # f16 scale + 16 nibble bytes = 18
    GGMLType.Q4_1: (QK4, 4 + QK4 // 2),  # f16 scale + f16 min + 16 bytes = 20
    GGMLType.Q8_0: (QK8, 2 + QK8),  # f16 scale + 32 int8 bytes = 34
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
}


class GGUFTokenType(enum.IntEnum):
    """Token types (gguf.h:144-153)."""

    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


# File-level "ftype" — the overall quantization mode of a model file.  The
# reference infers it by majority tensor dtype (bert.cpp:209-252); we keep the
# same enum values as ggml's llama_ftype for the `general.file_type` kv.
class GGUFFileType(enum.IntEnum):
    ALL_F32 = 0
    MOSTLY_F16 = 1
    MOSTLY_Q4_0 = 2
    MOSTLY_Q4_1 = 3
    # our extension beyond the reference's four ftypes (bert.cpp:209-252);
    # value 7 matches ggml's llama_ftype LLAMA_FTYPE_MOSTLY_Q8_0 so files
    # interop with other GGUF tooling
    MOSTLY_Q8_0 = 7


FTYPE_TO_GGML = {
    GGUFFileType.ALL_F32: GGMLType.F32,
    GGUFFileType.MOSTLY_F16: GGMLType.F16,
    GGUFFileType.MOSTLY_Q4_0: GGMLType.Q4_0,
    GGUFFileType.MOSTLY_Q4_1: GGMLType.Q4_1,
    GGUFFileType.MOSTLY_Q8_0: GGMLType.Q8_0,
}


# --- kv keys ----------------------------------------------------------------
# Arch prefix is "bert" for every model family the reference supports.
ARCH = "bert"


class Keys:
    """kv key names (gguf.h:259-302; cls addition at gguf.h:300)."""

    # general
    ARCHITECTURE = "general.architecture"
    QUANTIZATION_VERSION = "general.quantization_version"
    ALIGNMENT = "general.alignment"
    NAME = "general.name"
    FILE_TYPE = "general.file_type"
    SOURCE_HF_REPO = "general.source_hf_repo"

    # model hparams (formatted with arch prefix)
    CONTEXT_LENGTH = f"{ARCH}.context_length"
    EMBEDDING_LENGTH = f"{ARCH}.embedding_length"
    BLOCK_COUNT = f"{ARCH}.block_count"
    FEED_FORWARD_LENGTH = f"{ARCH}.feed_forward_length"
    TENSOR_DATA_LAYOUT = f"{ARCH}.tensor_data_layout"
    HEAD_COUNT = f"{ARCH}.attention.head_count"
    HEAD_COUNT_KV = f"{ARCH}.attention.head_count_kv"
    LAYER_NORM_EPS = f"{ARCH}.attention.layer_norm_epsilon"
    ROPE_DIMENSION_COUNT = f"{ARCH}.rope.dimension_count"
    # pooling config (our extension; the reference hard-codes mean+L2 with a
    # FIXME at bert.cpp:998)
    POOLING_TYPE = f"{ARCH}.pooling_type"
    NORMALIZE = f"{ARCH}.normalize_embeddings"
    # sentence-transformers Dense projection head (our extension: e.g.
    # LaBSE pools then projects through a tanh Dense layer before L2)
    DENSE_OUT = f"{ARCH}.dense_feat_out"
    DENSE_ACTIVATION = f"{ARCH}.dense_activation"
    # encoder-family extension (our extension; general.architecture carries
    # the family name, these carry its shape deltas): token-type table rows
    # (0 = no table, e.g. DistilBERT) and the first real-token position id
    # (RoBERTa: padding_idx + 1 = 2)
    TOKEN_TYPE_COUNT = f"{ARCH}.token_type_count"
    POSITION_OFFSET = f"{ARCH}.position_offset"
    # MPNet: T5-style bucketed relative attention bias shared by all layers
    # (HF MPNetEncoder.relative_attention_bias; 0 = absent)
    REL_ATTN_BUCKETS = f"{ARCH}.attention.relative_buckets"
    # ModernBERT rotary/local-attention geometry (our extension; the
    # freq_base name follows llama.cpp's {arch}.rope.freq_base convention)
    ROPE_FREQ_BASE = f"{ARCH}.rope.freq_base"
    ROPE_FREQ_BASE_LOCAL = f"{ARCH}.rope.freq_base_local"
    GLOBAL_ATTN_EVERY = f"{ARCH}.attention.global_every_n_layers"
    LOCAL_ATTN_WINDOW = f"{ARCH}.attention.local_window"
    # sequence-classification head (our extension: cross-encoder rerankers,
    # *ForSequenceClassification checkpoints; 0 = embedding model, no head)
    N_LABELS = f"{ARCH}.classifier.n_labels"
    HEAD_ACTIVATION = f"{ARCH}.classifier.activation"
    # factorized embedding-table width (ALBERT's embedding_size, ELECTRA's
    # embeddings_project input width; 0/absent = tables are
    # embedding_length wide, no projection) and the encoder GELU flavor
    # ("erf" exact — HF default, "tanh" approximation — ALBERT's gelu_new)
    EMB_WIDTH = f"{ARCH}.embedding_width"
    GELU = f"{ARCH}.gelu_variant"
    # T5 encoder geometry (our extension): far-field bucketing cap, d_kv
    # per-head width (key_length follows llama.cpp's name), FFN recipe
    REL_ATTN_MAX_DIST = f"{ARCH}.attention.relative_max_distance"
    HEAD_DIM = f"{ARCH}.attention.key_length"
    FFN_ACT = f"{ARCH}.ffn_activation"
    FFN_GATED = f"{ARCH}.ffn_gated"
    # SPLADE sparse encoder (our extension): the model carries its MLM
    # prediction head and produces |V|-dim sparse lexical vectors via
    # max-over-tokens log1p(relu(logits)) pooling instead of dense
    # sentence embeddings (the reference is dense-only, bert.h:41-92)
    MLM_HEAD = f"{ARCH}.mlm_head"
    # sentence-transformers named prompt prefixes (our extension; prefix
    # models — e5's "query: "/"passage: ", bge/gte instructions — silently
    # degrade without them).  PROMPTS is a JSON object {name: prefix};
    # DEFAULT_PROMPT names the prefix applied when the caller names none.
    PROMPTS = f"{ARCH}.prompts"
    DEFAULT_PROMPT = f"{ARCH}.default_prompt_name"
    # ColBERT late-interaction checkpoints (our extension): per-token dense
    # projection width (0/absent = not a ColBERT model), the query token
    # budget ([MASK]-augmented), punctuation filtering of doc tokens, and
    # the [Q]/[D] marker + [MASK] token ids the framing inserts
    # nomic-bert geometry (our extension): dynamic-NTK RoPE scaling past the
    # trained length (NomicBertDynamicNTKRotaryEmbedding) and whether the
    # checkpoint carries attention / FFN linear biases (published
    # nomic-embed checkpoints are bias-free on both)
    ROPE_SCALING_FACTOR = f"{ARCH}.rope.scaling_factor"
    ROPE_MAX_TRAINED = f"{ARCH}.rope.max_trained_positions"
    ATTN_BIAS = f"{ARCH}.attention.bias"
    FFN_BIAS = f"{ARCH}.ffn_bias"
    COLBERT_DIM = f"{ARCH}.colbert.dim"
    COLBERT_QUERY_MAXLEN = f"{ARCH}.colbert.query_maxlen"
    COLBERT_MASK_PUNCT = f"{ARCH}.colbert.mask_punctuation"
    COLBERT_Q_MARKER = f"{ARCH}.colbert.query_marker_id"
    COLBERT_D_MARKER = f"{ARCH}.colbert.doc_marker_id"
    COLBERT_MASK_ID = f"{ARCH}.colbert.mask_token_id"

    # tokenizer
    TOKENIZER_MODEL = "tokenizer.ggml.model"
    TOKENIZER_LIST = "tokenizer.ggml.tokens"
    TOKENIZER_TOKEN_TYPE = "tokenizer.ggml.token_type"
    TOKENIZER_SCORES = "tokenizer.ggml.scores"
    TOKENIZER_BOS_ID = "tokenizer.ggml.bos_token_id"
    TOKENIZER_EOS_ID = "tokenizer.ggml.eos_token_id"
    TOKENIZER_UNK_ID = "tokenizer.ggml.unknown_token_id"
    TOKENIZER_SEP_ID = "tokenizer.ggml.seperator_token_id"  # sic — reference spelling
    TOKENIZER_PAD_ID = "tokenizer.ggml.padding_token_id"
    TOKENIZER_CLS_ID = "tokenizer.ggml.cls_token_id"
    # Whole tokenizer.json embedded as a string kv
    # (convert-to-gguf.py:211-213).
    TOKENIZER_JSON_BLOB = "blob.tokenizer.json"


def ggml_nbytes(ggml_type: GGMLType, n_elements: int) -> int:
    """Byte size of a tensor with `n_elements` of the given type."""
    block_elems, block_bytes = GGML_TYPE_SIZES[ggml_type]
    if n_elements % block_elems:
        raise ValueError(
            f"{ggml_type.name}: {n_elements} elements not divisible by "
            f"block size {block_elems}"
        )
    return n_elements // block_elems * block_bytes


def align_offset(offset: int, alignment: int = GGUF_DEFAULT_ALIGNMENT) -> int:
    return (offset + alignment - 1) // alignment * alignment
