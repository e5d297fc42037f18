"""Model hyperparameters.

Equivalent of the reference's `bert_hparams` (bert.cpp:20-31), populated from
GGUF kv metadata exactly as the reference loader does (bert.cpp:496-513):
n_vocab comes from the token list length, everything else from `bert.*` keys.

Extension over the reference (which accepts only BertModel,
convert-to-gguf.py:133-136): the `arch` field selects among the supported
encoder families — "bert", "roberta" (incl. XLM-R checkpoints that share the
RobertaModel graph), "distilbert" — which differ only in tensor naming
(models/schema.py), token-type table presence, and RoBERTa's position-id
offset.  The GGUF kv key names stay `bert.*` for all of them (the reference's
reader vocabulary); `general.architecture` records the real family.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..gguf.constants import Keys

# Architecture-dependent defaults:
# (n_token_types, pos_offset, ln_eps, rel_attn_buckets).
# RoBERTa numbers positions from padding_idx + 1 = 2 (HF
# create_position_ids_from_input_ids), has a 1-row token-type table and
# eps 1e-5; DistilBERT has no token-type table at all; MPNet combines the
# RoBERTa position offset (padding_idx 1) with no token types plus a
# T5-style bucketed relative attention bias shared across layers (HF
# MPNetEncoder.compute_position_bias, num_buckets=32).
_ARCH_DEFAULTS = {
    "bert": (2, 0, 1e-12, 0),
    "roberta": (1, 2, 1e-5, 0),
    "distilbert": (0, 0, 1e-12, 0),
    "mpnet": (0, 2, 1e-5, 32),  # HF MPNetConfig layer_norm_eps default
    # ModernBERT (HF ModernBertModel): no token types, no absolute position
    # table (RoPE), pre-norm blocks, GeGLU MLP, bias-free linears/norms,
    # alternating global/local attention (see the rope_/attn window fields)
    "modernbert": (0, 0, 1e-5, 0),
    # ALBERT (HF AlbertModel): BERT block math with ONE shared layer applied
    # n_layer times (num_hidden_groups = inner_group_num = 1 in every
    # published checkpoint), a narrow factorized embedding table
    # (n_embd_emb, e.g. 128) projected to n_embd by
    # encoder.embedding_hidden_mapping_in, and gelu_new (= tanh) activation
    "albert": (2, 0, 1e-12, 0),
    # ELECTRA (HF ElectraModel): the BertModel graph and tensor names
    # verbatim (no pooler); small/base discriminators factorize the
    # embedding table like ALBERT (embeddings_project present only when
    # embedding_size != hidden_size)
    "electra": (2, 0, 1e-12, 0),
    # T5 encoder stack (HF T5EncoderModel — sentence-t5 / GTR dense
    # retrievers): pre-norm blocks with RMSNorm (no bias, no mean
    # subtraction, eps 1e-6), UNSCALED attention (no 1/sqrt(d) — folded
    # into init), a T5-bucketed relative attention bias table on block 0
    # shared by every layer, no absolute position table, bias-free linears
    "t5": (0, 0, 1e-6, 32),
    # DeBERTa-v2/v3 (HF DebertaV2Model — mxbai/nli cross-encoder rerankers,
    # deberta embedders): BERT post-norm blocks whose attention is
    # DISENTANGLED — content-content scores plus content->position and
    # position->content terms against a shared log-bucketed relative
    # position embedding table (encoder.rel_embeddings, LayerNormed), all
    # divided by sqrt(3d); v3 has no absolute position or token-type
    # tables (position_biased_input=False, type_vocab_size=0), eps 1e-7,
    # position_buckets 256
    "deberta": (0, 0, 1e-7, 256),
    # nomic-bert (HF NomicBertModel, trust_remote_code
    # modeling_hf_nomic_bert.py — nomic-embed-text-v1/v1.5,
    # nomic-bert-2048): BERT's post-norm block layout with RoPE instead of
    # absolute positions (rotate-half, base rotary_emb_base=1000, optional
    # dynamic-NTK scaling past max_trained_positions), a fused Wqkv
    # projection, SwiGLU FFN (fc2(fc11(x) * silu(fc12(x))),
    # NomicBertGatedMLP with flash-attn's GatedMlp half order), and
    # bias-free attention/FFN linears in every published checkpoint
    # (qkv_proj_bias = mlp_fc1_bias = mlp_fc2_bias = false); the embedding
    # LayerNorm ("emb_ln") and block norms keep biases.  eps 1e-12.
    "nomic-bert": (2, 0, 1e-12, 0),
}

# Per-family classification-head activation defaults: DistilBERT's
# pre_classifier uses ReLU, ModernBERT's PredictionHead / ELECTRA's
# ClassificationHead / DeBERTa's ContextPooler use GELU, everything else
# BERT's tanh pooler.  Shared by from_gguf_kv and the converter
# (models/convert.py) so the write and read defaults cannot drift.
HEAD_ACT_DEFAULTS = {
    "distilbert": "relu",
    "modernbert": "gelu",
    "electra": "gelu",
    "deberta": "gelu",
}


@dataclass(frozen=True)
class BertConfig:
    n_vocab: int
    n_ctx: int  # max tokens (bert.context_length)
    n_embd: int
    n_layer: int
    n_head: int
    n_ff: int
    layer_norm_eps: float = 1e-12
    n_token_types: int = 2  # token_type vocab; reference hard-codes 2 (bert.cpp:28)
    # "erf" matches HF BertModel exactly; "tanh" matches ggml's LUT
    # approximation (ggml_gelu). Score-level parity holds for either.
    gelu: str = "erf"
    # output head: "mean" | "cls" | "max" pooling, then optional L2 norm.
    # The reference hard-codes mean+L2 (bert.cpp:995-1006, FIXME at :998).
    pooling: str = "mean"
    normalize: bool = True
    # sentence-transformers Dense projection head applied between pooling
    # and normalization (0 = none): pooled @ W.T + b, then activation
    dense_out: int = 0
    dense_activation: str = "tanh"  # "tanh" | "identity"
    # encoder family: "bert" | "roberta" | "distilbert" (see module doc)
    arch: str = "bert"
    # first real-token position id (RoBERTa: padding_idx + 1 = 2); the
    # position table then has n_ctx + pos_offset rows
    pos_offset: int = 0
    # T5-style relative attention bias bucket count (MPNet: 32; 0 = none).
    # One [buckets, n_head] table shared by every layer, added to the
    # scaled attention scores (HF MPNetSelfAttention.forward).
    rel_attn_buckets: int = 0
    # far-field cap of the relative-position bucketing (HF
    # relative_attention_max_distance; 128 in every published T5/MPNet)
    rel_attn_max_dist: int = 128
    # per-head attention width when it differs from n_embd // n_head (T5's
    # d_kv: the q/k/v projections map d_model -> n_head * n_head_dim, e.g.
    # t5-3b/xl: 1024 -> 32*128 = 4096).  0 = n_embd // n_head.
    n_head_dim: int = 0
    # FFN recipe override (T5): activation "relu" | "gelu_erf" (HF
    # dense_act_fn "gelu") | "gelu_tanh" (gelu_new, incl. the "gated-gelu"
    # back-compat) and gating (act(wi_0) * wi_1 product).
    # "" = the family default (GELU per `gelu` for the BERT families).
    ffn_act: str = ""
    ffn_gated: bool = False
    # ModernBERT rotary/local-attention geometry (0.0/0 = unused by the
    # other families).  HF ModernBertAttention.__init__: layer i is GLOBAL
    # when i % global_attn_every == 0 (RoPE base rope_theta = config.
    # global_rope_theta); every other layer attends only within
    # |q_pos - k_pos| <= local_window // 2 and uses local_rope_theta for
    # its RoPE base (falling back to the global theta when None).
    rope_theta: float = 0.0
    local_rope_theta: float = 0.0
    global_attn_every: int = 0
    local_window: int = 0
    # nomic-bert rotary scaling + bias layout (0.0/0/True = unused by the
    # other families).  rope_scaling_factor > 0 enables dynamic-NTK base
    # scaling once the (static) sequence length exceeds rope_max_trained:
    # base' = base * ((factor * S / max_trained) - (factor - 1))
    #         ** (d / (d - 2))
    # (NomicBertDynamicNTKRotaryEmbedding._update_cos_sin_cache).
    # attn_bias/ffn_bias record whether the checkpoint's Wqkv+out_proj /
    # fc11+fc12+fc2 linears carry biases (conversion verifies the flags
    # against the state dict).
    rope_scaling_factor: float = 0.0
    rope_max_trained: int = 0
    attn_bias: bool = True
    ffn_bias: bool = True
    # sequence-classification head width (cross-encoder rerankers /
    # *ForSequenceClassification checkpoints; 0 = embedding model, no head).
    # Every HF family computes logits = out_proj(act(dense(h_pooled))):
    # BERT's pooler(tanh)+classifier, RoBERTa/MPNet's ClassificationHead
    # (dense+tanh+out_proj), DistilBERT's pre_classifier(ReLU)+classifier,
    # ModernBERT's PredictionHead (bias-free dense + gelu + bias-free
    # LayerNorm, pooled per `pooling` cls/mean) + classifier —
    # head_activation selects the act, the tensor names live in schema.py.
    n_labels: int = 0
    head_activation: str = "tanh"  # "tanh" | "relu"
    # SPLADE sparse encoder (naver/splade-*, opensearch neural-sparse,
    # sentence-transformers SparseEncoder MLMTransformer+SpladePooling):
    # the checkpoint keeps its MLM prediction head and the model emits
    # |V|-dim sparse lexical vectors — max over tokens of
    # log1p(relu(mlm_logits)) (SPLADE-max, Formal et al. 2021) — instead
    # of dense pooled embeddings.  The decoder projection is the tied
    # word-embedding table (conversion rejects untied checkpoints).
    mlm_head: bool = False
    # ColBERT late-interaction checkpoint (colbert-ir/colbertv2.0,
    # answerai-colbert-small-v1 and friends): colbert_dim > 0 marks the
    # model as ColBERT and is the per-token dense projection width (HF
    # HF_ColBERT's bias-free `linear`, e.g. 768 -> 128).  Queries frame
    # [CLS] [Q] tokens [SEP] then pad with [MASK] to query_maxlen (the
    # MASK positions are NOT attended to — attend_to_mask_tokens=False,
    # the published default — but their projected states participate in
    # scoring: ColBERT's query augmentation).  Documents frame
    # [CLS] [D] tokens [SEP]; mask_punctuation drops punctuation-token
    # vectors from scoring (the skiplist).  Marker/mask token ids are
    # resolved from the tokenizer at conversion.
    colbert_dim: int = 0
    query_maxlen: int = 32
    mask_punctuation: bool = True
    q_marker_id: int = -1
    d_marker_id: int = -1
    mask_id: int = -1
    # factorized embedding-table width (ALBERT's embedding_size 128,
    # ELECTRA-small's 128; 0 = the table is n_embd wide, no projection).
    # When set, the word/position/token-type tables and the embedding
    # LayerNorm live at this width and an emb_proj linear maps the
    # normalized embeddings to n_embd before layer 0 (HF
    # AlbertModel.encoder.embedding_hidden_mapping_in /
    # ElectraModel.embeddings_project).
    n_embd_emb: int = 0
    name: str = ""

    @property
    def head_dim(self) -> int:
        return self.n_head_dim or self.n_embd // self.n_head

    @property
    def attn_inner(self) -> int:
        """Width of the q/k/v projections (n_embd unless d_kv differs)."""
        return self.n_head * self.head_dim

    @property
    def emb_width(self) -> int:
        """Width of the embedding tables (n_embd unless factorized)."""
        return self.n_embd_emb or self.n_embd

    @property
    def shared_layers(self) -> bool:
        """True when one parameter set serves every layer (ALBERT): the
        layer stack has leading dim 1 and the scan reuses it n_layer
        times."""
        return self.arch == "albert"

    def __post_init__(self):
        if not self.n_head_dim and self.n_embd % self.n_head:
            raise ValueError(
                f"n_embd {self.n_embd} not divisible by n_head {self.n_head}"
            )
        if self.arch not in _ARCH_DEFAULTS:
            raise ValueError(
                f"unsupported architecture {self.arch!r} "
                f"(supported: {sorted(_ARCH_DEFAULTS)})"
            )
        if self.n_labels and self.head_activation not in (
            "tanh", "relu", "gelu"
        ):
            raise ValueError(
                f"unsupported head_activation {self.head_activation!r} "
                "(supported: tanh, relu, gelu)"
            )
        if self.mlm_head and self.arch not in (
            "bert", "roberta", "distilbert"
        ):
            raise ValueError(
                "mlm_head (SPLADE sparse encoding) is only supported for "
                f"bert/roberta/distilbert, not {self.arch!r}"
            )
        if self.colbert_dim:
            if self.arch == "t5":
                raise ValueError(
                    "colbert_dim needs a CLS-framed family, not t5"
                )
            if self.mlm_head or self.n_labels or self.dense_out:
                raise ValueError(
                    "colbert_dim is exclusive with mlm_head / n_labels / "
                    "dense_out (a ColBERT checkpoint has exactly the "
                    "per-token projection head)"
                )
            if min(self.q_marker_id, self.d_marker_id, self.mask_id) < 0:
                raise ValueError(
                    "ColBERT models need q_marker_id, d_marker_id and "
                    "mask_id (resolved from the tokenizer at conversion)"
                )
            if self.query_maxlen < 4:
                raise ValueError(
                    f"query_maxlen {self.query_maxlen} leaves no room for "
                    "[CLS] [Q] token [SEP]"
                )
        if self.n_embd_emb and self.arch not in ("albert", "electra"):
            raise ValueError(
                "factorized embeddings (n_embd_emb) are only supported for "
                f"albert/electra, not {self.arch!r}"
            )

    @classmethod
    def arch_defaults(cls, arch: str, **kw) -> "BertConfig":
        """Construct with arch-appropriate token-type/pos-offset/eps defaults
        (overridable via kw)."""
        ntt, off, eps, buckets = _ARCH_DEFAULTS[arch]
        kw.setdefault("n_token_types", ntt)
        kw.setdefault("pos_offset", off)
        kw.setdefault("layer_norm_eps", eps)
        kw.setdefault("rel_attn_buckets", buckets)
        if arch == "albert":
            # every published ALBERT uses hidden_act="gelu_new" (tanh approx)
            kw.setdefault("gelu", "tanh")
        return cls(arch=arch, **kw)

    @classmethod
    def from_gguf_kv(cls, kv: dict) -> "BertConfig":
        n_vocab = len(kv[Keys.TOKENIZER_LIST])
        arch = str(kv.get(Keys.ARCHITECTURE, "bert"))
        if arch not in _ARCH_DEFAULTS:  # e.g. reference files say "bert"
            arch = "bert"
        ntt_default, off_default, eps_default, buckets_default = _ARCH_DEFAULTS[arch]
        return cls(
            n_vocab=n_vocab,
            n_ctx=int(kv[Keys.CONTEXT_LENGTH]),
            n_embd=int(kv[Keys.EMBEDDING_LENGTH]),
            n_layer=int(kv[Keys.BLOCK_COUNT]),
            n_head=int(kv[Keys.HEAD_COUNT]),
            n_ff=int(kv[Keys.FEED_FORWARD_LENGTH]),
            layer_norm_eps=float(kv.get(Keys.LAYER_NORM_EPS, eps_default)),
            n_token_types=int(kv.get(Keys.TOKEN_TYPE_COUNT, ntt_default)),
            gelu=str(
                kv.get(Keys.GELU, "tanh" if arch == "albert" else "erf")
            ),
            n_embd_emb=int(kv.get(Keys.EMB_WIDTH, 0)),
            pooling=str(kv.get(Keys.POOLING_TYPE, "mean")),
            normalize=bool(kv.get(Keys.NORMALIZE, True)),
            dense_out=int(kv.get(Keys.DENSE_OUT, 0)),
            dense_activation=str(kv.get(Keys.DENSE_ACTIVATION, "tanh")),
            arch=arch,
            pos_offset=int(kv.get(Keys.POSITION_OFFSET, off_default)),
            rel_attn_buckets=int(
                kv.get(Keys.REL_ATTN_BUCKETS, buckets_default)
            ),
            rel_attn_max_dist=int(kv.get(Keys.REL_ATTN_MAX_DIST, 128)),
            n_head_dim=int(kv.get(Keys.HEAD_DIM, 0)),
            ffn_act=str(kv.get(Keys.FFN_ACT, "relu" if arch == "t5" else "")),
            ffn_gated=bool(kv.get(Keys.FFN_GATED, False)),
            rope_theta=float(kv.get(Keys.ROPE_FREQ_BASE, 0.0)),
            local_rope_theta=float(kv.get(Keys.ROPE_FREQ_BASE_LOCAL, 0.0)),
            global_attn_every=int(kv.get(Keys.GLOBAL_ATTN_EVERY, 0)),
            local_window=int(kv.get(Keys.LOCAL_ATTN_WINDOW, 0)),
            rope_scaling_factor=float(kv.get(Keys.ROPE_SCALING_FACTOR, 0.0)),
            rope_max_trained=int(kv.get(Keys.ROPE_MAX_TRAINED, 0)),
            attn_bias=bool(kv.get(Keys.ATTN_BIAS, arch != "nomic-bert")),
            ffn_bias=bool(kv.get(Keys.FFN_BIAS, arch != "nomic-bert")),
            mlm_head=bool(kv.get(Keys.MLM_HEAD, False)),
            colbert_dim=int(kv.get(Keys.COLBERT_DIM, 0)),
            query_maxlen=int(kv.get(Keys.COLBERT_QUERY_MAXLEN, 32)),
            mask_punctuation=bool(kv.get(Keys.COLBERT_MASK_PUNCT, True)),
            q_marker_id=int(kv.get(Keys.COLBERT_Q_MARKER, -1)),
            d_marker_id=int(kv.get(Keys.COLBERT_D_MARKER, -1)),
            mask_id=int(kv.get(Keys.COLBERT_MASK_ID, -1)),
            n_labels=int(kv.get(Keys.N_LABELS, 0)),
            head_activation=str(
                kv.get(
                    Keys.HEAD_ACTIVATION, HEAD_ACT_DEFAULTS.get(arch, "tanh")
                )
            ),
            name=str(kv.get("general.name", "")),
        )

    @classmethod
    def from_hf_config(cls, hf: dict, name: str = "") -> "BertConfig":
        """From a transformers config.json dict (BertConfig-style keys;
        DistilBertConfig uses its own names, dispatched on model_type)."""
        model_type = str(hf.get("model_type", "bert"))
        if model_type == "distilbert":
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("max_position_embeddings", 512)),
                n_embd=int(hf["dim"]),
                n_layer=int(hf["n_layers"]),
                n_head=int(hf["n_heads"]),
                n_ff=int(hf["hidden_dim"]),
                # HF modeling_distilbert hard-codes LayerNorm eps 1e-12
                layer_norm_eps=1e-12,
                n_token_types=0,
                arch="distilbert",
                name=name,
            )
        if model_type == "mpnet":
            # HF MPNetEmbeddings hard-codes padding_idx = 1 and numbers real
            # tokens RoBERTa-style from padding_idx + 1 = 2; the encoder adds
            # a T5-style bucketed relative attention bias (MPNetEncoder.
            # compute_position_bias — note it calls the bucket fn with its
            # DEFAULT num_buckets=32, ignoring the config field, so 32 is
            # the only value real checkpoints can have used).
            pos_offset = 2
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("max_position_embeddings", 514)) - pos_offset,
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
                n_token_types=0,
                arch="mpnet",
                pos_offset=pos_offset,
                rel_attn_buckets=int(
                    hf.get("relative_attention_num_buckets", 32)
                ),
                name=name,
            )
        if model_type == "modernbert":
            # Bias-free is the only published configuration (HF defaults;
            # answerdotai/ModernBERT-*, gte-modernbert, nomic-modernbert all
            # keep attention_bias = mlp_bias = norm_bias = False).  The
            # schema/forward assume it, so reject the hypothetical biased
            # variant loudly rather than silently dropping weights.
            if any(
                bool(hf.get(k, False))
                for k in ("attention_bias", "mlp_bias", "norm_bias")
            ):
                raise ValueError(
                    "modernbert with attention_bias/mlp_bias/norm_bias=True "
                    "is not supported (no published checkpoint uses biases)"
                )
            if str(hf.get("hidden_activation", "gelu")) != "gelu":
                raise ValueError(
                    "modernbert hidden_activation "
                    f"{hf.get('hidden_activation')!r} != 'gelu' unsupported"
                )
            local_theta = hf.get("local_rope_theta")  # None -> global theta
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("max_position_embeddings", 8192)),
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("norm_eps", 1e-5)),
                n_token_types=0,
                arch="modernbert",
                rope_theta=float(hf.get("global_rope_theta", 160000.0)),
                local_rope_theta=float(
                    local_theta if local_theta is not None else 0.0
                ),
                global_attn_every=int(hf.get("global_attn_every_n_layers", 3)),
                local_window=int(hf.get("local_attention", 128)),
                name=name,
            )
        if model_type == "t5":
            # HF T5Config: feed_forward_proj "relu" (original T5 — the
            # sentence-t5/gtr retrievers) or "gated-gelu" (v1.1/flan);
            # dense_act_fn "gelu_new" is torch's tanh approximation
            ff_proj = str(hf.get("feed_forward_proj", "relu"))
            gated = ff_proj.startswith("gated-")
            act = ff_proj.removeprefix("gated-")
            if act not in ("relu", "gelu", "gelu_new"):
                raise ValueError(f"unsupported t5 feed_forward_proj {ff_proj!r}")
            # HF T5Config back-compat: exactly "gated-gelu" means gelu_new
            # (tanh approx); a plain "gelu" stays the exact erf GELU
            if act == "gelu_new" or ff_proj == "gated-gelu":
                ffn_act = "gelu_tanh"
            elif act == "gelu":
                ffn_act = "gelu_erf"
            else:
                ffn_act = "relu"
            return cls(
                n_vocab=int(hf["vocab_size"]),
                # T5 has no absolute position table (relative attention) —
                # the legacy n_positions attr records the trained length
                n_ctx=int(hf.get("n_positions", 512)),
                n_embd=int(hf["d_model"]),
                n_layer=int(hf["num_layers"]),
                n_head=int(hf["num_heads"]),
                n_ff=int(hf["d_ff"]),
                layer_norm_eps=float(hf.get("layer_norm_epsilon", 1e-6)),
                n_token_types=0,
                arch="t5",
                rel_attn_buckets=int(
                    hf.get("relative_attention_num_buckets", 32)
                ),
                rel_attn_max_dist=int(
                    hf.get("relative_attention_max_distance", 128)
                ),
                n_head_dim=int(hf.get("d_kv", 64)),
                ffn_act=ffn_act,
                ffn_gated=gated,
                name=name,
            )
        if model_type == "deberta-v2":
            # the v3-generation feature set is the only supported (and only
            # widely published) configuration; reject the exotic v2 knobs
            # loudly rather than silently diverging
            if not bool(hf.get("relative_attention", False)):
                raise ValueError("deberta-v2 without relative_attention "
                                 "is not supported")
            if not bool(hf.get("share_att_key", False)):
                raise ValueError("deberta-v2 with share_att_key=False is "
                                 "not supported (v3 checkpoints share)")
            if bool(hf.get("position_biased_input", True)):
                raise ValueError("deberta-v2 with position_biased_input "
                                 "(absolute positions) is not supported")
            if int(hf.get("conv_kernel_size", 0)) > 0:
                raise ValueError("deberta-v2 conv layer is not supported")
            if "layer_norm" not in str(hf.get("norm_rel_ebd", "none")):
                raise ValueError("deberta-v2 without norm_rel_ebd="
                                 "layer_norm is not supported")
            pos_att = str(hf.get("pos_att_type", "p2c|c2p"))
            if "c2p" not in pos_att or "p2c" not in pos_att:
                raise ValueError(f"pos_att_type {pos_att!r} != c2p+p2c "
                                 "is not supported")
            emb_size = int(hf.get("embedding_size") or hf["hidden_size"])
            if emb_size != int(hf["hidden_size"]):
                raise ValueError("deberta-v2 embedding_size != hidden_size "
                                 "is not supported")
            n_ctx = int(hf.get("max_position_embeddings", 512))
            max_rel = int(hf.get("max_relative_positions", -1))
            buckets = int(hf.get("position_buckets", 256))
            if buckets <= 0:
                raise ValueError("deberta-v2 without position_buckets is "
                                 "not supported")
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=n_ctx,
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("layer_norm_eps", 1e-7)),
                n_token_types=int(hf.get("type_vocab_size", 0)),
                arch="deberta",
                rel_attn_buckets=buckets,
                rel_attn_max_dist=max_rel if max_rel > 0 else n_ctx,
                name=name,
            )
        if model_type == "albert":
            # every published checkpoint keeps ONE layer group with ONE
            # inner layer (albert-base/large/xlarge/xxlarge v1+v2,
            # paraphrase-albert-*); the shared-layer scan assumes it
            if (int(hf.get("num_hidden_groups", 1)) != 1
                    or int(hf.get("inner_group_num", 1)) != 1):
                raise ValueError(
                    "albert with num_hidden_groups/inner_group_num != 1 is "
                    "not supported (no published checkpoint uses them)"
                )
            act = str(hf.get("hidden_act", "gelu_new"))
            if act not in ("gelu_new", "gelu"):
                raise ValueError(f"unsupported albert hidden_act {act!r}")
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("max_position_embeddings", 512)),
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
                n_token_types=int(hf.get("type_vocab_size", 2)),
                arch="albert",
                # "gelu_new" is torch's tanh approximation
                gelu="tanh" if act == "gelu_new" else "erf",
                n_embd_emb=int(hf.get("embedding_size", 128)),
                name=name,
            )
        if model_type == "electra":
            # ElectraModel is the BertModel graph (no pooler); small/base
            # discriminators factorize the embedding table
            # (embeddings_project present only when embedding_size !=
            # hidden_size)
            emb_size = int(hf.get("embedding_size", hf["hidden_size"]))
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("max_position_embeddings", 512)),
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
                n_token_types=int(hf.get("type_vocab_size", 2)),
                arch="electra",
                n_embd_emb=0 if emb_size == int(hf["hidden_size"]) else emb_size,
                name=name,
            )
        if model_type == "nomic_bert":
            # modeling_hf_nomic_bert.py semantics; reject the knobs no
            # published checkpoint sets rather than silently diverging
            act = str(hf.get("activation_function", "swiglu"))
            if act != "swiglu":
                raise ValueError(
                    f"nomic_bert activation_function {act!r} != 'swiglu' "
                    "is not supported (every published nomic-embed/"
                    "nomic-bert checkpoint is SwiGLU)"
                )
            if float(hf.get("rotary_emb_fraction", 0.0)) != 1.0:
                raise ValueError(
                    "nomic_bert needs rotary_emb_fraction == 1.0 (partial "
                    "rotary / absolute-position variants unsupported)"
                )
            if bool(hf.get("rotary_emb_interleaved", False)):
                raise ValueError(
                    "nomic_bert rotary_emb_interleaved=True is not "
                    "supported (published checkpoints use rotate-half)"
                )
            if bool(hf.get("causal", False)) or bool(hf.get("prenorm",
                                                            False)):
                raise ValueError(
                    "nomic_bert with causal or prenorm set is not supported"
                )
            if bool(hf.get("use_rms_norm", False)):
                raise ValueError("nomic_bert use_rms_norm is not supported")
            fc1_b = bool(hf.get("mlp_fc1_bias", True))
            fc2_b = bool(hf.get("mlp_fc2_bias", True))
            if fc1_b != fc2_b:
                raise ValueError(
                    "nomic_bert with mixed mlp_fc1_bias/mlp_fc2_bias is "
                    "not supported"
                )
            scaling = hf.get("rotary_scaling_factor")
            return cls(
                n_vocab=int(hf["vocab_size"]),
                n_ctx=int(hf.get("n_positions", 2048)),
                n_embd=int(hf["n_embd"]),
                n_layer=int(hf["n_layer"]),
                n_head=int(hf["n_head"]),
                n_ff=int(hf["n_inner"]),
                layer_norm_eps=float(hf.get("layer_norm_epsilon", 1e-12)),
                n_token_types=int(hf.get("type_vocab_size", 2)),
                arch="nomic-bert",
                rope_theta=float(hf.get("rotary_emb_base", 1000.0)),
                rope_scaling_factor=float(scaling or 0.0),
                rope_max_trained=int(hf.get("max_trained_positions", 2048)),
                ffn_act="silu",
                ffn_gated=True,
                attn_bias=bool(hf.get("qkv_proj_bias", True)),
                ffn_bias=fc1_b,
                name=name,
            )
        if model_type in ("roberta", "xlm-roberta", "camembert"):
            pos_offset = int(hf.get("pad_token_id", 1)) + 1
            return cls(
                n_vocab=int(hf["vocab_size"]),
                # usable context excludes the pos_offset dummy rows
                n_ctx=int(hf.get("max_position_embeddings", 514)) - pos_offset,
                n_embd=int(hf["hidden_size"]),
                n_layer=int(hf["num_hidden_layers"]),
                n_head=int(hf["num_attention_heads"]),
                n_ff=int(hf["intermediate_size"]),
                layer_norm_eps=float(hf.get("layer_norm_eps", 1e-5)),
                n_token_types=int(hf.get("type_vocab_size", 1)),
                arch="roberta",
                pos_offset=pos_offset,
                name=name,
            )
        return cls(
            n_vocab=int(hf["vocab_size"]),
            n_ctx=int(hf.get("max_position_embeddings", 512)),
            n_embd=int(hf["hidden_size"]),
            n_layer=int(hf["num_hidden_layers"]),
            n_head=int(hf["num_attention_heads"]),
            n_ff=int(hf["intermediate_size"]),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
            n_token_types=int(hf.get("type_vocab_size", 2)),
            name=name,
        )


# Well-known model shapes (for synthetic benchmarking without downloads).
MINILM_L6 = BertConfig(
    n_vocab=30522, n_ctx=512, n_embd=384, n_layer=6, n_head=12, n_ff=1536,
    name="all-MiniLM-L6-v2",
)
MINILM_L12 = BertConfig(
    n_vocab=30522, n_ctx=512, n_embd=384, n_layer=12, n_head=12, n_ff=1536,
    name="all-MiniLM-L12-v2",
)
BERT_BASE = BertConfig(
    n_vocab=30522, n_ctx=512, n_embd=768, n_layer=12, n_head=12, n_ff=3072,
    name="bert-base-uncased",
)
DISTILROBERTA = BertConfig(
    n_vocab=50265, n_ctx=512, n_embd=768, n_layer=6, n_head=12, n_ff=3072,
    layer_norm_eps=1e-5, n_token_types=1, arch="roberta", pos_offset=2,
    name="all-distilroberta-v1",
)
DISTILBERT_BASE = BertConfig(
    n_vocab=30522, n_ctx=512, n_embd=768, n_layer=6, n_head=12, n_ff=3072,
    n_token_types=0, arch="distilbert",
    name="multi-qa-distilbert-cos-v1",
)
MODERNBERT_BASE = BertConfig(
    # answerdotai/ModernBERT-base geometry (gte-modernbert-base and
    # nomic-modernbert embedders reuse it); gte pools cls, so the synthetic
    # preset does too
    n_vocab=50368, n_ctx=8192, n_embd=768, n_layer=22, n_head=12, n_ff=1152,
    n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
    rope_theta=160000.0, local_rope_theta=10000.0,
    global_attn_every=3, local_window=128, pooling="cls",
    name="gte-modernbert-base",
)
GTR_BASE = BertConfig(
    # sentence-transformers/gtr-t5-base geometry (t5-base encoder + mean
    # pool + Dense; the synthetic preset skips the Dense head)
    n_vocab=32128, n_ctx=512, n_embd=768, n_layer=12, n_head=12, n_ff=3072,
    n_token_types=0, arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32,
    n_head_dim=64, ffn_act="relu",
    name="gtr-t5-base",
)
DEBERTA_V3_BASE = BertConfig(
    # microsoft/deberta-v3-base geometry (the mxbai-rerank-base-v1 /
    # nli-deberta-v3-base encoder)
    n_vocab=128100, n_ctx=512, n_embd=768, n_layer=12, n_head=12, n_ff=3072,
    n_token_types=0, arch="deberta", layer_norm_eps=1e-7,
    rel_attn_buckets=256, rel_attn_max_dist=512,
    name="deberta-v3-base",
)
NOMIC_EMBED = BertConfig(
    # nomic-ai/nomic-embed-text-v1.5 geometry (NomicBertModel): post-norm
    # RoPE blocks (base 1000), SwiGLU FFN (n_inner 3072), bias-free
    # attention/FFN linears, dynamic-NTK scaling past the 2048 trained
    # length up to the advertised 8192 context
    n_vocab=30528, n_ctx=8192, n_embd=768, n_layer=12, n_head=12, n_ff=3072,
    arch="nomic-bert", rope_theta=1000.0, rope_scaling_factor=2.0,
    rope_max_trained=2048, ffn_act="silu", ffn_gated=True,
    attn_bias=False, ffn_bias=False,
    name="nomic-embed-text-v1.5",
)
MPNET_BASE = BertConfig(
    n_vocab=30527, n_ctx=512, n_embd=768, n_layer=12, n_head=12, n_ff=3072,
    n_token_types=0, arch="mpnet", pos_offset=2, rel_attn_buckets=32,
    layer_norm_eps=1e-5,
    name="all-mpnet-base-v2",
)
