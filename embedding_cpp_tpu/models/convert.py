"""HF BERT checkpoint -> GGUF converter.

Feature-parity with the reference converter (models/convert-to-gguf.py):
same kv schema (bert.* hparams, tokenizer.ggml.* vocab, the whole
tokenizer.json embedded as the `blob.tokenizer.json` string kv,
convert-to-gguf.py:211-213), same tensor policy (HF state-dict names
verbatim; `pooler.dense.*` and `embeddings.position_ids` skipped,
convert-to-gguf.py:294-321; 2-D `.weight` tensors cast to the target type).

Extension over the reference: direct one-step conversion to Q4_0/Q4_1/Q8_0
(the reference requires convert-to-f32 + a separate quantize binary).
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from ..gguf.constants import (
    GGMLType,
    GGUFFileType,
    FTYPE_TO_GGML,
    GGUFTokenType,
    GGUFValueType,
    Keys,
    QK4,
)
from ..gguf.quant import quantize
from ..gguf.writer import GGUFWriter
from .config import HEAD_ACT_DEFAULTS, BertConfig
from .schema import SKIPPED_TENSORS

FTYPE_NAMES = {
    "f32": GGUFFileType.ALL_F32,
    "f16": GGUFFileType.MOSTLY_F16,
    "q4_0": GGUFFileType.MOSTLY_Q4_0,
    "q4_1": GGUFFileType.MOSTLY_Q4_1,
    "q8_0": GGUFFileType.MOSTLY_Q8_0,
}

# Special-token fallbacks when no special_tokens_map.json is available:
# BERT/DistilBERT WordPiece names first, then the RoBERTa BPE names (whose
# <s>/</s> play the cls/sep roles in our single-sequence framing,
# tokenizer/base.frame_ids).
_SPECIAL_TOKEN_NAMES = {
    "unk": ("[UNK]", "<unk>"),
    "sep": ("[SEP]", "</s>"),
    "pad": ("[PAD]", "<pad>"),
    "cls": ("[CLS]", "<s>"),
}


def special_ids_from_vocab(vocab: dict[str, int], overrides: dict | None = None):
    """Resolve unk/sep/pad/cls ids from the vocab (+ explicit overrides)."""
    ids = {}
    for key, candidates in _SPECIAL_TOKEN_NAMES.items():
        if overrides and key in overrides:
            ids[key] = int(overrides[key])
            continue
        for tok in candidates:
            if tok in vocab:
                ids[key] = int(vocab[tok])
                break
    return ids


def write_bert_gguf(
    out_path: str | os.PathLike,
    config: BertConfig,
    state_dict: dict[str, np.ndarray],
    tokenizer_json: bytes,
    ftype: GGUFFileType = GGUFFileType.ALL_F32,
    *,
    special_ids: dict | None = None,
    source_hf_repo: str = "",
    prompts: dict[str, str] | None = None,
    default_prompt_name: str = "",
) -> None:
    """Write a reference-compatible BERT GGUF file."""
    tok = json.loads(tokenizer_json)
    vocab = tok["model"]["vocab"]
    tok_model = str(tok["model"].get("type", "WordPiece"))
    scores = [0.0] * config.n_vocab
    if isinstance(vocab, list):
        # Unigram serializes vocab as [[piece, score], ...] in id order
        id_to_token = {i: p for i, (p, _) in enumerate(vocab)}
        vocab = {p: i for i, p in id_to_token.items()}
        for i, (_, s) in enumerate(tok["model"]["vocab"]):
            if i < config.n_vocab:
                scores[i] = float(s)
    elif isinstance(vocab, dict):
        id_to_token = {int(i): t for t, i in vocab.items()}
    else:
        raise ValueError(
            "tokenizer.json model.vocab must be a dict (WordPiece/BPE) "
            "or a [piece, score] list (Unigram)"
        )
    # Added tokens (specials) may live outside model.vocab
    for added in tok.get("added_tokens", []):
        id_to_token.setdefault(int(added["id"]), added["content"])
    n_vocab = config.n_vocab
    tokens = []
    for i in range(n_vocab):
        if i not in id_to_token:
            raise ValueError(f"vocab has no token for id {i} (vocab_size {n_vocab})")
        tokens.append(id_to_token[i].encode("utf-8"))

    sp = special_ids_from_vocab(vocab, special_ids)

    w = GGUFWriter()
    # the kv key *prefix* stays "bert." for every family (the reference
    # reader's vocabulary, gguf.h:259-302); general.architecture records
    # which encoder family the tensor names/shapes follow
    w.add_string(Keys.ARCHITECTURE, config.arch)
    w.add_string(Keys.NAME, config.name or Path(out_path).stem)
    if source_hf_repo:
        w.add_string(Keys.SOURCE_HF_REPO, source_hf_repo)
    w.add_string(Keys.TENSOR_DATA_LAYOUT, "")
    w.add_uint32(Keys.CONTEXT_LENGTH, config.n_ctx)
    w.add_uint32(Keys.EMBEDDING_LENGTH, config.n_embd)
    w.add_uint32(Keys.BLOCK_COUNT, config.n_layer)
    w.add_uint32(Keys.FEED_FORWARD_LENGTH, config.n_ff)
    w.add_uint32(Keys.ROPE_DIMENSION_COUNT, config.head_dim)
    w.add_uint32(Keys.HEAD_COUNT, config.n_head)
    w.add_uint32(Keys.HEAD_COUNT_KV, config.n_head)
    w.add_float32(Keys.LAYER_NORM_EPS, config.layer_norm_eps)
    if config.pooling != "mean":
        w.add_string(Keys.POOLING_TYPE, config.pooling)
    if not config.normalize:
        w.add_bool(Keys.NORMALIZE, False)
    if config.dense_out:
        w.add_uint32(Keys.DENSE_OUT, config.dense_out)
        w.add_string(Keys.DENSE_ACTIVATION, config.dense_activation)
    if config.n_labels:
        w.add_uint32(Keys.N_LABELS, config.n_labels)
        w.add_string(Keys.HEAD_ACTIVATION, config.head_activation)
    if config.mlm_head:
        w.add_bool(Keys.MLM_HEAD, True)
    if config.colbert_dim:
        w.add_uint32(Keys.COLBERT_DIM, config.colbert_dim)
        w.add_uint32(Keys.COLBERT_QUERY_MAXLEN, config.query_maxlen)
        w.add_bool(Keys.COLBERT_MASK_PUNCT, config.mask_punctuation)
        w.add_uint32(Keys.COLBERT_Q_MARKER, config.q_marker_id)
        w.add_uint32(Keys.COLBERT_D_MARKER, config.d_marker_id)
        w.add_uint32(Keys.COLBERT_MASK_ID, config.mask_id)
    if prompts:
        # named prompt prefixes (config_sentence_transformers.json); JSON
        # object so arbitrary names/unicode survive the kv string type
        w.add_string(
            Keys.PROMPTS, json.dumps(prompts, ensure_ascii=False)
        )
        if default_prompt_name:
            w.add_string(Keys.DEFAULT_PROMPT, default_prompt_name)
    if config.arch != "bert":
        # shape deltas of the non-bert families (config.py _ARCH_DEFAULTS);
        # written explicitly so the reader needs no arch-specific guessing
        w.add_uint32(Keys.TOKEN_TYPE_COUNT, config.n_token_types)
        w.add_uint32(Keys.POSITION_OFFSET, config.pos_offset)
        if config.rel_attn_buckets:
            w.add_uint32(Keys.REL_ATTN_BUCKETS, config.rel_attn_buckets)
        if config.n_embd_emb:
            # factorized embedding width (ALBERT / ELECTRA-small)
            w.add_uint32(Keys.EMB_WIDTH, config.n_embd_emb)
        if config.arch in ("t5", "deberta"):
            # far-field cap of the relative-position bucketing
            w.add_uint32(Keys.REL_ATTN_MAX_DIST, config.rel_attn_max_dist)
        if config.arch == "t5":
            # T5 geometry: d_kv, FFN recipe
            w.add_uint32(Keys.HEAD_DIM, config.head_dim)
            w.add_string(Keys.FFN_ACT, config.ffn_act or "relu")
            w.add_bool(Keys.FFN_GATED, config.ffn_gated)
        if config.gelu != ("tanh" if config.arch == "albert" else "erf"):
            # only written when it differs from the reader's arch default
            w.add_string(Keys.GELU, config.gelu)
        if config.arch == "modernbert":
            # rotary/local-attention geometry (config.py field docs)
            w.add_float32(Keys.ROPE_FREQ_BASE, config.rope_theta)
            w.add_float32(Keys.ROPE_FREQ_BASE_LOCAL, config.local_rope_theta)
            w.add_uint32(Keys.GLOBAL_ATTN_EVERY, config.global_attn_every)
            w.add_uint32(Keys.LOCAL_ATTN_WINDOW, config.local_window)
        if config.arch == "nomic-bert":
            # rotary base + dynamic-NTK scaling + bias layout (config.py)
            w.add_float32(Keys.ROPE_FREQ_BASE, config.rope_theta)
            w.add_float32(Keys.ROPE_SCALING_FACTOR, config.rope_scaling_factor)
            w.add_uint32(Keys.ROPE_MAX_TRAINED, config.rope_max_trained)
            w.add_bool(Keys.ATTN_BIAS, config.attn_bias)
            w.add_bool(Keys.FFN_BIAS, config.ffn_bias)
            w.add_string(Keys.FFN_ACT, "silu")
            w.add_bool(Keys.FFN_GATED, True)
    w.add_uint32("general.file_type", int(ftype))

    w.add_string(Keys.TOKENIZER_JSON_BLOB, tokenizer_json)
    # "bert" = WordPiece (the reference's value); "gpt2" = byte-level BPE;
    # "t5" = SentencePiece Unigram (ggml's names) — informational, dispatch
    # runs off the json blob
    _TOK_MODEL_NAMES = {"BPE": "gpt2", "Unigram": "t5"}
    w.add_string(Keys.TOKENIZER_MODEL, _TOK_MODEL_NAMES.get(tok_model, "bert"))
    w.add_array(Keys.TOKENIZER_LIST, tokens, GGUFValueType.STRING)
    # Unigram carries real piece log-probs; other families write zeros
    # (the reference writes zeros unconditionally)
    w.add_array(Keys.TOKENIZER_SCORES, scores, GGUFValueType.FLOAT32)
    w.add_array(
        Keys.TOKENIZER_TOKEN_TYPE,
        [int(GGUFTokenType.NORMAL)] * n_vocab,
        GGUFValueType.INT32,
    )
    if "unk" in sp:
        w.add_uint32(Keys.TOKENIZER_UNK_ID, sp["unk"])
    if "sep" in sp:
        w.add_uint32(Keys.TOKENIZER_SEP_ID, sp["sep"])
    if "pad" in sp:
        w.add_uint32(Keys.TOKENIZER_PAD_ID, sp["pad"])
    if "cls" in sp:
        w.add_uint32(Keys.TOKENIZER_CLS_ID, sp["cls"])

    target = FTYPE_TO_GGML[ftype]
    # classification-head models carry their pooler: it IS the head's dense
    # layer for BERT (SKIPPED_TENSORS drops it only for embedding models,
    # matching convert-to-gguf.py:294-321)
    skipped = SKIPPED_TENSORS
    if config.n_labels:
        from .schema import head_tensors

        skipped = skipped - set(head_tensors(config))
    for name, data in state_dict.items():
        if name in skipped:
            continue
        arr = np.ascontiguousarray(np.asarray(data), dtype=np.float32)
        if arr.ndim > 2:
            # drop stray singleton dims from odd checkpoints — but never
            # squeeze a legitimate 2-D table (RoBERTa's token-type table is
            # [1, E] and must stay 2-D)
            arr = np.squeeze(arr)
        if target != GGMLType.F32 and name.endswith(".weight") and arr.ndim == 2:
            if target == GGMLType.F16:
                w.add_tensor(name, arr.astype(np.float16))
            elif arr.shape[-1] % QK4:
                # block quants must not straddle rows (ggml blocks are
                # row-local); e.g. MPNet's [32, n_head] relative-attention
                # bias table stays f32 — same rule as quantize_tool
                w.add_tensor(name, arr)
            else:
                w.add_tensor_raw(name, arr.shape, target, quantize(arr.reshape(-1), target))
        else:
            w.add_tensor(name, arr)
    w.write(os.fspath(out_path))


def _detect_sparse(model_dir: Path) -> bool:
    """True when the checkpoint is a sentence-transformers SparseEncoder
    (modules.json stacks MLMTransformer + SpladePooling — the SPLADE
    packaging; raw naver/splade-* BertForMaskedLM dirs carry no modules.json
    and need an explicit sparse=True)."""
    path = model_dir / "modules.json"
    if not path.is_file():
        return False
    try:
        with open(path) as f:
            modules = json.load(f)
    except (OSError, ValueError):
        return False
    if not isinstance(modules, list):
        return False
    types = {str(m.get("type", "")) for m in modules if isinstance(m, dict)}
    return any("SpladePooling" in t for t in types)


def _vocab_token_id(tokenizer_json: bytes, token: str) -> int:
    """Resolve a token string to its id via tokenizer.json (model.vocab,
    both WordPiece/BPE dicts and Unigram piece lists, plus added_tokens).
    -1 when absent."""
    tok = json.loads(tokenizer_json)
    vocab = tok.get("model", {}).get("vocab", {})
    if isinstance(vocab, dict) and token in vocab:
        return int(vocab[token])
    if isinstance(vocab, list):
        for i, item in enumerate(vocab):
            if isinstance(item, (list, tuple)) and item and item[0] == token:
                return i
    for added in tok.get("added_tokens", []):
        if added.get("content") == token:
            return int(added["id"])
    return -1


def _read_colbert_metadata(model_dir: Path) -> dict:
    """colbert-ai's artifact.metadata (JSON; carries query_maxlen,
    mask_punctuation, dim, query_token_id/doc_token_id token strings).
    Empty dict when absent — conversion then uses the published defaults."""
    path = model_dir / "artifact.metadata"
    if not path.is_file():
        return {}
    try:
        with open(path) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return {}
    return meta if isinstance(meta, dict) else {}


def load_hf_dir(model_dir: str | os.PathLike, *, sparse: bool | None = None,
                colbert: bool | None = None):
    """Load a local HF BERT checkpoint directory (config.json /
    tokenizer.json / safetensors-or-pytorch weights, no network) into
    (config, state_dict, tokenizer_json, special_id_overrides, hf_repo).

    sparse: keep the MLM prediction head and mark the model as a SPLADE
    sparse encoder (config.mlm_head) instead of dropping the head like the
    dense conversion does.  None = auto-detect from modules.json
    (SpladePooling).

    colbert: treat the checkpoint as ColBERT (keep the per-token
    `linear.weight` projection, resolve [Q]/[D]/[MASK] token ids, record
    query_maxlen/mask_punctuation).  None = auto-detect from the
    architectures list ("HF_ColBERT"/"ColBERT") or artifact.metadata."""
    model_dir = Path(model_dir)
    if sparse is None:
        sparse = _detect_sparse(model_dir)
    with open(model_dir / "config.json") as f:
        hf_config = json.load(f)
    archs = hf_config.get("architectures") or []
    # the reference accepts only BertModel (convert-to-gguf.py:133-136); we
    # extend to the sibling encoder families (models/schema.py)
    _SUPPORTED = (
        "BertModel", "BertForMaskedLM",
        "DistilBertModel", "DistilBertForMaskedLM",
        "RobertaModel", "RobertaForMaskedLM",
        "XLMRobertaModel", "XLMRobertaForMaskedLM", "CamembertModel",
        "MPNetModel", "MPNetForMaskedLM",
        "ModernBertModel", "ModernBertForMaskedLM",
        "AlbertModel", "AlbertForMaskedLM",
        # T5 encoder stacks (sentence-t5 / GTR retrievers); full seq2seq
        # checkpoints are accepted and their decoder/lm_head dropped
        "T5EncoderModel", "T5Model", "T5ForConditionalGeneration",
        # ELECTRA discriminators (ElectraModel == the BertModel graph, no
        # pooler); ForPreTraining carries the discriminator head we drop
        "ElectraModel", "ElectraForPreTraining", "ElectraForMaskedLM",
        # cross-encoder rerankers (sequence-classification heads): the
        # reference converts none of these; we map them to the same encoder
        # schema plus head tensors (schema.head_tensors)
        "BertForSequenceClassification",
        "DistilBertForSequenceClassification",
        "RobertaForSequenceClassification",
        "XLMRobertaForSequenceClassification",
        "CamembertForSequenceClassification",
        "MPNetForSequenceClassification",
        "ModernBertForSequenceClassification",
        "AlbertForSequenceClassification",
        "ElectraForSequenceClassification",
        # DeBERTa-v2/v3 (the v3 feature set is validated in from_hf_config)
        "DebertaV2Model", "DebertaV2ForMaskedLM",
        "DebertaV2ForSequenceClassification",
        # nomic-bert (nomic-embed-text-v1/v1.5, nomic-bert-2048):
        # RoPE + SwiGLU post-norm encoder (models/nomic.py)
        "NomicBertModel",
        # ColBERT late-interaction checkpoints (colbert-ir/colbertv2.0,
        # answerai-colbert-small-v1): a BERT-family encoder + a bias-free
        # per-token projection (`linear.weight`), packaged with
        # artifact.metadata by the colbert-ai trainer
        "HF_ColBERT", "ColBERT",
    )
    if archs and archs[0] not in _SUPPORTED:
        raise ValueError(f"unsupported architecture: {archs[0]}")
    colbert_meta = _read_colbert_metadata(model_dir)
    if colbert is None:
        colbert = bool(
            archs and archs[0] in ("HF_ColBERT", "ColBERT")
        ) or bool(colbert_meta.get("dim") or colbert_meta.get("query_maxlen"))
    if colbert and sparse:
        raise ValueError("a checkpoint cannot be both ColBERT and SPLADE")
    config = BertConfig.from_hf_config(hf_config, name=model_dir.name)
    import dataclasses

    pooling = _read_st_pooling(model_dir)
    if pooling is not None:
        config = dataclasses.replace(config, pooling=pooling)
    dense = _read_st_dense(model_dir)
    if dense is not None:
        out_features, activation, tensors = dense

    tokenizer_json_path = model_dir / "tokenizer.json"
    if not tokenizer_json_path.is_file():
        raise FileNotFoundError(f"missing {tokenizer_json_path}")
    tokenizer_json = tokenizer_json_path.read_bytes()

    state_dict = _load_state_dict(model_dir)
    # strip the base-model prefix of *ForMaskedLM-style checkpoints and drop
    # their task heads (cls.* for BERT, lm_head.* / vocab_* for the others);
    # "model." is ModernBERT's base prefix (ModernBertForSequenceClassification
    # holds the encoder as self.model)
    _PREFIXES = ("bert.", "distilbert.", "roberta.", "mpnet.", "model.",
                 "albert.", "electra.", "deberta.")
    # task heads: BERT's cls.*, RoBERTa/MPNet's lm_head.*, DistilBERT's
    # vocab_*, ALBERT's predictions.*, ELECTRA's discriminator/generator
    # prediction heads, DeBERTa-v3's RTD/MLM heads
    _HEADS = ("cls.", "lm_head.", "vocab_transform.", "vocab_layer_norm.",
              "vocab_projector.", "decoder.", "predictions.",
              "discriminator_predictions.", "generator_predictions.",
              "generator_lm_head.", "lm_predictions.", "mask_predictions.")
    is_seq_cls = bool(archs) and archs[0].endswith("ForSequenceClassification")
    if sparse and is_seq_cls:
        raise ValueError(
            "sparse (SPLADE) conversion requires a *ForMaskedLM checkpoint, "
            f"not {archs[0]}"
        )
    if not is_seq_cls:
        # ModernBertForMaskedLM reuses the "head." prediction-head names the
        # classification checkpoints carry — dead weight without a classifier
        _HEADS = _HEADS + ("head.",)
    keep: frozenset[str] = frozenset()
    if sparse:
        # SPLADE: the MLM prediction head IS the model's output head — keep
        # the family's canonical head names (plus the tied decoder views,
        # verified and dropped below) through the head filter
        from .schema import MLM_TIED_TENSORS, _MLM_TENSORS_BY_ARCH

        if config.arch not in _MLM_TENSORS_BY_ARCH:
            raise ValueError(
                "sparse (SPLADE) conversion is only supported for "
                f"bert/roberta/distilbert, not {config.arch!r}"
            )
        keep = frozenset(_MLM_TENSORS_BY_ARCH[config.arch]) | MLM_TIED_TENSORS
    state_dict = {
        next((k[len(p):] for p in _PREFIXES if k.startswith(p)), k): v
        for k, v in state_dict.items()
        if k in keep or not k.startswith(_HEADS)
    }
    if config.arch == "nomic-bert":
        # the checkpoint is the ground truth for bias presence — config
        # flags (qkv_proj_bias/mlp_*_bias) occasionally disagree with the
        # serialized tensors across community uploads
        config = dataclasses.replace(
            config,
            attn_bias="encoder.layers.0.attn.Wqkv.bias" in state_dict,
            ffn_bias="encoder.layers.0.mlp.fc2.bias" in state_dict,
        )
    if sparse:
        config = dataclasses.replace(config, mlm_head=True)
        state_dict = _canonicalize_mlm_head(config, state_dict)
    if colbert:
        if "linear.weight" not in state_dict:
            raise ValueError(
                "ColBERT conversion needs the per-token projection "
                "`linear.weight` (not found in the checkpoint)"
            )
        dim = int(np.asarray(state_dict["linear.weight"]).shape[0])
        # marker/mask token ids: artifact.metadata names the marker TOKENS
        # (strings); the published checkpoints use [unused0]/[unused1] for
        # BERT vocabs.  The mask token comes from the tokenizer family.
        q_tok = str(colbert_meta.get("query_token_id") or "[unused0]")
        d_tok = str(colbert_meta.get("doc_token_id") or "[unused1]")
        q_id = _vocab_token_id(tokenizer_json, q_tok)
        d_id = _vocab_token_id(tokenizer_json, d_tok)
        mask_id = next(
            (i for i in (_vocab_token_id(tokenizer_json, t)
                         for t in ("[MASK]", "<mask>")) if i >= 0),
            -1,
        )
        if min(q_id, d_id, mask_id) < 0:
            raise ValueError(
                f"could not resolve ColBERT special tokens in the "
                f"tokenizer: {q_tok!r} -> {q_id}, {d_tok!r} -> {d_id}, "
                f"[MASK]/<mask> -> {mask_id}"
            )
        config = dataclasses.replace(
            config,
            colbert_dim=dim,
            query_maxlen=int(colbert_meta.get("query_maxlen", 32)),
            mask_punctuation=bool(colbert_meta.get("mask_punctuation", True)),
            q_marker_id=q_id, d_marker_id=d_id, mask_id=mask_id,
        )
    if dense is not None:
        config = dataclasses.replace(
            config, dense_out=out_features, dense_activation=activation
        )
        state_dict.update(tensors)

    if is_seq_cls:
        # cross-encoder reranker: record the head geometry (the tensor-name
        # mapping per family lives in schema.head_tensors).  n_labels comes
        # from the out-projection's rows — the checkpoint's ground truth.
        out_name = (
            "classifier.out_proj.weight"
            if "classifier.out_proj.weight" in state_dict
            else "classifier.weight"
        )
        replacements = dict(
            n_labels=int(np.asarray(state_dict[out_name]).shape[0]),
            head_activation=HEAD_ACT_DEFAULTS.get(config.arch, "tanh"),
        )
        if config.arch == "modernbert":
            # the schema assumes the only published head configuration
            # (bias-free dense, like the encoder's bias-free linears)
            if bool(hf_config.get("classifier_bias", False)):
                raise ValueError(
                    "modernbert with classifier_bias=True is not supported "
                    "(no published checkpoint uses it)"
                )
            # classification pools BEFORE the head, per classifier_pooling
            replacements["pooling"] = str(
                hf_config.get("classifier_pooling") or "cls"
            )
        config = dataclasses.replace(config, **replacements)

    overrides = _special_overrides(model_dir)
    return (
        config, state_dict, tokenizer_json, overrides,
        hf_config.get("_name_or_path", ""), _read_st_prompts(model_dir),
    )


def _canonicalize_mlm_head(config, state_dict: dict) -> dict:
    """Verify the MLM decoder ties to the word table and normalize the tied
    views to the canonical schema names (models/schema.mlm_tensors).

    HF ForMaskedLM state dicts serialize tied tensors inconsistently:
    safetensors stores the shared storage ONCE (decoder.weight absent),
    torch dicts may carry both views.  When a decoder view is present it
    must equal its tie target — an untied (fine-tuned-apart) decoder can't
    ride the word table and is rejected loudly."""
    from .schema import mlm_tensors

    word = np.asarray(state_dict["embeddings.word_embeddings.weight"])
    decoder_name, bias_alias, bias_canon = {
        "bert": ("cls.predictions.decoder.weight",
                 "cls.predictions.decoder.bias", "cls.predictions.bias"),
        "roberta": ("lm_head.decoder.weight",
                    "lm_head.decoder.bias", "lm_head.bias"),
        "distilbert": ("vocab_projector.weight",
                       None, "vocab_projector.bias"),
    }[config.arch]
    dec = state_dict.pop(decoder_name, None)
    if dec is not None and not np.array_equal(np.asarray(dec), word):
        raise ValueError(
            f"{decoder_name} is not tied to the word-embedding table; "
            "untied MLM decoders are not supported (no published SPLADE "
            "checkpoint unties them)"
        )
    if bias_alias is not None:
        alias = state_dict.pop(bias_alias, None)
        if alias is not None:
            canon = state_dict.get(bias_canon)
            if canon is None:
                state_dict[bias_canon] = alias
            elif not np.array_equal(np.asarray(alias), np.asarray(canon)):
                raise ValueError(
                    f"{bias_alias} differs from {bias_canon}; "
                    "inconsistent tied MLM bias views"
                )
    missing = [n for n in mlm_tensors(config) if n not in state_dict]
    if missing:
        raise ValueError(f"MLM head tensors missing from checkpoint: {missing}")
    return state_dict


def convert_hf_dir(
    model_dir: str | os.PathLike,
    out_path: str | os.PathLike,
    ftype: str | GGUFFileType = "f32",
    *,
    sparse: bool | None = None,
    colbert: bool | None = None,
) -> None:
    """Convert a local HF BERT checkpoint directory to GGUF
    (the reference's models/convert-to-gguf.py).  sparse: keep the MLM head
    for SPLADE sparse encoding; colbert: keep the per-token projection and
    record the ColBERT framing config (None = auto-detect, see
    load_hf_dir)."""
    if isinstance(ftype, str):
        ftype = FTYPE_NAMES[ftype]
    config, state_dict, tokenizer_json, overrides, repo, prompts = (
        load_hf_dir(model_dir, sparse=sparse, colbert=colbert)
    )
    write_bert_gguf(
        out_path,
        config,
        state_dict,
        tokenizer_json,
        ftype,
        special_ids=overrides,
        source_hf_repo=repo,
        prompts=prompts[0],
        default_prompt_name=prompts[1],
    )


def convert_hf_dir_to_legacy(
    model_dir: str | os.PathLike,
    out_path: str | os.PathLike,
    ftype: str = "f16",
) -> None:
    """Convert a local HF BERT checkpoint to the legacy pre-GGUF .bin format
    (the reference's models/convert-to-ggml.py; f32/f16 only).  sparse is
    pinned False: the legacy header has no mlm_head hparam, so a SPLADE dir
    (modules.json auto-detection) converts to a plain dense .bin here."""
    from ..gguf.legacy import write_legacy_bin

    config, state_dict, tokenizer_json, _, _, _ = load_hf_dir(
        model_dir, sparse=False
    )
    write_legacy_bin(out_path, config, state_dict, tokenizer_json, ftype)


def _load_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    st_path = model_dir / "model.safetensors"
    if st_path.is_file():
        from safetensors.numpy import load_file

        return load_file(str(st_path))
    pt_path = model_dir / "pytorch_model.bin"
    if pt_path.is_file():
        import torch

        sd = torch.load(str(pt_path), map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {model_dir}"
    )


def _read_st_dense(model_dir: Path):
    """Read a sentence-transformers Dense module (e.g. LaBSE's 2_Dense):
    a linear projection + activation applied between pooling and
    normalization.  The reference never loads these — its converter only
    accepts the bare BertModel (convert-to-gguf.py:133-136), so the module
    weights are simply absent from its output.  Returns
    (out_features, activation, {"dense.linear.weight": ..., ...}) or None."""
    dense_dirs = sorted(model_dir.glob("*_Dense"),
                        key=lambda q: int(q.name.split("_")[0]))
    if not dense_dirs:
        return None
    if len(dense_dirs) > 1:
        raise NotImplementedError(
            f"{len(dense_dirs)} stacked Dense modules in {model_dir}; "
            "only a single projection head is supported"
        )
    d = dense_dirs[0]
    with open(d / "config.json") as f:
        cfg = json.load(f)
    act_name = str(cfg.get("activation_function", "")).rsplit(".", 1)[-1]
    if act_name == "Tanh":
        activation = "tanh"
    elif act_name in ("Identity", ""):
        activation = "identity"
    else:
        raise ValueError(
            f"unsupported Dense activation {act_name!r} in {d} "
            "(supported: Tanh, Identity)"
        )
    st_path = d / "model.safetensors"
    if st_path.is_file():
        from safetensors.numpy import load_file

        weights = load_file(str(st_path))
    else:
        import torch

        sd = torch.load(str(d / "pytorch_model.bin"), map_location="cpu",
                        weights_only=True)
        weights = {k: v.float().numpy() for k, v in sd.items()}
    tensors = {
        "dense.linear.weight": np.asarray(weights["linear.weight"], np.float32),
        "dense.linear.bias": np.asarray(
            weights.get(
                "linear.bias",
                np.zeros(int(cfg["out_features"]), np.float32),
            ),
            np.float32,
        ),
    }
    return int(cfg["out_features"]), activation, tensors


def _read_st_prompts(model_dir: Path) -> tuple[dict[str, str], str]:
    """Read named prompt prefixes from config_sentence_transformers.json.

    Prefix models (e5's "query: "/"passage: ", bge/gte instruction
    prompts) publish them there as {"prompts": {name: prefix},
    "default_prompt_name": name|null}; encoding without the prefix
    silently degrades retrieval quality, so the converter carries them
    into the GGUF kv.  The reference ignores the file entirely (its
    convert-to-gguf.py reads only config.json/tokenizer.json)."""
    path = model_dir / "config_sentence_transformers.json"
    if not path.is_file():
        return {}, ""
    with open(path) as f:
        cfg = json.load(f)
    raw = cfg.get("prompts") or {}
    prompts = {
        str(name): str(prefix)
        for name, prefix in raw.items()
        if isinstance(prefix, str) and prefix
    }
    default = cfg.get("default_prompt_name") or ""
    if default and default not in prompts:
        default = ""  # dangling name (or its prefix was empty) — drop it
    return prompts, str(default)


def _read_st_pooling(model_dir: Path) -> str | None:
    """Read a sentence-transformers 1_Pooling/config.json if present — the
    pooling config the reference ignores (benchmarks/README.md:31 notes the
    resulting bert-base score mismatch)."""
    path = model_dir / "1_Pooling" / "config.json"
    if not path.is_file():
        return None
    with open(path) as f:
        cfg = json.load(f)
    if cfg.get("pooling_mode_cls_token"):
        return "cls"
    if cfg.get("pooling_mode_max_tokens"):
        return "max"
    if cfg.get("pooling_mode_mean_tokens"):
        return "mean"
    return None


def _special_overrides(model_dir: Path) -> dict | None:
    """Read special-token ids from tokenizer_config/special_tokens_map."""
    path = model_dir / "special_tokens_map.json"
    if not path.is_file():
        return None
    with open(path) as f:
        smap = json.load(f)
    with open(model_dir / "tokenizer.json", "rb") as f:
        vocab = json.load(f)["model"]["vocab"]
    out = {}
    for key, map_key in (
        ("unk", "unk_token"),
        ("sep", "sep_token"),
        ("pad", "pad_token"),
        ("cls", "cls_token"),
    ):
        tok = smap.get(map_key)
        if isinstance(tok, dict):
            tok = tok.get("content")
        if tok in vocab:
            out[key] = vocab[tok]
    return out or None
