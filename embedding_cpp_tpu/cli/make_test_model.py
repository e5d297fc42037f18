"""Build a synthetic GGUF model (random weights + synthetic vocab).

Usage: python -m embedding_cpp_tpu.cli.make_test_model out.gguf \
           [--preset tiny|tiny-colbert|tiny-roberta|tiny-xlmr|tiny-distilbert|tiny-mpnet|tiny-modernbert|tiny-albert|tiny-electra|tiny-t5|tiny-deberta|tiny-splade|tiny-reranker|tiny-modernbert-reranker|tiny-deberta-reranker|minilm-l6|minilm-l12|bert-base|mpnet-base|modernbert-base]\
           [--ftype f32] [--seed 0]

The roberta preset carries a trained byte-level BPE tokenizer; xlmr a trained
SentencePiece-Unigram one; distilbert a WordPiece one.

Lets every surface (CLI, server, benchmarks, tests) run end-to-end without
network access or real model downloads.
"""
from __future__ import annotations

import argparse
from dataclasses import replace

from ..models.config import (
    BERT_BASE,
    DEBERTA_V3_BASE,
    GTR_BASE,
    MINILM_L6,
    MINILM_L12,
    MODERNBERT_BASE,
    MPNET_BASE,
    NOMIC_EMBED,
    BertConfig,
)
from ..models.convert import FTYPE_NAMES, write_bert_gguf
from ..models.params import random_state_dict
from ..tokenizer.testvocab import (
    build_bpe_tokenizer_json,
    build_tokenizer_json,
    build_unigram_tokenizer_json,
)

PRESETS = {
    "tiny": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        name="tiny-test",
    ),
    "tiny-roberta": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        layer_norm_eps=1e-5, n_token_types=1, arch="roberta", pos_offset=2,
        name="tiny-roberta-test",
    ),
    # XLM-R = RoBERTa encoder + SentencePiece-Unigram tokenizer
    # (reference converts it through the same bert path; convert-to-gguf.py)
    "tiny-xlmr": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        layer_norm_eps=1e-5, n_token_types=1, arch="roberta", pos_offset=2,
        name="tiny-xlmr-test",
    ),
    "tiny-distilbert": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="distilbert", name="tiny-distilbert-test",
    ),
    # MPNet tokenizes with WordPiece (MPNetTokenizer wraps BertTokenizer's
    # algorithm behind RoBERTa-style special tokens)
    "tiny-mpnet": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="mpnet", pos_offset=2, rel_attn_buckets=32,
        name="tiny-mpnet-test",
    ),
    # ModernBERT tokenizes with byte-level BPE (a modified OLMo/GPT-2
    # vocabulary); 4 layers cover the global/local alternation (g,l,l,g)
    "tiny-modernbert": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=4, n_head=4, n_ff=128,
        n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
        rope_theta=160000.0, local_rope_theta=10000.0,
        global_attn_every=3, local_window=16,
        name="tiny-modernbert-test",
    ),
    # T5 encoder (gtr/sentence-t5 shape at tiny scale): RMSNorm pre-norm
    # blocks, unscaled attention + shared relative bias, relu FFN,
    # SentencePiece-Unigram tokenizer, no CLS framing
    "tiny-t5": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32,
        n_head_dim=16, ffn_act="relu", name="tiny-t5-test",
    ),
    # DeBERTa-v3 (mxbai/nli reranker base at tiny scale): disentangled
    # attention over log-bucketed relative positions, SentencePiece-Unigram
    "tiny-deberta": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="deberta", layer_norm_eps=1e-7,
        rel_attn_buckets=32, rel_attn_max_dist=128, name="tiny-deberta-test",
    ),
    # DeBERTa-v3 cross-encoder reranker (ContextPooler gelu + classifier)
    "tiny-deberta-reranker": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_token_types=0, arch="deberta", layer_norm_eps=1e-7,
        rel_attn_buckets=32, rel_attn_max_dist=128,
        n_labels=1, head_activation="gelu",
        name="tiny-deberta-reranker-test",
    ),
    # ALBERT: one shared layer applied n_layer times, factorized embedding
    # table (emb_width 32 -> n_embd 64), gelu_new (tanh) activation;
    # SentencePiece in real checkpoints but WordPiece is fine synthetically
    "tiny-albert": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=3, n_head=4, n_ff=128,
        arch="albert", gelu="tanh", n_embd_emb=32, name="tiny-albert-test",
    ),
    # ELECTRA-small-style discriminator: BERT graph + factorized embeddings
    "tiny-electra": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        arch="electra", n_embd_emb=32, name="tiny-electra-test",
    ),
    # SPLADE sparse encoder: BERT encoder + MLM prediction head (drives
    # encode_sparse / /v1/sparse_embeddings hermetically); random weights
    # still exercise the full max-log1p-relu + top-k pipeline
    "tiny-splade": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        mlm_head=True, name="tiny-splade-test",
    ),
    # cross-encoder reranker: BERT encoder + classification head (drives
    # the rerank CLI / /v1/rerank route hermetically)
    "tiny-reranker": BertConfig(
        n_vocab=1000, n_ctx=128, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        n_labels=1, name="tiny-reranker-test",
    ),
    # ModernBERT reranker (gte-reranker-modernbert shape): PredictionHead
    # (bias-free dense + gelu + bias-free norm) + biased classifier
    "tiny-modernbert-reranker": BertConfig(
        n_vocab=600, n_ctx=128, n_embd=64, n_layer=4, n_head=4, n_ff=128,
        n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
        rope_theta=160000.0, local_rope_theta=10000.0,
        global_attn_every=3, local_window=16,
        n_labels=1, head_activation="gelu", pooling="cls",
        name="tiny-modernbert-reranker-test",
    ),
    # nomic-bert (nomic-embed-text shape at tiny scale): post-norm RoPE
    # blocks, SwiGLU FFN, bias-free attention/FFN linears, dynamic-NTK
    # rope scaling past max_trained (exercised by n_ctx > rope_max_trained)
    "tiny-nomic": BertConfig(
        n_vocab=1000, n_ctx=256, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        arch="nomic-bert", rope_theta=1000.0, rope_scaling_factor=2.0,
        rope_max_trained=128, ffn_act="silu", ffn_gated=True,
        attn_bias=False, ffn_bias=False, name="tiny-nomic-test",
    ),
    # ColBERT late-interaction checkpoint (colbertv2 shape at tiny scale):
    # per-token 32-dim projection, [Q]/[D] markers, [MASK] query
    # augmentation, punctuation skiplist.  Marker/mask ids here are
    # placeholders; make_test_model resolves them from the built test vocab
    # ([unused0]/[unused1]/[MASK]) exactly like the converter does.
    "tiny-colbert": BertConfig(
        n_vocab=300, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        colbert_dim=32, query_maxlen=16, mask_punctuation=True,
        q_marker_id=5, d_marker_id=6, mask_id=4, name="tiny-colbert-test",
    ),
    "minilm-l6": replace(MINILM_L6, n_vocab=1000, name="minilm-l6-synthetic"),
    "minilm-l12": replace(MINILM_L12, n_vocab=1000, name="minilm-l12-synthetic"),
    "bert-base": replace(BERT_BASE, n_vocab=1000, name="bert-base-synthetic"),
    "mpnet-base": replace(MPNET_BASE, n_vocab=1000, name="mpnet-base-synthetic"),
    "modernbert-base": replace(
        MODERNBERT_BASE, n_vocab=1000, name="modernbert-base-synthetic"
    ),
    "gtr-base": replace(GTR_BASE, n_vocab=600, name="gtr-base-synthetic"),
    "nomic-embed-text": replace(
        NOMIC_EMBED, n_vocab=1000, name="nomic-embed-synthetic"
    ),
    "deberta-base": replace(
        DEBERTA_V3_BASE, n_vocab=600, name="deberta-base-synthetic"
    ),
}


def make_test_model(
    out_path: str, preset: str = "tiny", ftype: str = "f32", seed: int = 0
) -> None:
    config = PRESETS[preset]
    if preset == "tiny-xlmr" or config.arch in ("t5", "deberta"):
        # Unigram training may converge below the requested vocab size —
        # size the model to the trained piece list
        import json

        tokenizer_json = build_unigram_tokenizer_json(config.n_vocab)
        spec = json.loads(tokenizer_json)
        n = len(spec["model"]["vocab"])
        n = max([n] + [t["id"] + 1 for t in spec.get("added_tokens", [])])
        config = replace(config, n_vocab=n)
    elif config.arch in ("roberta", "modernbert"):
        # BPE training stops when the corpus runs out of merges, so the
        # trained vocab may be smaller than requested — size the model to it
        import json

        tokenizer_json = build_bpe_tokenizer_json(config.n_vocab)
        spec = json.loads(tokenizer_json)
        ids = list(spec["model"]["vocab"].values()) + [
            t["id"] for t in spec.get("added_tokens", [])
        ]
        config = replace(config, n_vocab=max(ids) + 1)
    else:
        tokenizer_json = build_tokenizer_json(config.n_vocab)
    if config.colbert_dim:
        # resolve the marker/mask ids from the actual test vocab, the same
        # lookup the HF converter performs (models/convert.py)
        from ..models.convert import _vocab_token_id

        config = replace(
            config,
            q_marker_id=_vocab_token_id(tokenizer_json, "[unused0]"),
            d_marker_id=_vocab_token_id(tokenizer_json, "[unused1]"),
            mask_id=_vocab_token_id(tokenizer_json, "[MASK]"),
        )
    sd = random_state_dict(config, seed=seed)
    write_bert_gguf(out_path, config, sd, tokenizer_json, FTYPE_NAMES[ftype])


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out")
    p.add_argument("--preset", choices=sorted(PRESETS), default="tiny")
    p.add_argument("--ftype", choices=sorted(FTYPE_NAMES), default="f32")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    make_test_model(args.out, args.preset, args.ftype, args.seed)
    print(f"wrote {args.preset} ({args.ftype}) model to {args.out}")


if __name__ == "__main__":
    main()
