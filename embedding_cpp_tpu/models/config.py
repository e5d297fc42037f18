"""Model hyperparameters.

Equivalent of the reference's `bert_hparams` (bert.cpp:20-31), populated from
GGUF kv metadata exactly as the reference loader does (bert.cpp:496-513):
n_vocab comes from the token list length, everything else from `bert.*` keys.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..gguf.constants import Keys


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
    name: str = ""

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    def __post_init__(self):
        if self.n_embd % self.n_head:
            raise ValueError(
                f"n_embd {self.n_embd} not divisible by n_head {self.n_head}"
            )

    @classmethod
    def from_gguf_kv(cls, kv: dict) -> "BertConfig":
        n_vocab = len(kv[Keys.TOKENIZER_LIST])
        return cls(
            n_vocab=n_vocab,
            n_ctx=int(kv[Keys.CONTEXT_LENGTH]),
            n_embd=int(kv[Keys.EMBEDDING_LENGTH]),
            n_layer=int(kv[Keys.BLOCK_COUNT]),
            n_head=int(kv[Keys.HEAD_COUNT]),
            n_ff=int(kv[Keys.FEED_FORWARD_LENGTH]),
            layer_norm_eps=float(kv.get(Keys.LAYER_NORM_EPS, 1e-12)),
            pooling=str(kv.get(Keys.POOLING_TYPE, "mean")),
            normalize=bool(kv.get(Keys.NORMALIZE, True)),
            dense_out=int(kv.get(Keys.DENSE_OUT, 0)),
            dense_activation=str(kv.get(Keys.DENSE_ACTIVATION, "tanh")),
            name=str(kv.get("general.name", "")),
        )

    @classmethod
    def from_hf_config(cls, hf: dict, name: str = "") -> "BertConfig":
        """From a transformers BertConfig-style dict (config.json)."""
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
