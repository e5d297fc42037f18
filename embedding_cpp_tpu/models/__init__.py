"""Model layer: configs, tensor schema, parameter loading, BERT forward."""
from .bert import (
    ComputeOptions,
    bert_embed_batch,
    bert_score_batch,
    bert_sparse_batch,
    make_forward,
    mean_pool_normalize,
)
from .config import BERT_BASE, MINILM_L6, MINILM_L12, MPNET_BASE, BertConfig
from .params import load_params, random_params, random_state_dict

__all__ = [
    "BertConfig",
    "MINILM_L6",
    "MINILM_L12",
    "BERT_BASE",
    "MPNET_BASE",
    "ComputeOptions",
    "bert_embed_batch",
    "bert_score_batch",
    "bert_sparse_batch",
    "make_forward",
    "mean_pool_normalize",
    "load_params",
    "random_params",
    "random_state_dict",
]
