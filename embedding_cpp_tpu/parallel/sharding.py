"""GSPMD parameter shardings + the pjit-compiled distributed forward.

Tensor-parallel layout (Megatron-style, applied through `jax.sharding`
annotations — XLA inserts the collectives):

- q/k/v and ffn_up weights:  column-parallel (output/head axis over "tp");
  their biases follow the same split;
- o and ffn_down weights:    row-parallel (contraction axis over "tp") —
  GSPMD emits one psum per row-parallel matmul, riding ICI;
- embeddings, LayerNorms, row-parallel biases: replicated;
- activations/data: batch axis over "dp".

QTensors (q4/q8) shard the same way: their qs/scales/mins planes all carry N last
and (blocked) K in the middle, so one spec per logical weight applies to all
three planes.  Block alignment holds whenever (K/32) % tp == 0 — checked.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.bert import ComputeOptions, bert_embed_batch, bert_embed_packed
from ..models.config import BertConfig
from .mesh import DP_AXIS, TP_AXIS

# per-logical-weight specs; arrays are layer-stacked (leading L axis = None)
_COLUMN_PARALLEL = frozenset({"q_w", "k_w", "v_w", "ffn_up_w", "ffn_gate_w"})
_ROW_PARALLEL = frozenset({"o_w", "ffn_down_w"})
_COLUMN_BIAS = frozenset({"q_b", "k_b", "v_b", "ffn_up_b"})


def _layer_spec(key: str, tp: int, config: BertConfig):
    if tp > 1 and key in _COLUMN_PARALLEL:
        return P(None, None, TP_AXIS)  # [L, K(/2|/32), N] -> split N
    if tp > 1 and key in _ROW_PARALLEL:
        return P(None, TP_AXIS, None)  # split K (blocked axes divide evenly)
    if tp > 1 and key in _COLUMN_BIAS:
        return P(None, TP_AXIS)  # [L, N]
    return P()  # replicated


def _check_divisibility(config: BertConfig, tp: int) -> None:
    if tp == 1:
        return
    if config.n_head % tp:
        raise ValueError(f"n_head {config.n_head} not divisible by tp={tp}")
    for name, k in (("n_embd", config.n_embd), ("n_ff", config.n_ff)):
        if (k // 32) % tp:
            raise ValueError(
                f"{name}={k}: K/32={k//32} not divisible by tp={tp} "
                "(Q4 block alignment)"
            )


def param_pspecs(params, config: BertConfig, tp: int):
    """Pytree of PartitionSpecs matching the params treedef."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "layers" in keys:
            # path: ('layers', <weight key>[, <dataclass field>])
            wkey = keys[keys.index("layers") + 1]
            s = _layer_spec(wkey, tp, config)
            if leaf.ndim < len(s):  # e.g. ln scales [L, E] with 3-axis spec
                s = P(*list(s)[: leaf.ndim])
            return s
        return P()  # embeddings replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _globalize(mesh, spec):
    """Returns a converter: numpy batch -> global jax.Array on a
    multi-process mesh (jit rejects numpy inputs with non-trivial shardings
    there).  Identical-on-all-hosts inputs are the caller's contract — the
    serving plane guarantees it by leader broadcast
    (parallel/distributed.py); per-host streams use
    distributed.local_batch instead.  Single-process: no-op."""
    import jax

    if jax.process_count() == 1:
        return lambda arr: arr
    sharding = NamedSharding(mesh, spec)

    def convert(arr):
        if isinstance(arr, jax.Array):  # already global (per-host stream)
            return arr
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return convert


class ShardedForward:
    """Callable distributed forward.  `__call__` keeps the batch-sharded
    output; `.gather` is the compact-output variant (gather_idx picks the
    real rows on device, so padded batch rows never cross the device->host
    link — the same transfer optimization the single-device engine applies,
    engine.py compact gather).  On a multi-process mesh, numpy data inputs
    are converted to global arrays (identical-inputs contract; see
    _globalize)."""

    def __init__(self, plain, gather, to_global=lambda arr: arr):
        self._plain = plain
        self._gather = gather
        self._to_global = to_global

    def __call__(self, p, ids, mask):
        return self._plain(p, self._to_global(ids), self._to_global(mask))

    def gather(self, p, ids, mask, gather_idx):
        return self._gather(
            p, self._to_global(ids), self._to_global(mask), gather_idx
        )


def shard_params_and_make_forward(
    params, config: BertConfig, opts: ComputeOptions, mesh
):
    """device_put params per the TP layout; return (params, forward) where
    forward is a ShardedForward with data sharded over dp."""
    tp = mesh.shape.get(TP_AXIS, 1)
    _check_divisibility(config, tp)

    pspecs = param_pspecs(params, config, tp)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, shardings)

    data_sharding = NamedSharding(mesh, P(DP_AXIS, None))
    rep = NamedSharding(mesh, P())
    # int8 output mode returns one packed uint8 [B, E+4] array — same
    # batch-axis sharding as any other output dtype
    out_sharding = data_sharding
    out_rep = rep

    @partial(
        jax.jit,
        in_shardings=(shardings, data_sharding, data_sharding),
        out_shardings=out_sharding,
    )
    def forward(p, ids, mask):
        return bert_embed_batch(p, ids, mask, config, opts)

    # compact variant: [M, n_embd] output replicates (M rows map to
    # arbitrary dp shards and M is small — one vector per real sentence)
    @partial(
        jax.jit,
        in_shardings=(shardings, data_sharding, data_sharding, rep),
        out_shardings=out_rep,
    )
    def forward_gather(p, ids, mask, gather_idx):
        return bert_embed_batch(p, ids, mask, config, opts,
                                gather_idx=gather_idx)

    return params, ShardedForward(
        forward, forward_gather, _globalize(mesh, P(DP_AXIS, None))
    )


def make_packed_forward(mesh, config: BertConfig, opts: ComputeOptions):
    """Sequence-packed distributed forward: packed rows shard over dp like
    plain batch rows (params use their committed shardings); the compact
    [M, n_embd] gather result replicates — M rows map to arbitrary dp shards
    and M is small (one vector per sentence)."""
    data = NamedSharding(mesh, P(DP_AXIS, None))
    rep = NamedSharding(mesh, P())
    out_rep = rep  # int8 mode packs into one uint8 array

    @partial(
        jax.jit,
        static_argnums=(5,),  # n_seg (pjit forbids kwargs with in_shardings)
        in_shardings=(None, data, data, data, rep),
        out_shardings=out_rep,
    )
    def forward(p, ids, seg, pos, gather_idx, n_seg):
        return bert_embed_packed(
            p, ids, seg, pos, config, opts, n_seg=n_seg, gather_idx=gather_idx
        )

    conv = _globalize(mesh, P(DP_AXIS, None))

    def packed(p, ids, seg, pos, gather_idx, n_seg):
        return forward(p, conv(ids), conv(seg), conv(pos), gather_idx, n_seg)

    return packed
