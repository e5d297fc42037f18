"""Manual-collective distributed forward via jax.shard_map.

The GSPMD path (parallel/sharding.py) lets XLA place the collectives, but a
`pallas_call` cannot be partitioned by GSPMD — so this module provides the
same dp x tp layout with *manual* Megatron collectives: inside the shard_map
body every array is a per-device local, Pallas kernels run unchanged, and
the two row-parallel matmuls per layer issue explicit `lax.psum`s over the
"tp" axis (riding ICI on real hardware).

Numerically identical to the GSPMD path (tests assert it); use this one when
`q4_impl="pallas"` / `attn_impl="pallas"` should run on a mesh.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.bert import ComputeOptions, bert_embed_batch, bert_embed_packed
from ..models.config import BertConfig
from .mesh import DP_AXIS, TP_AXIS
from .sharding import _check_divisibility, param_pspecs


def shard_params_and_make_forward_manual(
    params, config: BertConfig, opts: ComputeOptions, mesh
):
    """device_put params per the TP layout; return (params, forward) where
    forward runs the model as a shard_map body with explicit collectives."""
    tp = mesh.shape.get(TP_AXIS, 1)
    _check_divisibility(config, tp)

    pspecs = param_pspecs(params, config, tp)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, shardings)

    body_opts = dataclasses.replace(
        opts,
        tp_axis=TP_AXIS if tp > 1 else None,
        inside_shard_map=True,
    )
    data_spec = P(DP_AXIS, None)
    out_spec = data_spec  # int8 mode packs into one uint8 [B, E+4] array

    def body(p, ids, mask):
        return bert_embed_batch(p, ids, mask, config, body_opts)

    fwd = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(pspecs, data_spec, data_spec),
            out_specs=out_spec,
            check_vma=False,
        )
    )
    return params, fwd


def make_packed_forward_manual(
    params, config: BertConfig, opts: ComputeOptions, mesh
):
    """Sequence-packed shard_map forward: packed rows shard over dp, params
    use the Megatron tp layout with explicit psums, and — unlike GSPMD —
    the segment-masked Pallas attention kernel runs inside the body (each
    device sees per-device locals).  The compact gather happens on the
    dp-local rows; results concatenate over dp.

    Takes `params` only to derive the pspec tree (pass the already-sharded
    pytree from shard_params_and_make_forward_manual).
    """
    tp = mesh.shape.get(TP_AXIS, 1)
    _check_divisibility(config, tp)
    pspecs = param_pspecs(params, config, tp)

    body_opts = dataclasses.replace(
        opts,
        tp_axis=TP_AXIS if tp > 1 else None,
        inside_shard_map=True,
    )
    data_spec = P(DP_AXIS, None)

    out_spec = P(DP_AXIS, None, None)  # int8 mode packs into one u8 array

    def make(n_seg: int, max_seg_len: int | None):
        def body(p, ids, seg, pos):
            # per-device local [B/dp, G, E] slot grid; gather on the host
            # side of the concatenated result keeps slot indexing global
            return bert_embed_packed(
                p, ids, seg, pos, config, body_opts, n_seg=n_seg,
                max_seg_len=max_seg_len,
            )

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(pspecs, data_spec, data_spec, data_spec),
                out_specs=out_spec,
                check_vma=False,
            )
        )

    return make
