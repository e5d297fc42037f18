"""Batched, masked BERT encoder forward pass (pure JAX).

Reproduces the reference graph's math (bert.cpp:845-1012, documented in
SURVEY.md §3.3) with two deliberate extensions the single-sentence CPU code
never needed:

- **attention masking** over padded token batches (the reference builds one
  graph per unpadded sentence and has no mask at all — a padded batch must
  mask both softmax keys and the mean-pool to produce identical outputs);
- **dtype policy**: matmuls run in a configurable activation dtype (bf16 on
  TPU for MXU throughput, f32 for bit-parity testing), while LayerNorm,
  softmax, pooling and L2-normalization always accumulate in f32.

The layer loop is a `lax.scan` over layer-stacked parameters — one compiled
layer body regardless of depth.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import linear
from ..ops.qtensor import QTensor, gather_rows
from .config import BertConfig

Array = jax.Array

_MASK_BIAS = -1e9  # additive bias for masked keys (applied in f32)


@dataclass(frozen=True)
class ComputeOptions:
    """Runtime compute configuration (static under jit)."""

    dtype: str = "float32"  # activation dtype: "float32" | "bfloat16"
    # dtype of the returned embeddings.  "float32" matches the reference
    # (bert.h:46 float*); "float16"/"bfloat16" halve the device->host
    # transfer — on normalized embeddings f16 shifts cosine scores by ~1e-4,
    # standard for vector stores.  "int8" quarters it: the forward returns
    # (int8 codes, f32 per-vector scale) and the host decodes — the
    # device->host fetch is the measured bottleneck under the relay
    # (CLAUDE.md), so transfer compression is throughput, not just memory.
    # Pooling/normalization still run in f32.
    output_dtype: str = "float32"
    # Q4 matmul implementation.  "auto" resolves to the fused Pallas
    # dequant+bias+GELU kernel on a local TPU (single-device jit or inside
    # shard_map) and to the XLA dequant path otherwise (GSPMD cannot
    # partition a pallas_call; CPU runs the kernel only in slow interpret
    # mode).  Decisive r3 measurement (in-device full-forward A/B,
    # benchmarks/kernels.py --forward-only): pallas 6.93 ms vs xla 8.26 ms
    # at [32, 512] — the fused epilogue closed the r2 fusion asymmetry
    # (q4 FFN pattern 137 vs 73 TF/s; benchmarks/results/q4_kernel_analysis.md).
    q4_impl: str = "auto"  # "auto" | "xla" | "pallas"
    # "auto": fused Pallas kernel on TPU for S >= 128 (1.7x XLA at S=512,
    # scores never hit HBM), XLA einsum otherwise
    attn_impl: str = "auto"  # "auto" | "xla" | "pallas"
    # mesh axis name for manual (shard_map) tensor parallelism: set by
    # parallel.shard_map_forward, None under GSPMD/single-device.  Inside
    # shard_map all arrays are per-device locals, so Pallas kernels work.
    tp_axis: str | None = None
    inside_shard_map: bool = False  # set by parallel.shard_map_forward

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def resolve_impls(opts: ComputeOptions) -> ComputeOptions:
    """Resolve q4_impl="auto" against the runtime (trace-time: ComputeOptions
    is static under jit).  Mirrors the attention impl dispatch: Pallas needs
    per-device local arrays and a real TPU."""
    if opts.q4_impl != "auto":
        return opts
    import dataclasses

    local = jax.device_count() == 1 or opts.inside_shard_map
    on_tpu = jax.devices()[0].platform == "tpu"
    return dataclasses.replace(
        opts, q4_impl="pallas" if (on_tpu and local) else "xla"
    )


def layer_norm(x: Array, scale: Array, bias: Array, eps: float, out_dtype) -> Array:
    """(x - mean)/sqrt(var + eps) * scale + bias, computed in f32
    (ggml_norm + mul/add, bert.cpp:890-898).  Delegates to the ops-layer
    helper so the composed-linear tail and this entry share one
    implementation (the in-kernel variant in ops/q4_matmul._epilogue is the
    same math on preloaded f32 tiles)."""
    from ..ops.linear import _layer_norm

    return _layer_norm(x, scale, bias, eps, out_dtype)


def gelu(x: Array, kind: str) -> Array:
    """"erf" matches HF; "tanh" matches ggml's approximation (ggml_gelu).
    The forward pass fuses GELU through ops.linear(activation=...) — this
    standalone form remains for direct use/testing."""
    return jax.nn.gelu(x, approximate=(kind == "tanh"))


def t5_relative_bucket(rel, num_buckets: int = 32, max_distance: int = 128,
                       xp=jnp):
    """T5-style bidirectional relative-position bucketing, exactly as HF
    MPNetEncoder.relative_position_bucket computes it (sign bucket + linear
    near-field + log-spaced far-field, capped at max_distance).  `rel` is
    k_pos - q_pos; works on numpy (static positions, folded at trace time)
    or jnp arrays via `xp`."""
    half = num_buckets // 2
    n = -rel
    ret = (n < 0).astype(xp.int32) * half
    n = xp.abs(n)
    max_exact = half // 2
    val_if_large = max_exact + (
        xp.log(xp.maximum(n, 1).astype(xp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(xp.int32)
    val_if_large = xp.minimum(val_if_large, half - 1)
    return ret + xp.where(n < max_exact, n.astype(xp.int32), val_if_large)


def _rel_attn_bias(table: Array, s: int, max_distance: int = 128) -> Array:
    """MPNet shared position bias for a plain padded batch: [H, S, S] f32.

    HF computes the bias from absolute arange positions regardless of
    padding (MPNetEncoder.compute_position_bias: context/memory positions
    are arange(qlen)) — padded keys get a bias too but are masked out.  The
    bucket matrix depends only on the static sequence length, so it folds
    into the compiled graph as a numpy constant."""
    pos = np.arange(s)
    bucket = t5_relative_bucket(
        pos[None, :] - pos[:, None], int(table.shape[0]),
        max_distance=max_distance, xp=np,
    )
    # [S, S] gather -> [S, S, H] -> [H, S, S]
    return jnp.transpose(
        table.astype(jnp.float32)[jnp.asarray(bucket)], (2, 0, 1)
    )


def _rel_attn_bias_packed(table: Array, pos: Array,
                          max_distance: int = 128) -> Array:
    """Per-row position bias for sequence-packed batches: [B, H, S, S].

    Within a segment the per-segment positions (restarting at 0) give the
    same k_pos - q_pos differences as absolute positions would, so packed
    outputs equal the unpacked per-sentence results; cross-segment pairs get
    an arbitrary bucket but are masked block-diagonal by segment."""
    rel = pos[:, None, :] - pos[:, :, None]  # [B, Sq, Sk] = k - q
    bucket = t5_relative_bucket(rel, int(table.shape[0]),
                                max_distance=max_distance, xp=jnp)
    return jnp.transpose(table.astype(jnp.float32)[bucket], (0, 3, 1, 2))


def _attention(
    x: Array,
    lp: dict,
    mask_bias: Array,
    config: BertConfig,
    opts: ComputeOptions,
    seg: Array | None = None,
    max_seg_len: int | None = None,
    pos_bias: Array | None = None,
) -> Array:
    """Multi-head self-attention: softmax(KᵀQ/sqrt(d)) · V
    (bert.cpp:907-942), masked over padded keys.

    With `seg` (sequence packing: [B, S] int32 segment ids, -1 on padding)
    attention is additionally block-diagonal — token q may only attend to
    token k when seg[q] == seg[k], which makes a packed row's segments
    mathematically independent sentences, exactly like the reference's
    one-graph-per-sentence evaluation (bert.cpp:1065)."""
    b, s, e = x.shape
    d = config.head_dim

    q = linear(x, lp["q_w"], lp["q_b"], q4_impl=opts.q4_impl)
    # head count from the (possibly tp-local) projection width
    h = q.shape[-1] // d
    k = linear(x, lp["k_w"], lp["k_b"], q4_impl=opts.q4_impl)
    v = linear(x, lp["v_w"], lp["v_b"], q4_impl=opts.q4_impl)

    if opts.attn_impl == "pallas" or (
        opts.attn_impl == "auto"
        and (jax.device_count() == 1 or opts.inside_shard_map)
        and jax.devices()[0].platform == "tpu"
    ):
        if (pos_bias is not None and pos_bias.ndim == 3
                and pos_bias.shape[0] not in (1, h)):
            # manual-TP shard_map body: the bias table replicates while the
            # head axis is device-local — slice THIS device's heads before
            # the lane-slice kernels (their per-head loop indexes bias head
            # hh for lane slice hh, so a full-H bias would feed every
            # device head 0..h-1's bias rows regardless of tp rank)
            i = jax.lax.axis_index(opts.tp_axis)
            pos_bias = jax.lax.dynamic_slice_in_dim(pos_bias, i * h, h,
                                                    axis=0)
        if (pos_bias is None and seg is None
                and 128 <= s <= 1024 and s % 8 == 0 and d % 8 == 0):
            # plain padded batches take the projection-layout kernel: heads
            # are lane slices of [B, S, H*d], so the [B,S,H,d]<->[B,H,S,d]
            # transposes (measured ~135 us/layer HBM time at MiniLM
            # [32,512]) never exist on either side.  Whole attn block 456
            # vs 794 us, bit-identical output on v5e
            # (benchmarks/results/q4_forward_breakdown.md).
            from ..ops.attention import flash_attention_bse

            return flash_attention_bse(q, k, v, mask_bias, h)
        if pos_bias is None and seg is not None:
            from ..ops.attention import (
                flash_attention_packed_bse,
                packed_bse_applies,
            )

            if packed_bse_applies(s, d, max_seg_len):
                # packed batches — the engine's DEFAULT serving path
                # (engine.py packing="auto") — take the same projection-
                # layout kernel with the block-diagonal segment mask
                # computed in-kernel; the ~135 us/layer transpose tax the
                # r4 breakdown found no longer applies to the path the
                # headline bench measures (packed_bse_ab_v5e.json).
                return flash_attention_packed_bse(q, k, v, seg, h)
        if pos_bias is not None and seg is not None and pos_bias.ndim == 3:
            from ..ops.attention import (
                fits_bias_bse,
                flash_attention_bias_packed_bse,
                packed_bse_applies,
            )

            if packed_bse_applies(s, d, max_seg_len) and fits_bias_bse(
                s, h * d, pos_bias.shape[0], q.dtype.itemsize
            ):
                # packed bias families (MPNet): the batch-invariant
                # [H, S, S] bias (valid within segments because packed
                # positions are consecutive — see _rel_attn_bias_packed)
                # rides VMEM-resident across the batch grid with the
                # segment mask computed in-kernel
                # (packed_bias_ab_v5e.json).
                return flash_attention_bias_packed_bse(
                    q, k, v, seg, pos_bias, h
                )
        if (pos_bias is not None and seg is None and pos_bias.ndim == 3
                and 128 <= s <= 1024 and s % 8 == 0 and d % 8 == 0):
            from ..ops.attention import (
                fits_bias_bse,
                flash_attention_bias_bse,
            )

            if fits_bias_bse(s, h * d, pos_bias.shape[0], q.dtype.itemsize):
                # bias families (MPNet) in the projection layout: same
                # no-transpose win, with the [H, S, S] bias DMA'd once and
                # VMEM-resident across the batch grid (mpnet-base forward
                # 27.1 ms vs 32.3 with the transposed bias kernel and 37.4
                # XLA, attn_bias_ab_v5e.json)
                return flash_attention_bias_bse(
                    q, k, v, mask_bias, pos_bias, h
                )

    q = q.reshape(b, s, h, d)
    k = k.reshape(b, s, h, d)
    v = v.reshape(b, s, h, d)

    if pos_bias is not None and pos_bias.shape[-3] != h:
        # manual-TP shard_map body: the bias table replicates while the head
        # axis is device-local — take this device's head slice
        i = jax.lax.axis_index(opts.tp_axis)
        pos_bias = jax.lax.dynamic_slice_in_dim(
            pos_bias, i * h, h, axis=pos_bias.ndim - 3
        )

    impl = opts.attn_impl
    if impl == "auto":
        # pallas needs per-device local arrays: single-device jit, or inside
        # a shard_map body (GSPMD jit cannot partition a pallas_call)
        local = jax.device_count() == 1 or opts.inside_shard_map
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = (
            "pallas"
            if (on_tpu and local and s >= 128 and s % 8 == 0 and d % 8 == 0)
            else "xla"
        )
    if impl == "pallas" and pos_bias is not None and (
        seg is not None or pos_bias.ndim != 3
    ):
        # the packed/segment kernels take no additive bias, and the bias
        # kernel streams a batch-invariant [H, S, S] table — packed MPNet
        # (per-row restart positions -> [B, H, S, S]) rides the XLA path.
        # Plain-batch bias rides the fused kernel: real-TPU parity
        # (attn_bias_smoke_v5e.json, max|err| 0.008 at mpnet-base geometry)
        # and A/B (attn_bias_ab_v5e.json: kernel 378 vs 1417 us, full MPNet
        # forward 32.3 vs 37.4 ms at [32,512]) are on record.
        impl = "xla"
    if impl == "pallas":
        if seg is not None:
            from ..ops.attention import flash_attention_packed

            att = flash_attention_packed(q, k, v, seg, max_seg_len=max_seg_len)
        else:
            from ..ops.attention import flash_attention

            att = flash_attention(q, k, v, mask_bias, pos_bias=pos_bias)
    else:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if seg is not None:
            allowed = seg[:, :, None] == seg[:, None, :]  # [B, Sq, Sk]
            bias = jnp.where(allowed, 0.0, _MASK_BIAS).astype(jnp.float32)
            scores = scores * (1.0 / d**0.5) + bias[:, None, :, :]
        else:
            scores = scores * (1.0 / d**0.5) + mask_bias[:, None, None, :]
        if pos_bias is not None:
            # added after scaling, exactly as HF MPNetSelfAttention.forward
            # does (scores /= sqrt(d); scores += position_bias)
            scores = scores + pos_bias  # [H,S,S] broadcasts over batch
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        att = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return att.reshape(b, s, h * d)


def encoder_layer(
    x: Array,
    lp: dict,
    mask_bias: Array,
    config: BertConfig,
    opts: ComputeOptions,
    seg: Array | None = None,
    max_seg_len: int | None = None,
    pos_bias: Array | None = None,
) -> Array:
    """One transformer block: attn + add&norm, GELU FFN + add&norm
    (bert.cpp:900-994)."""
    att = _attention(x, lp, mask_bias, config, opts, seg=seg,
                     max_seg_len=max_seg_len, pos_bias=pos_bias)
    # row-parallel matmuls psum over tp in manual mode (Megatron pattern).
    # The residual add + LayerNorm tails ride the projection's epilogue:
    # fused in-kernel on the Pallas Q4 path, XLA-fused otherwise — the
    # add&norm never round-trips HBM either way (ops/linear.py).
    x = linear(
        att, lp["o_w"], lp["o_b"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
        ln=(lp["ln_att_scale"], lp["ln_att_bias"], config.layer_norm_eps),
    )
    # GELU fuses into the up-projection: XLA does it in its matmul epilogue;
    # the Pallas Q4 kernel does the same in-kernel (ops/q4_matmul.py)
    h = linear(
        x, lp["ffn_up_w"], lp["ffn_up_b"], q4_impl=opts.q4_impl,
        activation="gelu_tanh" if config.gelu == "tanh" else "gelu_erf",
    )
    return linear(
        h, lp["ffn_down_w"], lp["ffn_down_b"], q4_impl=opts.q4_impl,
        reduce_axis=opts.tp_axis, residual=x,
        ln=(lp["ln_out_scale"], lp["ln_out_bias"], config.layer_norm_eps),
    )


def embed_tokens(
    params: dict,
    ids: Array,
    config: BertConfig,
    opts: ComputeOptions,
    positions: Array | None = None,
    type_ids: Array | None = None,
) -> Array:
    """word[ids] + token_type[0] + position[off..off+S-1], then embedding
    LayerNorm (bert.cpp:868-898).  Token type is always 0 and positions are
    consecutive, exactly as the reference hard-codes them for BERT; the
    arch-dependent deltas the reference never supports: DistilBERT has no
    token-type table (the param key is absent), and RoBERTa numbers real
    tokens from `pos_offset` = padding_idx + 1 (HF
    create_position_ids_from_input_ids).  For sequence-packed batches
    `positions` carries the per-segment position ids (restarting at 0 for
    each packed sentence, matching the reference's per-sentence graphs).
    `type_ids` ([B, S] int32) selects per-token segment embeddings — the
    cross-encoder pair framing ([CLS] q [SEP] d [SEP] with segments 0/1)
    the embedding paths never need (they hard-wire type 0, like the
    reference)."""
    emb = params["embeddings"]
    s = ids.shape[-1]
    off = config.pos_offset
    word = emb["word"]
    if isinstance(word, QTensor):
        x = gather_rows(word, ids, dtype=jnp.float32)
    else:
        x = word[ids].astype(jnp.float32)
    if "token_type" in emb:
        tt = emb["token_type"]  # always dense (params.py loads tiny tables f32)
        x = x + (tt[0] if type_ids is None else tt[type_ids]).astype(jnp.float32)
    if positions is None:
        x = x + emb["position"][off : off + s].astype(jnp.float32)
    else:
        x = x + emb["position"][positions + off].astype(jnp.float32)
    x = layer_norm(
        x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps, opts.jdtype
    )
    if "emb_proj_w" in emb:
        # factorized embeddings (ALBERT's embedding_hidden_mapping_in,
        # ELECTRA's embeddings_project): project the LayerNormed emb_width
        # embeddings up to n_embd before layer 0
        x = linear(x, emb["emb_proj_w"], emb["emb_proj_b"])
    return x


def _run_layers(x: Array, layers, config: BertConfig, apply_layer) -> Array:
    """Run the layer stack as one `lax.scan`.

    Normally the scan's xs are the layer-stacked params (one compiled layer
    body regardless of depth).  With config.shared_layers (ALBERT) the stack
    has leading dim 1 — ONE parameter set serves every layer (HF
    AlbertTransformer reapplies albert_layer_groups[0]) — so the scan closes
    over the single layer's params and iterates `length=n_layer` with no xs,
    keeping the weights un-duplicated in HBM."""
    if config.shared_layers:
        lp = jax.tree_util.tree_map(lambda a: a[0], layers)
        x, _ = jax.lax.scan(
            lambda h, _: (apply_layer(h, lp), None), x, None,
            length=config.n_layer,
        )
    else:
        x, _ = jax.lax.scan(
            lambda h, lp: (apply_layer(h, lp), None), x, layers
        )
    return x


def pool_normalize(
    x: Array, mask: Array, pooling: str = "mean", normalize: bool = True
) -> Array:
    """Masked pooling over tokens + optional L2 normalization.

    "mean" is the reference behavior (bert.cpp:995-1006; its unmasked
    xᵀ·(1/N) matmul becomes sum(x·mask)/sum(mask) over padded batches);
    "cls"/"max" honor sentence-transformers pooling configs the reference
    ignores (FIXME at bert.cpp:998).
    """
    xf = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]  # [B,S,1]
    if pooling == "mean":
        pooled = jnp.sum(xf * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    elif pooling == "cls":
        pooled = xf[..., 0, :]
    elif pooling == "max":
        pooled = jnp.max(jnp.where(m > 0, xf, -jnp.inf), axis=-2)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if not normalize:
        return pooled
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def mean_pool_normalize(x: Array, mask: Array) -> Array:
    return pool_normalize(x, mask, "mean", True)


def _l2_normalize(x: Array) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, 1e-12)


def quantize_output_i8(out: Array) -> tuple[Array, Array]:
    """Per-vector symmetric int8: codes = round(x / scale), scale = amax/127.
    On L2-normalized embeddings the round-trip error is ~amax/254 per
    element (<0.5% of the largest component) — cosine scores move by ~1e-4.
    Returns (int8 codes [..., E], f32 scales [...])."""
    amax = jnp.max(jnp.abs(out), axis=-1)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.round(out / jnp.maximum(scale, 1e-20)[..., None])
    return q.astype(jnp.int8), scale


def dequantize_output_i8(q, scale):
    """Host-side decode of quantize_output_i8 (numpy or jax arrays)."""
    import numpy as np

    return np.asarray(q, dtype=np.float32) * np.asarray(scale)[..., None]


def pack_output_i8(out: Array) -> Array:
    """Quantize + bit-pack into ONE uint8 array [..., E+4]: codes in the
    first E bytes, the f32 scale's 4 bytes appended.  One array means one
    device->host fetch — the relay pays a ~25 ms round trip PER FETCH, so a
    (codes, scales) pair costs an extra RTT per batch that erases the size
    win (measured: pair-int8 20.9k < f16 21.7k sentences/s; packed avoids
    it)."""
    q, scale = quantize_output_i8(out)
    qb = jax.lax.bitcast_convert_type(q, jnp.uint8)
    sb = jax.lax.bitcast_convert_type(scale, jnp.uint8)  # [..., 4]
    return jnp.concatenate([qb, sb], axis=-1)


def unpack_output_i8(packed) -> "jnp.ndarray":
    """Host-side decode of pack_output_i8: numpy [..., E+4] u8 -> f32
    [..., E]."""
    import numpy as np

    packed = np.ascontiguousarray(packed)
    q = packed[..., :-4].view(np.int8)
    scale = np.ascontiguousarray(packed[..., -4:]).view(np.float32)[..., 0]
    return q.astype(np.float32) * scale[..., None]


def _cast_output(out: Array, opts: ComputeOptions):
    """Apply the output transfer encoding: plain dtype cast, or packed int8
    (uint8 [..., E+4]; see pack_output_i8)."""
    if opts.output_dtype == "int8":
        return pack_output_i8(out)
    return out.astype(jnp.dtype(opts.output_dtype))


def _output_head(pooled: Array, params: dict, config: BertConfig) -> Array:
    """Optional sentence-transformers Dense projection (pooled @ W + b with
    tanh/identity activation — e.g. LaBSE) between pooling and the L2 norm.
    The reference never carries these weights: its converter only accepts
    the bare BertModel (convert-to-gguf.py:133-136), so Dense modules are
    absent from its GGUFs and mean+L2 is hard-coded (bert.cpp:995-1006).
    `pooled` and the head params are f32 (pool_normalize accumulates f32;
    the weights load as f32 regardless of the activation dtype)."""
    dense = params.get("dense")
    if dense is None:
        return _l2_normalize(pooled) if config.normalize else pooled
    y = pooled @ dense["w"] + dense["b"]
    if config.dense_activation == "tanh":
        y = jnp.tanh(y)
    return _l2_normalize(y) if config.normalize else y


def pool_normalize_packed(
    x: Array,
    seg: Array,
    pos: Array,
    n_seg: int,
    pooling: str = "mean",
    normalize: bool = True,
) -> Array:
    """Per-segment pooling over a packed row: [B, S, E] -> [B, n_seg, E].

    The segment-wise analog of `pool_normalize`: each packed sentence pools
    over exactly its own tokens (the reference pools one sentence per graph,
    bert.cpp:995-1006).  Mean and cls reduce via a [B, S, G] one-hot matmul
    (MXU-friendly); max uses segment_max over flattened global segment ids.
    Empty segment slots come out as zero vectors.
    """
    b, s, e = x.shape
    xf = x.astype(jnp.float32)
    gids = jnp.arange(n_seg, dtype=seg.dtype)
    onehot = (seg[:, :, None] == gids[None, None, :]).astype(jnp.float32)
    if pooling == "mean":
        sums = jnp.einsum("bsg,bse->bge", onehot, xf)
        counts = jnp.sum(onehot, axis=1)[..., None]  # [B, G, 1]
        pooled = sums / jnp.maximum(counts, 1.0)
    elif pooling == "cls":
        # each segment's first token (pos == 0) is its [CLS]
        sel = onehot * (pos == 0).astype(jnp.float32)[:, :, None]
        pooled = jnp.einsum("bsg,bse->bge", sel, xf)
    elif pooling == "max":
        flat_seg = jnp.where(
            seg >= 0, seg + n_seg * jnp.arange(b, dtype=seg.dtype)[:, None], b * n_seg
        ).reshape(-1)
        pooled = jax.ops.segment_max(
            xf.reshape(b * s, e), flat_seg, num_segments=b * n_seg + 1
        )[: b * n_seg].reshape(b, n_seg, e)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if not normalize:
        return pooled
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def bert_embed_batch(
    params: dict,
    ids: Array,
    mask: Array,
    config: BertConfig,
    opts: ComputeOptions = ComputeOptions(),
    gather_idx: Array | None = None,
    token_states: bool = False,
) -> Array:
    """Token ids [B, S] + validity mask [B, S] -> embeddings [B, n_embd] f32.

    The full reference pipeline (bert_eval_batch, bert.cpp:1030-1108) as one
    jittable function over a *padded batch* instead of a per-sentence loop.

    `gather_idx` ([M] int32 row indices) compacts the output to [M, n_embd]
    on device so padded batch rows never cross the device->host link.

    `token_states=True` returns the final per-token hidden states
    [B, S, n_embd] f32 (HF last_hidden_state) instead of pooled embeddings
    — the late-interaction / feature-extraction surface; pooling, output
    head, gather and transfer encoding are all skipped.
    """
    if config.arch == "modernbert":
        # pre-norm / RoPE / GeGLU graph — entirely different block math
        # (models/modernbert.py); dispatched here so every caller (engine,
        # GSPMD, shard_map) stays arch-agnostic
        from .modernbert import modernbert_embed_batch

        return modernbert_embed_batch(
            params, ids, mask, config, opts, gather_idx=gather_idx,
            token_states=token_states,
        )
    if config.arch == "t5":
        # pre-norm RMSNorm / unscaled attention / shared relative bias
        # (models/t5.py — sentence-t5 / GTR retrievers)
        from .t5 import t5_embed_batch

        return t5_embed_batch(
            params, ids, mask, config, opts, gather_idx=gather_idx,
            token_states=token_states,
        )
    if config.arch == "deberta":
        # disentangled attention over log-bucketed relative positions
        # (models/deberta.py — DeBERTa-v3 encoders/rerankers)
        from .deberta import deberta_embed_batch

        return deberta_embed_batch(
            params, ids, mask, config, opts, gather_idx=gather_idx,
            token_states=token_states,
        )
    if config.arch == "nomic-bert":
        # post-norm RoPE + SwiGLU graph (models/nomic.py — nomic-embed)
        from .nomic import nomic_embed_batch

        return nomic_embed_batch(
            params, ids, mask, config, opts, gather_idx=gather_idx,
            token_states=token_states,
        )
    opts = resolve_impls(opts)
    x = embed_tokens(params, ids, config, opts)
    mask_bias = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    # MPNet: ONE bucketed relative-position bias shared by every layer
    # (computed once, like HF MPNetEncoder.forward)
    rel = params.get("rel_attn_bias")
    pos_bias = None if rel is None else _rel_attn_bias(rel, ids.shape[-1])

    x = _run_layers(
        x, params["layers"], config,
        lambda h, lp: encoder_layer(h, lp, mask_bias, config, opts,
                                    pos_bias=pos_bias),
    )
    if token_states:
        return x.astype(jnp.float32)
    pooled = pool_normalize(x, mask, config.pooling, normalize=False)
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out[gather_idx]
    return _cast_output(out, opts)


_SPARSE_TILE_BUDGET = 128 << 20  # f32 bytes for one [B, chunk, V] logits tile


def _sparse_chunk(s: int, b: int, n_vocab: int, cap: int = 64) -> int:
    """Largest divisor of s, <= cap, whose [b, chunk, n_vocab] f32 logits
    tile fits _SPARSE_TILE_BUDGET — the per-step token count of the chunked
    MLM-logits scan.  A whole-sequence [B, S, V] tensor would be ~2 GB at
    [32, 512] x 30k vocab; at chunk=1 the tile is b*V*4 bytes, so the CALLER
    must also bound b (Engine.sparse_tokens caps the batch bucket from the
    same budget)."""
    per_token = max(1, b * n_vocab * 4)
    cap = min(cap, s, max(1, _SPARSE_TILE_BUDGET // per_token))
    for c in range(cap, 0, -1):
        if s % c == 0:
            return c
    return 1


def bert_sparse_batch(
    params: dict,
    ids: Array,
    mask: Array,
    config: BertConfig,
    opts: ComputeOptions,
    k: int,
    gather_idx: Array | None = None,
) -> Array:
    """SPLADE sparse encoding: token ids [B, S] -> packed top-k sparse
    vectors [B (or M), 2k] uint32.

    The sparse-retrieval surface (SPLADE-max, Formal et al. 2021; the
    sentence-transformers SparseEncoder MLMTransformer+SpladePooling stack):
    every token's final hidden state runs the checkpoint's MLM prediction
    head — t = LayerNorm(gelu(h @ W_d + b_d)); logits = t @ W_wordᵀ + b —
    and the sentence's |V|-dim sparse vector is max over its (real) tokens
    of log1p(relu(logits)).  The reference is dense-only (bert.h:41-92).

    TPU shape: the logits matmul is chunked over the sequence with a
    running max (a lax.scan; the [B, S, V] activation never materializes),
    the |V|-dim vector is immediately top-k'd ON DEVICE, and indices+values
    leave as ONE bit-packed uint32 array (unpack_sparse_topk) — ~2k entries
    instead of a 30k-float row per sentence, one fetch per batch (the relay
    pays a round trip per fetch, see pack_output_i8).
    """
    mlm = params.get("mlm")
    if mlm is None:
        raise ValueError("model has no MLM head (not a SPLADE checkpoint)")
    opts = resolve_impls(opts)
    from ..ops.linear import linear

    h = bert_embed_batch(params, ids, mask, config, opts, token_states=True)
    b, s, e = h.shape
    cs = _sparse_chunk(s, b, config.n_vocab)
    # transform in f32 (two tiny ops), then the decoder matmul in the
    # activation dtype per chunk
    t = h @ mlm["dense_w"] + mlm["dense_b"]
    t = gelu(t, config.gelu)
    t = layer_norm(t, mlm["ln_scale"], mlm["ln_bias"], config.layer_norm_eps,
                   opts.jdtype)
    tc = t.reshape(b, s // cs, cs, e).transpose(1, 0, 2, 3)  # [n, B, cs, E]
    mc = mask.reshape(b, s // cs, cs).transpose(1, 0, 2)  # [n, B, cs]

    def step(acc, xs):
        tch, mch = xs
        logits = linear(tch, mlm["decoder_w"], mlm["bias"],
                        q4_impl=opts.q4_impl)  # [B, cs, V]
        w = jnp.log1p(jax.nn.relu(logits.astype(jnp.float32)))
        w = w * mch.astype(jnp.float32)[..., None]
        return jnp.maximum(acc, jnp.max(w, axis=1)), None

    acc0 = jnp.zeros((b, config.n_vocab), jnp.float32)
    sparse, _ = jax.lax.scan(step, acc0, (tc, mc))
    if gather_idx is not None:
        sparse = sparse[gather_idx]
    val, idx = jax.lax.top_k(sparse, k)
    return pack_sparse_topk(idx, val)


def pack_sparse_topk(idx: Array, val: Array) -> Array:
    """Bit-pack top-k sparse entries into ONE uint32 array [..., 2k]:
    indices first, f32 values bitcast behind them (one device->host fetch —
    same rationale as pack_output_i8)."""
    iv = jax.lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.uint32)
    vv = jax.lax.bitcast_convert_type(val.astype(jnp.float32), jnp.uint32)
    return jnp.concatenate([iv, vv], axis=-1)


def unpack_sparse_topk(packed) -> tuple["np.ndarray", "np.ndarray"]:
    """Host-side decode of pack_sparse_topk: uint32 [..., 2k] ->
    (int32 indices [..., k], f32 values [..., k])."""
    import numpy as np

    packed = np.ascontiguousarray(packed)
    k = packed.shape[-1] // 2
    idx = packed[..., :k].view(np.int32)
    val = packed[..., k:].view(np.float32)
    return idx, val


def bert_score_batch(
    params: dict,
    ids: Array,
    mask: Array,
    config: BertConfig,
    opts: ComputeOptions = ComputeOptions(),
    type_ids: Array | None = None,
) -> Array:
    """Sequence-classification forward: [B, S] token ids (+ optional
    [B, S] segment type ids) -> [B, n_labels] f32 logits.

    The cross-encoder path (reranking): a query/document pair framed as
    [CLS] q [SEP] d [SEP] (segments 0/1) runs the same masked encoder as
    the embedding path, then logits = out(act(dense(h_cls))) — the shape
    every HF *ForSequenceClassification head reduces to (schema.py
    _HEAD_TENSORS_BY_ARCH).  The head computes in f32 (it is two tiny
    matvecs; accuracy over MXU throughput).  The reference has no
    classification surface at all (bert.h:41-92).
    """
    if config.arch == "modernbert":
        # pre-norm RoPE graph + PredictionHead (dense+gelu+norm), pooled
        # cls/mean per config.pooling; no token-type table so type_ids are
        # structurally unused (dispatched here like bert_embed_batch)
        from .modernbert import modernbert_score_batch

        return modernbert_score_batch(params, ids, mask, config, opts)
    if config.arch == "t5":
        # monoT5-style rerankers are seq2seq (decoder logits), not
        # sequence-classification heads — out of scope for the encoder
        raise ValueError("t5 encoders have no classification head")
    if config.arch == "nomic-bert":
        # no published nomic-bert sequence-classification checkpoint; the
        # generic path below lacks RoPE, so fail loudly instead of wrongly
        raise ValueError(
            "nomic-bert classification heads are not supported"
        )
    if config.arch == "deberta":
        from .deberta import deberta_score_batch

        return deberta_score_batch(params, ids, mask, config, opts,
                                   type_ids=type_ids)
    if "head" not in params:
        raise ValueError("model has no classification head (n_labels == 0)")
    opts = resolve_impls(opts)
    x = embed_tokens(params, ids, config, opts, type_ids=type_ids)
    mask_bias = jnp.where(mask.astype(bool), 0.0, _MASK_BIAS).astype(jnp.float32)
    rel = params.get("rel_attn_bias")
    pos_bias = None if rel is None else _rel_attn_bias(rel, ids.shape[-1])

    x = _run_layers(
        x, params["layers"], config,
        lambda h, lp: encoder_layer(h, lp, mask_bias, config, opts,
                                    pos_bias=pos_bias),
    )
    h = x[..., 0, :].astype(jnp.float32)  # CLS hidden state
    return classifier_head(h, params["head"], config.head_activation)


def project_token_states(params: dict, x: Array) -> Array:
    """Apply the ColBERT per-token projection when the checkpoint carries
    one (params["colbert"], HF_ColBERT's bias-free `linear`): [..., E] ->
    [..., colbert_dim] in f32.  Identity for non-ColBERT models — callers
    on the token-states surface route through here so ColBERT checkpoints
    always emit projected vectors."""
    cb = params.get("colbert")
    if cb is None:
        return x
    return jnp.matmul(
        x.astype(jnp.float32), cb["w"], preferred_element_type=jnp.float32
    )


def maxsim_scores(
    params: dict,
    q_states: Array,
    q_mask: Array,
    d_ids: Array,
    d_mask: Array,
    config: BertConfig,
    opts: ComputeOptions,
    d_keep: Array | None = None,
) -> Array:
    """Late-interaction (ColBERT-style) MaxSim: query token states
    [Sq, E] + doc token ids [B, S] -> [B] f32 relevance scores.

    `d_keep` ([B, S], optional) restricts which doc tokens participate in
    SCORING while `d_mask` stays the attention mask — ColBERT checkpoints
    attend punctuation but filter it from the similarity (the skiplist).

    score(q, d) = sum over real query tokens of max over real doc tokens of
    cosine(q_i, d_j) — the MaxSim operator of ColBERT (Khattab & Zaharia
    2020) computed over the encoder's final hidden states, token vectors
    L2-normalized so the per-token similarity is cosine.  Works with ANY
    supported encoder family (no checkpoint-specific projection/markers:
    this is generic late interaction over token states, not a loader for
    ColBERT-format checkpoints).  The reference has no token-level surface
    at all (bert.h:41-92).

    TPU shape: ONE dispatch scores a whole padded doc batch — the doc
    forward, the [B, Sq, S] similarity tensor, masking, and both reductions
    all stay on device; only [B] floats cross the link.
    """
    d = bert_embed_batch(params, d_ids, d_mask, config, opts,
                         token_states=True)  # [B, S, E] f32
    d = project_token_states(params, d)  # ColBERT checkpoints: [B, S, dim]
    qn = _l2_normalize(q_states.astype(jnp.float32))
    dn = _l2_normalize(d)
    sim = jnp.einsum("qe,bse->bqs", qn, dn)
    score_mask = d_mask if d_keep is None else d_keep
    sim = jnp.where(score_mask[:, None, :] > 0, sim, -jnp.inf)
    best = jnp.max(sim, axis=-1)  # [B, Sq]
    # all-padding doc rows (bucket filler) keep -inf here; callers slice
    # real rows.  Padded QUERY slots contribute 0.
    best = jnp.where(q_mask[None, :] > 0, best, 0.0)
    return jnp.sum(best, axis=-1)


def classifier_head(h: Array, head: dict, activation: str) -> Array:
    """logits = out(act(dense(h))) in f32 — the shape every HF
    *ForSequenceClassification head reduces to (schema.py
    _HEAD_TENSORS_BY_ARCH); shared by the BERT-family and DeBERTa score
    paths.  `activation`: "tanh" | "relu" | "gelu" (erf), validated at
    config construction."""
    y = h @ head["dense_w"] + head["dense_b"]
    if activation == "tanh":
        y = jnp.tanh(y)
    elif activation == "relu":
        y = jax.nn.relu(y)
    else:
        y = jax.nn.gelu(y, approximate=False)
    return y @ head["out_w"] + head["out_b"]


def bert_embed_packed(
    params: dict,
    ids: Array,
    seg: Array,
    pos: Array,
    config: BertConfig,
    opts: ComputeOptions = ComputeOptions(),
    *,
    n_seg: int,
    gather_idx: Array | None = None,
    max_seg_len: int | None = None,
) -> Array:
    """Sequence-packed forward: many sentences per row -> [B, n_seg, n_embd].

    ids/seg/pos are [B, S]: seg holds the per-row segment id of each token
    (-1 on padding), pos the within-segment position (0..len-1, as the
    reference's per-sentence graphs number positions, bert.cpp:874-878).
    Packing turns short-sentence traffic into a handful of large dispatches:
    attention is masked block-diagonal by segment and pooling is per-segment,
    so outputs equal the unpacked per-sentence results.

    `gather_idx` ([M] int32 flat indices into B*n_seg) compacts the output to
    [M, n_embd] on device — only real sentences cross the device->host link,
    not empty segment slots (the fetch is bandwidth-bound on thin hosts).
    """
    if config.arch == "modernbert":
        from .modernbert import modernbert_embed_packed

        return modernbert_embed_packed(
            params, ids, seg, pos, config, opts, n_seg=n_seg,
            gather_idx=gather_idx, max_seg_len=max_seg_len,
        )
    if config.arch == "t5":
        from .t5 import t5_embed_packed

        return t5_embed_packed(
            params, ids, seg, pos, config, opts, n_seg=n_seg,
            gather_idx=gather_idx, max_seg_len=max_seg_len,
        )
    if config.arch == "deberta":
        from .deberta import deberta_embed_packed

        return deberta_embed_packed(
            params, ids, seg, pos, config, opts, n_seg=n_seg,
            gather_idx=gather_idx, max_seg_len=max_seg_len,
        )
    if config.arch == "nomic-bert":
        from .nomic import nomic_embed_packed

        return nomic_embed_packed(
            params, ids, seg, pos, config, opts, n_seg=n_seg,
            gather_idx=gather_idx, max_seg_len=max_seg_len,
        )
    opts = resolve_impls(opts)
    x = embed_tokens(params, ids, config, opts, positions=pos)
    mask_bias = jnp.where(seg >= 0, 0.0, _MASK_BIAS).astype(jnp.float32)
    rel = params.get("rel_attn_bias")
    # the BATCH-INVARIANT [H, S, S] bias serves packed rows too: within a
    # segment the restart positions are consecutive, so k_pos - q_pos equals
    # the absolute row offset k - q; cross-segment pairs are masked to -1e9
    # (softmax-exact zero) regardless of their bias.  The naive per-row
    # [B, H, S, S] form (_rel_attn_bias_packed, kept for the equivalence
    # test) costs B*H*S*S*4 bytes of HBM and blocks the fused kernel.
    pos_bias = None if rel is None else _rel_attn_bias(rel, ids.shape[-1])

    x = _run_layers(
        x, params["layers"], config,
        lambda h, lp: encoder_layer(h, lp, mask_bias, config, opts, seg=seg,
                                    max_seg_len=max_seg_len,
                                    pos_bias=pos_bias),
    )
    pooled = pool_normalize_packed(
        x, seg, pos, n_seg, config.pooling, normalize=False
    )
    out = _output_head(pooled, params, config)
    if gather_idx is not None:
        out = out.reshape(-1, out.shape[-1])[gather_idx]
    return _cast_output(out, opts)


def make_forward(config: BertConfig, opts: ComputeOptions = ComputeOptions()):
    """jit-compiled forward closed over static config/options."""

    @partial(jax.jit, static_argnames=())
    def fwd(params, ids, mask):
        return bert_embed_batch(params, ids, mask, config, opts)

    return fwd
