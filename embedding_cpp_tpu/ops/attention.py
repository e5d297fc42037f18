"""Fused masked self-attention Pallas TPU kernel.

The reference materializes softmax(KᵀQ/sqrt(d)) as a full [S, S] tensor per
sentence in CPU RAM (bert.cpp:930-934).  The XLA fallback path does the batch
equivalent — a [B, H, S, S] f32 tensor in HBM, which at S=512 dominates HBM
traffic.  This kernel computes attention per (batch, head, q-tile) with
scores living only in VMEM: encoder sequence lengths (<=512) let the whole
K/V block sit in VMEM, so no online-softmax recurrence is needed — one
scores tile, one masked softmax, one PV matmul.

Numerics match the XLA path: f32 score accumulation, f32 softmax, additive
key mask bias (-1e9 on padding).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, hb):
    # blocks: q [1,HB,TQ,d]; k, v [1,HB,S,d]; bias [1,1,S] f32.  Per-head
    # dots run sequentially inside one grid cell: at d=32 each dot uses a
    # quarter of the MXU's contraction/lane width, so the win comes from
    # fewer grid cells (less per-cell overhead), not dot shape — measured
    # 460 us vs 692 at (B=32, S=512, H=12) for hb=H, tq=S vs hb=1, tq=256.
    # With an extra [HB,TQ,S] f32 ref (MPNet's batch-invariant relative
    # position bias) it is added after scaling, exactly as HF
    # MPNetSelfAttention.forward does.  A [1,TQ,S] bias block is
    # head-invariant (ModernBERT's sliding-window mask): every head reads
    # block 0 (`hh % shape[0]` folds at trace time).
    pbias_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    bias = bias_ref[0, 0]
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, S]
        scores = scores * scale + bias[None, :]
        if pbias_ref is not None:
            scores = scores + pbias_ref[hh % pbias_ref.shape[0]]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        # softmax division deferred past the PV dot: divide the [TQ, d]
        # output instead of the [TQ, S] probabilities — d/S of the VPU
        # divide work.  The sum is taken BEFORE the dot so the f32 scores
        # tile dies at the bf16 cast instead of staying live across the
        # dot (VMEM stack pressure; see attention_occupancy.md).
        se = jnp.sum(e, axis=-1, keepdims=True)
        acc = jnp.dot(
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


def _attn_tiles(h: int, s: int, d: int, itemsize: int = 2,
                tq_candidates=(512, 256, 128),
                score_bytes: int = 4, bias_bytes: int = 0,
                bias_heads: bool = True) -> tuple[int, int]:
    """(tq, hb): whole-sequence q tiles and as many heads per grid cell as
    the VMEM budget allows (per-head score tiles are sequential, so only the
    q/k/v/out tiles scale with hb).  score_bytes=8 for the segment-masked
    kernel, whose [TQ, S] boolean mask lives alongside the f32 scores;
    bias_bytes=4 for the additive-bias kernel, whose [HB, TQ, S] f32
    position-bias tile is double-buffered alongside qkv (bias_heads=False
    for a head-invariant [1, TQ, S] bias, which doesn't scale with hb)."""
    for tq in (s, *tq_candidates):
        if s % tq:
            continue
        for hb in range(h, 0, -1):
            if h % hb:
                continue
            tiles = 2 * hb * (3 * s + tq) * d * itemsize  # dbl-buffered qkv+o
            tiles += 2 * (hb if bias_heads else 1) * tq * s * bias_bytes
            if tiles + tq * s * score_bytes <= 10 * 1024 * 1024:
                return tq, hb
    # nothing fits the budget model (very long s): smallest safe tile — the
    # largest divisor of s that is a multiple of 8 and <= 128.  Falling back
    # to tq=s here would be exactly the whole-sequence [S, S] score tile the
    # loop above exists to avoid (VMEM blowup for large unaligned s).
    for tq in range(128, 0, -8):
        if s % tq == 0:
            return tq, 1
    return s, 1  # unreachable for s % 8 == 0 (callers guarantee it)


@functools.partial(jax.jit, static_argnames=("tq", "hb"))
def _flash_attention(q: Array, k: Array, v: Array, mask_bias: Array, *,
                     tq: int, hb: int) -> Array:
    """q/k/v: [B, H, S, d]; mask_bias: [B, S] f32 additive. -> [B, H, S, d]"""
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (b, h // hb, s // tq)

    kernel = functools.partial(_attn_kernel, scale=scale, hb=hb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=3 * b * h * s * d * q.dtype.itemsize
            + b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the deferred-division softmax peaks ~19M scoped VMEM at
            # (hb=12, tq=512); the 16M default limit is conservative
            # (v5e has 128M physical) — raise it rather than shrink tiles
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, mask_bias[:, None, :])


@functools.partial(jax.jit, static_argnames=("tq", "hb"))
def _flash_attention_bias(q: Array, k: Array, v: Array, mask_bias: Array,
                          pos_bias: Array, *, tq: int, hb: int) -> Array:
    """q/k/v: [B, H, S, d]; mask_bias: [B, S] f32; pos_bias: [H, S, S] f32
    (batch-invariant) or [1, S, S] (also head-invariant — ModernBERT's
    per-layer window mask). -> [B, H, S, d]

    Batch rides the INNERMOST grid dimension: consecutive grid steps then
    share the (head, q-tile) bias block, so Pallas DMAs each [HB, TQ, S]
    f32 bias tile from HBM once per (hi, qi) instead of once per batch
    element — H*S*S*4 total bias traffic instead of B*H*S*S*4 (the
    [B,H,S,S] f32 score tensor the XLA path materializes)."""
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (h // hb, s // tq, b)
    ph = pos_bias.shape[0]  # h, or 1 for a head-invariant bias

    kernel = functools.partial(_attn_kernel, scale=scale, hb=hb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, tq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s), lambda hi, qi, bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb if ph != 1 else 1, tq, s),
                (lambda hi, qi, bi: (hi, qi, 0)) if ph != 1
                else (lambda hi, qi, bi: (0, qi, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tq, d), lambda hi, qi, bi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize
            + ph * s * s * 4,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            # bias reuse requires consecutive bi steps to revisit the same
            # (hi, qi) block: bi must stay innermost/sequential
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, mask_bias[:, None, :], pos_bias)


def _attn_bse_kernel(q_ref, k_ref, v_ref, mask_ref, *rest, scale, h, d,
                     seg_mask):
    # ONE body serves all four projection-layout variants; blocks:
    # q/k/v/o [1, S, H*d]; mask [1, 1, S] — f32 additive key-padding bias,
    # or int32 segment ids when seg_mask (packed rows: the block-diagonal
    # mask computes in-kernel); optional pbias [PH, S, S] f32 (PH = H, or 1
    # for a head-invariant bias) rides a constant index map so Pallas DMAs
    # it once and every batch step revisits it VMEM-resident.
    #
    # Heads are LANE SLICES of the projection output — no [B,S,H,d]
    # reshape/transpose ever happens.  The r4 forward breakdown measured
    # the layout transposes of the [B,H,S,d] kernel at ~135 us/layer
    # HBM-roofline time and the whole attn block at 794 us; this layout
    # runs the same block at 456 us with bit-identical output
    # (q4_forward_breakdown.md).  Lane-sliced [S, d] operands cost
    # VPU-local relayout instead of HBM round trips, and the [S, E] tiles
    # DMA fully contiguous.  Packing is the engine's default serving path
    # (engine.py packing="auto"), so the seg variants carry the same win
    # to production (packed_bse_ab_v5e.json / packed_bias_ab_v5e.json).
    pbias_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    if seg_mask:
        seg = mask_ref[0, 0]
        allowed = seg[:, None] == seg[None, :]  # [S, S]
    else:
        bias = mask_ref[0, 0]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S]
        if seg_mask:
            sc = scores * scale
            if pbias_ref is not None:
                sc = sc + pbias_ref[hh % pbias_ref.shape[0]]
            scores = jnp.where(allowed, sc, -1e9)
        else:
            scores = scores * scale + bias[None, :]
            if pbias_ref is not None:
                scores = scores + pbias_ref[hh % pbias_ref.shape[0]]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [S, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "seg_mask"))
def _flash_attention_bse_call(q: Array, k: Array, v: Array, mask: Array,
                              pos_bias: Array | None, *, h: int,
                              seg_mask: bool) -> Array:
    """Shared pallas_call for the BSE family.  q/k/v: [B, S, H*d]; mask:
    [B, S] (f32 bias, or int32 seg ids when seg_mask); pos_bias: optional
    [H|1, S, S] f32. -> [B, S, H*d]"""
    b, s, e = q.shape
    d = e // h
    scale = 1.0 / (d**0.5)

    kernel = functools.partial(_attn_bse_kernel, scale=scale, h=h, d=d,
                               seg_mask=seg_mask)
    row = pl.BlockSpec((1, s, e), lambda bi: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [row, row, row,
                pl.BlockSpec((1, 1, s), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, mask[:, None, :]]
    bias_bytes = 0
    if pos_bias is not None:
        ph = pos_bias.shape[0]
        in_specs.append(pl.BlockSpec((ph, s, s), lambda bi: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(pos_bias)
        bias_bytes = ph * s * s * 4
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, e), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, e), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * b * s * e * q.dtype.itemsize + bias_bytes,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            # bias residency requires sequential batch steps revisiting the
            # constant-index bias block; without a bias the single grid
            # axis is embarrassingly parallel
            dimension_semantics=(
                ("arbitrary",) if pos_bias is not None else ("parallel",)
            ),
            # the resident [H, S, S] f32 bias is ~12.6 MB at mpnet-base
            # geometry on top of the qkv/score tiles (v5e has 128M physical)
            vmem_limit_bytes=(48 if pos_bias is not None else 32)
            * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(*args)


def flash_attention_bse(q: Array, k: Array, v: Array, mask_bias: Array,
                        h: int) -> Array:
    """Masked multi-head attention over the PROJECTION-OUTPUT layout.

    q, k, v: [B, S, H*d] exactly as the q/k/v linears produce them;
    mask_bias: [B, S] f32 (0 valid / -1e9 padding).  Returns [B, S, H*d],
    ready for the output projection.  Numerics identical to
    flash_attention (measured max|err| 0.0 on v5e); the win is layout —
    no [B,S,H,d]<->[B,H,S,d] transposes on either side.  Callers guarantee
    S % 8 == 0, (H*d) % H == 0, d % 8 == 0, and S small enough for a
    whole-sequence [S, S] f32 score tile (<= 1024).
    """
    return _flash_attention_bse_call(
        q, k, v, mask_bias.astype(jnp.float32), None, h=h, seg_mask=False
    )


def flash_attention_bias_bse(q: Array, k: Array, v: Array, mask_bias: Array,
                             pos_bias: Array, h: int) -> Array:
    """Additive-position-bias attention over the PROJECTION-OUTPUT layout
    (MPNet relative attention, T5's shared bias, ModernBERT's windowed
    global fallback): q/k/v [B, S, H*d] -> [B, S, H*d], no layout
    transposes on either side (see flash_attention_bse).  The [H, S, S]
    bias is DMA'd once and stays VMEM-resident across the batch grid.
    Callers guarantee S % 8 == 0, d % 8 == 0, S <= 1024 and the VMEM gate
    (fits_bias_bse)."""
    return _flash_attention_bse_call(
        q, k, v, mask_bias.astype(jnp.float32),
        pos_bias.astype(jnp.float32), h=h, seg_mask=False,
    )


def flash_attention_packed_bse(q: Array, k: Array, v: Array, seg: Array,
                               h: int) -> Array:
    """Segment-masked (sequence-packed) attention over the PROJECTION-OUTPUT
    layout: q/k/v [B, S, H*d] straight from the q/k/v linears, seg [B, S]
    int32 segment ids (-1 on padding) -> [B, S, H*d] ready for the output
    projection.  Numerics identical to flash_attention_packed's full
    kernel (same masked-softmax order); the win is layout — no
    [B,S,H,d]<->[B,H,S,d] transposes on either side, which the r4 forward
    breakdown measured at ~135 us/layer HBM time at MiniLM [32,512]
    (q4_forward_breakdown.md).  Callers guarantee S % 8 == 0, d % 8 == 0,
    and 128 <= S <= 1024 (whole-sequence [S, S] f32 score tile in VMEM).
    """
    return _flash_attention_bse_call(
        q, k, v, seg.astype(jnp.int32), None, h=h, seg_mask=True
    )


def flash_attention_bias_packed_bse(q: Array, k: Array, v: Array, seg: Array,
                                    pos_bias: Array, h: int) -> Array:
    """Additive-position-bias attention over PACKED rows in the
    PROJECTION-OUTPUT layout (packed MPNet / T5 / ModernBERT-local):
    q/k/v [B, S, H*d], seg [B, S] int32 (-1 padding), pos_bias [H, S, S] or
    [1, S, S] f32 built from ABSOLUTE row offsets — valid because within a
    packed segment the restart positions are consecutive, so k_pos - q_pos
    equals k - q on every UNMASKED pair, and cross-segment pairs take -1e9
    and underflow to exactly 0 in the softmax regardless of their bias
    (see models/bert._rel_attn_bias_packed and the equivalence test in
    tests/test_packing.py).  The bias is DMA'd once and stays
    VMEM-resident across the batch grid; the segment mask is computed
    in-kernel.  Callers guarantee S % 8 == 0, d % 8 == 0, 128 <= S <= 1024
    and fits_bias_bse."""
    return _flash_attention_bse_call(
        q, k, v, seg.astype(jnp.int32), pos_bias.astype(jnp.float32), h=h,
        seg_mask=True,
    )


# VMEM gate for the resident-bias BSE kernels: full bias + qkv/out tiles +
# the per-head f32 score tile must fit comfortably
_BIAS_BSE_BUDGET = 28 * 1024 * 1024


def fits_bias_bse(s: int, e: int, ph: int, itemsize: int) -> bool:
    """True when the resident-bias BSE kernel's working set fits the
    budget: bias [PH, S, S] f32 + 2x-buffered qkv/out [S, E] tiles + two
    f32 [S, S] score-class tiles."""
    need = (ph * s * s * 4 + 8 * s * e * itemsize + 2 * s * s * 4)
    return need <= _BIAS_BSE_BUDGET


def packed_bse_applies(s: int, d: int, max_seg_len: int | None) -> bool:
    """True when the packed projection-layout kernel should carry a packed
    batch: aligned tiles, S inside the whole-sequence score-tile envelope,
    and the windowed packed kernel (which needs the [B,H,S,d] layout and
    only engages at S >= 1024 with a window narrower than S — see
    flash_attention_packed) would not apply."""
    if s % 8 or d % 8 or not (128 <= s <= 1024):
        return False
    if max_seg_len is not None and s % 128 == 0 and s >= 1024:
        tq_w = 256 if s % 256 == 0 else 128
        wmax = -(-(tq_w + 2 * max_seg_len + 24) // 128) * 128
        if wmax < s:
            return False  # the windowed kernel's FLOP cut beats the layout
    return True


def _attn_seg_kernel(q_ref, k_ref, v_ref, segq_ref, segk_ref, o_ref, *,
                     scale, hb):
    # blocks: q [1,HB,TQ,d]; k, v [1,HB,S,d]; segq [1,1,TQ]; segk [1,1,S].
    # HB heads per grid cell: the segment mask is computed once and the
    # unrolled per-head dots pipeline on the MXU (measured ~13% over one
    # head per cell at MiniLM shapes; d=32 keeps each dot at low MXU
    # occupancy regardless, which bounds this kernel).
    allowed = segq_ref[0, 0][:, None] == segk_ref[0, 0][None, :]
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, S]
        scores = jnp.where(allowed, scores * scale, -1e9)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [TQ, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tq", "hb"))
def _flash_attention_packed(
    q: Array, k: Array, v: Array, seg: Array, *, tq: int, hb: int
) -> Array:
    """q/k/v: [B, H, S, d]; seg: [B, S] int32 (-1 = padding). -> [B, H, S, d]"""
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (b, h // hb, s // tq)

    kernel = functools.partial(_attn_seg_kernel, scale=scale, hb=hb)
    seg3 = seg[:, None, :]  # explicit singleton axis for the block spec
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tq), lambda bi, hi, qi: (bi, 0, qi), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, s), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the deferred-division softmax peaks ~19M scoped VMEM at
            # (hb=12, tq=512); the 16M default limit is conservative
            # (v5e has 128M physical) — raise it rather than shrink tiles
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, seg3, seg3)


def _attn_seg_window_kernel(
    q_ref, k_ref, v_ref, segq_ref, segk_ref, o_ref, *, scale, tq, wmax, s, hb
):
    # blocks: q [1,HB,TQ,d]; k, v [1,HB,S,d]; segq [1,TQ,1]; segk [1,S,1].
    # Packed segments are contiguous, so a q tile starting at qs only has
    # valid keys within [qs - W, qs + TQ + W) for W = max segment length;
    # the dots run on that window (wmax >= TQ + 2W + 24) instead of all S —
    # restoring per-sentence attention cost inside packed rows.  The window
    # and its mask are computed once per grid cell and shared by the HB
    # sequential per-head dots (same win as the full kernels: fewer cells).
    qi = pl.program_id(2)
    qs = qi * tq
    margin = (wmax - tq) // 2
    kstart = jnp.clip(((qs - margin) // 8) * 8, 0, s - wmax)
    kstart = pl.multiple_of(kstart, 8)
    # seg refs are [1, S, 1] (S on sublanes): the windowed key slice is a
    # sublane-dim dynamic slice, which Mosaic supports (lane-dim ones don't)
    allowed = (
        segq_ref[0, :, 0][:, None]
        == segk_ref[0, pl.ds(kstart, wmax), 0][None, :]
    )
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh, pl.ds(kstart, wmax), :]
        v = v_ref[0, hh, pl.ds(kstart, wmax), :]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, wmax]
        scores = jnp.where(allowed, scores * scale, -1e9)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [TQ, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tq", "wmax", "hb"))
def _flash_attention_packed_window(
    q: Array, k: Array, v: Array, seg: Array, *, tq: int, wmax: int, hb: int
) -> Array:
    """Windowed variant: only [tq, wmax] score tiles instead of [tq, S]."""
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (b, h // hb, s // tq)

    kernel = functools.partial(
        _attn_seg_window_kernel, scale=scale, tq=tq, wmax=wmax, s=s, hb=hb
    )
    seg3 = seg[:, :, None]  # [B, S, 1]: S on sublanes for dynamic slicing
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tq, 1), lambda bi, hi, qi: (bi, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, 1), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * wmax * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * wmax,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # the deferred-division softmax peaks ~19M scoped VMEM at
            # (hb=12, tq=512); the 16M default limit is conservative
            # (v5e has 128M physical) — raise it rather than shrink tiles
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, seg3, seg3)


def _attn_local_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, hb, tq, wmax, s, window
):
    # blocks: q [1,HB,TQ,d]; k, v [1,HB,S,d]; bias [1,S,1] f32 (key padding,
    # S on sublanes so the windowed slice is a sublane-dim dynamic slice).
    # Sliding-window attention (ModernBERT local layers): query q attends
    # keys with |q - k| <= window // 2, so the q tile at qs only needs keys
    # in [qs - w/2, qs + tq + w/2) — the dots run on a [TQ, wmax] slice
    # centred on the tile instead of [TQ, S].  FLOPs scale with wmax, not S.
    qi = pl.program_id(2)
    qs = qi * tq
    kstart = jnp.clip(((qs + (tq - wmax) // 2) // 8) * 8, 0, s - wmax)
    kstart = pl.multiple_of(kstart, 8)
    kb = bias_ref[0, pl.ds(kstart, wmax), 0]  # [wmax] additive padding bias
    qpos = qs + jax.lax.broadcasted_iota(jnp.int32, (tq, wmax), 0)
    kpos = kstart + jax.lax.broadcasted_iota(jnp.int32, (tq, wmax), 1)
    add = jnp.where(
        jnp.abs(qpos - kpos) <= window // 2, kb[None, :], -1e9
    )
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh, pl.ds(kstart, wmax), :]
        v = v_ref[0, hh, pl.ds(kstart, wmax), :]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, wmax]
        scores = scores * scale + add
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [TQ, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "tq", "wmax", "hb"))
def _flash_attention_local(
    q: Array, k: Array, v: Array, mask_bias: Array, *,
    window: int, tq: int, wmax: int, hb: int
) -> Array:
    """q/k/v: [B, H, S, d]; mask_bias: [B, S] f32 additive. -> [B, H, S, d]"""
    b, h, s, d = q.shape
    scale = 1.0 / (d**0.5)
    grid = (b, h // hb, s // tq)

    kernel = functools.partial(
        _attn_local_kernel, scale=scale, hb=hb, tq=tq, wmax=wmax, s=s,
        window=window,
    )
    bias3 = mask_bias.astype(jnp.float32)[:, :, None]  # [B, S, 1]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, s, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s, 1), lambda bi, hi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, tq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * wmax * d,
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
            transcendentals=b * h * s * wmax,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, bias3)


def flash_attention_local(
    q: Array, k: Array, v: Array, mask_bias: Array, window: int
) -> Array:
    """Sliding-window multi-head attention (ModernBERT local layers).

    q, k, v: [B, S, H, d]; mask_bias: [B, S] f32 (0 valid / -1e9 padding);
    token q attends token k iff |q - k| <= window // 2 and k is valid —
    exactly the distance mask HF ModernBertModel._update_attention_mask
    builds, but computed tile-locally so out-of-window keys are never
    loaded into the dots.  Requires S % 128 == 0 and the implied key
    window tq + window + 16 (rounded up to 128 lanes) < S; callers fall
    back to `flash_attention` with an [S, S] window bias otherwise.
    """
    b, s, h, d = q.shape
    tq, wmax = local_window_tiles(s, window)
    assert wmax is not None, (s, window)
    itemsize = q.dtype.itemsize
    hb = next(
        (
            c
            for c in range(h, 0, -1)
            if h % c == 0
            and 2 * c * (3 * s + tq) * d * itemsize + tq * wmax * 8
            <= 10 * 1024 * 1024
        ),
        1,
    )
    out = _flash_attention_local(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), mask_bias,
        window=window, tq=tq, wmax=wmax, hb=hb,
    )
    return out.transpose(0, 2, 1, 3)


def local_window_tiles(s: int, window: int) -> tuple[int, int | None]:
    """(tq, wmax) for the sliding-window kernel, or (tq, None) when the
    windowed slice would not be narrower than the full sequence (the full
    kernel with an [S, S] bias is then at least as good).  The margin must
    cover window // 2 on each side plus the 8-alignment round-down slack of
    the window start."""
    if s % 128:
        return 128, None
    tq = 256 if s % 256 == 0 and s >= 2048 else 128
    wmax = -(-(tq + window + 16) // 128) * 128
    return tq, wmax if wmax < s else None


def flash_attention_packed(
    q: Array, k: Array, v: Array, seg: Array, max_seg_len: int | None = None
) -> Array:
    """Segment-masked (sequence-packed) multi-head attention.

    q, k, v: [B, S, H, d]; seg: [B, S] int32 segment ids, -1 on padding.
    Token q attends to token k iff seg[q] == seg[k] — attention is
    block-diagonal over packed sentences, reproducing the reference's
    one-sentence-per-graph independence (bert.cpp:1065) inside one dispatch.

    `max_seg_len` (static) bounds the longest packed sentence: when the
    implied key window TQ + 2W + 8 is narrower than S, the windowed kernel
    runs, with attention FLOPs proportional to the window, not S^2.
    """
    b, s, h, d = q.shape
    if s % 8 or d % 8:
        allowed = seg[:, :, None] == seg[:, None, :]
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)
        scores = scores * (1.0 / d**0.5) + bias[:, None, :, :]
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if max_seg_len is not None and s % 128 == 0:
        # margin (wmax-tq)/2 must cover W plus the 8-alignment slack on both
        # the window start round-down and the needed right edge
        tq_w = 256 if s % 256 == 0 else 128
        wmax = -(-(tq_w + 2 * max_seg_len + 24) // 128) * 128
        # measured on v5e at S=512/d=32 the kernel is overhead-bound, not
        # dot-bound — windowing only pays once the full [TQ, S] tile is
        # substantially larger (long-context rows); at S<=512 the full
        # kernel wins
        if wmax < s and s >= 1024:
            itemsize = q.dtype.itemsize
            hb = next(
                (
                    c
                    for c in range(h, 0, -1)
                    if h % c == 0
                    and 2 * c * (3 * s + tq_w) * d * itemsize
                    + tq_w * wmax * 8
                    <= 10 * 1024 * 1024
                ),
                1,
            )
            out = _flash_attention_packed_window(
                qt, kt, vt, seg.astype(jnp.int32), tq=tq_w, wmax=wmax, hb=hb
            )
            return out.transpose(0, 2, 1, 3)
    tq, hb = _attn_tiles(h, s, d, q.dtype.itemsize, score_bytes=8)
    out = _flash_attention_packed(qt, kt, vt, seg.astype(jnp.int32), tq=tq,
                                  hb=hb)
    return out.transpose(0, 2, 1, 3)


def flash_attention(q: Array, k: Array, v: Array, mask_bias: Array,
                    pos_bias: Array | None = None) -> Array:
    """Masked multi-head attention.

    q, k, v: [B, S, H, d] (the model's layout); mask_bias: [B, S] f32
    (0 for valid keys, -1e9 for padding); pos_bias: optional [H, S, S] f32
    batch-invariant additive bias (MPNet relative attention), added after
    scaling.  Returns [B, S, H, d].

    Falls back to the XLA einsum path when shapes don't tile (tiny S or
    unaligned d).
    """
    b, s, h, d = q.shape
    # kernel needs sublane-aligned q tiles and a pow-of-two-ish d
    if s % 8 or d % 8:
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores * (1.0 / d**0.5) + mask_bias[:, None, None, :]
        if pos_bias is not None:
            scores = scores + pos_bias
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, d]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if pos_bias is not None:
        tq, hb = _attn_tiles(h, s, d, q.dtype.itemsize, bias_bytes=4,
                             bias_heads=pos_bias.shape[0] != 1)
        out = _flash_attention_bias(
            qt, kt, vt, mask_bias.astype(jnp.float32),
            pos_bias.astype(jnp.float32), tq=tq, hb=hb,
        )
        return out.transpose(0, 2, 1, 3)
    tq, hb = _attn_tiles(h, s, d, q.dtype.itemsize)
    out = _flash_attention(qt, kt, vt, mask_bias.astype(jnp.float32), tq=tq,
                           hb=hb)
    return out.transpose(0, 2, 1, 3)
