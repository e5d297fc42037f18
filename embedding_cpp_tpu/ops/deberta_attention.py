"""Fused disentangled self-attention Pallas TPU kernel (DeBERTa-v2/v3).

The XLA path (models/deberta.py _attention) materializes, per layer, the
content-content scores PLUS a gathered content->position term and a gathered
position->content term — three [B, H, S, S]-class f32 tensors in HBM before
softmax (at deberta-v3-base [32, 512] that is ~1.2 GB of HBM round trips per
layer).  This kernel computes all three terms per (head, batch) grid cell
with everything living in VMEM, like ops/attention.py does for the plain
families.

The tricky part is the relative-position GATHER: the XLA path indexes a
[.., S, 2*span] tensor with bucket(q_pos - k_pos).  Mosaic has no efficient
dynamic gather along lanes, and its strided `dynamic_rotate` caps the total
shift below one vreg width (measured: "max shift in a vreg 132 is larger
than the vreg's width 128") — so the kernel re-expresses the gather as a
**skewed matmul**:

1. outside the kernel, the per-layer projected tables pos_k/pos_q
   ([2*span, d] per head) are re-indexed by RELATIVE OFFSET delta = q - k
   (a trace-time numpy gather — bucket() is position-only for plain
   batches), giving delta-major tables of width W = 2S;
2. in the kernel, `q @ PK^T` / `PQ @ k^T` produce [S, W] / [W, S] tiles
   whose needed [S, S] entries lie on diagonals: entry (q, k) sits at
   offset q - k;
3. a **barrel shifter** — log2(S) static `pltpu.roll` steps, each selected
   per row (or per lane) by one bit of the row index — aligns those
   diagonals into columns.  Static rolls have no shift-width limit, and the
   S log2(S) select+roll VPU traffic is tiny next to the dots.

Numerics match the XLA path: f32 score accumulation, all three terms scaled
by 1/sqrt(3d) (HF's scale_factor = 1 + |{c2p, p2c}|), additive key-padding
bias, f32 softmax with the division deferred past the PV dot.

Reference behavior: HF DebertaV2 DisentangledSelfAttention
.disentangled_attention_bias; the reference engine loads no DeBERTa at all
(/root/reference/models/convert-to-gguf.py:133-136 accepts BertModel only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _skew_lane(x: Array, nbits: int, base: int) -> Array:
    """out[i, j] = x[i, (j - base - i) mod W]  (roll row i right by base+i).

    Barrel shifter: one static roll by `base`, then log2 steps adding bit b
    of the row index.  All rolls are static-shift (Mosaic's strided rotate
    caps the total shift below a vreg width, so it cannot express this)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = pltpu.roll(x, base, 1)
    for b in range(nbits):
        step = 1 << b
        x = jnp.where((rows & step) != 0, pltpu.roll(x, step, 1), x)
    return x


def _skew_sub(x: Array, nbits: int, base: int) -> Array:
    """out[r, k] = x[(r - base - k) mod W, k]  (roll column k down by
    base+k) — the sublane-axis counterpart of _skew_lane."""
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = pltpu.roll(x, base, 0)
    for b in range(nbits):
        step = 1 << b
        x = jnp.where((cols & step) != 0, pltpu.roll(x, step, 0), x)
    return x


def _deberta_kernel(q_ref, k_ref, v_ref, bias_ref, pk_ref, pq_ref, o_ref, *,
                    scale, hb, s, nbits):
    # blocks: q/k/v [1, HB, S, d]; bias [1, 1, S] f32; pk/pq [HB, W, d]
    # (delta-major tables, W = 2S).  Whole-sequence q tiles: DeBERTa
    # checkpoints are n_ctx <= 512, so [S, S] f32 scores plus the two
    # [S, 2S] skew tiles fit VMEM comfortably (~13 MB at S=512 f32).
    bias = bias_ref[0, 0]
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] content-content

        # content->position: C[i, w] = q_i . pos_k[c2p_idx(S-1-w)]; the
        # needed (i, k) entry sits at w = S-1-i+k -> lane-skew with
        # base = W - (S-1) = S+1 aligns it to column k
        c = jax.lax.dot_general(
            q, pk_ref[hh], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, W]
        scores = scores + _skew_lane(c, nbits, s + 1)[:, :s]

        # position->content: D[w, k] = pos_q[p2c_idx(w-S)] . k_k; the
        # needed (i, k) entry sits at w = i-k+S -> sublane-skew base = S
        dmat = jax.lax.dot_general(
            pq_ref[hh], k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W, S]
        scores = scores + _skew_sub(dmat, nbits, s)[:s, :]

        scores = scores * scale + bias[None, :]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [S, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hb",))
def _disentangled_attention(q: Array, k: Array, v: Array, mask_bias: Array,
                            pk: Array, pq: Array, *, hb: int) -> Array:
    """q/k/v: [B, H, S, d]; mask_bias: [B, S] f32; pk/pq: [H, 2S, d]
    delta-major tables. -> [B, H, S, d]"""
    b, h, s, d = q.shape
    scale = 1.0 / float(np.sqrt(d * 3))  # scale_factor = 1 + |{c2p, p2c}|
    grid = (h // hb, 1, b)  # batch innermost: pk/pq blocks DMA once per head
    nbits = max(1, int(np.ceil(np.log2(s))))

    kernel = functools.partial(_deberta_kernel, scale=scale, hb=hb, s=s,
                               nbits=nbits)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
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
                (hb, 2 * s, d), lambda hi, qi, bi: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb, 2 * s, d), lambda hi, qi, bi: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            # qk + pv + the two [*, 2S] skew dots = 4x plain attention dots
            flops=2 * b * h * s * d * (2 * s + 4 * s),
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize
            + 2 * h * 2 * s * d * 4,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            # table reuse requires consecutive bi steps to revisit the same
            # hi block: bi must stay innermost/sequential
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # live peak ~13 MB at (S=512, d=64, f32): scores 1M + two skew
            # tiles 2x4M + barrel temporaries; 32M was measured neutral on
            # the q4 kernels while 96M regressed scheduling ~10%
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, mask_bias[:, None, :], pk, pq)


def _deberta_seg_kernel(q_ref, k_ref, v_ref, seg_ref, pk_ref, pq_ref, o_ref,
                        *, scale, hb, s, nbits):
    # the packed twin of _deberta_kernel: seg [1, 1, S] int32 replaces the
    # additive key-padding bias — the block-diagonal segment mask is
    # computed once per grid cell and applied as where(allowed, ., -1e9).
    # The delta-major skew tables stay the PLAIN absolute-offset ones:
    # within a packed segment the restart positions are consecutive, so
    # bucket(pos_q - pos_k) == bucket(q - k) on every unmasked pair, and
    # masked pairs underflow to exact softmax zero whatever their bucket
    # (the same identity the packed bias-BSE kernels use).
    seg = seg_ref[0, 0]
    allowed = seg[:, None] == seg[None, :]  # [S, S]
    for hh in range(hb):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] content-content
        c = jax.lax.dot_general(
            q, pk_ref[hh], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, W]
        scores = scores + _skew_lane(c, nbits, s + 1)[:, :s]
        dmat = jax.lax.dot_general(
            pq_ref[hh], k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W, S]
        scores = scores + _skew_sub(dmat, nbits, s)[:s, :]

        scores = jnp.where(allowed, scores * scale, -1e9)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        se = jnp.sum(e, axis=-1, keepdims=True)  # before the dot: frees e
        acc = jnp.dot(  # softmax divide deferred to the [S, d] output
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, hh] = (acc / se).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hb",))
def _disentangled_attention_seg(q: Array, k: Array, v: Array, seg: Array,
                                pk: Array, pq: Array, *, hb: int) -> Array:
    """q/k/v: [B, H, S, d]; seg: [B, S] int32 (-1 = padding); pk/pq:
    [H, 2S, d] delta-major tables. -> [B, H, S, d]"""
    b, h, s, d = q.shape
    scale = 1.0 / float(np.sqrt(d * 3))
    grid = (h // hb, 1, b)  # batch innermost: pk/pq blocks DMA once per head
    nbits = max(1, int(np.ceil(np.log2(s))))

    kernel = functools.partial(_deberta_seg_kernel, scale=scale, hb=hb, s=s,
                               nbits=nbits)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
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
                (hb, 2 * s, d), lambda hi, qi, bi: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hb, 2 * s, d), lambda hi, qi, bi: (hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, s, d), lambda hi, qi, bi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s * d * (2 * s + 4 * s),
            bytes_accessed=4 * b * h * s * d * q.dtype.itemsize
            + 2 * h * 2 * s * d * 4,
            transcendentals=b * h * s * s,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(q, k, v, seg[:, None, :], pk, pq)


def disentangled_attention_packed(
    q: Array, k: Array, v: Array, seg: Array,
    pos_k: Array, pos_q: Array, span: int, max_dist: int,
) -> Array:
    """Fused DeBERTa attention over PACKED rows: q/k/v [B, S, H, d], seg
    [B, S] int32 segment ids (-1 padding).  Uses the plain absolute-offset
    delta tables (valid within segments — see _deberta_seg_kernel) with the
    block-diagonal mask computed in-kernel.  Same envelope as
    disentangled_attention (S % 64 == 0, d % 8 == 0, S <= 512)."""
    b, s, h, d = q.shape
    c2p_idx, p2c_idx = delta_tables(s, span, max_dist)
    pk = jnp.transpose(pos_k[c2p_idx], (1, 0, 2))  # [H, 2S, d]
    pq = jnp.transpose(pos_q[p2c_idx], (1, 0, 2))
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    itemsize = q.dtype.itemsize
    hb = next(
        (
            c
            for c in range(h, 0, -1)
            if h % c == 0
            and 2 * c * (4 * s * d * itemsize + 2 * (2 * s) * d * itemsize)
            + 3 * s * 2 * s * 4
            <= 12 * 1024 * 1024
        ),
        1,
    )
    out = _disentangled_attention_seg(
        qt, kt, vt, seg.astype(jnp.int32), pk, pq, hb=hb
    )
    return out.transpose(0, 2, 1, 3)


def delta_tables(s: int, span: int, max_dist: int):
    """Trace-time numpy gather indices mapping the delta-major kernel
    tables back into the [2*span] bucket tables:

    - pk_rev[w] indexes pos_k at c2p_idx(S-1-w)  (reversed so the c2p
      lane-skew shifts RIGHT — Mosaic rolls are one-directional);
    - pq_rows[w] indexes pos_q at p2c_idx(w-S), where
      p2c_idx(delta) = clip(-bucket(-delta) + span)  (HF's p2c gather at
      bucket(k_pos - q_pos), models/deberta.py _attention).
    """
    from ..models.deberta import deberta_log_bucket

    w = np.arange(2 * s)
    c2p_idx = np.clip(
        deberta_log_bucket(s - 1 - w, span, max_dist, xp=np) + span,
        0, 2 * span - 1,
    )
    p2c_idx = np.clip(
        -deberta_log_bucket(s - w, span, max_dist, xp=np) + span,
        0, 2 * span - 1,
    )
    return c2p_idx, p2c_idx


def disentangled_attention(
    q: Array, k: Array, v: Array, mask_bias: Array,
    pos_k: Array, pos_q: Array, span: int, max_dist: int,
) -> Array:
    """Fused DeBERTa attention over a plain (padded) batch.

    q, k, v: [B, S, H, d] (the model's layout); mask_bias: [B, S] f32
    (0 valid / -1e9 padding); pos_k / pos_q: [2*span, H, d] — THIS layer's
    k/v projections of the shared rel-embedding table (share_att_key).
    Returns [B, S, H, d].  Caller guarantees S % 64 == 0, d % 8 == 0 and
    S <= 512 (whole-sequence tiles; see models/deberta.py dispatch).
    """
    b, s, h, d = q.shape
    c2p_idx, p2c_idx = delta_tables(s, span, max_dist)
    # delta-major tables, head-major for the kernel block specs
    pk = jnp.transpose(pos_k[c2p_idx], (1, 0, 2))  # [H, 2S, d]
    pq = jnp.transpose(pos_q[p2c_idx], (1, 0, 2))
    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, d]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # VMEM budget: qkv+out tiles double-buffered + table blocks + the f32
    # scores/skew tiles (3 live [S, 2S]-class f32 tiles per head step)
    itemsize = q.dtype.itemsize
    hb = next(
        (
            c
            for c in range(h, 0, -1)
            if h % c == 0
            and 2 * c * (4 * s * d * itemsize + 2 * (2 * s) * d * itemsize)
            + 3 * s * 2 * s * 4
            <= 12 * 1024 * 1024
        ),
        1,
    )
    out = _disentangled_attention(
        qt, kt, vt, mask_bias.astype(jnp.float32), pk, pq, hb=hb
    )
    return out.transpose(0, 2, 1, 3)
