"""Fused attention kernel vs the XLA einsum reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from conftest import tpu_atol as _tpu_atol

from embedding_cpp_tpu.ops.attention import flash_attention


def _reference(q, k, v, bias):
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / d**0.5) + bias[:, None, None, :]
    import jax

    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 4, 32), (1, 128, 12, 32), (2, 128, 4, 64)])
def test_matches_reference(b, s, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    bias = np.zeros((b, s), np.float32)
    bias[:, s // 2 :] = -1e9  # half the keys padded
    bias = jnp.asarray(bias)

    expected = np.asarray(_reference(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias))
    np.testing.assert_allclose(got, expected, atol=_tpu_atol(2e-5), rtol=1e-4)


def test_full_model_attn_pallas_matches_xla():
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions, bert_embed_batch, random_params

    cfg = BertConfig(n_vocab=256, n_ctx=128, n_embd=128, n_layer=2, n_head=4, n_ff=256)
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(4, 64)).astype(np.int32)
    mask = np.ones((4, 64), np.int32)
    mask[:, 50:] = 0
    a = np.asarray(bert_embed_batch(params, ids, mask, cfg, ComputeOptions(attn_impl="xla")))
    b = np.asarray(bert_embed_batch(params, ids, mask, cfg, ComputeOptions(attn_impl="pallas")))
    np.testing.assert_allclose(a, b, atol=_tpu_atol(1e-5), rtol=1e-4)


def test_bf16_path():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    bias = jnp.zeros((1, 128), jnp.float32)
    expected = np.asarray(_reference(q, k, v, bias), dtype=np.float32)
    got = np.asarray(flash_attention(q, k, v, bias), dtype=np.float32)
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)


def _seg_reference(q, k, v, seg):
    import jax

    d = q.shape[-1]
    allowed = seg[:, :, None] == seg[:, None, :]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)
    scores = scores * (1.0 / d**0.5) + bias[:, None, :, :]
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _random_segments(rng, b, s, max_len):
    seg = np.full((b, s), -1, np.int32)
    for i in range(b):
        c, g = 0, 0
        while c < s - 2:
            l = int(rng.integers(2, max_len + 1))
            l = min(l, s - c)
            seg[i, c : c + l] = g
            c += l
            g += 1
            if rng.random() < 0.1:
                break  # leave a padded tail sometimes
    return seg


@pytest.mark.parametrize("max_seg_len,s", [(None, 512), (32, 512), (64, 1024)])
def test_packed_matches_reference(max_seg_len, s):
    """Segment-masked kernel (full and windowed variants) vs XLA.
    s=1024 with a short max_seg_len routes through the windowed variant."""
    from embedding_cpp_tpu.ops.attention import flash_attention_packed

    rng = np.random.default_rng(0)
    b, h, d = 2, 4, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    seg_np = _random_segments(rng, b, s, max_seg_len or 48)
    seg = jnp.asarray(seg_np)

    expected = np.asarray(_seg_reference(q, k, v, seg))
    got = np.asarray(flash_attention_packed(q, k, v, seg, max_seg_len=max_seg_len))
    # padding rows are don't-care (never read downstream: valid tokens can't
    # attend seg=-1 and pooling excludes it) — compare valid positions only.
    # On real TPUs the Mosaic dot and the XLA einsum round f32 multiplies
    # differently on the MXU (measured <= 1.1e-3; CLAUDE.md measured facts);
    # interpret mode (CPU) is exact.
    valid = seg_np >= 0
    np.testing.assert_allclose(got[valid], expected[valid], atol=_tpu_atol(2e-5),
                               rtol=1e-4)


def test_packed_window_covers_exact_boundaries():
    """Segments aligned exactly at q-tile boundaries must stay covered by
    the window (the round-down + margin slack math); drives the windowed
    kernel directly."""
    from embedding_cpp_tpu.ops.attention import _flash_attention_packed_window

    rng = np.random.default_rng(1)
    b, s, h, d = 1, 512, 2, 32
    W = 64
    seg = np.full((b, s), -1, np.int32)
    for i, start in enumerate(range(0, s, W)):  # exactly tile-aligned
        seg[0, start : start + W] = i
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    seg = jnp.asarray(seg)

    expected = np.asarray(_seg_reference(q, k, v, seg))
    qt, kt, vt = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    wmax = -(-(128 + 2 * W + 24) // 128) * 128
    got = np.asarray(
        _flash_attention_packed_window(qt, kt, vt, seg, tq=128, wmax=wmax, hb=1)
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, expected, atol=_tpu_atol(2e-5), rtol=1e-4)


def test_attn_tiles_never_whole_sequence_over_budget():
    """The tile picker must not fall back to an [S, S] score tile when
    nothing fits the VMEM budget (that tile cannot compile on TPU)."""
    from embedding_cpp_tpu.ops.attention import _attn_tiles

    tq, hb = _attn_tiles(12, 8192, 32, 2, score_bytes=8)
    assert tq * 8192 * 8 <= 10 * 1024 * 1024 or tq == 128
    assert tq < 8192
    # normal encoder shapes still pick whole-sequence tiles with all heads
    tq, hb = _attn_tiles(12, 512, 32, 2)
    assert tq == 512 and hb == 12
    # long UNALIGNED s (s % 128 != 0, s % 8 == 0): the fallback must pick a
    # small divisor tile, never tq == s (ADVICE r2: that is exactly the
    # whole-sequence [S, S] tile the budget loop exists to avoid)
    s = 8 * 5003  # 40024: divisors are {1,2,4,8} x {1,5003,...}; tq -> 8
    tq, hb = _attn_tiles(12, s, 32, 2)
    assert tq < s and s % tq == 0 and tq % 8 == 0 and tq <= 128


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 4, 32), (1, 128, 12, 32), (2, 128, 4, 64)])
def test_bias_kernel_matches_reference(b, s, h, d):
    """Additive [H, S, S] position bias (MPNet relative attention) in the
    fused kernel vs the XLA einsum path."""
    import jax

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = np.zeros((b, s), np.float32)
    mask[:, (3 * s) // 4:] = -1e9
    mask = jnp.asarray(mask)
    pos_bias = jnp.asarray(rng.normal(size=(h, s, s)).astype(np.float32))

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / d**0.5) + mask[:, None, None, :] + pos_bias
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    expected = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    )
    got = np.asarray(flash_attention(q, k, v, mask, pos_bias=pos_bias))
    np.testing.assert_allclose(got, expected, atol=_tpu_atol(2e-5), rtol=1e-4)


def test_mpnet_forward_pallas_matches_xla():
    """Full MPNet forward: fused bias kernel vs XLA (the auto dispatch takes
    the bias kernel on TPU for plain padded batches)."""
    from embedding_cpp_tpu.models import (
        BertConfig, ComputeOptions, bert_embed_batch, random_params,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=128, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        n_token_types=0, arch="mpnet", pos_offset=2, rel_attn_buckets=32,
    )
    params = random_params(cfg, seed=4)
    rng = np.random.default_rng(5)
    ids = rng.integers(5, 256, size=(4, 64)).astype(np.int32)
    mask = np.ones((4, 64), np.int32)
    mask[:, 40:] = 0
    a = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="xla")))
    b = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="pallas")))
    np.testing.assert_allclose(a, b, atol=_tpu_atol(1e-5), rtol=1e-4)


@pytest.mark.parametrize("s,window", [(512, 128), (512, 64), (1024, 128)])
def test_local_window_kernel_matches_reference(s, window):
    """Sliding-window kernel (ModernBERT local layers) vs the XLA einsum
    path with the full [S, S] distance mask."""
    import jax
    from embedding_cpp_tpu.ops.attention import flash_attention_local

    rng = np.random.default_rng(6)
    b, h, d = 2, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = np.zeros((b, s), np.float32)
    mask[:, (7 * s) // 8:] = -1e9  # padded tail
    maskj = jnp.asarray(mask)

    pos = np.arange(s)
    dist_ok = np.abs(pos[None, :] - pos[:, None]) <= window // 2
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / d**0.5) + maskj[:, None, None, :]
    scores = jnp.where(jnp.asarray(dist_ok)[None, None], scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    expected = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    )
    got = np.asarray(flash_attention_local(q, k, v, maskj, window))
    # padded queries whose whole window is padding are don't-care (pooling
    # never reads them; the reference einsum gives them a different garbage
    # distribution because its out-of-window keys sit at exactly -1e9) —
    # compare valid query positions only, like the packed-kernel test.
    valid = mask[:, :, None, None] == 0.0
    np.testing.assert_allclose(
        np.where(valid, got, 0.0), np.where(valid, expected, 0.0),
        atol=_tpu_atol(2e-5), rtol=1e-4,
    )


def test_local_window_tiles():
    from embedding_cpp_tpu.ops.attention import local_window_tiles

    tq, wmax = local_window_tiles(512, 128)
    assert (tq, wmax) == (128, 384)  # pays: 384 < 512
    assert local_window_tiles(256, 128)[1] is None  # window covers S
    assert local_window_tiles(520, 128)[1] is None  # unaligned S
    tq, wmax = local_window_tiles(8192, 128)
    assert tq == 256 and wmax == 512  # 16x fewer score FLOPs than [TQ, S]


@pytest.mark.parametrize("s", [128, 512])
def test_modernbert_forward_pallas_matches_xla(s):
    """Full ModernBERT forward, fused kernels vs XLA: s=512 exercises the
    lax.cond global-kernel / sliding-window-kernel split, s=128 the
    head-invariant [1, S, S] window-bias kernel (window not narrower
    than S)."""
    from embedding_cpp_tpu.models import (
        BertConfig, ComputeOptions, bert_embed_batch, random_params,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=1024, n_embd=64, n_layer=3, n_head=2, n_ff=128,
        n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
        rope_theta=160000.0, local_rope_theta=10000.0,
        global_attn_every=3, local_window=64 if s == 512 else 16,
    )
    params = random_params(cfg, seed=8)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 256, size=(2, s)).astype(np.int32)
    mask = np.ones((2, s), np.int32)
    mask[1, (3 * s) // 4:] = 0
    a = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="xla")))
    b = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="pallas")))
    np.testing.assert_allclose(a, b, atol=_tpu_atol(1e-5), rtol=1e-4)


def test_bse_kernel_matches_reference():
    """flash_attention_bse (projection-output layout, heads as lane
    slices) == the [B,S,H,d] reference — the layout change must be
    numerically invisible (measured bit-exact on v5e,
    q4_forward_breakdown.md)."""
    from embedding_cpp_tpu.ops.attention import flash_attention_bse

    rng = np.random.default_rng(5)
    for b, s, h, d in ((2, 128, 4, 32), (1, 256, 3, 64), (2, 136, 2, 40)):
        q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        bias = np.zeros((b, s), np.float32)
        bias[:, (s * 3) // 4:] = -1e9
        bias = jnp.asarray(bias)
        expected = np.asarray(_reference(q, k, v, bias)).reshape(b, s, h * d)
        got = np.asarray(flash_attention_bse(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d),
            v.reshape(b, s, h * d), bias, h,
        ))
        np.testing.assert_allclose(got, expected, atol=_tpu_atol(2e-5),
                                   rtol=1e-4)


@pytest.mark.parametrize("b,s,h,d", [(2, 128, 4, 32), (2, 512, 4, 32),
                                     (1, 256, 3, 64)])
def test_packed_bse_kernel_matches_reference(b, s, h, d):
    """flash_attention_packed_bse (projection layout, in-kernel segment
    mask) == the [B,S,H,d] seg reference — packing is the engine's default
    serving path, so the no-transpose layout must be numerically invisible
    there too."""
    from embedding_cpp_tpu.ops.attention import flash_attention_packed_bse

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    seg_np = _random_segments(rng, b, s, 48)
    seg = jnp.asarray(seg_np)

    expected = np.asarray(_seg_reference(q, k, v, seg)).reshape(b, s, h * d)
    got = np.asarray(flash_attention_packed_bse(
        q.reshape(b, s, h * d), k.reshape(b, s, h * d),
        v.reshape(b, s, h * d), seg, h,
    ))
    valid = (seg_np >= 0)[..., None] & np.ones((1, 1, h * d), bool)
    np.testing.assert_allclose(got[valid[:, :, 0]], expected[valid[:, :, 0]],
                               atol=_tpu_atol(2e-5), rtol=1e-4)


@pytest.mark.parametrize("ph", ["heads", "invariant"])
def test_bias_packed_bse_kernel_matches_reference(ph):
    """flash_attention_bias_packed_bse (resident [H,S,S] bias + in-kernel
    segment mask) == the XLA einsum with the same bias and block-diagonal
    mask — the packed MPNet/T5 route."""
    import jax
    from embedding_cpp_tpu.ops.attention import flash_attention_bias_packed_bse

    rng = np.random.default_rng(8)
    b, s, h, d = 2, 256, 4, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    seg_np = _random_segments(rng, b, s, 32)
    seg = jnp.asarray(seg_np)
    pb = jnp.asarray(rng.normal(
        size=(h if ph == "heads" else 1, s, s)
    ).astype(np.float32))

    allowed = seg[:, :, None] == seg[:, None, :]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(
        allowed[:, None], scores * (1.0 / d**0.5) + pb[None], -1e9
    )
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    expected = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    ).reshape(b, s, h * d)
    got = np.asarray(flash_attention_bias_packed_bse(
        q.reshape(b, s, h * d), k.reshape(b, s, h * d),
        v.reshape(b, s, h * d), seg, pb, h,
    ))
    valid = seg_np >= 0
    np.testing.assert_allclose(got[valid], expected[valid],
                               atol=_tpu_atol(2e-5), rtol=1e-4)


def test_packed_bse_applies_gate():
    from embedding_cpp_tpu.ops.attention import packed_bse_applies

    assert packed_bse_applies(512, 32, None)          # the serving shape
    assert packed_bse_applies(512, 32, 64)            # window can't engage
    assert packed_bse_applies(128, 64, None)
    assert not packed_bse_applies(64, 32, None)       # below the envelope
    assert not packed_bse_applies(2048, 32, None)     # above the [S,S] tile
    assert not packed_bse_applies(520, 20, None)      # unaligned d
    # at exactly S=1024 a short max_seg_len makes the windowed kernel
    # narrower — it keeps the batch (FLOP cut beats layout)
    assert not packed_bse_applies(1024, 32, 64)
    assert packed_bse_applies(1024, 32, 500)          # window >= S: BSE


def test_packed_model_bse_path_matches_xla():
    """attn_impl='pallas' at S >= 128 routes the packed BERT path through
    the packed BSE kernel (models/bert._attention gate); outputs match XLA
    for the real (segment) rows."""
    from embedding_cpp_tpu.models import (
        BertConfig, ComputeOptions, random_params,
    )
    from embedding_cpp_tpu.models.bert import bert_embed_packed

    cfg = BertConfig(n_vocab=256, n_ctx=128, n_embd=128, n_layer=2,
                     n_head=4, n_ff=256)
    params = random_params(cfg, seed=11)
    rng = np.random.default_rng(12)
    b, s, n_seg = 2, 128, 8
    seg = _random_segments(rng, b, s, 24)
    seg = np.where(seg >= n_seg, -1, seg)
    ids = rng.integers(1, 256, size=(b, s)).astype(np.int32)
    ids[seg < 0] = 0
    pos = np.zeros((b, s), np.int32)
    for i in range(b):
        for g in range(n_seg):
            n = int((seg[i] == g).sum())
            pos[i, seg[i] == g] = np.arange(n)
    a = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg, ComputeOptions(attn_impl="xla"),
        n_seg=n_seg,
    ))
    bb = np.asarray(bert_embed_packed(
        params, ids, seg, pos, cfg, ComputeOptions(attn_impl="pallas"),
        n_seg=n_seg,
    ))
    np.testing.assert_allclose(a, bb, atol=_tpu_atol(1e-5), rtol=1e-4)


def test_full_model_bse_path_matches_xla():
    """attn_impl='pallas' at S >= 128 routes the plain BERT path through
    the BSE kernel (models/bert._attention gate); outputs match XLA."""
    from embedding_cpp_tpu.models import (
        BertConfig, ComputeOptions, bert_embed_batch, random_params,
    )

    cfg = BertConfig(n_vocab=256, n_ctx=128, n_embd=128, n_layer=2,
                     n_head=4, n_ff=256)
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(3, 128)).astype(np.int32)
    mask = np.ones((3, 128), np.int32)
    mask[1, 70:] = 0
    ids[mask == 0] = 0
    a = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="xla")))
    b = np.asarray(bert_embed_batch(params, ids, mask, cfg,
                                    ComputeOptions(attn_impl="pallas")))
    np.testing.assert_allclose(a, b, atol=_tpu_atol(1e-5), rtol=1e-4)
