"""Sequence packing: many sentences per row via segment ids.

The packed forward (models.bert.bert_embed_packed) must produce exactly the
per-sentence results of the unpacked path — the reference evaluates one
sentence per graph (bert.cpp:1065); packing reproduces that independence
inside one dispatch via block-diagonal attention and per-segment pooling.
"""
import dataclasses

import numpy as np
import pytest

from conftest import tpu_atol

from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_params,
)
from embedding_cpp_tpu.models.bert import bert_embed_packed
from embedding_cpp_tpu.runtime.batching import PackedSegBatch, pack_segments

CFG = BertConfig(
    n_vocab=128, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
    name="tiny-test",
)
F32 = ComputeOptions(dtype="float32")


def _sentences(rng, n, min_len=3, max_len=20):
    lens = rng.integers(min_len, max_len + 1, size=n)
    return [list(rng.integers(1, CFG.n_vocab, size=l)) for l in lens]


# --- packer invariants -------------------------------------------------------

def test_pack_segments_places_every_sentence_once():
    rng = np.random.default_rng(0)
    toks = _sentences(rng, 57)
    batches = pack_segments(toks, list(range(len(toks))), pad_id=0,
                            seq_len=64, n_seg=8)
    seen = {}
    for b in batches:
        for r, row in enumerate(b.positions):
            for g, orig in enumerate(row):
                assert orig not in seen
                seen[orig] = (b, r, g)
                # tokens of segment g in row r match the original sentence
                sel = b.seg[r] == g
                np.testing.assert_array_equal(b.ids[r][sel], toks[orig])
                np.testing.assert_array_equal(
                    b.pos[r][sel], np.arange(len(toks[orig]))
                )
    assert len(seen) == len(toks)


def test_pack_segments_respects_capacity():
    rng = np.random.default_rng(1)
    toks = _sentences(rng, 40)
    batches = pack_segments(toks, list(range(len(toks))), pad_id=0,
                            seq_len=64, n_seg=4)
    for b in batches:
        assert b.ids.shape[1] == 64
        for r, row in enumerate(b.positions):
            assert len(row) <= 4
            assert int((b.seg[r] >= 0).sum()) == sum(len(toks[i]) for i in row)
    # padding slots are marked
    for b in batches:
        assert np.all(b.ids[b.seg < 0] == 0)
        assert np.all(b.pos[b.seg < 0] == 0)


def test_pack_segments_nfd_path_caps_and_places():
    """The short-sentence NFD placement (every len <= seq_len/8) must honor
    the n_seg cap and place every sentence exactly once."""
    rng = np.random.default_rng(3)
    # all tiny -> a 512-token row could hold >100, so n_seg=16 must bind
    toks = [list(rng.integers(1, 50, size=rng.integers(2, 6)))
            for _ in range(300)]
    batches = pack_segments(toks, list(range(len(toks))), pad_id=0,
                            seq_len=512, n_seg=16)
    seen = set()
    for b in batches:
        for r, row in enumerate(b.positions):
            assert len(row) <= 16
            for g, orig in enumerate(row):
                assert orig not in seen
                seen.add(orig)
                sel = b.seg[r] == g
                np.testing.assert_array_equal(b.ids[r][sel], toks[orig])
    assert len(seen) == len(toks)


def test_pack_segments_nfd_matches_ffd_quality():
    """On a uniformly-short workload the NFD row count stays within 5% of
    what FFD would produce (the stated bar for taking the fast path)."""
    from embedding_cpp_tpu.runtime.batching import _ffd_place, _nfd_place

    rng = np.random.default_rng(4)
    lens = rng.integers(4, 30, size=2000)
    toks = [list(range(n)) for n in lens]
    nfd_rows = len(_nfd_place(np.asarray(lens), 512, 64))
    ffd_rows = len(_ffd_place(toks, np.asarray(lens), 512, 64))
    assert nfd_rows <= ffd_rows * 1.05 + 1


def test_pack_segments_rejects_oversized():
    with pytest.raises(ValueError):
        pack_segments([list(range(100))], [0], pad_id=0, seq_len=64, n_seg=4)


# --- packed forward == unpacked forward --------------------------------------

@pytest.mark.parametrize("pooling", ["mean", "cls", "max"])
def test_packed_forward_matches_unpacked(pooling):
    cfg = dataclasses.replace(CFG, pooling=pooling)
    rng = np.random.default_rng(2)
    params = random_params(cfg, seed=3)
    toks = _sentences(rng, 13)
    batches = pack_segments(toks, list(range(len(toks))), pad_id=0,
                            seq_len=64, n_seg=8)

    got = np.zeros((len(toks), cfg.n_embd), dtype=np.float32)
    for b in batches:
        vecs = np.asarray(
            bert_embed_packed(params, b.ids, b.seg, b.pos, cfg, F32,
                              n_seg=b.n_seg)
        )
        for r, row in enumerate(b.positions):
            for g, orig in enumerate(row):
                got[orig] = vecs[r, g]

    for i, t in enumerate(toks):
        ids = np.asarray([t], dtype=np.int32)
        mask = np.ones_like(ids)
        want = np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))[0]
        np.testing.assert_allclose(got[i], want, atol=tpu_atol(2e-5), rtol=1e-4,
                                   err_msg=f"sentence {i} (pooling={pooling})")


def test_packed_bias_toeplitz_equals_per_row():
    """The batch-invariant [H, S, S] bias (built from absolute row offsets)
    must equal the naive per-row [B, H, S, S] bias on every SAME-SEGMENT
    pair — packed positions are consecutive within a segment, so
    pos[k] - pos[q] == k - q there.  This is the claim that lets the packed
    MPNet/T5 paths reuse one VMEM-resident bias table instead of
    materializing B*H*S*S floats."""
    from embedding_cpp_tpu.models.bert import (
        _rel_attn_bias,
        _rel_attn_bias_packed,
    )

    rng = np.random.default_rng(9)
    b, s, h = 3, 64, 4
    table = np.asarray(rng.normal(size=(32, h)).astype(np.float32))
    seg = np.full((b, s), -1, np.int32)
    pos = np.zeros((b, s), np.int32)
    for i in range(b):
        c, g = 0, 0
        while c < s - 4:
            l = int(rng.integers(3, 20))
            l = min(l, s - c)
            seg[i, c:c + l] = g
            pos[i, c:c + l] = np.arange(l)
            c, g = c + l, g + 1
    import jax.numpy as jnp

    toe = np.asarray(_rel_attn_bias(jnp.asarray(table), s))  # [H, S, S]
    per_row = np.asarray(
        _rel_attn_bias_packed(jnp.asarray(table), jnp.asarray(pos))
    )  # [B, H, S, S]
    same = seg[:, :, None] == seg[:, None, :]
    same &= (seg >= 0)[:, :, None]
    for i in range(b):
        np.testing.assert_array_equal(
            np.broadcast_to(toe, per_row[i].shape)[:, same[i]],
            per_row[i][:, same[i]],
        )


def test_packed_empty_segments_are_zero():
    params = random_params(CFG, seed=4)
    toks = [[5, 6, 7]]
    (b,) = pack_segments(toks, [0], pad_id=0, seq_len=64, n_seg=8,
                         batch_buckets=(1,))
    vecs = np.asarray(
        bert_embed_packed(params, b.ids, b.seg, b.pos, CFG, F32, n_seg=8)
    )
    assert np.all(vecs[0, 1:] == 0.0)
    assert np.isfinite(vecs).all()


# --- engine integration ------------------------------------------------------

ENGINE_CFG = dataclasses.replace(CFG, n_vocab=512)


def _engine(packing):
    from embedding_cpp_tpu.runtime.engine import Engine

    return Engine.synthetic(ENGINE_CFG, ftype="f32", opts=F32, packing=packing)


def test_engine_packing_matches_unpacked():
    texts = [f"word{i % 7} thing stuff other {('x ' * (i % 9))}" for i in range(50)]
    e_never = _engine("never")
    e_always = _engine("always")
    a = e_never.encode(texts)
    b = e_always.encode(texts)
    np.testing.assert_allclose(a, b, atol=tpu_atol(2e-5), rtol=1e-4)
    assert e_always.stats["batches"] <= e_never.stats["batches"]


def test_output_dtype_f16():
    """output_dtype=float16 halves the device->host transfer; cosine vs the
    f32 output stays within f16 rounding."""
    from embedding_cpp_tpu.runtime.engine import Engine

    texts = [f"some words {i} more tokens here" for i in range(40)]
    f32 = _engine("always").encode(texts)
    e16 = Engine.synthetic(
        ENGINE_CFG, ftype="f32",
        opts=dataclasses.replace(F32, output_dtype="float16"),
        packing="always",
    )
    out = e16.encode(texts)
    assert out.dtype == np.float32  # host-side result is always f32
    cos = (out * f32).sum(axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(f32, axis=1)
    )
    assert cos.min() > 0.99999


def test_engine_auto_packs_many_short_sentences():
    e = _engine("auto")
    texts = ["short sentence here"] * 40
    out = e.encode(texts)
    assert out.shape == (40, CFG.n_embd)
    # all 40 short sentences fit one packed dispatch
    assert e.stats["batches"] == 1


def test_packed_forward_matches_unpacked_roberta():
    """pos_offset families (RoBERTa/XLM-R) through the packed path: the
    per-segment restart positions must land at position[pos + off]
    (models/bert.py embed positions), so packed == plain."""
    cfg = dataclasses.replace(
        CFG, layer_norm_eps=1e-5, n_token_types=1, arch="roberta",
        pos_offset=2, name="packed-roberta",
    )
    params = random_params(cfg, seed=7)
    rng = np.random.default_rng(8)
    token_lists = [
        list(rng.integers(4, cfg.n_vocab, size=l))
        for l in (5, 9, 3, 12, 7, 4)
    ]
    plain = []
    for toks in token_lists:
        ids = np.array([toks], np.int32)
        mask = np.ones_like(ids)
        plain.append(
            np.asarray(bert_embed_batch(params, ids, mask, cfg, F32))[0]
        )
    plain = np.stack(plain)

    batches = pack_segments(token_lists, list(range(len(token_lists))),
                            pad_id=0, seq_len=16, n_seg=8)
    got = np.full_like(plain, np.nan)
    for b in batches:
        vecs = np.asarray(
            bert_embed_packed(params, b.ids, b.seg, b.pos, cfg, F32,
                              n_seg=b.n_seg)
        )
        for r, row in enumerate(b.positions):
            for g, orig in enumerate(row):
                got[orig] = vecs[r, g]
    np.testing.assert_allclose(got, plain, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("arch_kw", [
    dict(arch="albert", gelu="tanh", n_embd_emb=32, layer_norm_eps=1e-12),
    dict(arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32, n_head_dim=16,
         ffn_act="relu", n_token_types=0),
    dict(arch="deberta", layer_norm_eps=1e-7, rel_attn_buckets=32,
         rel_attn_max_dist=64, n_token_types=0),
], ids=["albert", "t5", "deberta"])
def test_engine_packed_equals_plain_new_families(arch_kw):
    """Engine-level packing (planner -> pack_segments -> per-segment
    pooling -> compact gather) for the families with non-BERT graphs:
    packed encode must equal the plain bucketed encode."""
    from embedding_cpp_tpu.models.config import BertConfig
    from embedding_cpp_tpu.runtime.engine import Engine

    cfg = BertConfig(
        n_vocab=400, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        name=f"pack-{arch_kw['arch']}", **arch_kw,
    )
    packed_eng = Engine.synthetic(cfg, ftype="f32", packing="always")
    plain_eng = Engine.synthetic(cfg, ftype="f32", packing="never")
    rng = np.random.default_rng(7)
    tok_lists = [
        list(map(int, rng.integers(4, cfg.n_vocab, size=rng.integers(3, 14))))
        for _ in range(17)
    ]
    a = packed_eng.embed_tokens(tok_lists)
    b = plain_eng.embed_tokens(tok_lists)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
