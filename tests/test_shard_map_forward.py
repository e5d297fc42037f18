"""Manual-collective (shard_map) forward: must equal single-device and GSPMD
outputs on dp x tp meshes, for dense and packed-Q4 params."""
import numpy as np
import pytest

from embedding_cpp_tpu.gguf import GGUFFileType
from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_params,
)

CFG = BertConfig(
    n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
    name="shardmap-test",
)
OPTS = ComputeOptions(dtype="float32", attn_impl="xla")


def _data(batch=8, seq=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.n_vocab, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[:, 12:] = 0
    return ids, mask


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize(
    "ftype",
    [GGUFFileType.ALL_F32, GGUFFileType.MOSTLY_Q4_0, GGUFFileType.MOSTLY_Q8_0],
)
def test_manual_matches_single(eight_devices, dp, tp, ftype):
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    params = random_params(CFG, ftype, seed=0)
    ids, mask = _data()
    expected = np.asarray(bert_embed_batch(params, ids, mask, CFG, OPTS))

    mesh = make_mesh(dp=dp, tp=tp, devices=eight_devices)
    sharded, fwd = shard_params_and_make_forward_manual(params, CFG, OPTS, mesh)
    got = np.asarray(fwd(sharded, ids, mask))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_manual_mpnet_rel_bias_tp(eight_devices, dp, tp):
    """MPNet's shared relative-attention bias under manual TP: the bias
    table replicates and each device slices its own heads (bert.py
    _attention axis_index slice) — outputs must equal single-device and the
    GSPMD path."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import shard_params_and_make_forward
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        n_token_types=0, arch="mpnet", pos_offset=2, rel_attn_buckets=32,
        name="shardmap-mpnet",
    )
    params = random_params(cfg, seed=3)
    ids, mask = _data(seed=4)
    expected = np.asarray(bert_embed_batch(params, ids, mask, cfg, OPTS))

    mesh = make_mesh(dp=dp, tp=tp, devices=eight_devices)
    p1, f1 = shard_params_and_make_forward(params, cfg, OPTS, mesh)
    p2, f2 = shard_params_and_make_forward_manual(params, cfg, OPTS, mesh)
    np.testing.assert_allclose(
        np.asarray(f1(p1, ids, mask)), expected, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(f2(p2, ids, mask)), expected, atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_manual_modernbert_tp(eight_devices, dp, tp):
    """ModernBERT under both distribution paths: RoPE tables replicate,
    heads are tp-local after the load-time Wqkv split, the GeGLU halves
    column-shard independently (ffn_gate_w), and the per-layer global/local
    window masks are data-replicated — outputs must equal single-device."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import shard_params_and_make_forward
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=4, n_head=4, n_ff=256,
        n_token_types=0, arch="modernbert", layer_norm_eps=1e-5,
        rope_theta=160000.0, local_rope_theta=10000.0,
        global_attn_every=3, local_window=8, name="shardmap-modernbert",
    )
    params = random_params(cfg, seed=5)
    ids, mask = _data(seed=6)
    expected = np.asarray(bert_embed_batch(params, ids, mask, cfg, OPTS))

    mesh = make_mesh(dp=dp, tp=tp, devices=eight_devices)
    p1, f1 = shard_params_and_make_forward(params, cfg, OPTS, mesh)
    p2, f2 = shard_params_and_make_forward_manual(params, cfg, OPTS, mesh)
    if tp > 1:
        gw = p1["layers"]["ffn_gate_w"]
        assert gw.sharding.shard_shape(gw.shape)[-1] == gw.shape[-1] // tp
    np.testing.assert_allclose(
        np.asarray(f1(p1, ids, mask)), expected, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(f2(p2, ids, mask)), expected, atol=2e-5, rtol=1e-4
    )


def test_manual_matches_gspmd(eight_devices):
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import shard_params_and_make_forward
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    params = random_params(CFG, GGUFFileType.MOSTLY_Q4_1, seed=1)
    ids, mask = _data(seed=2)
    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    p1, f1 = shard_params_and_make_forward(params, CFG, OPTS, mesh)
    p2, f2 = shard_params_and_make_forward_manual(params, CFG, OPTS, mesh)
    a = np.asarray(f1(p1, ids, mask))
    b = np.asarray(f2(p2, ids, mask))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_manual_with_pallas_q4(eight_devices):
    """Pallas Q4 kernel inside shard_map (interpret mode on CPU)."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    params = random_params(CFG, GGUFFileType.MOSTLY_Q4_0, seed=0)
    ids, mask = _data()
    expected = np.asarray(bert_embed_batch(params, ids, mask, CFG, OPTS))

    opts = ComputeOptions(dtype="float32", attn_impl="xla", q4_impl="pallas")
    mesh = make_mesh(dp=2, tp=2, devices=eight_devices[:4])
    sharded, fwd = shard_params_and_make_forward_manual(params, CFG, opts, mesh)
    got = np.asarray(fwd(sharded, ids, mask))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_manual_packed_matches_single(eight_devices):
    """Sequence-packed shard_map forward (segment-masked attention inside
    the body) equals the single-device packed result."""
    from embedding_cpp_tpu.models.bert import bert_embed_packed
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        make_packed_forward_manual,
        shard_params_and_make_forward_manual,
    )
    from embedding_cpp_tpu.runtime.batching import pack_segments

    rng = np.random.default_rng(3)
    toks = [list(rng.integers(1, CFG.n_vocab, size=rng.integers(3, 14)))
            for _ in range(20)]
    (pb,) = pack_segments(toks, list(range(len(toks))), 0, seq_len=64,
                          n_seg=8, row_multiple=4)

    params = random_params(CFG, GGUFFileType.MOSTLY_Q4_0, seed=0)
    expected = np.asarray(
        bert_embed_packed(params, pb.ids, pb.seg, pb.pos, CFG, OPTS, n_seg=8)
    )

    mesh = make_mesh(dp=4, tp=2, devices=eight_devices)
    sharded, _ = shard_params_and_make_forward_manual(params, CFG, OPTS, mesh)
    make = make_packed_forward_manual(sharded, CFG, OPTS, mesh)
    got = np.asarray(make(8, None)(sharded, pb.ids, pb.seg, pb.pos))
    assert got.shape == expected.shape
    # compare only real segment slots (pad slots are don't-care)
    for r, row in enumerate(pb.positions):
        for g in range(len(row)):
            np.testing.assert_allclose(got[r, g], expected[r, g],
                                       atol=2e-5, rtol=1e-4)


def test_manual_albert_shared_layer_tp(eight_devices):
    """Manual-TP shard_map over ALBERT: the single shared layer's
    column/row-parallel shards feed the xs=None scan inside the body; the
    emb_proj linear stays replicated."""
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.shard_map_forward import (
        shard_params_and_make_forward_manual,
    )

    cfg = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=3, n_head=4, n_ff=256,
        arch="albert", gelu="tanh", n_embd_emb=32, name="shardmap-albert",
    )
    params = random_params(cfg, GGUFFileType.MOSTLY_Q4_0, seed=5)
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.n_vocab, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 12:] = 0
    expected = np.asarray(bert_embed_batch(params, ids, mask, cfg, OPTS))

    mesh = make_mesh(dp=2, tp=4, devices=eight_devices)
    sharded, fwd = shard_params_and_make_forward_manual(
        params, cfg, OPTS, mesh
    )
    got = np.asarray(fwd(sharded, ids, mask))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
