"""Token-level final hidden states (encode_token_states).

The late-interaction / feature-extraction surface: per-token
last_hidden_state with pooling/normalization/head skipped.  Gates: the
states match HF torch exactly where a parity harness exists (BERT), and
for every family manual masked-mean-pool + L2 of the token states
reproduces encode() (which pins the states to the same tensor the pooled
path consumes)."""
import numpy as np
import pytest

from embedding_cpp_tpu.models import (
    BertConfig,
    ComputeOptions,
    bert_embed_batch,
    random_state_dict,
)
from embedding_cpp_tpu.models.params import build_params, source_from_arrays
from embedding_cpp_tpu.runtime.engine import Engine

F32 = ComputeOptions(dtype="float32")

FAMILY_CFGS = {
    "bert": dict(),
    "mpnet": dict(arch="mpnet", pos_offset=2, rel_attn_buckets=32,
                  layer_norm_eps=1e-5, n_token_types=0),
    "modernbert": dict(arch="modernbert", n_token_types=0,
                       layer_norm_eps=1e-5, rope_theta=160000.0,
                       local_rope_theta=10000.0, global_attn_every=3,
                       local_window=16),
    "albert": dict(arch="albert", gelu="tanh", n_embd_emb=32),
    "t5": dict(arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32,
               n_head_dim=16, ffn_act="relu", n_token_types=0),
    "deberta": dict(arch="deberta", layer_norm_eps=1e-7, rel_attn_buckets=32,
                    rel_attn_max_dist=64, n_token_types=0),
}


def _cfg(kw):
    return BertConfig(
        n_vocab=400, n_ctx=64, n_embd=64, n_layer=2, n_head=4, n_ff=128,
        name="tok-states", **kw,
    )


def test_bert_token_states_match_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    cfg = _cfg(FAMILY_CFGS["bert"])
    sd = random_state_dict(cfg, seed=3)
    hf_config = transformers.BertConfig(
        vocab_size=cfg.n_vocab, hidden_size=cfg.n_embd,
        num_hidden_layers=cfg.n_layer, num_attention_heads=cfg.n_head,
        intermediate_size=cfg.n_ff, max_position_embeddings=cfg.n_ctx,
        type_vocab_size=cfg.n_token_types,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    model = transformers.BertModel(hf_config, add_pooling_layer=False)
    model.eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected

    rng = np.random.default_rng(4)
    ids = rng.integers(4, cfg.n_vocab, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 8:] = 0
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    params = build_params(source_from_arrays(sd), cfg)
    got = np.asarray(
        bert_embed_batch(params, ids, mask, cfg, F32, token_states=True)
    )
    assert got.shape == expected.shape
    # padded positions of HF outputs attend differently only where masked
    # — compare valid positions
    for b in range(3):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], expected[b, :n], atol=5e-4,
                                   rtol=1e-4)


@pytest.mark.parametrize("family", sorted(FAMILY_CFGS),
                         ids=sorted(FAMILY_CFGS))
def test_engine_token_states_consistent_with_encode(family):
    """Masked-mean-pool + L2 of the returned token states reproduces
    encode() for every family (mean pooling, no Dense head)."""
    cfg = _cfg(FAMILY_CFGS[family])
    eng = Engine.synthetic(cfg, opts=F32, packing="never")
    texts = ["hello world", "the quick brown fox jumps over the lazy dog",
             "a", "Café déjà vu"]
    states = eng.encode_token_states(texts)
    framed = eng.tokenize_batch(texts)
    assert [s.shape for s in states] == [
        (len(f), cfg.n_embd) for f in framed
    ]
    pooled = np.stack([s.mean(axis=0) for s in states])
    manual = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)
    direct = eng.encode(texts)
    np.testing.assert_allclose(manual, direct, atol=2e-5, rtol=1e-4)


def test_token_states_chunking():
    """Inputs beyond the top batch bucket split into multiple dispatches
    and come back in order."""
    cfg = _cfg(FAMILY_CFGS["bert"])
    eng = Engine.synthetic(
        cfg, opts=F32, packing="never", batch_buckets=(1, 4),
    )
    texts = [f"sentence number {i}" for i in range(9)]  # 3 chunks at cap 4
    states = eng.encode_token_states(texts)
    assert len(states) == 9
    ref = eng.encode_token_states([texts[6]])[0]
    np.testing.assert_allclose(states[6], ref, atol=2e-5, rtol=1e-4)
