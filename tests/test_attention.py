"""Fused attention kernel vs the XLA einsum reference."""
import numpy as np
import pytest

import jax.numpy as jnp

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
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


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
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_bf16_path():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 128, 4, 32)), dtype=jnp.bfloat16)
    bias = jnp.zeros((1, 128), jnp.float32)
    expected = np.asarray(_reference(q, k, v, bias), dtype=np.float32)
    got = np.asarray(flash_attention(q, k, v, bias), dtype=np.float32)
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)
