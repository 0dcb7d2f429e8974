"""Pallas kernel tests (interpreter mode on the CPU backend; the same
kernels run compiled on TPU — exercised by bench.py and the TPU smoke
runs)."""
import numpy as np

import jax
import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.ops.attention import (
    causal_attention_core)
from vq_vae_transformer_arc_welding_tpu.ops.pallas_attn import (
    flash_causal_attention)
from vq_vae_transformer_arc_welding_tpu.ops.pallas_vq import (
    nearest_codes_pallas)
from vq_vae_transformer_arc_welding_tpu.ops.vq import nearest_codes


def test_pallas_vq_bit_matches_xla(rng):
    z = jnp.asarray(rng.standard_normal((3000, 32)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(nearest_codes(z, cb)),
                                  np.asarray(nearest_codes_pallas(z, cb)))


def test_pallas_vq_tie_break_first_index(rng):
    z = jnp.asarray(rng.standard_normal((512, 8)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    cb = cb.at[11].set(cb[2])  # duplicate row -> tie
    ref = np.asarray(nearest_codes(z, cb))
    out = np.asarray(nearest_codes_pallas(z, cb))
    np.testing.assert_array_equal(ref, out)
    assert not (out == 11).any()  # first index wins


def test_pallas_vq_nonaligned_n(rng):
    z = jnp.asarray(rng.standard_normal((77, 16)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(nearest_codes(z, cb)),
                                  np.asarray(nearest_codes_pallas(z, cb)))


def test_flash_attention_matches_xla_core(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((2, 3, 21, 16)), jnp.float32)
               for _ in range(3))
    ref = causal_attention_core(q, k, v)
    out = flash_causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_grads_match_xla(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 13, 8)), jnp.float32)
               for _ in range(3))

    def loss_pal(q, k, v):
        return jnp.sum(flash_causal_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(causal_attention_core(q, k, v) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_transformer_with_pallas_attention_matches_xla(rng):
    from vq_vae_transformer_arc_welding_tpu.models import TransformerDecoder
    kw = dict(d_model=32, n_classes=18, seq_len=9, n_blocks=2, n_head=4)
    m_x = TransformerDecoder(**kw)
    m_p = TransformerDecoder(**kw, attention_impl="pallas")
    params, _ = m_x.init(0)
    ids = jnp.asarray(rng.integers(0, 18, (3, 9)), jnp.int32)
    a, _ = m_x.apply(params, None, ids, generate=True)
    b, _ = m_p.apply(params, None, ids, generate=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)
    # gradient path (custom_vjp) through the model
    def loss(m):
        def f(p):
            logits, _ = m.apply(p, None, ids, generate=False)
            return jnp.sum(logits ** 2)
        return jax.grad(f)(params)
    g_x = loss(m_x)
    g_p = loss(m_p)
    for x, p in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(p), rtol=1e-4,
                                   atol=1e-4)


def test_model_with_pallas_vq_matches_xla_model(rng):
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    kw = dict(hidden_dim=16, input_dim=2, num_embeddings=8, embedding_dim=4,
              n_resblocks=1, learning_rate=1e-3, batch_norm=False)
    m_x = VQVAEPatch(**kw)
    m_p = VQVAEPatch(**kw, vq_impl="pallas")
    params, state = m_x.init(0)
    x = jnp.asarray(rng.standard_normal((4, 200, 2)), jnp.float32)
    ids_x = m_x.encode_indices(params, state, x)
    ids_p = m_p.encode_indices(params, state, x)
    np.testing.assert_array_equal(np.asarray(ids_x), np.asarray(ids_p))
    assert m_p.hparams == m_x.hparams  # vq_impl is runtime-only
