"""Op-level golden parity tests vs torch primitives.

The reference's compute is built from torch.nn layers; each TPU-native
op here must reproduce that math exactly (SURVEY.md §7 hard parts). We
compare against torch.nn directly — the ground truth the reference
itself relies on.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.ops.activations import (gelu, leaky_relu,
                                                                new_gelu)
from vq_vae_transformer_arc_welding_tpu.ops.attention import (
    causal_attention_core, split_heads)
from vq_vae_transformer_arc_welding_tpu.ops.conv import (center_tap_dense,
                                                         conv1d_same)
from vq_vae_transformer_arc_welding_tpu.ops.gru import gru_forward
from vq_vae_transformer_arc_welding_tpu.ops.norm import (BatchNormState,
                                                         batch_norm_apply,
                                                         layer_norm)
from vq_vae_transformer_arc_welding_tpu.ops.patching import (
    conv_transpose_stride_eq_kernel, patch_embed)
from vq_vae_transformer_arc_welding_tpu.ops.vq import vq_quantize

TOL = dict(rtol=1e-5, atol=1e-5)


def test_new_gelu_matches_tanh_formula(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    ours = np.asarray(new_gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.tensor(x), approximate="tanh").numpy()
    np.testing.assert_allclose(ours, ref, **TOL)


def test_exact_gelu_matches_torch(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, **TOL)


def test_leaky_relu(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x))),
        torch.nn.functional.leaky_relu(torch.tensor(x)).numpy(), **TOL)


def test_patch_embed_matches_strided_conv1d(rng):
    """Reference patch embed: permute+flatten then Conv1d(1->H, k=s=25)."""
    b, t, c, h, patch = 4, 200, 2, 32, 25
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    conv = torch.nn.Conv1d(1, h, kernel_size=patch, stride=patch)
    xt = torch.tensor(x).permute(0, 2, 1).reshape(b, -1).unsqueeze(1)
    ref = conv(xt).detach().numpy()  # (B, H, 16)

    kernel = conv.weight.detach().numpy()[:, 0, :].T  # (patch, H)
    bias = conv.bias.detach().numpy()
    ours = np.asarray(patch_embed(jnp.asarray(x), jnp.asarray(kernel),
                                  jnp.asarray(bias), patch))  # (B, 16, H)
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)), **TOL)


def test_center_tap_dense_matches_per_position_conv_loop(rng):
    """The 'seperate=True' loop: shared k3/p1 conv applied to each
    length-1 position slice == center-tap affine map."""
    b, p, ci, co = 3, 16, 8, 5
    x = rng.standard_normal((b, p, ci)).astype(np.float32)
    conv = torch.nn.Conv1d(ci, co, kernel_size=3, stride=1, padding=1)
    xt = torch.tensor(x).permute(0, 2, 1)  # (B, C, P)
    outs = [conv(xt[:, :, i].unsqueeze(2)) for i in range(p)]
    ref = torch.cat(outs, dim=2).detach().numpy()  # (B, co, P)

    ours = np.asarray(center_tap_dense(
        jnp.asarray(x), jnp.asarray(conv.weight.detach().numpy()),
        jnp.asarray(conv.bias.detach().numpy())))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)), **TOL)


def test_conv1d_same_matches_torch(rng):
    b, l, ci, co = 2, 16, 8, 8
    x = rng.standard_normal((b, l, ci)).astype(np.float32)
    conv = torch.nn.Conv1d(ci, co, kernel_size=3, stride=1, padding=1)
    ref = conv(torch.tensor(x).permute(0, 2, 1)).detach().numpy()
    ours = np.asarray(conv1d_same(
        jnp.asarray(x), jnp.asarray(conv.weight.detach().numpy()),
        jnp.asarray(conv.bias.detach().numpy())))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [5, 10, 2])
def test_conv_transpose_stride_eq_kernel(rng, k):
    b, l, ci, co = 2, 16, 8, 4
    x = rng.standard_normal((b, l, ci)).astype(np.float32)
    ct = torch.nn.ConvTranspose1d(ci, co, kernel_size=k, stride=k)
    ref = ct(torch.tensor(x).permute(0, 2, 1)).detach().numpy()  # (B, co, l*k)
    ours = np.asarray(conv_transpose_stride_eq_kernel(
        jnp.asarray(x), jnp.asarray(ct.weight.detach().numpy()),
        jnp.asarray(ct.bias.detach().numpy())))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)), **TOL)


def test_batch_norm_train_and_eval_match_torch(rng):
    b, c = 32, 8
    x = rng.standard_normal((b, c)).astype(np.float32)
    bn = torch.nn.BatchNorm1d(c)
    bn.train()
    ref_train = bn(torch.tensor(x)).detach().numpy()
    state = BatchNormState.create(c)
    ours_train, new_state = batch_norm_apply(
        jnp.asarray(x), jnp.ones((c,)), jnp.zeros((c,)), state, train=True)
    np.testing.assert_allclose(np.asarray(ours_train), ref_train, **TOL)
    np.testing.assert_allclose(np.asarray(new_state.mean),
                               bn.running_mean.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(new_state.var),
                               bn.running_var.numpy(), **TOL)

    bn.eval()
    x2 = rng.standard_normal((b, c)).astype(np.float32)
    ref_eval = bn(torch.tensor(x2)).detach().numpy()
    ours_eval, _ = batch_norm_apply(
        jnp.asarray(x2), jnp.ones((c,)), jnp.zeros((c,)), new_state, train=False)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, **TOL)


def test_batch_norm_channels_last_3d_matches_torch_ncl(rng):
    """PatchEmbeddingInverse BN runs on (B, C, L); ours on (B, L, C)."""
    b, c, l = 8, 6, 10
    x = rng.standard_normal((b, c, l)).astype(np.float32)
    bn = torch.nn.BatchNorm1d(c)
    bn.train()
    ref = bn(torch.tensor(x)).detach().numpy()
    ours, st = batch_norm_apply(
        jnp.asarray(np.transpose(x, (0, 2, 1))), jnp.ones((c,)),
        jnp.zeros((c,)), BatchNormState.create(c), train=True)
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 2, 1)),
                               ref, **TOL)
    np.testing.assert_allclose(np.asarray(st.var), bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 7, 16)).astype(np.float32)
    ln = torch.nn.LayerNorm(16)
    ref = ln(torch.tensor(x)).detach().numpy()
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.ones((16,)),
                                 jnp.zeros((16,))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_gru_matches_torch(rng):
    b, t, i, h, layers = 3, 7, 5, 6, 2
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    gru = torch.nn.GRU(i, h, layers, batch_first=True)
    ref_out, ref_h = gru(torch.tensor(x))
    params = []
    for li in range(layers):
        params.append({
            "w_ih": jnp.asarray(getattr(gru, f"weight_ih_l{li}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(gru, f"weight_hh_l{li}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(gru, f"bias_ih_l{li}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(gru, f"bias_hh_l{li}").detach().numpy()),
        })
    out, h_n = gru_forward(jnp.asarray(x), params)
    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), ref_h.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_vq_quantize_matches_reference_math(rng):
    """Indices, straight-through output, loss, and perplexity against a
    direct torch evaluation of the published VQ-VAE formulas."""
    n, d, k, beta = 48, 8, 16, 0.25
    z = rng.standard_normal((4, 12, d)).astype(np.float32)
    cb = rng.standard_normal((k, d)).astype(np.float32)

    zt = torch.tensor(z, requires_grad=True)
    cbt = torch.tensor(cb)
    z_flat = zt.reshape(-1, d)
    dist = (z_flat**2).sum(1, keepdim=True) + (cbt**2).sum(1) - 2 * z_flat @ cbt.t()
    idx = dist.argmin(1)
    z_q = cbt[idx].reshape(zt.shape)
    loss = ((z_q.detach() - zt)**2).mean() + beta * ((z_q - zt.detach())**2).mean()
    onehot = torch.nn.functional.one_hot(idx, k).float()
    e_mean = onehot.mean(0)
    perp = torch.exp(-(e_mean * torch.log(e_mean + 1e-10)).sum())

    out = vq_quantize(jnp.asarray(z), jnp.asarray(cb), beta)
    np.testing.assert_array_equal(np.asarray(out.indices).reshape(-1),
                                  idx.numpy())
    np.testing.assert_allclose(np.asarray(out.loss), loss.detach().numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out.perplexity), perp.numpy(), **TOL)
    del n

    # straight-through: z_q output value equals codebook rows; gradient
    # w.r.t. z of sum(z_q) is all-ones (identity pass-through)
    g = jax.grad(lambda zz: jnp.sum(
        vq_quantize(zz, jnp.asarray(cb), beta).z_q))(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z), **TOL)


def test_causal_attention_core_matches_torch_sdpa(rng):
    b, nh, t, hd = 2, 4, 9, 8
    q = rng.standard_normal((b, nh, t, hd)).astype(np.float32)
    k = rng.standard_normal((b, nh, t, hd)).astype(np.float32)
    v = rng.standard_normal((b, nh, t, hd)).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), is_causal=True
    ).numpy()
    ours = np.asarray(causal_attention_core(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_split_heads_roundtrip(rng):
    x = rng.standard_normal((2, 5, 12)).astype(np.float32)
    from vq_vae_transformer_arc_welding_tpu.ops.attention import merge_heads
    y = merge_heads(split_heads(jnp.asarray(x), 3))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_conv1d_same_im2col_matches_lax_and_torch(rng):
    """The im2col lowering (faster backward on TPU; BENCHMARKS.md round
    9) must match conv1d_same and the torch Conv1d on values AND on
    gradients — it is a relayout, not a different op."""
    from vq_vae_transformer_arc_welding_tpu.ops.conv import (
        conv1d_same_im2col)
    b, l, ci, co = 2, 16, 8, 8
    x = rng.standard_normal((b, l, ci)).astype(np.float32)
    conv = torch.nn.Conv1d(ci, co, kernel_size=3, stride=1, padding=1)
    ref = conv(torch.tensor(x).permute(0, 2, 1)).detach().numpy()
    w = jnp.asarray(conv.weight.detach().numpy())
    bias = jnp.asarray(conv.bias.detach().numpy())
    ours = np.asarray(conv1d_same_im2col(jnp.asarray(x), w, bias))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)

    # gradient equivalence vs the lax.conv path (same loss surface)
    def loss(fn, xx, ww):
        return jnp.sum(fn(xx, ww, bias) ** 2)

    g_lax = jax.grad(loss, argnums=(1, 2))(conv1d_same, jnp.asarray(x), w)
    g_im2 = jax.grad(loss, argnums=(1, 2))(conv1d_same_im2col,
                                           jnp.asarray(x), w)
    for a_, b_ in zip(g_lax, g_im2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_vqvae_conv_impl_im2col_matches_lax(rng):
    """Whole-model check: conv_impl='im2col' reproduces the default
    decoder path's loss and gradients to float tolerance."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    kw = dict(hidden_dim=32, input_dim=2, num_embeddings=16,
              embedding_dim=8, n_resblocks=2, learning_rate=1e-3,
              dropout_p=0.0, batch_norm=False)
    m_lax = VQVAEPatch(**kw)
    m_im2 = VQVAEPatch(**kw, conv_impl="im2col")
    params, state = m_lax.init(0)
    x = jnp.asarray(rng.standard_normal((4, 200, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    (l1, _), g1 = jax.value_and_grad(m_lax.loss_fn, has_aux=True)(
        params, state, x, train=True, rng=key)
    (l2, _), g2 = jax.value_and_grad(m_im2.loss_fn, has_aux=True)(
        params, state, x, train=True, rng=key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)
