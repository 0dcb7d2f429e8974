"""Token-id MLP classifier (parity: reference model/mlp_embedding.py:11-42).

nn.Embedding(256, 16) over codebook token ids, flattened into the same
Linear+BN+LeakyReLU stack as MLP. Pairs with the `classification_ids`
dataset task; an orphan in the reference (no entry-script caller) kept
for inventory parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.activations import leaky_relu
from ..ops.norm import BatchNormState, batch_norm_apply
from ..utils.random import dropout
from .base import Module
from .initializers import torch_linear_bias, torch_linear_weight

EMBED_DIM = 16
VOCAB = 256


class MLPEmbedding(Module):
    def __init__(self, input_size: int, output_size: int, in_dim: int,
                 hidden_sizes: int, n_hidden_layers: int = 4,
                 dropout_p: float = 0.1, learning_rate: float = 1e-3,
                 model_id: str = ""):
        self.input_size = input_size
        self.output_size = output_size
        self.in_dim = in_dim
        self.hidden_sizes = hidden_sizes
        self.n_hidden_layers = n_hidden_layers
        self.dropout_p = dropout_p
        self.learning_rate = learning_rate
        self.model_id = model_id
        self.hparams = dict(input_size=input_size, output_size=output_size,
                            in_dim=in_dim, hidden_sizes=hidden_sizes,
                            n_hidden_layers=n_hidden_layers, dropout_p=dropout_p,
                            learning_rate=learning_rate, model_id=model_id)

    def init(self, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        k_emb, key = jax.random.split(key)
        h = self.hidden_sizes
        dims = ([EMBED_DIM * self.in_dim * self.input_size]
                + [h] * (self.n_hidden_layers + 1))
        layers, bn = [], []
        ks = jax.random.split(key, len(dims))
        for i in range(len(dims) - 1):
            kw, kb = jax.random.split(ks[i])
            layers.append({
                "w": torch_linear_weight(kw, dims[i], dims[i + 1]),
                "b": torch_linear_bias(kb, dims[i], dims[i + 1]),
                "bn_scale": jnp.ones((dims[i + 1],)),
                "bn_bias": jnp.zeros((dims[i + 1],)),
            })
            bn.append(BatchNormState.create(dims[i + 1]))
        kw, kb = jax.random.split(ks[-1])
        params = {
            "embedding": jax.random.normal(k_emb, (VOCAB, EMBED_DIM)),
            "layers": layers,
            "head": {"w": torch_linear_weight(kw, h, self.output_size),
                     "b": torch_linear_bias(kb, h, self.output_size)},
        }
        return params, {"bn": bn}

    def apply(self, params, state, x_ids, *, train=False, rng=None):
        x = jnp.take(params["embedding"], x_ids, axis=0)
        x = x.reshape(x.shape[0], -1)
        new_bn = []
        for p, bn in zip(params["layers"], state["bn"]):
            x = jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]
            x, s = batch_norm_apply(x, p["bn_scale"], p["bn_bias"], bn, train=train)
            new_bn.append(s)
            x = leaky_relu(x)
        x = dropout(rng, x, self.dropout_p, train)
        logits = jnp.dot(x, params["head"]["w"],
                         preferred_element_type=jnp.float32) + params["head"]["b"]
        return logits, {"bn": new_bn}
