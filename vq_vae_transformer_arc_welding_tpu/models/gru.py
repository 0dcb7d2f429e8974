"""GRU binary classifier (capability parity: reference model/gru.py:10-51).

Reshape to (B, -1, in_dim) -> stacked GRU (ops/gru.py lax.scan cells,
zero-init hidden) -> last timestep -> Dropout -> Linear head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.gru import gru_forward
from ..utils.random import dropout
from .base import Module
from .initializers import gru_params, torch_linear_bias, torch_linear_weight


class GRU(Module):
    def __init__(self, input_size: int = 1, in_dim: int = 3, output_size: int = 1,
                 hidden_sizes: int = 64, n_hidden_layers: int = 2,
                 dropout_p: float = 0.2, learning_rate: float = 1e-3,
                 model_id: str = ""):
        self.input_size = input_size
        self.in_dim = in_dim
        self.output_size = output_size
        self.hidden_sizes = hidden_sizes
        self.n_hidden_layers = n_hidden_layers
        self.dropout_p = dropout_p
        self.learning_rate = learning_rate
        self.model_id = model_id
        self.hparams = dict(input_size=input_size, in_dim=in_dim,
                            output_size=output_size, hidden_sizes=hidden_sizes,
                            n_hidden_layers=n_hidden_layers, dropout_p=dropout_p,
                            learning_rate=learning_rate, model_id=model_id)

    def init(self, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, self.n_hidden_layers + 1)
        layers = [gru_params(ks[i],
                             self.in_dim if i == 0 else self.hidden_sizes,
                             self.hidden_sizes)
                  for i in range(self.n_hidden_layers)]
        kw, kb = jax.random.split(ks[-1])
        params = {
            "gru": layers,
            "head": {"w": torch_linear_weight(kw, self.hidden_sizes,
                                              self.output_size),
                     "b": torch_linear_bias(kb, self.hidden_sizes,
                                            self.output_size)},
        }
        return params, {}

    def apply(self, params, state, x, *, train=False, rng=None):
        x = x.reshape(x.shape[0], -1, self.in_dim)
        out, _ = gru_forward(x, params["gru"])
        h = out[:, -1, :]
        h = dropout(rng, h, self.dropout_p, train)
        logits = jnp.dot(h, params["head"]["w"],
                         preferred_element_type=jnp.float32) + params["head"]["b"]
        return logits, state
