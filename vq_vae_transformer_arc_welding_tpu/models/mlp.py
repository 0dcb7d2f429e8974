"""MLP binary classifier (capability parity: reference model/mlp.py:11-41).

Flatten -> Linear+BN+LeakyReLU stack -> Dropout -> Linear head. All
dense layers are single MXU matmuls; BatchNorm state is threaded
explicitly (ops/norm.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.activations import leaky_relu
from ..ops.norm import BatchNormState, batch_norm_apply
from ..utils.random import dropout
from .base import Module
from .initializers import torch_linear_bias, torch_linear_weight


class MLP(Module):
    def __init__(self, input_size: int, output_size: int, in_dim: int,
                 hidden_sizes: int, n_hidden_layers: int = 4,
                 dropout_p: float = 0.1, learning_rate: float = 1e-3,
                 model_id: str = "", compute_dtype=None):
        self.input_size = input_size
        self.output_size = output_size
        self.in_dim = in_dim
        self.hidden_sizes = hidden_sizes
        self.n_hidden_layers = n_hidden_layers
        self.dropout_p = dropout_p
        self.learning_rate = learning_rate
        self.model_id = model_id
        # runtime option (not an hparam): bf16 matmul inputs with f32
        # accumulation; BN/activations/head output stay f32
        self.compute_dtype = compute_dtype
        self.hparams = dict(input_size=input_size, output_size=output_size,
                            in_dim=in_dim, hidden_sizes=hidden_sizes,
                            n_hidden_layers=n_hidden_layers, dropout_p=dropout_p,
                            learning_rate=learning_rate, model_id=model_id)

    def init(self, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        h = self.hidden_sizes
        dims = ([self.input_size * self.in_dim]
                + [h] * (self.n_hidden_layers + 1))
        layers = []
        state = {"bn": []}
        ks = jax.random.split(key, len(dims))
        for i in range(len(dims) - 1):
            kw, kb = jax.random.split(ks[i])
            layers.append({
                "w": torch_linear_weight(kw, dims[i], dims[i + 1]),
                "b": torch_linear_bias(kb, dims[i], dims[i + 1]),
                "bn_scale": jnp.ones((dims[i + 1],)),
                "bn_bias": jnp.zeros((dims[i + 1],)),
            })
            state["bn"].append(BatchNormState.create(dims[i + 1]))
        kw, kb = jax.random.split(ks[-1])
        params = {
            "layers": layers,
            "head": {"w": torch_linear_weight(kw, h, self.output_size),
                     "b": torch_linear_bias(kb, h, self.output_size)},
        }
        return params, state

    def apply(self, params, state, x, *, train=False, rng=None):
        cd = self.compute_dtype
        mm = ((lambda a, w: jnp.dot(a, w,
                                    preferred_element_type=jnp.float32))
              if cd is None else
              (lambda a, w: jnp.dot(a.astype(cd), w.astype(cd),
                                    preferred_element_type=jnp.float32)))
        x = x.reshape(x.shape[0], -1)
        new_bn = []
        for p, bn in zip(params["layers"], state["bn"]):
            x = mm(x, p["w"]) + p["b"]
            x, s = batch_norm_apply(x, p["bn_scale"], p["bn_bias"], bn, train=train)
            new_bn.append(s)
            x = leaky_relu(x)
        x = dropout(rng, x, self.dropout_p, train)
        logits = mm(x, params["head"]["w"]) + params["head"]["b"]
        return logits, {"bn": new_bn}
