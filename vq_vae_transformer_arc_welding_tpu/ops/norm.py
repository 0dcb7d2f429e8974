"""Normalization layers with torch-equivalent semantics under jit.

BatchNorm running statistics are explicit state (a `BatchNormState`
pytree) threaded through `apply` — no mutation, so everything stays
inside a single compiled step and works under pjit/DP, where the
reference relied on torch module mutation (SURVEY.md §7 "BatchNorm
semantics under jit/DP").
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BatchNormState(NamedTuple):
    mean: jnp.ndarray  # (C,)
    var: jnp.ndarray   # (C,)

    @staticmethod
    def create(num_features: int, dtype=jnp.float32) -> "BatchNormState":
        return BatchNormState(jnp.zeros((num_features,), dtype),
                              jnp.ones((num_features,), dtype))


def batch_norm_apply(x, scale, bias, state: BatchNormState, *, train: bool,
                     momentum: float = 0.1, eps: float = 1e-5):
    """torch.nn.BatchNorm1d semantics, channels-last.

    x: (..., C); stats reduce over all leading axes. Training uses the
    biased batch variance for normalization but stores the unbiased
    variance in the running estimate, with torch's momentum convention
    running = (1-m)*running + m*batch (defaults m=0.1, eps=1e-5).
    Returns (y, new_state).
    """
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = BatchNormState(
            (1 - momentum) * state.mean + momentum * mean,
            (1 - momentum) * state.var + momentum * unbiased,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean) / jnp.sqrt(var + eps)
    return y * scale + bias, new_state


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """torch.nn.LayerNorm over the last axis (reference transformer blocks)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * scale + bias
