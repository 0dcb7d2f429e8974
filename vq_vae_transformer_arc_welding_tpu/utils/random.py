"""Stateless randomness helpers (torch-equivalent semantics, JAX keys)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng, x, p: float, train: bool):
    """Inverted dropout matching torch.nn.Dropout (scale 1/(1-p) at train)."""
    if not train or p <= 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
