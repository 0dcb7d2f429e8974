"""TS2Vec hierarchical contrastive loss (parity: model/ts2vec/losses.py).

Instance + temporal contrastive terms, alternated with time max-pool
halving until one timestep remains. The reference's tril/triu logits
construction (losses.py:30-35) — dropping the diagonal by summing a
shifted lower and upper triangle — is reproduced exactly. Shapes are
static per pooling level, so the python while-loop unrolls into a
fixed jit graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _off_diagonal_logits(sim):
    """(..., N, N) similarity -> (..., N, N-1) logits with the diagonal
    removed via tril/triu shift (reference :30-31, :44-45)."""
    n = sim.shape[-1]
    low = jnp.tril(sim, k=-1)[..., :, :-1]
    up = jnp.triu(sim, k=1)[..., :, 1:]
    return low + up


def instance_contrastive_loss(z1, z2):
    b, t = z1.shape[0], z1.shape[1]
    if b == 1:
        return jnp.asarray(0.0, z1.dtype)
    z = jnp.concatenate([z1, z2], axis=0)          # (2B, T, C)
    z = jnp.swapaxes(z, 0, 1)                      # (T, 2B, C)
    sim = jnp.einsum("tic,tjc->tij", z, z,
                     preferred_element_type=jnp.float32)
    logits = -jax.nn.log_softmax(_off_diagonal_logits(sim), axis=-1)
    i = jnp.arange(b)
    return (logits[:, i, b + i - 1].mean() + logits[:, b + i, i].mean()) / 2


def temporal_contrastive_loss(z1, z2):
    t = z1.shape[1]
    if t == 1:
        return jnp.asarray(0.0, z1.dtype)
    z = jnp.concatenate([z1, z2], axis=1)          # (B, 2T, C)
    sim = jnp.einsum("bic,bjc->bij", z, z,
                     preferred_element_type=jnp.float32)
    logits = -jax.nn.log_softmax(_off_diagonal_logits(sim), axis=-1)
    idx = jnp.arange(t)
    return (logits[:, idx, t + idx - 1].mean()
            + logits[:, t + idx, idx].mean()) / 2


def _max_pool_halve(z):
    """torch max_pool1d(k=2) over time: stride 2, drop odd tail."""
    t = z.shape[1]
    t2 = t // 2
    z = z[:, :t2 * 2].reshape(z.shape[0], t2, 2, z.shape[-1])
    return z.max(axis=2)


def hierarchical_contrastive_loss(z1, z2, alpha: float = 0.5,
                                  temporal_unit: int = 0):
    loss = jnp.asarray(0.0, jnp.float32)
    d = 0
    while z1.shape[1] > 1:
        if alpha != 0:
            loss = loss + alpha * instance_contrastive_loss(z1, z2)
        if d >= temporal_unit and 1 - alpha != 0:
            loss = loss + (1 - alpha) * temporal_contrastive_loss(z1, z2)
        d += 1
        z1 = _max_pool_halve(z1)
        z2 = _max_pool_halve(z2)
    if z1.shape[1] == 1:
        if alpha != 0:
            loss = loss + alpha * instance_contrastive_loss(z1, z2)
        d += 1
    return loss / d
