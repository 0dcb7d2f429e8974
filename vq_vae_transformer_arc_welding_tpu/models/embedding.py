"""Embedding components (parity: reference model/embedding.py).

The transformer uses token + sinusoidal-position embedding inline
(models/transformer.py); this module exposes the standalone pieces,
including the conditional variant (LatentEmbeddingCond, reference
:27-43 — an orphan in the reference, kept for inventory parity).
"""
from __future__ import annotations

import jax.numpy as jnp

from .transformer import sinusoidal_pe


def positional_embedding(t: int, d_model: int, max_len: int = 5000):
    """(1, t, d_model) fixed sin/cos table slice (reference :6-24)."""
    return jnp.asarray(sinusoidal_pe(max_len, d_model))[None, :t]


def latent_embedding(ids, tok_table, *, max_len: int = 512):
    """Token embedding + sinusoidal PE (reference :45-59).
    ids: (B, T) int; tok_table: (vocab, d)."""
    t = ids.shape[1]
    d = tok_table.shape[1]
    return jnp.take(tok_table, ids, axis=0) + positional_embedding(
        t, d, max_len)


def latent_embedding_cond(ids, cond, tok_table, cond_table, *,
                          max_len: int = 512):
    """Token + PE + broadcast condition embedding (reference :27-43)."""
    x = latent_embedding(ids, tok_table, max_len=max_len)
    c = jnp.take(cond_table, cond, axis=0)[:, None, :]
    return x + c
