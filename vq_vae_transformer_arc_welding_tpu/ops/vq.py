"""Vector-quantization bottleneck (classic straight-through VQ-VAE).

Math parity with reference model/vector_quantizer.py:76-119: squared-L2
distances via the z^2 + e^2 - 2 z.e expansion in float32, first-index
argmin tie-break (torch.argmin and jnp.argmin both return the lowest
index), commitment loss with stop-gradients mirroring :107-111, and
perplexity from the code histogram (:114-115). The one-hot scatter +
matmul lookup of the reference is replaced by a direct gather — same
result, no (BP, K) one-hot materialization.

The distance+argmin is the kernel called out for Pallas fusion
(SURVEY.md §3.4); `ops/pallas_vq.py` provides that path, this module is
the XLA reference used for bit-checking codebook indices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VQOutput(NamedTuple):
    loss: jnp.ndarray        # scalar embedding (codebook+commitment) loss
    z_q: jnp.ndarray         # quantized latents, same shape as input
    perplexity: jnp.ndarray  # scalar exp(entropy of code usage)
    indices: jnp.ndarray     # (..., ) int32 codebook indices (input shape minus last dim)


def nearest_codes(z_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Argmin of squared L2 distance to each codebook row.

    z_flat: (N, D) float32; codebook: (K, D). Returns (N,) int32.
    Distances are computed with the same expansion and dtype as the
    reference so indices are bit-comparable on identical weights.
    """
    z_flat = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    d = (jnp.sum(z_flat**2, axis=1, keepdims=True)
         + jnp.sum(cb**2, axis=1)
         - 2.0 * jnp.dot(z_flat, cb.T, preferred_element_type=jnp.float32))
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def vq_lookup(indices: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Decode codebook vectors from indices (reference :121-131)."""
    return jnp.take(codebook, indices, axis=0)


def vq_quantize(z: jnp.ndarray, codebook: jnp.ndarray, beta: float = 0.25,
                *, nearest_fn=None) -> VQOutput:
    """Classic VQ forward with straight-through estimator.

    z: (..., D); codebook: (K, D). `nearest_fn` lets callers swap in the
    Pallas kernel while keeping loss/ST semantics here.
    """
    k = codebook.shape[0]
    z_flat = z.reshape(-1, z.shape[-1])
    find = nearest_fn if nearest_fn is not None else nearest_codes
    idx = find(z_flat, codebook)
    z_q = vq_lookup(idx, codebook).reshape(z.shape)

    sg = jax.lax.stop_gradient
    loss = jnp.mean((sg(z_q) - z) ** 2) + beta * jnp.mean((z_q - sg(z)) ** 2)
    z_q_st = z + sg(z_q - z)

    # perplexity over the batch's code histogram (reference :114-115)
    counts = jnp.zeros((k,), jnp.float32).at[idx].add(1.0)
    e_mean = counts / idx.shape[0]
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

    return VQOutput(loss, z_q_st, perplexity, idx.reshape(z.shape[:-1]))
