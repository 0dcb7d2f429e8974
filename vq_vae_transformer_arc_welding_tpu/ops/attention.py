"""Causal multi-head self-attention.

XLA path with exact reference semantics (model/transformer_block.py:40-63:
fused qkv projection, 1/sqrt(head_dim) scaling, additive -inf causal mask,
softmax in f32, optional attention/residual dropout). Sequences here are
short (<=321 tokens, SURVEY.md §5 "long-context: absent"), so the full
T x T score tile fits comfortably in VMEM; `ops/pallas_attn.py` provides
a fused flash kernel for the capability headroom, selected via
`attention_impl`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.random import dropout


def split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, c = x.shape
    return jnp.transpose(x.reshape(b, t, n_head, c // n_head), (0, 2, 1, 3))


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * d)


def causal_attention_core(q, k, v, *, attn_dropout_p: float = 0.0,
                          train: bool = False, rng=None):
    """q,k,v: (B, H, T, D). Returns (B, H, T, D)."""
    d = q.shape[-1]
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    t = q.shape[2]
    causal = jnp.tril(jnp.ones((t, t), bool))
    att = jnp.where(causal, att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    if train and attn_dropout_p > 0.0:
        att = dropout(rng, att, attn_dropout_p, train)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(att.dtype),
                      preferred_element_type=jnp.float32)


def causal_self_attention(x, params, *, n_head: int, attn_dropout_p: float = 0.0,
                          resid_dropout_p: float = 0.1, train: bool = False,
                          rng=None, impl: str = "xla"):
    """Full attention layer: qkv proj -> core -> output proj.

    params: c_attn_w (C, 3C), c_attn_b (3C,), c_proj_w (C, C), c_proj_b (C,)
    (torch Linear weights stored transposed for row-major x @ W).
    """
    # projections follow the activation dtype (bf16 serving keeps HBM
    # traffic half-width); score math stays f32 inside the core
    acc = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    qkv = jnp.dot(x, params["c_attn_w"],
                  preferred_element_type=acc) + params["c_attn_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, n_head) for t in (q, k, v))

    if rng is not None:
        rng_att, rng_res = jax.random.split(rng)
    else:
        rng_att = rng_res = None

    use_pallas = impl == "pallas"
    if use_pallas and train and attn_dropout_p > 0.0:
        # the fused kernel has no dropout; fall back rather than
        # silently dropping regularization
        use_pallas = False
    if use_pallas:
        from .pallas_attn import flash_causal_attention
        y = flash_causal_attention(q, k, v)
    else:
        y = causal_attention_core(q, k, v, attn_dropout_p=attn_dropout_p,
                                  train=train, rng=rng_att).astype(acc)
    y = merge_heads(y)
    y = jnp.dot(y, params["c_proj_w"],
                preferred_element_type=acc) + params["c_proj_b"]
    return dropout(rng_res, y, resid_dropout_p, train)
