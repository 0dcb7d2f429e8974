"""Activation functions matching the reference's exact math.

The reference mixes two GELU flavors (tanh-approx in transformer blocks,
exact-erf in the class head / conv stacks) — we keep both distinct so
logits match. Reference: model/transformer_block.py:8-15 (NewGELU),
torch.nn.GELU default elsewhere.
"""
import math

import jax
import jax.numpy as jnp


def new_gelu(x):
    """GPT-2 tanh-approximate GELU (reference model/transformer_block.py:14-15).

    x*x*x (not x**3) keeps the op free of integer_pow so the SAME
    function is usable inside Pallas TPU kernel bodies (Mosaic lowers
    mul but not integer_pow); the value is bit-identical."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x * x * x)))


def gelu(x):
    """Exact (erf) GELU — torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x, negative_slope: float = 0.01):
    """torch.nn.LeakyReLU default slope 0.01 (reference model/mlp.py:19)."""
    return jnp.where(x >= 0, x, negative_slope * x)
