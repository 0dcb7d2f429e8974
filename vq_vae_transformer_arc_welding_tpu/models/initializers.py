"""Weight initializers replicating torch layer defaults.

Quality parity (F1 within 0.5 pts, BASELINE.md) depends on matching the
reference's init *distributions* — torch's kaiming-uniform Linear/Conv
defaults, xavier-uniform conv override (model/autencoder_lightning_base.py:70-78),
GRU uniform(-1/sqrt(H), 1/sqrt(H)), and GPT-2 normal(0, 0.02)
(model/transformer_decoder.py:53-62).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_weight(key, fan_in: int, fan_out: int, transposed: bool = True):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    Returns (fan_in, fan_out) when transposed (our x @ W layout), else
    torch's (fan_out, fan_in)."""
    bound = 1.0 / math.sqrt(fan_in)
    shape = (fan_in, fan_out) if transposed else (fan_out, fan_in)
    return uniform(key, shape, bound)


def torch_linear_bias(key, fan_in: int, fan_out: int):
    bound = 1.0 / math.sqrt(fan_in)
    return uniform(key, (fan_out,), bound)


def torch_conv1d_default(key, out_ch: int, in_ch: int, k: int):
    """torch.nn.Conv1d default weight+bias, torch layout (O, I, k)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k)
    return uniform(kw, (out_ch, in_ch, k), bound), uniform(kb, (out_ch,), bound)


def xavier_conv1d(key, out_ch: int, in_ch: int, k: int):
    """xavier_uniform weight + zero bias, torch layout (O, I, k).

    Applied to every Conv* in the VQ-VAE via Autoencoder.weights_init
    (reference model/autencoder_lightning_base.py:70-78); torch fans for
    conv are in_ch*k / out_ch*k."""
    bound = math.sqrt(6.0 / (in_ch * k + out_ch * k))
    return uniform(key, (out_ch, in_ch, k), bound), jnp.zeros((out_ch,))


def xavier_conv_transpose1d(key, in_ch: int, out_ch: int, k: int):
    """xavier_uniform for ConvTranspose1d, torch layout (I, O, k).

    torch computes fans on the raw (I, O, k) tensor: fan_in = O*k,
    fan_out = I*k — note the swap vs Conv1d."""
    bound = math.sqrt(6.0 / (out_ch * k + in_ch * k))
    return uniform(key, (in_ch, out_ch, k), bound), jnp.zeros((out_ch,))


def gpt2_linear(key, fan_in: int, fan_out: int, std: float = 0.02):
    """normal(0, std) weight (transposed layout) + zero bias."""
    w = jax.random.normal(key, (fan_in, fan_out)) * std
    return w, jnp.zeros((fan_out,))


def gpt2_embedding(key, num: int, dim: int, std: float = 0.02):
    return jax.random.normal(key, (num, dim)) * std


def gru_params(key, input_size: int, hidden: int):
    """One torch GRU layer: every tensor U(+-1/sqrt(hidden))."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform(ks[0], (3 * hidden, input_size), bound),
        "w_hh": uniform(ks[1], (3 * hidden, hidden), bound),
        "b_ih": uniform(ks[2], (3 * hidden,), bound),
        "b_hh": uniform(ks[3], (3 * hidden,), bound),
    }
