"""TS2Vec dilated-conv encoder, JAX-native.

Capability parity with the reference's vendored TS2Vec encoder
(model/ts2vec/encoder.py, dilated_conv.py): input Linear -> random
timestamp masking (binomial/continuous/... modes) -> a stack of
residual dilated conv blocks (dilation 2^i, GELU-conv-GELU-conv +
projector on width change / final block) -> representation dropout.
NaN timestamps are zeroed and force-masked exactly like the reference
(:41-66). Convs run in NHC layout via lax.conv_general_dilated with
rhs_dilation (XLA lowers them onto the MXU); the even-receptive-field
trim of SamePadConv (dilated_conv.py:17-23) is reproduced by slicing.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.initializers import torch_linear_bias, torch_linear_weight
from ..utils.random import dropout


def _conv_init(key, out_ch, in_ch, k):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k)
    w = jax.random.uniform(kw, (out_ch, in_ch, k), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_ch,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def same_pad_conv(x, p, dilation: int):
    """x: (B, T, I); p: torch-layout weight (O, I, k). 'same' output
    length with receptive-field trim for even fields."""
    k = p["w"].shape[-1]
    receptive = (k - 1) * dilation + 1
    pad = receptive // 2
    y = jax.lax.conv_general_dilated(
        x, jnp.transpose(p["w"], (2, 1, 0)), window_strides=(1,),
        padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32) + p["b"]
    if receptive % 2 == 0:
        y = y[:, :-1]
    return y


def conv_block_apply(x, p, dilation: int):
    residual = x if p.get("projector") is None else same_pad_conv(
        x, p["projector"], 1)
    h = jax.nn.gelu(x, approximate=False)
    h = same_pad_conv(h, p["conv1"], dilation)
    h = jax.nn.gelu(h, approximate=False)
    h = same_pad_conv(h, p["conv2"], dilation)
    return h + residual


def generate_binomial_mask(key, b, t, p=0.5):
    return jax.random.bernoulli(key, p, (b, t))


def generate_continuous_mask(key, b, t, n=5, l=0.1):
    """n random spans of length l masked False per row (reference
    encoder.py:7-21), vectorized over rows."""
    if isinstance(n, float):
        n = int(n * t)
    n = max(min(n, t // 2), 1)
    if isinstance(l, float):
        l = int(l * t)
    l = max(l, 1)
    starts = jax.random.randint(key, (b, n), 0, t - l + 1)
    pos = jnp.arange(t)[None, None, :]
    in_span = (pos >= starts[..., None]) & (pos < starts[..., None] + l)
    return ~in_span.any(axis=1)


def ts_encoder_init(key, input_dims: int, output_dims: int = 320,
                    hidden_dims: int = 64, depth: int = 10):
    k_fc, key = jax.random.split(key)
    params = {
        "input_fc": {
            "w": torch_linear_weight(k_fc, input_dims, hidden_dims),
            "b": torch_linear_bias(jax.random.fold_in(k_fc, 1), input_dims,
                                   hidden_dims)},
        "blocks": [],
    }
    channels = [hidden_dims] * depth + [output_dims]
    in_ch = hidden_dims
    for i, out_ch in enumerate(channels):
        kb = jax.random.fold_in(key, i)
        k1, k2, k3 = jax.random.split(kb, 3)
        block = {"conv1": _conv_init(k1, out_ch, in_ch, 3),
                 "conv2": _conv_init(k2, out_ch, out_ch, 3),
                 "projector": (_conv_init(k3, out_ch, in_ch, 1)
                               if (in_ch != out_ch or i == len(channels) - 1)
                               else None)}
        params["blocks"].append(block)
        in_ch = out_ch
    return params


def ts_encoder_apply(params, x, *, mask="all_true", train=False, rng=None,
                     repr_dropout_p: float = 0.1):
    """x: (B, T, input_dims) possibly containing NaNs. mask: mode
    string or a (B, T) boolean array. Returns (B, T, output_dims)."""
    b, t, _ = x.shape
    nan_mask = ~jnp.isnan(x).any(axis=-1)            # (B, T)
    x = jnp.where(nan_mask[..., None], x, 0.0)
    h = jnp.dot(x, params["input_fc"]["w"],
                preferred_element_type=jnp.float32) + params["input_fc"]["b"]

    if isinstance(mask, str) and mask == "auto":
        mask = "binomial" if train else "all_true"
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_mask, k_drop = jax.random.split(rng)
    if isinstance(mask, str):
        if mask == "binomial":
            m = generate_binomial_mask(k_mask, b, t)
        elif mask == "continuous":
            m = generate_continuous_mask(k_mask, b, t)
        elif mask == "all_true":
            m = jnp.ones((b, t), bool)
        elif mask == "all_false":
            m = jnp.zeros((b, t), bool)
        elif mask == "mask_last":
            m = jnp.ones((b, t), bool).at[:, -1].set(False)
        else:
            raise ValueError(f"unknown mask mode {mask}")
    else:
        m = mask
    m = m & nan_mask
    h = jnp.where(m[..., None], h, 0.0)

    for i, blk in enumerate(params["blocks"]):
        h = conv_block_apply(h, blk, dilation=2 ** i)
    return dropout(k_drop, h, repr_dropout_p, train)
