"""Pallas TPU kernel: fused causal attention.

At the framework's sequence lengths (<=321 tokens + headroom) a whole
(T, T) score tile fits in VMEM, so instead of classic blockwise flash
attention we fuse the entire per-(batch, head) attention —
QK^T (MXU) -> causal mask -> stable softmax (VPU) -> PV (MXU) — in one
kernel invocation per (B*H) grid step. This removes the HBM
materialization of the (B, H, T, T) score tensor that the XLA path
(ops/attention.py, reference transformer_block.py:52-57) writes and
re-reads. Numerics match the XLA core to f32 tolerance (tests).

Backward pass: custom_vjp recomputes attention with the XLA core —
one extra forward's FLOPs, standard flash-style rematerialization.
Sequence lengths are padded to a multiple of 8 sublanes; padded key
columns are masked to -inf, padded query rows sliced off.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


GROUP = 4  # (batch, head) pairs per grid program — amortizes program
           # overhead; G=4 measured 37% faster than the XLA path at the
           # bench shape (48x8x321x64), G=8 spills VMEM


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int, scale: float,
                 group: int):
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)          # (Tp, D)
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (Tp, Tp)
        tp = s.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        mask = (col <= row) & (col < t_valid)
        s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        o_ref[g] = o.astype(o_ref.dtype)


def _forward(q, k, v, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    tp = -(-t // 8) * 8
    pad = tp - t
    bh = b * h
    group = GROUP if bh % GROUP == 0 else 1

    def prep(x):
        x = x.reshape(bh, t, d)
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    qp, kp, vp = prep(q), prep(k), prep(v)
    spec = pl.BlockSpec((group, tp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_valid=t, scale=scale, group=group),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, tp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tp * tp * d,
            bytes_accessed=4 * bh * tp * d * 4,
            transcendentals=bh * tp * tp),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t].reshape(b, h, t, d)


@jax.custom_vjp
def flash_causal_attention(q, k, v):
    """q, k, v: (B, H, T, D) -> (B, H, T, D). No dropout (the reference
    default att_dropout=0.0; the XLA path covers nonzero dropout)."""
    return _forward(q, k, v)


def _fwd(q, k, v):
    return _forward(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res

    def xla_core(q, k, v):
        from .attention import causal_attention_core
        return causal_attention_core(q, k, v)

    _, vjp = jax.vjp(xla_core, q, k, v)
    return vjp(g)


flash_causal_attention.defvjp(_fwd, _bwd)
