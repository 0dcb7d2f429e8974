"""Pallas TPU kernel: fused int8 transformer MLP for calibrated serving.

The block MLP (quantize -> int8 fc C->4C -> dequant+bias -> tanh-GELU
-> quantize -> int8 proj 4C->C -> dequant+bias) is HBM-bound in the XLA
path: the (B, T, 4C) fc intermediate (126 MB at the bench shape) is
written and re-read around the GELU, plus separate int8 quantize
passes. This kernel runs the whole chain per batch element with the
intermediate living in VMEM; per grid step the only HBM traffic is the
(T, C) input/output rows — the int8 weight blocks use constant index
maps so Mosaic keeps them resident across grid steps.

Serving only (no dropout in the reference MLP path anyway,
transformer_block.py:79-82 applies dropout after c_proj — which the
reference never enables at eval). Math identical to
models/quantized.py's qdot chain (tests/test_quantized.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import new_gelu as _new_gelu


def _kernel(scales_ref, h_ref, wfc_ref, bfc_ref, sfc_ref, wmp_ref, bmp_ref,
            smp_ref, o_ref):
    s_fc = scales_ref[0]     # 127/absmax of the fc input
    s_mp = scales_ref[1]     # 127/absmax of the gelu output
    h = h_ref[0]                                        # (Tp, C) f32
    h8 = jnp.clip(jnp.round(h * s_fc), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(
        h8, wfc_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    o = o * (sfc_ref[0] / s_fc) + bfc_ref[0]            # (Tp, 4C)
    o = _new_gelu(o)
    o8 = jnp.clip(jnp.round(o * s_mp), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        o8, wmp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    o_ref[0] = y * (smp_ref[0] / s_mp) + bmp_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mlp_quant(h, fc_w8, fc_scale, fc_bias, fc_act_scale,
                    mp_w8, mp_scale, mp_bias, mp_act_scale,
                    *, interpret: bool | None = None):
    """h: (B, T, C) f32 post-LN activations. Weights per
    models/quantized.QLinear: w8 (in, out) int8, scale (out,) f32 dequant,
    bias (out,), act_scale () = 127/absmax calibrated. Returns the MLP
    output (B, T, C) f32 (residual add stays outside)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = h.shape
    c4 = fc_w8.shape[1]

    tp = -(-t // 8) * 8
    if tp != t:
        h = jnp.pad(h, ((0, 0), (0, tp - t), (0, 0)))
    scales = jnp.stack([jnp.asarray(fc_act_scale, jnp.float32).reshape(()),
                        jnp.asarray(mp_act_scale, jnp.float32).reshape(())])

    const = lambda i: (0, 0)  # noqa: E731 — weight blocks, VMEM-resident
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), jnp.float32),
        interpret=interpret,
    )(scales, h, fc_w8, fc_bias.reshape(1, -1), fc_scale.reshape(1, -1),
      mp_w8, mp_bias.reshape(1, -1), mp_scale.reshape(1, -1))
    return out[:, :t] if tp != t else out
