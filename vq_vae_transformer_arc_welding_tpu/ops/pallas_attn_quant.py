"""Pallas TPU kernel: fused causal attention + int8 output quantization
for the calibrated-int8 serving path.

Round-1 lesson (models/quantized.py, BENCHMARKS.md "Kernel notes"): a
Pallas attention kernel that merely replaces the XLA attention LOSES
end-to-end because XLA fuses the surrounding quant/dequant elementwise
ops into its attention, and a kernel boundary breaks that. Round-2
measurement (scripts/bench_int8_variants.py): the f32 attention is
~55% of the int8 transformer's time — it is HBM-bound on the
materialized (B, H, T, T) score tensors.

This kernel removes both problems at once. Per batch element (grid over
B) it consumes the fused qkv projection output (B, T, 3C) — no
(B,H,T,D) transposes, XLA fuses the int8 qkv matmul's dequant+bias into
its epilogue — keeps every (T, T) score tile in VMEM, and writes the
attention output ALREADY QUANTIZED to int8 with the next (proj) matmul's
calibrated activation scale. HBM traffic per block drops from
~3x(B,H,T,T) f32 + y f32 to qkv-in + int8-out.

Serving only (no dropout, no grad); the training path keeps
ops/attention.py. Numerics: identical label decisions vs the XLA int8
path (tests/test_quantized.py::test_fused_attn_quant*).

Reference parity: computes exactly the reference attention math
(transformer_block.py:40-63) — 1/sqrt(D) scaling, causal mask, softmax
— followed by the same activation quantization qdot would apply.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, qkv_ref, o_ref, *, n_head: int, d_head: int,
            t_valid: int, sm_scale: float):
    c = n_head * d_head
    qkv = qkv_ref[0]                                   # (Tp, 3C)
    tp = qkv.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = (col <= row) & (col < t_valid)
    y_scale = scale_ref[0]

    outs = []
    for h in range(n_head):
        q = qkv[:, h * d_head:(h + 1) * d_head]
        k = qkv[:, c + h * d_head:c + (h + 1) * d_head]
        v = qkv[:, 2 * c + h * d_head:2 * c + (h + 1) * d_head]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (Tp, Tp)
        s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        outs.append(o)
    y = jnp.concatenate(outs, axis=1)                  # (Tp, C)
    o_ref[0] = jnp.clip(jnp.round(y * y_scale), -127, 127).astype(jnp.int8)


def _qkv_kernel(scales_ref, x_ref, w_ref, deq_ref, bias_ref, o_ref, *,
                n_head: int, d_head: int, t_valid: int, sm_scale: float,
                block_rows: int | None = None):
    """_kernel plus the int8 qkv projection in front: the (Tp, 3C) f32
    qkv tensor lives only in VMEM, never in HBM.

    block_rows: when set, score/PV matmuls are tiled over causal row
    blocks and the fully-masked upper-right column blocks are skipped
    entirely — rows in block r only ever attend to columns < (r+1)*br,
    so the skipped contributions are exact zeros. Cuts the dominant
    score-matmul FLOPs by ~(n_rb-1)/(2*n_rb)."""
    c = n_head * d_head
    x = x_ref[0]                                       # (Tp, C) f32
    x_scale = scales_ref[0]
    y_scale = scales_ref[1]
    x8 = jnp.clip(jnp.round(x * x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # (Tp, 3C) int32
    qkv = acc.astype(jnp.float32) * deq_ref[0] + bias_ref[0]

    tp = qkv.shape[0]
    br = tp if block_rows is None else block_rows
    n_rb = tp // br
    masks = []
    for r in range(n_rb):
        ext = (r + 1) * br
        row = jax.lax.broadcasted_iota(jnp.int32, (br, ext), 0) + r * br
        col = jax.lax.broadcasted_iota(jnp.int32, (br, ext), 1)
        masks.append((col <= row) & (col < t_valid))

    outs = []
    for h in range(n_head):
        q = qkv[:, h * d_head:(h + 1) * d_head]
        k = qkv[:, c + h * d_head:c + (h + 1) * d_head]
        v = qkv[:, 2 * c + h * d_head:2 * c + (h + 1) * d_head]
        blocks = []
        for r in range(n_rb):
            ext = (r + 1) * br
            s = jax.lax.dot_general(
                q[r * br:ext], k[:ext], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(masks[r], s, -jnp.inf)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            blocks.append(jax.lax.dot_general(
                p, v[:ext], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l)
        outs.append(blocks[0] if n_rb == 1
                    else jnp.concatenate(blocks, axis=0))
    y = jnp.concatenate(outs, axis=1)                  # (Tp, C)
    o_ref[0] = jnp.clip(jnp.round(y * y_scale), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "interpret", "block_rows"))
def fused_qkv_attention_quant(h, w_qkv_int8, deq, bias, x_scale, y_scale, *,
                              n_head: int, interpret: bool | None = None,
                              block_rows: int | None = None):
    """Fully fused int8 qkv-projection + causal attention + int8 output
    quantization.

    h: (B, T, C) f32 — the ln1 output (the int8 c_attn matmul's input).
    w_qkv_int8: (C, 3C) int8 weights; deq: (3C,) f32 = w_scale/x_scale;
    bias: (3C,) f32; x_scale: () f32 calibrated 127/absmax(h);
    y_scale: () f32 — the proj matmul's calibrated activation scale.
    Returns (B, T, C) int8 exactly as fused_causal_attention_quant.

    Numerics are bit-identical to qdot(h, c_attn) followed by
    fused_causal_attention_quant (same round/clip, same int32
    accumulation, same dequant multiply-add). The win is HBM traffic:
    the (B, T, 3C) f32 qkv tensor — 96 MB per block at the bench shape
    — is never written or re-read; per block the path now moves only
    the f32 ln1 input in and int8 attention output out."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = h.shape
    c3 = w_qkv_int8.shape[1]
    d_head = c // n_head
    sm_scale = 1.0 / math.sqrt(d_head)

    if block_rows is not None:
        if block_rows % 8:
            raise ValueError("block_rows must be a multiple of 8 (sublane)")
        tp = -(-t // block_rows) * block_rows
    else:
        tp = -(-t // 8) * 8
    if tp != t:
        h = jnp.pad(h, ((0, 0), (0, tp - t), (0, 0)))
    scales = jnp.stack([jnp.asarray(x_scale, jnp.float32).reshape(()),
                        jnp.asarray(y_scale, jnp.float32).reshape(())])
    deq = jnp.asarray(deq, jnp.float32).reshape(1, c3)
    bias = jnp.asarray(bias, jnp.float32).reshape(1, c3)

    out = pl.pallas_call(
        functools.partial(_qkv_kernel, n_head=n_head, d_head=d_head,
                          t_valid=t, sm_scale=sm_scale,
                          block_rows=block_rows),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), jnp.int8),
        interpret=interpret,
    )(scales, h, w_qkv_int8, deq, bias)
    return out[:, :t] if tp != t else out


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_causal_attention_quant(qkv, y_scale, *, n_head: int,
                                 interpret: bool | None = None):
    """qkv: (B, T, 3C) f32 fused projection output (bias added).
    y_scale: () or (1,) f32 — the proj matmul's calibrated activation
    quantization scale (127/absmax).  Returns (B, T, C) int8: the
    merged attention output, quantized for the int8 proj matmul.

    Tuning notes (measured at the bench shape, b=48 T=321 d512):
    one sample per grid program is the sweet spot. Grouping samples
    per program OOMs scoped VMEM (Mosaic keeps every unrolled head's
    score tile live); bf16 score matmuls gain nothing (this device
    runs f32/bf16 MXU at the same measured rate); feeding bf16 qkv
    forces a layout conversion that costs 3x. See BENCHMARKS.md."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c3 = qkv.shape
    c = c3 // 3
    d_head = c // n_head
    sm_scale = 1.0 / math.sqrt(d_head)

    tp = -(-t // 8) * 8  # sublane-align the sequence dim
    if tp != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))
    y_scale = jnp.asarray(y_scale, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, n_head=n_head, d_head=d_head,
                          t_valid=t, sm_scale=sm_scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), jnp.int8),
        interpret=interpret,
    )(y_scale, qkv)
    return out[:, :t] if tp != t else out
