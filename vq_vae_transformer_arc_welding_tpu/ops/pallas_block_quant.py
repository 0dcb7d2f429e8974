"""Pallas TPU kernels: whole-transformer-block fusion for the
calibrated-int8 serving path.

Round-3 left the int8 residual stream crossing HBM several times per
block: ln1 reads x and writes h (f32), the fused qkv+attention kernel
reads h and writes y8 (int8), the c_proj matmul reads y8 + x and writes
x_mid, ln2+quant reads x_mid again, and the MLP residual reads it once
more.  At the bench shape each f32 (B, T, C) pass is ~52 MB, so the
stream alone moves ~250 MB/block.

These kernels pull the whole block into VMEM.  Per grid program (one
batch element) the residual row (T, C) stays f32 in VMEM while the
kernel runs:

  ln1 -> int8 qkv matmul -> per-head causal attention -> int8 c_proj
      -> residual add -> ln2 -> int8 quantize [-> int8 MLP -> residual]

`fused_attn_block_quant` stops after ln2+quantize and returns both the
f32 mid-stream (for the MLP residual) and the int8 fc input — HBM
traffic per block becomes x-in + x_mid-out + h8-out, and XLA's MLP
chain (measured faster than a Pallas MLP in isolation, BENCHMARKS.md
"Kernel notes") keeps the rest.  `fused_block_quant` also swallows the
MLP (the (T, 4C) intermediate never leaves VMEM) and returns only the
next residual stream: x-in + x-out, the floor for this layer.

Numerics: same round/clip quantization as models/quantized.py's
unfused chain, so every int8 boundary (the h8 fc input, all quantized
matmul operands) bit-matches the XLA int8 path in interpret mode.
The f32 logits are NOT bit-identical: _attn_core applies the softmax
denominator after the PV matmul ((p@V)/l) where the XLA path
normalizes p first — tested contract is label equality with ~1e-3
logit tolerance (tests/test_quantized.py::test_block_fusion_label_parity).
Serving only — no dropout (the reference disables it at eval,
transformer_block.py:79-82), no grads.

Reference parity: one kernel call computes exactly one reference
`Block.forward` (transformer_block.py:66-83) under calibrated int8.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain-jnp helpers shared with the XLA paths — same functions, so the
# interpret-mode bit-identity contract can't drift
from .activations import new_gelu as _new_gelu
from .norm import layer_norm as _ln


def _q8(x, scale):
    return jnp.clip(jnp.round(x * scale), -127, 127).astype(jnp.int8)


def _idot(a8, w8_ref):
    return jax.lax.dot_general(
        a8, w8_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _attn_core_batched(qkv, n_head, d_head, t_valid, sm_scale):
    """All heads' attention as TWO (H,)-batched dot_generals instead of
    the per-head matmul loop (Mosaic lowers batched dots on this
    toolchain). K=128 'head pairing' of score matmuls is mathematically
    unavailable — stacking two heads along the contraction SUMS their
    scores — so batching the head dim is the only leverable form;
    measured vs the loop in BENCHMARKS.md round 5."""
    c = n_head * d_head
    tp = qkv.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, tp, tp), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tp, tp), 2)
    mask = (col <= row) & (col < t_valid)
    q_all = jnp.stack([qkv[:, h * d_head:(h + 1) * d_head]
                       for h in range(n_head)])            # (H, Tp, D)
    k_all = jnp.stack([qkv[:, c + h * d_head:c + (h + 1) * d_head]
                       for h in range(n_head)])
    v_all = jnp.stack([qkv[:, 2 * c + h * d_head:2 * c + (h + 1) * d_head]
                       for h in range(n_head)])
    s = jax.lax.dot_general(q_all, k_all, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(mask, s, -jnp.inf)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p, v_all, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) / l
    return jnp.concatenate([o[h] for h in range(n_head)], axis=1)


def _attn_core(qkv, n_head, d_head, t_valid, sm_scale, int8_attn=False):
    """All-heads causal attention on a VMEM (Tp, 3C) qkv tile; returns
    the merged (Tp, C) f32 output. Same math as pallas_attn_quant.

    int8_attn additionally runs the score and probs@V matmuls on the
    int8 MXU with dynamic per-(head, tile) scales computed in VMEM (a
    cheap VPU reduction — unlike the XLA int8-attention variant C of
    scripts/bench_int8_variants.py, no HBM elementwise pass is added).
    Accuracy envelope matches variant C: 100% label agreement measured
    (BENCHMARKS.md round 2 / round 4)."""
    c = n_head * d_head
    tp = qkv.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = (col <= row) & (col < t_valid)
    if int8_attn and tp != t_valid:
        # padded rows hold ln/bias-derived garbage, not zeros — zero
        # them so they can't leak into the dynamic quantization scales
        rvalid = jax.lax.broadcasted_iota(
            jnp.int32, (tp, 1), 0) < t_valid
        qkv = jnp.where(rvalid, qkv, 0.0)
    outs = []
    for h in range(n_head):
        q = qkv[:, h * d_head:(h + 1) * d_head]
        k = qkv[:, c + h * d_head:c + (h + 1) * d_head]
        v = qkv[:, 2 * c + h * d_head:2 * c + (h + 1) * d_head]
        if int8_attn:
            sq = 127.0 / jnp.maximum(jnp.max(jnp.abs(q)), 1e-6)
            sk = 127.0 / jnp.maximum(jnp.max(jnp.abs(k)), 1e-6)
            s = jax.lax.dot_general(
                _q8(q, sq), _q8(k, sk), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sm_scale / (sq * sk))
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mask, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if int8_attn:
            sv = 127.0 / jnp.maximum(jnp.max(jnp.abs(v)), 1e-6)
            o = jax.lax.dot_general(
                _q8(p, 127.0), _q8(v, sv), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) / (127.0 * sv)
        else:
            o = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        outs.append(o / l)
    return jnp.concatenate(outs, axis=1)


def _attn_half(x, scales, vc, v3c, w_qkv_ref, w_proj_ref, *,
               n_head, d_head, t_valid, sm_scale, int8_attn=False,
               attn_batched=None):
    """ln1 -> int8 qkv -> attention -> int8 c_proj -> residual -> ln2
    -> int8 quantize. Returns (x_mid f32, h8 int8).

    attn_batched=None (default) resolves to True unless int8_attn (the
    int8 score path needs per-head dynamic scales): the (H,)-batched
    dots are bit-identical to the loop and measured ~10% faster
    end-to-end on the transformer (BENCHMARKS.md round 5)."""
    if attn_batched is None:
        attn_batched = not int8_attn
    h = _ln(x, vc[0], vc[1])
    h8 = _q8(h, scales[0])
    qkv = _idot(h8, w_qkv_ref).astype(jnp.float32) * v3c[0] + v3c[1]
    y = (_attn_core_batched(qkv, n_head, d_head, t_valid, sm_scale)
         if attn_batched else
         _attn_core(qkv, n_head, d_head, t_valid, sm_scale, int8_attn))
    y8 = _q8(y, scales[1])
    proj = _idot(y8, w_proj_ref).astype(jnp.float32) * vc[4] + vc[5]
    x_mid = x + proj
    h2 = _ln(x_mid, vc[2], vc[3])
    return x_mid, _q8(h2, scales[2])


def _attn_block_kernel(scales_ref, x_ref, vc_ref, v3c_ref, w_qkv_ref,
                       w_proj_ref, xmid_ref, h8_ref, *, n_head, d_head,
                       t_valid, sm_scale, int8_attn, attn_batched=None):
    x_mid, h8 = _attn_half(
        x_ref[0].astype(jnp.float32), scales_ref, vc_ref[...], v3c_ref[...],
        w_qkv_ref, w_proj_ref, n_head=n_head, d_head=d_head, t_valid=t_valid,
        sm_scale=sm_scale, int8_attn=int8_attn, attn_batched=attn_batched)
    xmid_ref[0] = x_mid.astype(xmid_ref.dtype)
    h8_ref[0] = h8


def _full_block_kernel(scales_ref, x_ref, vc_ref, v3c_ref, v4c_ref,
                       w_qkv_ref, w_proj_ref, w_fc_ref, w_mp_ref, o_ref, *,
                       n_head, d_head, t_valid, sm_scale, int8_attn):
    x_mid, h8 = _attn_half(
        x_ref[0].astype(jnp.float32), scales_ref, vc_ref[...], v3c_ref[...],
        w_qkv_ref, w_proj_ref, n_head=n_head, d_head=d_head, t_valid=t_valid,
        sm_scale=sm_scale, int8_attn=int8_attn)
    mid = _idot(h8, w_fc_ref).astype(jnp.float32) * v4c_ref[0] + v4c_ref[1]
    g8 = _q8(_new_gelu(mid), scales_ref[3])
    mlp = _idot(g8, w_mp_ref).astype(jnp.float32) * vc_ref[6] + vc_ref[7]
    o_ref[0] = (x_mid + mlp).astype(o_ref.dtype)


def _block_operands(x, blk, full: bool):
    """Pack one quantized block's params (models/quantized.py layout)
    into the kernel operand layout. Returns (scales, vc, v3c, v4c)."""
    ca, cp, fc, mp = blk["c_attn"], blk["c_proj"], blk["c_fc"], blk["m_proj"]
    for q, name in ((ca, "c_attn"), (cp, "c_proj"), (fc, "c_fc"),
                    (mp, "m_proj")):
        if q.act_scale is None:
            raise ValueError(f"fused block path needs calibrated act "
                             f"scales ({name})")
    c = x.shape[-1]
    scal = [ca.act_scale, cp.act_scale, fc.act_scale, mp.act_scale]
    scales = jnp.stack([jnp.asarray(s, jnp.float32).reshape(())
                        for s in scal])
    vc_rows = [blk["ln1_scale"], blk["ln1_bias"],
               blk["ln2_scale"], blk["ln2_bias"],
               cp.scale / cp.act_scale, cp.bias]
    if full:
        vc_rows += [mp.scale / mp.act_scale, mp.bias]
    vc = jnp.stack([jnp.asarray(r, jnp.float32).reshape(c) for r in vc_rows])
    v3c = jnp.stack([(ca.scale / ca.act_scale).reshape(-1),
                     ca.bias.reshape(-1)])
    v4c = (jnp.stack([(fc.scale / fc.act_scale).reshape(-1),
                      fc.bias.reshape(-1)]) if full else None)
    return scales, vc, v3c, v4c


@functools.partial(jax.jit,
                   static_argnames=("n_head", "interpret", "int8_attn",
                                    "attn_batched"))
def fused_attn_block_quant(x, blk, *, n_head: int,
                           interpret: bool | None = None,
                           int8_attn: bool = False,
                           attn_batched: bool | None = None):
    """ln1 + int8 qkv + attention + int8 c_proj + residual + ln2 +
    int8 quantize, one kernel per block.

    x: (B, T, C) f32 residual stream entering the block.
    blk: one entry of quantize_transformer(...)["blocks"] (calibrated).
    Returns (x_mid f32 (B,T,C), h8 int8 (B,T,C)) — x_mid is the
    post-attention residual stream, h8 the quantized ln2 output ready
    for qdot_prequantized with c_fc."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    scales, vc, v3c, _ = _block_operands(x, blk, full=False)
    w_qkv, w_proj = blk["c_attn"].w_int8, blk["c_proj"].w_int8
    c3 = w_qkv.shape[1]
    d_head = c // n_head
    sm_scale = 1.0 / math.sqrt(d_head)

    tp = -(-t // 8) * 8
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    const = lambda i: (0, 0)  # noqa: E731 — VMEM-resident across grid
    rowblk = lambda i: (i, 0, 0)  # noqa: E731

    stream_dtype = x.dtype
    x_mid, h8 = pl.pallas_call(
        functools.partial(_attn_block_kernel, n_head=n_head, d_head=d_head,
                          t_valid=t, sm_scale=sm_scale,
                          int8_attn=int8_attn, attn_batched=attn_batched),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, c), rowblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tp, c), rowblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, c), rowblk, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, tp, c), stream_dtype),
                   jax.ShapeDtypeStruct((b, tp, c), jnp.int8)],
        interpret=interpret,
    )(scales, x, vc, v3c, w_qkv, w_proj)
    if tp != t:
        x_mid, h8 = x_mid[:, :t], h8[:, :t]
    return x_mid, h8


@functools.partial(jax.jit,
                   static_argnames=("n_head", "interpret", "int8_attn"))
def fused_block_quant(x, blk, *, n_head: int,
                      interpret: bool | None = None,
                      int8_attn: bool = False):
    """One whole calibrated-int8 transformer block as a single kernel:
    fused_attn_block_quant plus the int8 MLP and its residual.  The
    (T, 4C) MLP intermediate lives only in VMEM; per block the HBM
    traffic is x-in + x-out.  Returns the next residual stream
    (B, T, C) f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    scales, vc, v3c, v4c = _block_operands(x, blk, full=True)
    w_qkv, w_proj = blk["c_attn"].w_int8, blk["c_proj"].w_int8
    w_fc, w_mp = blk["c_fc"].w_int8, blk["m_proj"].w_int8
    c3, c4 = w_qkv.shape[1], w_fc.shape[1]
    d_head = c // n_head
    sm_scale = 1.0 / math.sqrt(d_head)

    tp = -(-t // 8) * 8
    if tp != t:
        x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    const = lambda i: (0, 0)  # noqa: E731
    rowblk = lambda i: (i, 0, 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_full_block_kernel, n_head=n_head, d_head=d_head,
                          t_valid=t, sm_scale=sm_scale,
                          int8_attn=int8_attn),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, c), rowblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c3), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, c), rowblk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), x.dtype),
        interpret=interpret,
    )(scales, x, vc, v3c, v4c, w_qkv, w_proj, w_fc, w_mp)
    return out[:, :t] if tp != t else out
