"""Pallas TPU kernel: fused KV-cache decode step (attention half-block).

The KV sampler's per-token cost decomposes as ~0.12 ms scan overhead +
~0.12 ms weight streaming + a ~90-op serial chain of batch-16-sized
XLA ops (BENCHMARKS.md round 4 "measured and NOT adopted",
scan-over-blocks entry). This kernel collapses one block's attention
half — ln1, qkv projection (bias folded via an augmented ones column),
K/V cache write at `pos`, masked attention over the whole cache, output
projection, residual add — into a single kernel per (block, token),
with the caches updated IN PLACE via input/output aliasing (no
(B, H, T, D) copies).

Grid over B: per program the sample's (H, T, D) K/V cache slices and
the block's weights (grid-resident, constant index maps) live in VMEM.
`pos` arrives as a scalar-prefetch operand so the cache row index is
dynamic without retracing.

Math mirrors TransformerDecoder._attn_cached (models/transformer.py)
in f32; logits equivalence vs the XLA step is tolerance-based, same
contract as the KV sampler's forced-sequence test.

MEASURED AND NOT ADOPTED (BENCHMARKS.md round 4): 1.23 vs 0.64
ms/token at the bench config — the (1, H, T, D) cache BlockSpecs
stream both full caches through VMEM (and back out) for every grid
program, ~670 MB of forced cache traffic per token across the 8
blocks, which swamps the ~35-op-per-block sequencing savings. XLA's
dynamic-update-slice + einsum path touches the caches once. The
sampler keeps the XLA step; this kernel stays as a correctness-tested
reference for per-sample fused decoding (e.g. for much longer caches
where VMEM residence across steps would pay).

The adopted fast path is instead XLA-level (BENCHMARKS.md round 5):
bf16 K/V cache storage + segmented static cache-prefix reads
(generate_kv cache_dtype / cache_buckets) — 0.64 -> 0.31 ms/token.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norm import layer_norm as _ln


def _decode_body(pos_ref, x_ref, vp_ref, wq_ref, wp_ref, kc_ref, vc_ref,
                 o_ref, kco_ref, vco_ref, *, n_head, d_head, sm_scale):
    del kc_ref, vc_ref  # aliased with kco_ref / vco_ref
    pos = pos_ref[0]
    c = n_head * d_head
    v = vp_ref[...]                     # (8, C): ln1_s, ln1_b, 0, proj_b
    xa = x_ref[0, 0:1, :]               # (1, C+1), last column == 1.0
    x = xa[:, :c]
    h = _ln(x, v[0], v[1])
    ha = jnp.concatenate([h, xa[:, c:]], axis=1)        # (1, C+1)
    qkv = jax.lax.dot_general(
        ha, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (1, 3C), bias folded
    t = kco_ref.shape[2]
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) <= pos
    outs = []
    for hh in range(n_head):
        q = qkv[:, hh * d_head:(hh + 1) * d_head]
        k = qkv[:, c + hh * d_head:c + (hh + 1) * d_head]
        vv = qkv[:, 2 * c + hh * d_head:2 * c + (hh + 1) * d_head]
        kco_ref[0, hh, pl.ds(pos, 1), :] = k.reshape(1, d_head)
        vco_ref[0, hh, pl.ds(pos, 1), :] = vv.reshape(1, d_head)
        kall = kco_ref[0, hh]                           # (T, D)
        vall = vco_ref[0, hh]
        s = jax.lax.dot_general(
            q, kall, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # (1, T)
        s = jnp.where(colv, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p, vall, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l)    # (1, D)
    y = jnp.concatenate(outs, axis=1)                   # (1, C)
    proj = jax.lax.dot_general(
        y, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + v[3].reshape(1, c)
    o_ref[0, 0:1, :] = x + proj


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_decode_attn(x, blk, kc, vc, pos, *, n_head: int,
                      interpret: bool | None = None):
    """One block's attention half for a single decode token.

    x: (B, 1, C) f32 residual stream entering the block.
    blk: one entry of params['blocks'] (list layout, f32 weights).
    kc/vc: (B, H, T, D) caches — updated in place at `pos` (donated via
    input/output aliasing). pos: () int32.
    Returns (x_mid (B, 1, C), kc, vc)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, _, c = x.shape
    h_, t, d = kc.shape[1], kc.shape[2], kc.shape[3]
    sm_scale = 1.0 / math.sqrt(d)
    p = blk["attn"]
    zero = jnp.zeros((c,), jnp.float32)
    vpack = jnp.stack([blk["ln1_scale"], blk["ln1_bias"], zero,
                       p["c_proj_b"], zero, zero, zero, zero]
                      ).astype(jnp.float32)  # 8 rows (sublane tiling)
    # fold the qkv bias into the matmul: append it as an extra weight
    # row consumed by a constant ones column on the activations
    w_qkv = jnp.concatenate(
        [p["c_attn_w"].astype(jnp.float32),
         p["c_attn_b"].astype(jnp.float32).reshape(1, -1)], axis=0)
    xa = jnp.concatenate([x.reshape(b, c), jnp.ones((b, 1), jnp.float32)],
                         axis=1)
    # TPU block tiling needs the sublane dim divisible by 8: carry the
    # token row as (B, 8, C+1) with rows 1-7 unused
    xa = jnp.pad(xa[:, None, :], ((0, 0), (0, 7), (0, 0)))
    pos = jnp.asarray(pos, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, c + 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c + 1, 3 * c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_, t, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_, t, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_, t, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_, t, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    out, kc2, vc2 = pl.pallas_call(
        functools.partial(_decode_body, n_head=n_head, d_head=d,
                          sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
                   jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                   jax.ShapeDtypeStruct(vc.shape, vc.dtype)],
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(pos, xa, vpack, w_qkv, p["c_proj_w"].astype(jnp.float32), kc, vc)
    return out[:, 0:1, :], kc2, vc2


# -- round-2 kernel: whole block, HBM caches, manual valid-prefix DMA --------
#
# v1 above fails on cache traffic: VMEM BlockSpec outputs always write the
# WHOLE block, so each grid program streamed its full (1, H, T, D) caches
# in AND back out (~670 MB/token over 8 blocks). Here the caches stay in
# HBM (MemorySpace.HBM), the kernel DMAs in only ceil((pos+1)/CHUNK)
# row-chunks of each cache (average traffic ~halves over a generation),
# and writes back one 8-row-aligned window — HBM tiling is (8, 128), so
# sub-8-row DMA slices are rejected. The whole transformer block
# (ln1 -> qkv -> cached attention -> proj -> residual -> ln2 -> fc ->
# new_gelu -> mproj -> residual) runs in ONE kernel, so the ~10 XLA
# launches per block per token become 1.
#
# Cache length must be a multiple of DECODE_CHUNK (pad with zeros; the
# position mask keeps padding out of the softmax). Rows beyond the DMA'd
# prefix hold stale scratch garbage; V is sanitized with a row mask so
# exp(-inf)=0 never multiplies a NaN.
#
# MEASURED AND NOT ADOPTED (round 5 / builder round 2): 1.61 vs 0.65
# ms/token at the bench config (d512/8 blocks, batch 16). The manual
# DMA removed v1's cache-traffic problem, but single-token batch-16
# decode decomposes into 16 grid programs x 8 blocks of per-sample
# (1, D)-GEMV attention — Mosaic has no batched matmul, so Pallas
# trades XLA's ~90-launch serial chain for 128 serialized tiny
# programs (~12.5 us each incl. chained DMA waits) and loses. XLA's
# batched einsum over (B, H) is the right shape for this op. The
# ADOPTED win on the sampler is bf16 K/V cache STORAGE on the XLA path
# (generate_kv cache_dtype): 0.65 -> 0.42 ms/token, 99.6% sampled-id
# agreement (BENCHMARKS.md round 5).

DECODE_CHUNK = 128


def _block_decode_body(pos_ref, xa_ref, vp_ref, wq_ref, wp_ref, wf_ref,
                       wm_ref, kc_hbm, vc_hbm, o_ref, kco_hbm, vco_hbm,
                       ks_ref, vs_ref, krow_ref, vrow_ref, sem,
                       *, n_head, d_head, sm_scale):
    from .activations import new_gelu as _gelu
    del kc_hbm, vc_hbm  # aliased with kco_hbm / vco_hbm
    i = pl.program_id(0)
    pos = pos_ref[0]
    c = n_head * d_head
    t = ks_ref.shape[1]

    # manual DMA: only the chunks covering rows [0, pos] come to VMEM.
    # Caches are (B, T, C) — the lane dim C=H*D is 128-tile-aligned,
    # unlike a (B, H, T, D) layout whose D=64 lane dim cannot be
    # HBM-sliced (Mosaic tiling (1,128))
    n_chunks = pos // DECODE_CHUNK + 1

    def copy_chunk(ci, _):
        for src, dst in ((kco_hbm, ks_ref), (vco_hbm, vs_ref)):
            dma = pltpu.make_async_copy(
                src.at[pl.ds(i, 1),
                       pl.ds(ci * DECODE_CHUNK, DECODE_CHUNK), :],
                dst.at[:, pl.ds(ci * DECODE_CHUNK, DECODE_CHUNK), :],
                sem)
            dma.start()
            dma.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, copy_chunk, 0)

    v = vp_ref[...]            # (8, C): ln1_s, ln1_b, ln2_s, ln2_b,
    #                            proj_b, mproj_b, 0, 0
    xa = xa_ref[0, 0:1, :]     # (1, C+1), last column == 1.0
    x = xa[:, :c]
    h = _ln(x, v[0], v[1])
    ha = jnp.concatenate([h, xa[:, c:]], axis=1)          # (1, C+1)
    qkv = jax.lax.dot_general(
        ha, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (1, 3C)

    # append this token's K/V row to the VMEM copies
    k_row = qkv[:, c:2 * c]                               # (1, C)
    v_row = qkv[:, 2 * c:]
    ks_ref[0, pl.ds(pos, 1), :] = k_row
    vs_ref[0, pl.ds(pos, 1), :] = v_row

    # sanitize V beyond pos: rows past the DMA'd prefix are stale
    # scratch garbage; probs there are exactly 0, but 0 * NaN = NaN
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    vs_ref[...] = jnp.where(rows <= pos, vs_ref[...], 0.0)

    # stage the 8-row aligned window containing `pos` for write-back:
    # HBM memrefs are (8, 128)-tiled, so sub-8-row DMA slices are
    # rejected. Rows beyond pos inside the window carry sanitized
    # zeros (V) / stale values (K) — harmless: every cache row <= pos
    # is rewritten real by the step that owns it, and rows > pos are
    # masked out of every read until then.
    pos8 = (pos // 8) * 8
    krow_ref[...] = ks_ref[:, pl.ds(pos8, 8), :]
    vrow_ref[...] = vs_ref[:, pl.ds(pos8, 8), :]

    colv = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) <= pos
    outs = []
    for hh in range(n_head):
        q = qkv[:, hh * d_head:(hh + 1) * d_head]         # (1, D)
        k_h = ks_ref[0][:, hh * d_head:(hh + 1) * d_head]  # (T, D)
        s = jax.lax.dot_general(
            q, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # (1, T)
        s = jnp.where(colv, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        v_h = vs_ref[0][:, hh * d_head:(hh + 1) * d_head]  # (T, D)
        outs.append(jax.lax.dot_general(
            p, v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l)          # (1, D)
    y = jnp.concatenate(outs, axis=1)                         # (1, C)
    x_mid = x + jax.lax.dot_general(
        y, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + v[4].reshape(1, c)

    h2 = _ln(x_mid, v[2], v[3])
    h2a = jnp.concatenate([h2, xa[:, c:]], axis=1)            # (1, C+1)
    mid = _gelu(jax.lax.dot_general(
        h2a, wf_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))                  # (1, 4C)
    x_out = x_mid + jax.lax.dot_general(
        mid, wm_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + v[5].reshape(1, c)
    o_ref[0, 0:1, :] = x_out

    # 8-row cache write-back (vs v1's WHOLE-cache write-back)
    for src, dst in ((krow_ref, kco_hbm), (vrow_ref, vco_hbm)):
        dma = pltpu.make_async_copy(
            src, dst.at[pl.ds(i, 1), pl.ds(pos8, 8), :], sem)
        dma.start()
        dma.wait()


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_block_decode(x, blk, kc, vc, pos, *, n_head: int,
                       interpret: bool | None = None):
    """One WHOLE transformer block for a single decode token, caches in
    HBM with valid-prefix DMA and single-row write-back.

    x: (B, 1, C) f32 residual stream entering the block.
    blk: one entry of params['blocks'] (list layout).
    kc/vc: (B, T, C) f32 caches — time-major, heads packed in the lane
    dim (C = H*D keeps HBM DMA slices 128-tile-aligned, which a
    (B, H, T, D) layout's D=64 lane dim is not) — T a multiple of
    DECODE_CHUNK; updated in place at `pos` (donate for true aliasing).
    pos: () int32. Returns (x_out (B, 1, C), kc, vc). Same math as
    TransformerDecoder._token_step's block body (models/transformer.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, _, c = x.shape
    h_, t = n_head, kc.shape[1]
    d = c // n_head
    if t % DECODE_CHUNK:
        raise ValueError(f"cache length {t} must be a multiple of "
                         f"{DECODE_CHUNK} (pad it)")
    sm_scale = 1.0 / math.sqrt(d)
    p = blk["attn"]
    m = blk["mlp"]
    zero = jnp.zeros((c,), jnp.float32)
    vpack = jnp.stack([blk["ln1_scale"], blk["ln1_bias"],
                       blk["ln2_scale"], blk["ln2_bias"],
                       p["c_proj_b"], m["c_proj_b"], zero, zero]
                      ).astype(jnp.float32)
    w_qkv = jnp.concatenate(
        [p["c_attn_w"].astype(jnp.float32),
         p["c_attn_b"].astype(jnp.float32).reshape(1, -1)], axis=0)
    w_fc = jnp.concatenate(
        [m["c_fc_w"].astype(jnp.float32),
         m["c_fc_b"].astype(jnp.float32).reshape(1, -1)], axis=0)
    xa = jnp.concatenate([x.reshape(b, c), jnp.ones((b, 1), jnp.float32)],
                         axis=1)
    xa = jnp.pad(xa[:, None, :], ((0, 0), (0, 7), (0, 0)))
    pos = jnp.asarray(pos, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, c + 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c + 1, 3 * c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c + 1, 4 * c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * c, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # kc
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # vc
        ],
        out_specs=[
            pl.BlockSpec((1, 8, c), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # kc out (aliased)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # vc out (aliased)
        ],
        scratch_shapes=[
            pltpu.VMEM((1, t, c), jnp.float32),      # K prefix
            pltpu.VMEM((1, t, c), jnp.float32),      # V prefix
            pltpu.VMEM((1, 8, c), jnp.float32),      # K write-back window
            pltpu.VMEM((1, 8, c), jnp.float32),      # V write-back window
            pltpu.SemaphoreType.DMA,
        ],
    )

    out, kc2, vc2 = pl.pallas_call(
        functools.partial(_block_decode_body, n_head=n_head, d_head=d,
                          sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
                   jax.ShapeDtypeStruct(kc.shape, kc.dtype),
                   jax.ShapeDtypeStruct(vc.shape, vc.dtype)],
        input_output_aliases={7: 1, 8: 2},
        interpret=interpret,
    )(pos, xa, vpack, w_qkv, p["c_proj_w"].astype(jnp.float32), w_fc,
      m["c_proj_w"].astype(jnp.float32), kc, vc)
    return out[:, 0:1, :], kc2, vc2
