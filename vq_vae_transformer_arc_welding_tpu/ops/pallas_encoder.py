"""Pallas TPU kernel: fused f32 VQ-VAE encoder resblock for serving.

End-to-end decomposition (BENCHMARKS.md round 4): stripping the
encoder's GELU/BatchNorm elementwise ops from the serving pipeline
saves ~2.5 ms/iter at the bench shape — the resblock chain
(gelu -> center-tap matmul -> BN -> gelu -> center-tap matmul -> BN ->
residual, models/vqvae_patch.py::_resblock) makes ~6 full HBM passes
over the (B*cycles*positions, hidden) activation per block that XLA
does not fuse across the two matmuls.

This kernel runs one whole eval-mode resblock per grid program on a
row tile held in VMEM: the only HBM traffic per block is x-in + x-out
plus the two center-tap weight matrices (constant index maps, resident
across the grid). Math is op-for-op identical to the XLA path — same
exact-erf GELU (ops/activations.gelu), same BatchNorm eval expression
(ops/norm.batch_norm_apply train=False), same contraction — so
interpret mode is bit-identical and the BASELINE.md bit-comparable-
codebook-indices contract is preserved where it is tested.

Serving only (eval BN, no dropout); training keeps the XLA path.

Reference parity: one kernel call == one reference CNNBlock
seperate=True resblock at eval (model/vq_vae_patch_embedd.py:60-74
with the 16-launch position loop already collapsed to a matmul,
ops/conv.py::center_tap_dense).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SQRT_HALF = 0.7071067811865476


def _erf(z):
    # Mosaic lowers neither erf nor erfc; Abramowitz & Stegun 7.1.26
    # rational approximation (max abs error 1.5e-7) built from
    # exp/mul/add, all VPU-lowerable.
    s = jnp.where(z < 0, -1.0, 1.0)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                * t - 0.284496736) * t + 0.254829592) * t * jnp.exp(-a * a)
    return s * y


def _gelu(x):
    # exact-erf GELU, 0.5*x*(1+erf(x/sqrt(2))). Differs from XLA's
    # erfc-based jax.nn.gelu(approximate=False) by <= the A&S 1.5e-7
    # erf error — can flip a VQ argmin only on a near-exact distance
    # tie (flip rate asserted tiny in tests/test_quantized.py)
    return 0.5 * x * (1.0 + _erf(x * _SQRT_HALF))


def _bn_eval(x, mean, var, scale, bias, eps=1e-5):
    # must match ops/norm.batch_norm_apply(train=False) op order
    y = (x - mean) / jnp.sqrt(var + eps)
    return y * scale + bias


def _kernel(x_ref, w1_ref, w2_ref, vec_ref, o_ref, *, use_bn: bool):
    v = vec_ref[...]
    x = x_ref[...]                                     # (R, C) f32
    h = _gelu(x)
    c = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + v[0]
    if use_bn:
        c = _bn_eval(c, v[1], v[2], v[3], v[4])
    h = _gelu(c)
    c = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + v[5]
    if use_bn:
        c = _bn_eval(c, v[6], v[7], v[8], v[9])
    o_ref[...] = x + c


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "use_bn"))
def fused_resblock_eval(x, w1, b1, bn1, w2, b2, bn2, *,
                        tile_rows: int = 1024, use_bn: bool = True,
                        interpret: bool | None = None):
    """One eval-mode encoder resblock, fused.

    x: (N, C) f32 rows (flattened (batch*cycles, positions)).
    w1/w2: (C, C) f32 center-tap matrices ALREADY transposed to
    (in, out) (i.e. kernel[:, :, k//2].T). b1/b2: (C,).
    bn1/bn2: (mean, var, scale, bias) tuples of (C,) eval statistics
    (ignored when use_bn=False — pass zeros).
    Returns (N, C) f32, bit-matching the XLA chain in interpret mode."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c = x.shape
    vec = jnp.stack([b1, *bn1, b2, *bn2]).astype(jnp.float32)  # (10, C)

    npad = -(-n // tile_rows) * tile_rows
    if npad != n:
        x = jnp.pad(x, ((0, npad - n), (0, 0)))
    const = lambda i: (0, 0)  # noqa: E731 — VMEM-resident across grid
    out = pl.pallas_call(
        functools.partial(_kernel, use_bn=use_bn),
        grid=(npad // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((10, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, c), jnp.float32),
        interpret=interpret,
    )(x, w1, w2, vec)
    return out[:n] if npad != n else out


def encoder_resblocks_fused(model, params, state, h, *,
                            tile_rows: int = 1024):
    """Run all encoder resblocks through the fused kernel.

    h: (B, P, C) patch-embed output. Returns (B, P, C) — the input to
    sep_conv. Mirrors VQVAEPatch._run_blocks at eval
    (models/vqvae_patch.py:168-175)."""
    b, p, c = h.shape
    flat = h.reshape(b * p, c)
    bns = state.get("encoder_bn") if model.batch_norm else None
    for i, blk in enumerate(params["encoder"]):
        if model.batch_norm:
            s1, s2 = bns[i]["bn1"], bns[i]["bn2"]
            bn1 = (s1.mean, s1.var, blk["bn1_scale"], blk["bn1_bias"])
            bn2 = (s2.mean, s2.var, blk["bn2_scale"], blk["bn2_bias"])
        else:
            zero = jnp.zeros((c,))
            bn1 = bn2 = (zero, zero, zero, zero)  # unused (use_bn=False)
        k1 = blk["conv1_w"].shape[-1] // 2
        k2 = blk["conv2_w"].shape[-1] // 2
        flat = fused_resblock_eval(
            flat, blk["conv1_w"][:, :, k1].T, blk["conv1_b"], bn1,
            blk["conv2_w"][:, :, k2].T, blk["conv2_b"], bn2,
            tile_rows=tile_rows, use_bn=model.batch_norm)
    return flat.reshape(b, p, c)


def encode_indices_fused(model, params, state, x, *, tile_rows: int = 1024,
                         group_size: int | None = None,
                         compute_dtype=None):
    """VQVAEPatch.encode_indices with the resblock chain on the fused
    kernel (patch-embed, sep_conv and the VQ argmin stay on XLA —
    they are single fused ops already).

    group_size: resblocks per kernel call (a group's weights stay
    VMEM-resident, so larger groups cut inter-block HBM traffic —
    measured monotone 6,240/6,313/6,439 windows/s for groups 1/2/4 at
    the bench config). Default: as many blocks as fit an ~8 MB weight
    budget (group_size=n_resblocks — the mono kernel — overflows VMEM
    at hidden 512 x 8 blocks in f32; bf16 weights fit all 8).

    compute_dtype: None = exact f32 (bit-comparable indices, the
    default serving contract). jnp.bfloat16 = bf16 matmul inputs with
    f32 accumulation inside the kernels. Measured on v5e: SLOWER at
    every grouping (4.43 f32 vs 4.58-4.84 ms bf16 encoder-only; -4%
    end-to-end) with 0 index flips on the bench config — the kernel
    is VPU/traffic-bound around small matmuls, so bf16 inputs buy
    nothing and the casts cost (BENCHMARKS.md round 6 "bf16 encoder:
    measured and NOT adopted"). Kept opt-in as the recorded ladder
    rung."""
    from .patching import patch_embed
    from .conv import center_tap_dense
    from .vq import nearest_codes

    if group_size is None:
        wbytes = 2 if compute_dtype is not None else 4
        per_block = 2 * model.hidden_dim * model.hidden_dim * wbytes
        group_size = max(1, (8 << 20) // per_block)
    h = patch_embed(x, params["patch_embed"]["kernel"],
                    params["patch_embed"]["bias"], model.patch_size)
    if group_size > 1 or compute_dtype is not None:
        b_, p_, c_ = h.shape
        weights, vecs = _pack_encoder(model, params, state)
        flat = h.reshape(b_ * p_, c_)
        nb = len(params["encoder"])
        for s0 in range(0, nb, group_size):
            s1 = min(s0 + group_size, nb)
            flat = fused_encoder_eval(
                flat, weights[2 * s0:2 * s1], vecs[10 * s0:10 * s1],
                tile_rows=tile_rows, use_bn=model.batch_norm,
                compute_dtype=compute_dtype)
        h = flat.reshape(b_, p_, c_)
    else:
        h = encoder_resblocks_fused(model, params, state, h,
                                    tile_rows=tile_rows)
    z_e = center_tap_dense(h, params["sep_conv"]["w"],
                           params["sep_conv"]["b"])
    if model.use_improved_vq:
        from . import vq_ema
        return vq_ema.nearest_ema(z_e, state["vq"])
    flat = z_e.reshape(-1, model.embedding_dim)
    return nearest_codes(flat, params["vq"]["codebook"]).reshape(
        z_e.shape[:-1])


def _resblock_chain(x, w_ref, vec_ref, n_blocks, use_bn, cdt=None):
    """cdt (compute dtype): None = exact f32 (the bit-comparable-index
    contract path). jnp.bfloat16 = cast each matmul's LHS to bf16 to
    match the (already-cast) bf16 weights — MXU runs at bf16 rate with
    f32 accumulation; gelu/BN/residual stay f32 on the VPU, so only
    the contraction inputs are rounded (same recipe as bf16 training,
    models/vqvae_patch.py::compute_dtype)."""
    lhs = (lambda h: h) if cdt is None else (lambda h: h.astype(cdt))
    for i in range(n_blocks):
        v = vec_ref[10 * i:10 * (i + 1)]
        h = _gelu(x)
        c = jax.lax.dot_general(
            lhs(h), w_ref[2 * i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + v[0]
        if use_bn:
            c = _bn_eval(c, v[1], v[2], v[3], v[4])
        h = _gelu(c)
        c = jax.lax.dot_general(
            lhs(h), w_ref[2 * i + 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + v[5]
        if use_bn:
            c = _bn_eval(c, v[6], v[7], v[8], v[9])
        x = x + c
    return x


def _all_blocks_kernel(x_ref, w_ref, vec_ref, o_ref, *, n_blocks: int,
                       use_bn: bool, cdt=None):
    """All resblocks unrolled in one program; weights (2*n_blocks, C, C)
    stay VMEM-resident across the row-tile grid."""
    o_ref[...] = _resblock_chain(x_ref[...], w_ref, vec_ref, n_blocks,
                                 use_bn, cdt=cdt)


def _entry_blocks_kernel(p_ref, wpe_ref, bpe_ref, w_ref, vec_ref, o_ref, *,
                         n_blocks: int, use_bn: bool):
    """patch-embed matmul + the first resblock group; the patch-embed
    output never touches HBM."""
    x = jax.lax.dot_general(
        p_ref[...], wpe_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bpe_ref[0]
    o_ref[...] = _resblock_chain(x, w_ref, vec_ref, n_blocks, use_bn)


def _exit_blocks_kernel(x_ref, w_ref, vec_ref, wsep_ref, bsep_ref, cb_ref,
                        o_ref, *, n_blocks: int, use_bn: bool):
    """Last resblock group + sep_conv + VQ nearest-code argmin; emits
    int32 ids directly. Distance expansion and first-index tie-break
    match ops/vq.nearest_codes exactly (emulated argmin: masked
    column-min — Mosaic has no argmin lowering)."""
    x = _resblock_chain(x_ref[...], w_ref, vec_ref, n_blocks, use_bn)
    z = jax.lax.dot_general(
        x, wsep_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bsep_ref[0]
    cb = cb_ref[...]                                   # (K, D)
    d = (jnp.sum(z * z, axis=1, keepdims=True)
         + jnp.sum(cb * cb, axis=1)
         - 2.0 * jax.lax.dot_general(
             z, cb, (((1,), (1,)), ((), ())),
             preferred_element_type=jnp.float32))      # (R, K)
    dmin = jnp.min(d, axis=1, keepdims=True)
    k = d.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    ids = jnp.min(jnp.where(d <= dmin, col, k), axis=1)
    o_ref[...] = ids[:, None].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "use_bn",
                                    "compute_dtype"))
def fused_encoder_eval(x, weights, vecs, *, tile_rows: int = 1024,
                       use_bn: bool = True, interpret: bool | None = None,
                       compute_dtype=None):
    """The WHOLE encoder resblock stack as one kernel: weights
    (2*n_blocks, C, C) resident in VMEM, x crosses HBM once total
    instead of once per block.
    vecs: (10*n_blocks, C) rows [b1, bn1x4, b2, bn2x4] per block.

    compute_dtype: None = exact f32 (default, bit-comparable-index
    contract). jnp.bfloat16 = bf16 matmul inputs/weights with f32
    accumulation (halves VMEM weight residency; the residual stream
    and elementwise math stay f32). Measured SLOWER than f32 on v5e
    at the bench config — see encode_indices_fused and BENCHMARKS.md
    round 6; kept opt-in.

    NOTE: at the bench config (hidden 512, 8 resblocks) the ~17 MB of
    f32 weights overflow VMEM and Mosaic fails to compile (measured,
    BENCHMARKS.md round 4 "NOT adopted") — use the per-block
    fused_resblock_eval there; this variant fits small-hidden
    configs (and the full 8-block stack in bf16, whose weights halve
    to ~8.4 MB)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c = x.shape
    n_blocks = weights.shape[0] // 2
    if compute_dtype is not None:
        weights = weights.astype(compute_dtype)

    npad = -(-n // tile_rows) * tile_rows
    if npad != n:
        x = jnp.pad(x, ((0, npad - n), (0, 0)))
    const = lambda i: (0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_all_blocks_kernel, n_blocks=n_blocks,
                          use_bn=use_bn, cdt=compute_dtype),
        grid=(npad // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_blocks, c, c), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10 * n_blocks, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, c), jnp.float32),
        interpret=interpret,
    )(x, weights, vecs)
    return out[:n] if npad != n else out


def _pack_encoder(model, params, state):
    """Stack every resblock's center-tap weights and vec rows for
    fused_encoder_eval."""
    ws, vs = [], []
    bns = state.get("encoder_bn") if model.batch_norm else None
    c = params["encoder"][0]["conv1_b"].shape[0]
    zero = jnp.zeros((c,))
    for i, blk in enumerate(params["encoder"]):
        k1 = blk["conv1_w"].shape[-1] // 2
        k2 = blk["conv2_w"].shape[-1] // 2
        ws += [blk["conv1_w"][:, :, k1].T, blk["conv2_w"][:, :, k2].T]
        if model.batch_norm:
            s1, s2 = bns[i]["bn1"], bns[i]["bn2"]
            vs += [blk["conv1_b"], s1.mean, s1.var, blk["bn1_scale"],
                   blk["bn1_bias"], blk["conv2_b"], s2.mean, s2.var,
                   blk["bn2_scale"], blk["bn2_bias"]]
        else:
            vs += [blk["conv1_b"], zero, zero, zero, zero,
                   blk["conv2_b"], zero, zero, zero, zero]
    return jnp.stack(ws), jnp.stack(vs)


def encode_indices_fused_mono(model, params, state, x, *,
                              tile_rows: int = 1024):
    """encode_indices_fused with the whole resblock stack in ONE kernel
    (fused_encoder_eval) instead of one kernel per block."""
    from .patching import patch_embed
    from .conv import center_tap_dense
    from .vq import nearest_codes

    h = patch_embed(x, params["patch_embed"]["kernel"],
                    params["patch_embed"]["bias"], model.patch_size)
    b, p, c = h.shape
    weights, vecs = _pack_encoder(model, params, state)
    flat = fused_encoder_eval(h.reshape(b * p, c), weights, vecs,
                              tile_rows=tile_rows,
                              use_bn=model.batch_norm)
    z_e = center_tap_dense(flat.reshape(b, p, c), params["sep_conv"]["w"],
                           params["sep_conv"]["b"])
    if model.use_improved_vq:
        from . import vq_ema
        return vq_ema.nearest_ema(z_e, state["vq"])
    flat_z = z_e.reshape(-1, model.embedding_dim)
    return nearest_codes(flat_z, params["vq"]["codebook"]).reshape(
        z_e.shape[:-1])


def _rowspec(tile_rows, c):
    return pl.BlockSpec((tile_rows, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _constspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "use_bn"))
def fused_encoder_entry_eval(patches, w_pe, b_pe, weights, vecs, *,
                             tile_rows: int = 1024, use_bn: bool = True,
                             interpret: bool | None = None):
    """patch-embed + first resblock group in one kernel: the patch-embed
    output lives only in VMEM. patches: (N, patch) from ops.patching."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, pz = patches.shape
    c = w_pe.shape[1]
    n_blocks = weights.shape[0] // 2
    npad = -(-n // tile_rows) * tile_rows
    if npad != n:
        patches = jnp.pad(patches, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_entry_blocks_kernel, n_blocks=n_blocks,
                          use_bn=use_bn),
        grid=(npad // tile_rows,),
        in_specs=[
            _rowspec(tile_rows, pz),
            _constspec((pz, c)), _constspec((1, c)),
            _constspec(tuple(weights.shape)),
            _constspec(tuple(vecs.shape)),
        ],
        out_specs=_rowspec(tile_rows, c),
        out_shape=jax.ShapeDtypeStruct((npad, c), jnp.float32),
        interpret=interpret,
    )(patches, w_pe, b_pe.reshape(1, c), weights, vecs)
    return out[:n] if npad != n else out


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret", "use_bn"))
def fused_encoder_exit_eval(x, weights, vecs, w_sep, b_sep, codebook, *,
                            tile_rows: int = 1024, use_bn: bool = True,
                            interpret: bool | None = None):
    """Last resblock group + sep_conv + VQ nearest-code in one kernel;
    returns (N,) int32 ids."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c = x.shape
    d_emb = w_sep.shape[1]
    n_blocks = weights.shape[0] // 2
    npad = -(-n // tile_rows) * tile_rows
    if npad != n:
        x = jnp.pad(x, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_exit_blocks_kernel, n_blocks=n_blocks,
                          use_bn=use_bn),
        grid=(npad // tile_rows,),
        in_specs=[
            _rowspec(tile_rows, c),
            _constspec(tuple(weights.shape)),
            _constspec(tuple(vecs.shape)),
            _constspec((c, d_emb)), _constspec((1, d_emb)),
            _constspec(tuple(codebook.shape)),
        ],
        out_specs=_rowspec(tile_rows, 1),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        interpret=interpret,
    )(x, weights, vecs, w_sep, b_sep.reshape(1, d_emb), codebook)
    out = out[:, 0]
    return out[:n] if npad != n else out


def encode_indices_fused_edges(model, params, state, x, *,
                               tile_rows: int = 1024,
                               group_size: int | None = None):
    """encode_indices_fused with the pipeline edges fused in too:
    patch-embed rides the first group kernel and sep_conv + VQ argmin
    ride the last — cycles in, int32 ids out, nothing else in HBM
    between kernel launches. Requires >= 2 groups (falls back to
    encode_indices_fused otherwise). Classic-VQ models only (EMA VQ
    keeps the XLA nearest_ema path)."""
    from .patching import patchify

    if model.use_improved_vq:
        return encode_indices_fused(model, params, state, x,
                                    tile_rows=tile_rows,
                                    group_size=group_size)
    if group_size is None:
        per_block = 2 * model.hidden_dim * model.hidden_dim * 4
        group_size = max(1, (8 << 20) // per_block)
    nb = len(params["encoder"])
    if nb < 2 * group_size:
        return encode_indices_fused(model, params, state, x,
                                    tile_rows=tile_rows,
                                    group_size=group_size)

    b = x.shape[0]
    patches = patchify(x, model.patch_size)
    n_p = patches.shape[1]
    flat_p = patches.reshape(b * n_p, model.patch_size)
    weights, vecs = _pack_encoder(model, params, state)
    w_sep = params["sep_conv"]["w"]
    w_sep = w_sep[:, :, w_sep.shape[-1] // 2].T

    bounds = list(range(0, nb, group_size)) + [nb]
    flat = fused_encoder_entry_eval(
        flat_p, params["patch_embed"]["kernel"],
        params["patch_embed"]["bias"],
        weights[:2 * bounds[1]], vecs[:10 * bounds[1]],
        tile_rows=tile_rows, use_bn=model.batch_norm)
    for s0, s1 in zip(bounds[1:-2], bounds[2:-1]):
        flat = fused_encoder_eval(
            flat, weights[2 * s0:2 * s1], vecs[10 * s0:10 * s1],
            tile_rows=tile_rows, use_bn=model.batch_norm)
    s0 = bounds[-2]
    ids = fused_encoder_exit_eval(
        flat, weights[2 * s0:], vecs[10 * s0:], w_sep,
        params["sep_conv"]["b"], params["vq"]["codebook"],
        tile_rows=tile_rows, use_bn=model.batch_norm)
    return ids.reshape(b, n_p)
