"""Pallas TPU kernel: fused VQ nearest-neighbor search.

The codebook lookup is the VQ-VAE's hot non-conv op (SURVEY.md §3.4
"the kernel to Pallas-fuse"): for every latent row find the argmin of
squared L2 distance to K codebook rows. XLA materializes the (N, K)
distance matrix in HBM between the matmul and the argmin; this kernel
keeps each (TILE_N, K) distance tile in VMEM, fusing
matmul (MXU) -> +norms -> argmin (VPU) in one pass. Indices are
bit-identical to ops/vq.nearest_codes: same f32 z^2+e^2-2z.e expansion,
same first-index tie-break (verified in tests/test_pallas.py).

Codebook sizes here are small (K=256, D=32) so the codebook tile and
its row norms stay resident in VMEM across the whole grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024


def _nearest_kernel(z_ref, cb_ref, out_ref):
    z = z_ref[:].astype(jnp.float32)          # (TILE_N, D)
    cb = cb_ref[:].astype(jnp.float32)        # (K, D)
    # d = |z|^2 + |e|^2 - 2 z.e ; |z|^2 is row-constant -> skip for argmin
    cross = jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # (TILE_N, K)
    e_sq = jnp.sum(cb * cb, axis=1, keepdims=True)  # (K, 1)
    d = e_sq.T - 2.0 * cross
    # manual first-index argmin (VPU-friendly: min + masked iota min)
    k = d.shape[1]
    m = jnp.min(d, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    idx = jnp.min(jnp.where(d == m, col, k), axis=1)
    out_ref[pl.program_id(0), :] = idx.astype(jnp.int32)


def nearest_codes_pallas(z_flat: jnp.ndarray, codebook: jnp.ndarray,
                         *, interpret: bool | None = None) -> jnp.ndarray:
    """(N, D) x (K, D) -> (N,) int32 nearest-codebook indices.

    Drop-in for ops.vq.nearest_codes (same indices; distances differ by
    the row-constant |z|^2 term which cannot change the argmin).
    Falls back to interpreter mode off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = z_flat.shape
    k = codebook.shape[0]
    pad = (-n) % TILE_N
    z_padded = jnp.pad(z_flat, ((0, pad), (0, 0))) if pad else z_flat
    n_pad = n + pad

    # indices come back as lane-aligned (n_tiles, TILE_N) rows
    out = pl.pallas_call(
        _nearest_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad // TILE_N, TILE_N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // TILE_N, TILE_N), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d, bytes_accessed=(n_pad * d + k * d) * 4,
            transcendentals=0),
        interpret=interpret,
    )(z_padded, codebook)
    return out.reshape(n_pad)[:n]
