"""1-D convolution primitives, TPU-shaped.

Two distinct paths mirror the reference's two distinct computations
(model/vq_vae_patch_embedd.py:93-114):

- `conv1d_same`: a real k=3, pad=1 convolution over the patch sequence
  (decoder CNNBlock with seperate=False). Lowered via
  lax.conv_general_dilated in NHC layout so XLA maps it to the MXU.

- `center_tap_dense`: the encoder's "seperate=True" mode loops a shared
  k=3/p=1 conv over length-1 slices; with a length-1 input both side
  taps only ever see zero padding, so the op is exactly an affine map
  by the kernel's center tap. We compute that as one batched matmul
  over all positions at once — the reference's 16 sequential kernel
  launches per block become a single MXU call (SURVEY.md §3.4 flags
  this loop as pathological). Exact same math, verified against torch
  in tests/test_ops.py.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv1d_same(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Conv1d stride 1 with symmetric 'same' padding for odd k.

    x: (B, L, I); kernel: (O, I, k) torch layout. Returns (B, L, O).
    """
    k = kernel.shape[-1]
    pad = (k - 1) // 2
    # the conv's in/out dtypes must match — lax.conv's GRADIENT rule
    # requires it, unlike dot_general — so bf16 inputs (bf16 training
    # mode) produce a bf16 conv upcast afterwards; the bias add stays
    # f32 either way. The MXU accumulates f32 internally regardless.
    out_dtype = x.dtype
    y = lax.conv_general_dilated(
        x, jnp.transpose(kernel, (2, 1, 0)).astype(x.dtype),  # (k, I, O)
        window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=out_dtype,
    )
    return y.astype(jnp.float32) + bias


def center_tap_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Shared conv applied per length-1 position == dense by the center tap.

    x: (B, P, I) where each of the P positions is an independent length-1
    "sequence"; kernel: (O, I, k) torch layout with odd k. Returns (B, P, O).
    """
    k = kernel.shape[-1]
    w = kernel[:, :, k // 2]  # (O, I)
    return jnp.einsum("bpi,oi->bpo", x, w,
                      preferred_element_type=jnp.float32) + bias


def conv_transpose_block(x, kernel, bias):
    """Alias re-exported for completeness; see patching.conv_transpose_stride_eq_kernel."""
    from .patching import conv_transpose_stride_eq_kernel
    return conv_transpose_stride_eq_kernel(x, kernel, bias)
