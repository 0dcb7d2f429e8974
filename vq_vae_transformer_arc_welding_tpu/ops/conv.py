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


def conv1d_same_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """conv1d_same re-expressed as one im2col matmul.

    Same math as `conv1d_same` (torch-parity-tested to 1e-4 in
    tests/test_ops.py) but lowered as a single (B·L, k·I) @ (k·I, O)
    GEMM instead of lax.conv. The payoff is the BACKWARD pass: XLA
    differentiates a dot_general into two dot_generals (MXU-native),
    while lax.conv's gradient lowers through transposed-conv ops that
    tile poorly at this model's short sequence (L=16). Measured on the
    VQ-VAE training step (BENCHMARKS.md round 9); reachable via
    ``VQVAEPatch(conv_impl='im2col')``. Float rounding differs from
    the lax.conv path at the ulp level (different accumulation order),
    which the decoder-side recon loss tolerates; the ENCODER's
    bit-comparable-index contract is untouched (center_tap_dense is
    already a matmul).
    """
    k = kernel.shape[-1]
    pad = (k - 1) // 2
    length = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    # tap-major feature concat: cols[t][:, l, :] = x[l + t - pad]
    xcat = jnp.concatenate([xp[:, t:t + length, :] for t in range(k)],
                           axis=-1)                       # (B, L, k*I)
    w = jnp.transpose(kernel, (2, 1, 0)).reshape(-1, kernel.shape[0])
    y = jnp.einsum("blf,fo->blo", xcat, w,
                   preferred_element_type=jnp.float32)
    return y + bias


def conv_transpose_block(x, kernel, bias):
    """Alias re-exported for completeness; see patching.conv_transpose_stride_eq_kernel."""
    from .patching import conv_transpose_stride_eq_kernel
    return conv_transpose_stride_eq_kernel(x, kernel, bias)
