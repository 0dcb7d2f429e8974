"""Patch embedding as MXU-friendly matmuls.

The reference implements patch embedding as a strided Conv1d over the
channel-concatenated signal (model/vq_vae_patch_embedd.py:7-17) and its
inverse as a two-stage ConvTranspose1d pyramid (:19-57). Both are
mathematically dense layers over non-overlapping patches, so on TPU we
express them as reshapes + einsums that tile directly onto the MXU —
no convolution lowering, no im2col.

Layout convention: time-major channels-last (B, L, C) everywhere; the
reference's NCL tensors exist only at its torch layer boundaries.
"""
from __future__ import annotations

import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, T, C) cycles -> (B, n_patches, patch_size) channel-concatenated patches.

    Matches reference model/vq_vae_patch_embedd.py:13-16: channels are
    concatenated along time (all V samples then all I samples) before
    splitting into patches.
    """
    b, t, c = x.shape
    flat = jnp.concatenate([x[:, :, i] for i in range(c)], axis=1)  # (B, T*C)
    return flat.reshape(b, (t * c) // patch_size, patch_size)


def patch_embed(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                patch_size: int) -> jnp.ndarray:
    """Strided Conv1d(1->H, k=s=patch) == patch matmul.

    kernel: (patch_size, hidden) — torch weight (H, 1, patch) transposed.
    Returns (B, n_patches, hidden).
    """
    patches = patchify(x, patch_size)
    return jnp.einsum("bnp,ph->bnh", patches, kernel,
                      preferred_element_type=jnp.float32) + bias


def conv_transpose_stride_eq_kernel(x: jnp.ndarray, kernel: jnp.ndarray,
                                    bias: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose1d with kernel_size == stride as an einsum.

    When k == s each input position independently produces k output
    samples: out[b, l*k + m, o] = sum_i x[b, l, i] * w[i, o, m] + bias[o].

    x: (B, L, I); kernel: (I, O, k) in torch ConvTranspose1d layout.
    Returns (B, L*k, O).
    """
    b, l, _ = x.shape
    i_dim, o_dim, k = kernel.shape
    y = jnp.einsum("bli,iok->blko", x, kernel,
                   preferred_element_type=jnp.float32)
    return y.reshape(b, l * k, o_dim) + bias


# Kernel-size plans for the inverse patch embed, keyed by patch size.
# Mirrors the hard-coded torch Sequential stacks at
# model/vq_vae_patch_embedd.py:24-47 (two ConvTranspose1d stages with
# BatchNorm+GELU between; stage strides multiply back to patch_size).
INVERSE_PATCH_PLANS = {25: (5, 5), 10: (2, 5), 50: (10, 5)}


def patch_embed_inverse(x, params, state, *, patch_size: int, input_dim: int,
                        train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """Two-stage ConvTranspose upsample + BN + GELU, then (B, T, input_dim).

    params: dict with ct1_kernel (H,H,k1), ct1_bias, bn_{scale,bias},
    ct2_kernel (H,1,k2), ct2_bias. state: BatchNormState for the BN.
    Returns (y, new_state). Matches model/vq_vae_patch_embedd.py:52-57
    including the final reshape(B, -1, input_dim) which interleaves the
    flat 400-sample signal into (200, 2) consecutive pairs.
    """
    from .norm import batch_norm_apply
    from .activations import gelu

    if patch_size not in INVERSE_PATCH_PLANS:
        raise NotImplementedError(f"Patch size not implemented: {patch_size}")
    x = conv_transpose_stride_eq_kernel(x, params["ct1_kernel"], params["ct1_bias"])
    x, state = batch_norm_apply(x, params["bn_scale"], params["bn_bias"], state,
                                train=train, momentum=momentum, eps=eps)
    x = gelu(x)
    x = conv_transpose_stride_eq_kernel(x, params["ct2_kernel"], params["ct2_bias"])
    b = x.shape[0]
    return x.reshape(b, -1, input_dim), state
