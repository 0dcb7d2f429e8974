"""TPU-native arc-welding quality-monitoring framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of
tmdt-buw/VQ-VAE-Transformer-Arc-Welding (reference mounted at
/root/reference): ASIMoW current/voltage cycle datasets, a VQ-VAE with
patch embedding, MLP/GRU classifiers, and a minGPT-style multitask
transformer over discrete latent tokens — redesigned TPU-first:

- compute as large batched matmuls on the MXU (the reference's
  per-position Python conv loops become single einsums),
- training epochs as `lax.scan` over device-resident data (no host
  DataLoader round-trips),
- data-parallel scaling over a `jax.sharding.Mesh` with psum'd
  gradients and codebook statistics,
- hot kernels (VQ nearest-neighbor, causal flash attention) as Pallas
  TPU kernels.
"""

__version__ = "0.1.0"
