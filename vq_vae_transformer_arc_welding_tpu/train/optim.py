"""Optimizers: torch-RAdam-equivalent optax chains.

The reference uses torch.optim.RAdam everywhere (autoencoder and
classifiers with defaults, transformer with betas (0.9, 0.95) + L2
weight decay 0.1 on Linear weights only — transformer_decoder.py:64-114)
and Lightning's global-norm gradient clipping. We compose the same
algorithm: clip -> (optional masked L2-added-to-grad) -> scale_by_radam
-> -lr. torch RAdam adds wd*p to the gradient *before* the adaptive
moments, which is exactly add_decayed_weights placed before
scale_by_radam in an optax chain (not decoupled AdamW-style decay).
"""
from __future__ import annotations

import optax


def make_radam(learning_rate: float, *, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0, decay_mask=None,
               clip_norm: float | None = None):
    parts = []
    if clip_norm is not None and clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    parts.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps,
                                      threshold=5.0))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)


def cosine_warmup_schedule(warmup: int, max_iters: int):
    """Cosine LR factor with linear warmup (reference
    classification_model.py:10-24 CosineWarmupScheduler — defined but
    unused there; exposed here as a first-class optax schedule)."""
    import jax.numpy as jnp

    def schedule(step):
        factor = 0.5 * (1 + jnp.cos(jnp.pi * step / max_iters))
        return jnp.where(step <= warmup,
                         factor * step / jnp.maximum(warmup, 1), factor)

    return schedule


def make_transformer_optimizer(model, params, *, clip_norm: float | None = 0.8):
    """RAdam(betas 0.9/0.95) with the minGPT decay/no-decay split."""
    mask = model.decay_mask(params)
    return make_radam(model.learning_rate, betas=model.betas,
                      weight_decay=model.weight_decay, decay_mask=mask,
                      clip_norm=clip_norm)
