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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_torch_radam(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8) -> optax.GradientTransformation:
    """Bit-faithful torch.optim.RAdam scaling, including PER-PARAMETER
    step counts.

    Two torch behaviors matter here:

    - eps placement: optax.scale_by_radam applies eps to the
      bias-corrected sqrt(v_hat); torch applies it to raw sqrt(v) and
      multiplies the numerator by sqrt(1-b2^t) — trajectories diverge
      ~1e-6/step once rectification engages. Matched exactly
      (tests/test_optim.py).
    - step counting: torch keeps `state['step']` PER PARAMETER and
      skips grad=None params entirely (no step, no moment update, no
      change). Under the reference's alternating multitask schedule
      the idle head is exactly such a param for whole stages, so its
      eventual first updates run the t=1,2,... rectification
      (momentum) branch — while a global count (optax-style) would
      drop it straight into the adaptive branch at t=N_other_stage.
      Found by the 50-step reference-scale trajectory
      (results/ref_scale_parity_50step.json: bit-tight for the 25-step
      gen prefix, divergence starting ONE step after the task switch).
      As with add_decayed_weights_where_grad below, an all-zero
      gradient tensor is jax's observable for torch's grad=None.
    """
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        counts = jax.tree_util.tree_map(
            lambda _: jnp.zeros([], jnp.int32), params)
        return _RAdamState(counts, zeros,
                           jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params

        def leaf(c, m, v, g):
            in_graph = jnp.any(g != 0)
            t_new = c + in_graph.astype(c.dtype)
            m_new = jnp.where(in_graph, b1 * m + (1 - b1) * g, m)
            v_new = jnp.where(in_graph, b2 * v + (1 - b2) * g * g, v)
            # t_safe only guards the div-by-zero of a never-updated
            # leaf, whose output is zeroed below anyway
            t = jnp.maximum(t_new.astype(jnp.float32), 1.0)
            bc1 = 1.0 - b1 ** t
            bc2 = 1.0 - b2 ** t
            rho_t = rho_inf - 2.0 * t * (b2 ** t) / bc2
            rect = jnp.sqrt(((rho_t - 4.0) * (rho_t - 2.0) * rho_inf)
                            / ((rho_inf - 4.0) * (rho_inf - 2.0) * rho_t))
            mhat = m_new / bc1
            adaptive = jnp.sqrt(bc2) / (jnp.sqrt(v_new) + eps)
            out = jnp.where(rho_t > 5.0, mhat * adaptive * rect, mhat)
            return (jnp.where(in_graph, out, jnp.zeros_like(out)),
                    t_new, m_new, v_new)

        out = jax.tree_util.tree_map(leaf, state.count, state.mu,
                                     state.nu, updates)
        is_tup = lambda x: isinstance(x, tuple)  # noqa: E731
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda o: o[i], out, is_leaf=is_tup)
        return pick(0), _RAdamState(pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init, update)


def add_decayed_weights_where_grad(
        weight_decay: float, mask=None) -> optax.GradientTransformation:
    """L2-to-gradient weight decay that SKIPS parameters whose incoming
    gradient tensor is all-zero.

    torch semantics: a parameter outside the loss graph has grad=None
    and torch.optim.RAdam skips it entirely — no decay, no moment
    update. The reference's alternating-task transformer relies on this
    (the inactive lm_head/class_head gets no grads during the other
    task's stages; that's also why it needs DDP
    find_unused_parameters=True, train_transformer_mtasks.py:31).
    Plain optax.add_decayed_weights would decay the inactive head every
    step (wd=0.1 -> the head collapses toward zero over a stage, gen
    loss pinned at ln(V)) — found via the round-2 quality study.

    In jax, out-of-graph parameters surface as exact-zero gradient
    tensors, so `any(g != 0)` is the None-test. An in-graph parameter
    with a numerically all-zero gradient (measure-zero event for float
    losses) would also skip its decay that step — torch would decay it;
    accepted deviation."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("add_decayed_weights_where_grad needs params")
        mask_tree = (mask if mask is not None
                     else jax.tree_util.tree_map(lambda _: True, updates))

        def leaf(g, p, m):
            if not m:
                return g
            in_graph = jnp.any(g != 0).astype(g.dtype)
            return g + weight_decay * in_graph * p

        return (jax.tree_util.tree_map(leaf, updates, params, mask_tree),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def make_radam(learning_rate: float, *, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0, decay_mask=None,
               clip_norm: float | None = None):
    parts = []
    if clip_norm is not None and clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(add_decayed_weights_where_grad(weight_decay,
                                                    mask=decay_mask))
    parts.append(scale_by_torch_radam(b1=betas[0], b2=betas[1], eps=eps))
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
