"""Optimizer parity: our RAdam chains vs torch.optim.RAdam, including
the transformer's L2-in-grad weight decay and global-norm clipping."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam


def _run_both(weight_decay=0.0, betas=(0.9, 0.999), clip=None, steps=6,
              lr=1e-2, shape=(4, 3)):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(shape).astype(np.float32)
    grads = [rng.standard_normal(shape).astype(np.float32)
             for _ in range(steps)]

    # torch side
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.RAdam([p], lr=lr, betas=betas,
                            weight_decay=weight_decay)
    for g in grads:
        opt.zero_grad()
        gt = torch.tensor(g)
        if clip is not None:
            # Lightning clips the raw gradient by global norm pre-step
            norm = gt.norm()
            if norm > clip:
                gt = gt * (clip / norm)
        p.grad = gt.clone()
        opt.step()

    # ours
    mask = jax.tree_util.tree_map(lambda _: True, {"w": 0})
    tx = make_radam(lr, betas=betas, weight_decay=weight_decay,
                    decay_mask=mask if weight_decay else None,
                    clip_norm=clip)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
    return p.detach().numpy(), np.asarray(params["w"])


def test_radam_matches_torch_defaults():
    ref, ours = _run_both()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_radam_matches_torch_transformer_config():
    """betas (0.9, 0.95) + weight decay 0.1 + clip 0.8 — the
    transformer's optimizer (reference transformer_decoder.py:111-112)."""
    ref, ours = _run_both(weight_decay=0.1, betas=(0.9, 0.95), clip=0.8)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_radam_rectification_boundary():
    """RAdam switches from unrectified to rectified updates around
    step 5 (rho threshold) — run enough steps to cross it. torch
    computes the rectification scalars in float64 while our traced
    coefficients are f32, leaving ~1e-6/step drift — bounded here."""
    ref, ours = _run_both(steps=12)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_weight_decay_skips_out_of_graph_params():
    """torch.optim skips parameters whose grad is None (out of the loss
    graph) — no decay, no moments. The transformer's alternating tasks
    depend on this: during class-only training the lm_head must stay
    untouched, not decay toward zero (wd=0.1 would pin gen loss at
    ln(V); round-2 regression)."""
    import jax
    import jax.numpy as jnp
    import optax
    from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam

    params = {"used_w": jnp.ones((4, 4)), "unused_w": jnp.ones((4, 4)),
              "bias": jnp.ones((4,))}
    mask = {"used_w": True, "unused_w": True, "bias": False}
    tx = make_radam(1e-1, betas=(0.9, 0.95), weight_decay=0.1,
                    decay_mask=mask, clip_norm=0.8)
    state = tx.init(params)
    grads = {"used_w": jnp.full((4, 4), 0.01),
             "unused_w": jnp.zeros((4, 4)),       # out of graph
             "bias": jnp.zeros((4,))}
    p = params
    for _ in range(20):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)
    # the unused head is bit-untouched; the used one moved
    assert jnp.array_equal(p["unused_w"], params["unused_w"])
    assert jnp.array_equal(p["bias"], params["bias"])
    assert float(jnp.max(jnp.abs(p["used_w"] - params["used_w"]))) > 1e-3


def test_radam_per_param_step_counts_match_torch():
    """torch.optim.RAdam keeps state['step'] PER PARAMETER and skips
    grad=None params entirely; under the reference's alternating
    multitask schedule the idle head's eventual first updates therefore
    run the early rectification (momentum) branch regardless of how
    many steps the other head took. A global step count drops it into
    the adaptive branch instead — found by the 50-step reference-scale
    trajectory (divergence exactly one optimizer step after the task
    switch; results/ref_scale_parity_50step.json)."""
    rng = np.random.default_rng(3)
    shape = (4, 3)
    a0 = rng.standard_normal(shape).astype(np.float32)
    b0 = rng.standard_normal(shape).astype(np.float32)
    ga = [rng.standard_normal(shape).astype(np.float32) for _ in range(18)]
    gb = [rng.standard_normal(shape).astype(np.float32) for _ in range(18)]

    # torch: param B idle (grad=None) for the first 10 steps — covers
    # torch-B's full momentum branch (t<=4) and the adaptive entry
    pa = torch.nn.Parameter(torch.tensor(a0.copy()))
    pb = torch.nn.Parameter(torch.tensor(b0.copy()))
    opt = torch.optim.RAdam([pa, pb], lr=1e-2, betas=(0.9, 0.95))
    for i in range(18):
        opt.zero_grad()
        pa.grad = torch.tensor(ga[i])
        if i >= 10:
            pb.grad = torch.tensor(gb[i])
        opt.step()

    from vq_vae_transformer_arc_welding_tpu.train.optim import (
        scale_by_torch_radam)
    tx = optax.chain(scale_by_torch_radam(0.9, 0.95), optax.scale(-1e-2))
    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = tx.init(params)
    for i in range(18):
        g = {"a": jnp.asarray(ga[i]),
             "b": jnp.asarray(gb[i]) if i >= 10 else jnp.zeros(shape)}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["a"]),
                               pa.detach().numpy(), rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               pb.detach().numpy(), rtol=0, atol=2e-6)
