"""Task adapters: bind a model to its loss/metrics and batch layout.

The reference encodes per-task behavior in LightningModule step methods
(autencoder_lightning_base.py:86-120, classification_model.py:110-152,
transformer_decoder.py:139-201); here each task is a small adapter the
Trainer drives through one jitted scan. Metric names match the
reference namespace exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .metrics import classification_metrics, cross_entropy


class Task:
    """Interface: batch_arrays(split), loss_and_metrics(...)."""
    model = None
    weighted_sampler = False

    def batch_arrays(self, split):
        raise NotImplementedError

    def loss_and_metrics(self, params, state, batch, *, train, rng):
        raise NotImplementedError


def _as_device_f32(x):
    """jnp.asarray that passes WindowedArray views through (the window
    gather then happens inside the jitted step — data/windowed.py)."""
    from ..data.windowed import WindowedArray
    if isinstance(x, WindowedArray):
        return x.astype(jnp.float32)
    return jnp.asarray(x, jnp.float32)


class ReconstructionTask(Task):
    """VQ-VAE training (reference autencoder_lightning_base.py:80-120)."""

    def __init__(self, model):
        self.model = model

    def batch_arrays(self, split):
        return (_as_device_f32(split.x),)

    def loss_and_metrics(self, params, state, batch, *, train, rng):
        (x,) = batch
        loss, (metrics, new_state) = self.model.loss_fn(
            params, state, x, train=train, rng=rng)
        return loss, metrics, new_state


class ClassificationTask(Task):
    """MLP/GRU/MLPEmbedding binary classification
    (reference classification_model.py:85-152)."""

    weighted_sampler = True

    def __init__(self, model, ids_input: bool = False):
        self.model = model
        self.ids_input = ids_input

    def batch_arrays(self, split):
        if self.ids_input:
            x = jnp.asarray(split.x, jnp.int32)
            x = x.reshape(x.shape[0], -1)
        else:
            x = _as_device_f32(split.x)
        return x, jnp.asarray(split.y, jnp.int32)

    def loss_and_metrics(self, params, state, batch, *, train, rng):
        x, y = batch
        logits, new_state = self.model.apply(params, state, x, train=train,
                                             rng=rng)
        loss = cross_entropy(logits, y)
        metrics = {"loss": loss, **classification_metrics(logits, y)}
        return loss, metrics, new_state


class TransformerGenTask(Task):
    """Next-token generation over latent ids
    (reference transformer_decoder.py:145-149)."""

    def __init__(self, model):
        self.model = model

    def batch_arrays(self, split):
        return (jnp.asarray(split.x, jnp.int32),
                jnp.asarray(split.cond, jnp.int32),
                jnp.asarray(split.y, jnp.int32))

    def loss_and_metrics(self, params, state, batch, *, train, rng):
        x, _, y = batch
        logits, new_state = self.model.apply(params, state, x, train=train,
                                             rng=rng, generate=True)
        loss = self.model.loss_gen(logits, y)
        return loss, {"loss": loss}, new_state


class TransformerClassTask(Task):
    """Binary quality classification via the class head
    (reference transformer_decoder.py:151-167). Metric namespace uses
    the reference's `cl/` prefix."""

    weighted_sampler = True
    metric_namespace = "cl"

    def __init__(self, model):
        self.model = model

    def batch_arrays(self, split):
        return (jnp.asarray(split.x, jnp.int32),
                jnp.asarray(split.cond, jnp.int32),
                jnp.asarray(split.y, jnp.int32))

    def loss_and_metrics(self, params, state, batch, *, train, rng):
        x, cond, _ = batch
        logits, new_state = self.model.apply(params, state, x, train=train,
                                             rng=rng, generate=False)
        loss = self.model.loss_class(logits, cond)
        m = classification_metrics(logits, cond)
        # acc_good/acc_bad are the constant-predictor tripwire: a head
        # stuck predicting one class shows (1.0, 0.0) or (0.0, 1.0).
        # The reference logs them for the standalone classifiers
        # (model/classification_model.py:103-106); surfacing them here
        # too makes "non-degenerate" checkable from the leg output.
        metrics = {"loss": loss, "acc": m["acc"], "f1_score": m["f1_score"],
                   "acc_good": m["acc_good"], "acc_bad": m["acc_bad"]}
        return loss, metrics, new_state
