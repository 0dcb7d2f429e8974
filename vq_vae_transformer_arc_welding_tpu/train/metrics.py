"""Classification metrics matching torchmetrics semantics used by the
reference (model/classification_model.py:85-108).

- accuracy: micro average over the two classes (torchmetrics
  accuracy(task='multiclass', num_classes=2) default).
- binary F1 on the positive class, 0 when the denominator is 0.
- per-class accuracies acc_good (label 1) / acc_bad (label 0), 0 when
  the class is absent from the batch (reference :103-106).

All pure jnp so they run inside the jitted epoch scan; the epoch-level
`*_mean` aggregation (mean over *batches*, reference :154-171) happens
on the stacked per-batch values.
"""
from __future__ import annotations

import jax.numpy as jnp


def accuracy_micro(preds, y):
    return jnp.mean((preds == y).astype(jnp.float32))


def per_class_accuracy(preds, y, cls: int):
    in_cls = (y == cls)
    n = jnp.sum(in_cls)
    correct = jnp.sum((preds == cls) & in_cls)
    return jnp.where(n > 0, correct / jnp.maximum(n, 1), 0.0).astype(jnp.float32)


def binary_f1(preds, y):
    tp = jnp.sum((preds == 1) & (y == 1)).astype(jnp.float32)
    fp = jnp.sum((preds == 1) & (y == 0)).astype(jnp.float32)
    fn = jnp.sum((preds == 0) & (y == 1)).astype(jnp.float32)
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1e-9), 0.0)


def classification_metrics(logits, y):
    """Returns the reference's per-batch metric dict (loss excluded)."""
    preds = jnp.argmax(logits, axis=-1)
    return {
        "acc": accuracy_micro(preds, y),
        "acc_good": per_class_accuracy(preds, y, 1),
        "acc_bad": per_class_accuracy(preds, y, 0),
        "f1_score": binary_f1(preds, y),
    }


def cross_entropy(logits, labels):
    """torch F.cross_entropy (mean reduction) for integer labels."""
    import jax
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
