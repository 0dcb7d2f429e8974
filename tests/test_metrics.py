"""Metric golden tests vs sklearn (torchmetrics is not in this image;
binary F1 / micro accuracy definitions coincide)."""
import numpy as np
from sklearn.metrics import accuracy_score, f1_score

import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.train.metrics import (
    accuracy_micro, binary_f1, classification_metrics, cross_entropy,
    per_class_accuracy)


def test_f1_and_accuracy_match_sklearn(rng):
    for _ in range(5):
        y = rng.integers(0, 2, 64)
        p = rng.integers(0, 2, 64)
        np.testing.assert_allclose(
            float(binary_f1(jnp.asarray(p), jnp.asarray(y))),
            f1_score(y, p, average="binary", zero_division=0), rtol=1e-6)
        np.testing.assert_allclose(
            float(accuracy_micro(jnp.asarray(p), jnp.asarray(y))),
            accuracy_score(y, p), rtol=1e-6)


def test_f1_zero_denominator_is_zero():
    y = np.zeros(8, np.int64)
    p = np.zeros(8, np.int64)
    assert float(binary_f1(jnp.asarray(p), jnp.asarray(y))) == 0.0


def test_per_class_accuracy_absent_class_is_zero():
    y = np.ones(8, np.int64)
    p = np.ones(8, np.int64)
    assert float(per_class_accuracy(jnp.asarray(p), jnp.asarray(y), 0)) == 0.0
    assert float(per_class_accuracy(jnp.asarray(p), jnp.asarray(y), 1)) == 1.0


def test_cross_entropy_matches_torch(rng):
    import torch
    logits = rng.standard_normal((16, 5)).astype(np.float32)
    y = rng.integers(0, 5, 16)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(y)).numpy()
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_classification_metrics_keys(rng):
    logits = jnp.asarray(rng.standard_normal((16, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, 16), jnp.int32)
    m = classification_metrics(logits, y)
    assert set(m) == {"acc", "acc_good", "acc_bad", "f1_score"}
