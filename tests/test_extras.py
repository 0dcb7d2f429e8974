"""Tests for auxiliary parity components: OOD scoring, schedules,
undersampling, plot helpers, embedding variants, npy export."""
import os

import numpy as np

import jax
import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.data.datasets import (
    shuffle_and_undersample)
from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
from vq_vae_transformer_arc_welding_tpu.models.embedding import (
    latent_embedding, latent_embedding_cond, positional_embedding)
from vq_vae_transformer_arc_welding_tpu.models.plot_helper import (
    plot_recon_matplotlib)
from vq_vae_transformer_arc_welding_tpu.train.optim import (
    cosine_warmup_schedule)


def test_forward_ood_orders_outliers(rng):
    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                       batch_norm=False)
    params, state = model.init(0)
    x = rng.standard_normal((4, 200, 2)).astype(np.float32)
    scores = model.forward_ood(params, state, jnp.asarray(x))
    assert scores.shape == (4,)
    # scaling one sample far out of distribution must raise its score
    x_out = x.copy()
    x_out[2] *= 50.0
    scores2 = model.forward_ood(params, state, jnp.asarray(x_out))
    assert float(scores2[2]) > float(scores[2])
    assert float(scores2[2]) == max(float(s) for s in scores2)


def test_cosine_warmup_schedule_factors():
    sched = cosine_warmup_schedule(warmup=10, max_iters=100)
    assert float(sched(0)) == 0.0
    # mid-warmup: cosine * linear ramp
    e = 5
    expect = 0.5 * (1 + np.cos(np.pi * e / 100)) * e / 10
    np.testing.assert_allclose(float(sched(e)), expect, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-6)


def test_shuffle_and_undersample_balances(rng):
    x = rng.standard_normal((100, 3)).astype(np.float32)
    y = (rng.random(100) > 0.8).astype(np.int64)  # imbalanced
    xb, yb = shuffle_and_undersample(rng, x, y)
    assert (yb == 0).sum() == (yb == 1).sum()
    assert len(xb) == 2 * min((y == 0).sum(), (y == 1).sum())


def test_plot_recon_matplotlib(tmp_path, rng):
    t = rng.standard_normal((200, 2)).astype(np.float32)
    p = t + 0.1 * rng.standard_normal((200, 2)).astype(np.float32)
    out = str(tmp_path / "recon.png")
    plot_recon_matplotlib(t, p, out, title="cycle 0")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_embedding_variants(rng):
    tok = jnp.asarray(rng.standard_normal((10, 8)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 10, (3, 5)), jnp.int32)
    labels = jnp.asarray([0, 1, 0], jnp.int32)
    pe = positional_embedding(5, 8)
    base = latent_embedding(ids, tok)
    np.testing.assert_allclose(np.asarray(base),
                               np.asarray(jnp.take(tok, ids, axis=0) + pe),
                               rtol=1e-6)
    withc = latent_embedding_cond(ids, labels, tok, cond)
    np.testing.assert_allclose(
        np.asarray(withc - base),
        np.broadcast_to(np.asarray(jnp.take(cond, labels, axis=0))[:, None, :],
                        (3, 5, 8)), rtol=1e-5)


def test_load_npy_data(tmp_path):
    from types import SimpleNamespace

    from vq_vae_transformer_arc_welding_tpu.data.asimow import load_npy_data
    from vq_vae_transformer_arc_welding_tpu.data.splits import (
        DataSplitId, get_val_test_ids)
    from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
        write_synthetic_csv)

    d = str(tmp_path)
    write_synthetic_csv(os.path.join(d, "processed_asimow_dataset.csv"),
                        n_cycles_per_run=20, extra_train_runs=2)
    ids = get_val_test_ids()
    cfg = SimpleNamespace(batch_size=8, n_cycles=1, data_dir=d)
    tr_x, tr_y, v_x, v_y, te_x, te_y = load_npy_data(
        cfg, [DataSplitId(*i) for i in ids["val_ids"]],
        [DataSplitId(*i) for i in ids["test_ids"]])
    assert tr_x.shape[1:] == (200, 2) and tr_y is not None
    assert len(v_x) and len(te_x)
