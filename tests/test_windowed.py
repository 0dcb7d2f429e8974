"""On-device windowing (data/windowed.py): bit-equivalence with the
materialized window path and end-to-end training equivalence."""
import numpy as np
import pytest

import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.data import (ASIMoWDataModule,
                                                     get_val_test_ids)
from vq_vae_transformer_arc_welding_tpu.data.scaler import StandardScaler
from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
    write_synthetic_csv)
from vq_vae_transformer_arc_welding_tpu.data.windowed import (
    WindowedArray, fit_scaler_on_windows, window_counts)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("asimow_windowed")
    write_synthetic_csv(str(d / "processed_asimow_dataset.csv"),
                        n_cycles_per_run=30, extra_train_runs=3)
    return str(d)


def _modules(data_dir, task="classification", n_cycles=5, offset=0,
             window=200):
    ids = get_val_test_ids()
    kw = dict(task=task, n_cycles=n_cycles, val_data_ids=ids["val_ids"],
              test_data_ids=ids["test_ids"], batch_size=16,
              data_directory_path=data_dir, window_offset=offset,
              window_size=window)
    a = ASIMoWDataModule(**kw)
    b = ASIMoWDataModule(**kw, window_mode="ondevice")
    a.setup()
    b.setup()
    return a, b


def test_windowed_view_bit_equals_materialized(data_dir):
    mat, dev = _modules(data_dir)
    for name in ("train", "val", "test"):
        sa, sb = getattr(mat, name), getattr(dev, name)
        assert isinstance(sb.x, WindowedArray)
        assert sb.x.shape == sa.x.shape
        assert len(sb.x) == len(sa.x)
        np.testing.assert_array_equal(sb.x.materialize(), sa.x)
        np.testing.assert_array_equal(sb.y, sa.y)
    # scaler stats identical (window-multiset weighting is exact)
    np.testing.assert_allclose(dev.scaler.mean_, mat.scaler.mean_,
                               rtol=1e-10)
    np.testing.assert_allclose(dev.scaler.scale_, mat.scaler.scale_,
                               rtol=1e-10)
    # batch gather with an arbitrary index set
    idx = np.array([3, 0, 17, 5])
    np.testing.assert_array_equal(np.asarray(dev.train.x[idx]),
                                  mat.train.x[idx])


def test_windowed_view_with_offset_window(data_dir):
    mat, dev = _modules(data_dir, n_cycles=3, offset=20, window=150)
    np.testing.assert_array_equal(dev.train.x.materialize(), mat.train.x)


def test_window_counts_match_materialized_multiset():
    n_total, seq = 23, 5
    c = window_counts(n_total, seq)
    brute = np.zeros(n_total, np.int64)
    for i in range(n_total - seq):
        brute[i:i + seq] += 1
    np.testing.assert_array_equal(c, brute)

    rng = np.random.default_rng(0)
    cycles = rng.standard_normal((n_total, 7, 2)).astype(np.float32)
    idx = np.arange(n_total - seq)[:, None] + np.arange(seq)
    windows = cycles[idx].reshape(n_total - seq, -1, 2)
    ref = StandardScaler().fit(windows)
    ours = fit_scaler_on_windows(StandardScaler(), cycles, seq)
    np.testing.assert_allclose(ours.mean_, ref.mean_, rtol=1e-12)
    np.testing.assert_allclose(ours.scale_, ref.scale_, rtol=1e-12)


def test_windowed_training_loss_equivalence(data_dir):
    """A full fit on the windowed view must reproduce the materialized
    path's losses exactly (same sampling stream, same batch values)."""
    from vq_vae_transformer_arc_welding_tpu.models import MLP
    from vq_vae_transformer_arc_welding_tpu.train.loop import Trainer
    from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam
    from vq_vae_transformer_arc_welding_tpu.train.tasks import (
        ClassificationTask)

    mat, dev = _modules(data_dir, n_cycles=3)
    losses = {}
    for name, dm in (("mat", mat), ("dev", dev)):
        model = MLP(input_size=200 * 3, output_size=2, in_dim=2,
                    hidden_sizes=16, n_hidden_layers=1, dropout_p=0.0,
                    learning_rate=1e-3)
        params, state = model.init(0)
        tr = Trainer(max_epochs=2, seed=3, verbose=False)
        res = tr.fit(ClassificationTask(model), dm, params, state,
                     make_radam(1e-3, clip_norm=0.42))
        losses[name] = [row.get("train/loss") for row in res.history]
        metrics = tr.evaluate(ClassificationTask(model), res.final_params,
                              res.final_state, dm.val, dm.batch_size,
                              dm.drop_last, "val")
        losses[name + "_val"] = metrics["val/loss"]
    assert losses["mat"] == losses["dev"], (losses["mat"], losses["dev"])
    assert losses["mat_val"] == losses["dev_val"]
