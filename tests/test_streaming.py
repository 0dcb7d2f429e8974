"""Streaming (beyond-HBM) training path: mmap datasets, native batch
gather, and bitwise loss equivalence with the resident scan epoch."""
import numpy as np
import pytest

from vq_vae_transformer_arc_welding_tpu.data.datasets import (ArraySplit,
                                                              sampling_weights)
from vq_vae_transformer_arc_welding_tpu.data.streaming import (MmapDataset,
                                                               StreamingSplit)
from vq_vae_transformer_arc_welding_tpu.models import MLP
from vq_vae_transformer_arc_welding_tpu.train.loop import Trainer
from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam
from vq_vae_transformer_arc_welding_tpu.train.tasks import ClassificationTask


def _toy_data(rng, n=200, t=40, c=2):
    y = rng.integers(0, 2, n).astype(np.int64)
    x = rng.standard_normal((n, t, c)).astype(np.float32)
    x[y == 1] += 0.8
    return x, y


def test_mmap_dataset_roundtrip_and_native_gather(tmp_path, rng):
    x, y = _toy_data(rng)
    path = str(tmp_path / "ds")
    MmapDataset.write(path, x, y)
    ds = MmapDataset(path)
    assert len(ds) == len(x) and ds.x.shape == x.shape
    np.testing.assert_array_equal(ds.y, y)
    idx = rng.integers(0, len(x), 37)
    np.testing.assert_array_equal(ds.x[idx], x[idx])          # gather
    np.testing.assert_array_equal(np.asarray(ds.x), x)        # full view


def test_native_gather_matches_numpy(rng):
    from vq_vae_transformer_arc_welding_tpu.data.streaming import (
        _native_gather)
    from vq_vae_transformer_arc_welding_tpu.native.build import (
        load_native_lib)
    if load_native_lib() is None:
        pytest.skip("native lib unavailable")
    mm = np.ascontiguousarray(
        rng.standard_normal((500, 96)).astype(np.float32))
    idx = rng.integers(0, 500, 333).astype(np.int64)
    out = np.empty((333, 96), np.float32)
    assert _native_gather(mm, idx, out)
    np.testing.assert_array_equal(out, mm[idx])


class _DM:
    drop_last = True
    batch_size = 16

    def __init__(self, train, val, weights):
        self.train, self.val, self.test = train, val, val
        self.train_sampling = weights


def test_streaming_fit_bitwise_equals_resident(tmp_path, rng):
    """Same seeds, same data: the streaming epoch (host gather +
    device_put per group) must reproduce the resident scan epoch's
    training losses bitwise — incl. grad accumulation and weighted
    sampling streams."""
    x, y = _toy_data(rng)
    xv, yv = _toy_data(rng, n=64)
    weights = sampling_weights(y)

    path = str(tmp_path / "train")
    MmapDataset.write(path, x, y)
    stream_dm = _DM(StreamingSplit(MmapDataset(path)),
                    ArraySplit(xv, yv), weights)
    resident_dm = _DM(ArraySplit(x, y), ArraySplit(xv, yv), weights)

    losses = {}
    for name, dm, streaming in (("res", resident_dm, False),
                                ("str", stream_dm, True)):
        model = MLP(input_size=40, output_size=2, in_dim=2, hidden_sizes=16,
                    n_hidden_layers=1, dropout_p=0.1, learning_rate=1e-3)
        params, state = model.init(0)
        tr = Trainer(max_epochs=3, seed=5, verbose=False,
                     accumulate_grad_batches=2, streaming=streaming,
                     monitor="val/f1_score_mean", mode="max")
        res = tr.fit(ClassificationTask(model), dm, params, state,
                     make_radam(1e-3, clip_norm=0.5))
        losses[name] = ([row.get("train/loss") for row in res.history],
                        res.best_score)
    assert losses["res"] == losses["str"], losses


def test_streaming_mesh_unsupported():
    try:
        Trainer(streaming=True, mesh=object())
        assert False, "expected NotImplementedError"
    except NotImplementedError:
        pass
