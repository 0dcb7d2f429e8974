"""Data-layer tests: CSV schema, splits, windowing, scaling, latent
materialization (test strategy per SURVEY.md §4 — the reference ships
no tests, so transforms are verified against hand-computed goldens and
a reference-style loop implementation)."""
import os

import numpy as np
import pytest

from vq_vae_transformer_arc_welding_tpu.data import (ASIMoWDataModule,
                                                     DataSplitId,
                                                     LatentPredDataModule,
                                                     StandardScaler,
                                                     get_val_test_ids,
                                                     load_asimow_csv,
                                                     make_autoregressive,
                                                     sampling_weights)
from vq_vae_transformer_arc_welding_tpu.data.asimow import (
    create_sequence_windows)
from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
    make_synthetic_arrays, write_synthetic_csv)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("asimow")
    write_synthetic_csv(str(d / "processed_asimow_dataset.csv"),
                        n_cycles_per_run=30, extra_train_runs=3)
    return str(d)


def test_csv_roundtrip(data_dir):
    vi, labels, exp, run = load_asimow_csv(
        os.path.join(data_dir, "processed_asimow_dataset.csv"))
    assert vi.shape[1:] == (200, 2)
    assert set(np.unique(labels)) <= {-1, 0, 1}
    assert len(vi) == len(labels) == len(exp) == len(run)
    # every benchmark val/test id present
    ids = get_val_test_ids()
    pairs = set(zip(exp.tolist(), run.tolist()))
    for e, w in ids["val_ids"] + ids["test_ids"]:
        assert (e, w) in pairs


def test_sequence_windows_match_reference_loop(rng):
    """Vectorized windowing == the reference's Python loop
    (asimow_dataloader.py:185-206)."""
    x = rng.standard_normal((20, 200, 2)).astype(np.float32)
    y = rng.integers(0, 2, 20)
    seq_len, wsize, woff = 5, 180, 10

    new_x = np.zeros((x.shape[0] - seq_len, wsize * seq_len, x.shape[2]))
    new_y = np.zeros((y.shape[0] - seq_len))
    for i in range(x.shape[0] - seq_len):
        x_t = x[i:i + seq_len][:, woff:woff + wsize, :]
        new_x[i] = x_t.reshape(-1, 2)
        new_y[i] = y[i + seq_len]

    ours_x, ours_y = create_sequence_windows(x, y, seq_len, wsize, woff)
    np.testing.assert_allclose(ours_x, new_x, rtol=1e-6)
    np.testing.assert_array_equal(ours_y, new_y)


def test_scaler_matches_population_stats(rng):
    x = rng.standard_normal((50, 10, 2)).astype(np.float32) * 3 + 5
    sc = StandardScaler().fit(x)
    flat = x.reshape(-1, 2)
    np.testing.assert_allclose(sc.mean_, flat.mean(0), rtol=1e-5)
    np.testing.assert_allclose(sc.scale_, flat.std(0), rtol=1e-5)
    t = sc.transform(x)
    np.testing.assert_allclose(t.reshape(-1, 2).mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(t.reshape(-1, 2).std(0), 1, atol=1e-4)
    np.testing.assert_allclose(sc.inverse_transform(t), x, rtol=1e-4,
                               atol=1e-4)


def test_sampling_weights_balance():
    labels = np.array([0, 0, 0, 1])
    w = sampling_weights(labels)
    np.testing.assert_allclose(w, [0.25, 0.25, 0.25, 0.75])
    # expected mass per class equal: 3*0.25 == 1*0.75
    assert abs(w[labels == 0].sum() - w[labels == 1].sum()) < 1e-6


def test_make_autoregressive_shift():
    ids = np.array([[1, 2, 3], [3, 0, 1]])
    labels = np.array([1, 0])
    split, num_classes = make_autoregressive(ids, labels)
    assert num_classes == 6  # max 3 -> start 4, end 5, classes 6
    np.testing.assert_array_equal(split.x, [[4, 1, 2, 3], [4, 3, 0, 1]])
    np.testing.assert_array_equal(split.y, [[1, 2, 3, 5], [3, 0, 1, 5]])
    np.testing.assert_array_equal(split.cond, labels)


def test_asimow_module_classification(data_dir):
    ids = get_val_test_ids()
    dm = ASIMoWDataModule(task="classification", n_cycles=3,
                          val_data_ids=ids["val_ids"],
                          test_data_ids=ids["test_ids"], batch_size=8,
                          data_directory_path=data_dir)
    dm.setup()
    assert dm.train.x.shape[1:] == (600, 2)
    assert dm.train.y.dtype == np.int64
    assert set(np.unique(dm.train.y)) <= {0, 1}  # -1 filtered
    assert dm.train_sampling is not None
    assert len(dm.train_sampling) == len(dm.train.x)
    # val/test non-empty and disjoint sizes sane
    assert len(dm.val.x) > 0 and len(dm.test.x) > 0
    # train data standard-scaled
    flat = dm.train.x.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), 0, atol=1e-3)
    np.testing.assert_allclose(flat.std(0), 1, atol=1e-2)


def test_asimow_module_reconstruction(data_dir):
    ids = get_val_test_ids()
    dm = ASIMoWDataModule(task="reconstruction", n_cycles=1,
                          val_data_ids=ids["val_ids"],
                          test_data_ids=ids["test_ids"], batch_size=8,
                          data_directory_path=data_dir)
    dm.setup()
    assert dm.train.x.shape[1:] == (200, 2)
    assert dm.train.y is None
    assert dm.train_sampling is None
    # reconstruction keeps unlabeled cycles
    vi, labels, exp, run = load_asimow_csv(
        os.path.join(data_dir, "processed_asimow_dataset.csv"))
    ids_d = get_val_test_ids()
    heldout = set(ids_d["val_ids"]) | set(ids_d["test_ids"])
    n_train_cycles = sum((e, w) not in heldout
                         for e, w in zip(exp.tolist(), run.tolist()))
    assert len(dm.train.x) == n_train_cycles


@pytest.mark.parametrize("task,xdtype", [
    ("classification", np.float32),
    ("classification_ids", np.int64),
    ("autoregressive_ids", np.int64),
    ("autoregressive_ids_classification", np.int64),
])
def test_latent_module_tasks(data_dir, task, xdtype):
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                       batch_norm=False)
    params, state = model.init(0)
    ids = get_val_test_ids()
    n_cycles = 2
    dm = LatentPredDataModule(
        (model, params, state), task=task, n_cycles=n_cycles,
        val_data_ids=[DataSplitId(*v) for v in ids["val_ids"]],
        test_data_ids=[DataSplitId(*v) for v in ids["test_ids"]],
        batch_size=8, data_directory_path=data_dir)
    dm.setup()
    assert dm.train.x.dtype == xdtype
    if task == "classification":
        assert dm.train.x.shape[1:] == (n_cycles, 4 * model.enc_out_len)
        assert dm.train_sampling is not None
    elif task == "classification_ids":
        assert dm.train.x.shape[1:] == (n_cycles, model.enc_out_len)
    else:
        # start token prepended: n_cycles*16 + 1
        assert dm.train.x.shape[1] == n_cycles * model.enc_out_len + 1
        assert dm.train.y.shape == dm.train.x.shape
        assert dm.num_classes is not None
        if task == "autoregressive_ids":
            assert dm.train_sampling is None
            np.testing.assert_array_equal(dm.train.cond,
                                          np.zeros(len(dm.train.x)))
    # ids within valid range
    if xdtype == np.int64 and task != "classification":
        assert dm.train.x.max() < 8 + 2 or task.startswith("autoregressive")


def test_latent_module_depends_on_vq_params(data_dir):
    """Latent materialization must be a pure function of the frozen VQ
    checkpoint's CONTENTS: different codebooks -> different token
    datasets, same codebook -> bit-identical ones. Guards against any
    future disk/memory cache keyed on checkpoint *identity* (path or
    model_id) rather than contents — the failure mode that would have
    silently invalidated the round-4 VQ-pairing re-runs (QUALITY.md,
    pairing-bug section; reference latentspace_dataloader.py:21-26
    caches by model_id and is vulnerable to exactly this)."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                       batch_norm=False)
    ids = get_val_test_ids()
    kw = dict(task="autoregressive_ids", n_cycles=2,
              val_data_ids=[DataSplitId(*v) for v in ids["val_ids"]],
              test_data_ids=[DataSplitId(*v) for v in ids["test_ids"]],
              batch_size=8, data_directory_path=data_dir)
    xs = []
    for seed in (0, 1, 0):
        params, state = model.init(seed)
        dm = LatentPredDataModule((model, params, state), **kw)
        dm.setup()
        xs.append(np.asarray(dm.train.x))
    assert (xs[0] != xs[1]).any(), \
        "different VQ params produced identical token datasets"
    np.testing.assert_array_equal(xs[0], xs[2])


def test_synthetic_labels_have_signal():
    vi, labels, _, _ = make_synthetic_arrays(n_cycles_per_run=40, seed=1)
    good = vi[labels == 1].std(axis=(0, 1))
    bad = vi[labels == 0].std(axis=(0, 1))
    assert (bad > good).all()  # bad welds noisier by construction


def test_synthetic_markov_regime():
    """The 'markov' label process (Study C): defects arrive in bursts
    whose persistence makes the next-cycle label predictable from the
    window (the learnable target the iid regime lacks at high model
    capacity — QUALITY.md), unlabeled cycles mask the LABEL but keep
    the true-state physics, and the signature_strength knob scales the
    bad-cycle signatures without touching good cycles."""
    import numpy as np
    vi, labels, exp, run = make_synthetic_arrays(
        n_cycles_per_run=150, seed=0, extra_train_runs=8,
        label_process="markov", signature_strength=0.5)
    runs = exp.astype(np.int64) * 1000 + run.astype(np.int64)
    lab = labels.copy()
    # persistence of the labeled chain (ignore masked cycles)
    same = [lab[i + 1] == lab[i] for i in range(len(lab) - 1)
            if runs[i + 1] == runs[i] and lab[i] >= 0 and lab[i + 1] >= 0]
    p = float(np.mean(same))
    assert 0.82 < p < 0.95, p  # ~markov_persistence (0.85 default)
    # both classes present, minority sized by the run mix
    frac_bad = float((labels == 0).mean())
    assert 0.15 < frac_bad < 0.5, frac_bad
    assert 0.05 < float((labels == -1).mean()) < 0.2  # unlabeled kept
    # subtler signatures still separable per-cycle (std ordering holds)
    good = vi[labels == 1].std(axis=(0, 1))
    bad = vi[labels == 0].std(axis=(0, 1))
    assert (bad > good).all()
    # strength=1.0 markov vs strength=0.5: louder bad-cycle signatures,
    # identical label stream (labels draw before the waveforms)
    vi2, labels2, _, _ = make_synthetic_arrays(
        n_cycles_per_run=150, seed=0, extra_train_runs=8,
        label_process="markov", signature_strength=1.0)
    np.testing.assert_array_equal(labels, labels2)
    assert vi2[labels2 == 0].std() > vi[labels == 0].std()
    g1, g2 = vi[labels == 1], vi2[labels2 == 1]
    np.testing.assert_allclose(g1.std(), g2.std(), rtol=0.05)
