"""Synthetic ASIMoW-schema dataset generator (test strategy, SURVEY.md §4).

Emits a CSV with the reference schema — three id columns then
V_0..V_199, I_0..I_199 (asimow_dataloader.py:240-246) — with
label-dependent waveform structure so classifiers have real signal:
good cycles (label 1) are clean current/voltage arcs, bad cycles
(label 0) carry dropouts and harmonic distortion, and a fraction is
unlabeled (-1) like the real dataset.
"""
from __future__ import annotations

import os

import numpy as np

from .asimow import CYCLE_LEN
from .splits import get_val_test_ids


def synthetic_cycles(rng: np.random.Generator, n: int, labels: np.ndarray):
    t = np.linspace(0, 2 * np.pi, CYCLE_LEN)
    phase = rng.uniform(0, 2 * np.pi, (n, 1))
    v = 28.0 + 4.0 * np.sin(t + phase) + 0.4 * rng.standard_normal((n, CYCLE_LEN))
    i = 220.0 + 60.0 * np.cos(t + phase) + 4.0 * rng.standard_normal((n, CYCLE_LEN))
    bad = labels == 0
    if bad.any():
        nb = int(bad.sum())
        # dropouts + third-harmonic distortion on bad welds
        v[bad] += 3.0 * np.sin(3 * t + phase[bad]) \
            + rng.standard_normal((nb, CYCLE_LEN)) * 1.5
        drop_start = rng.integers(20, CYCLE_LEN - 40, nb)
        for row, s in zip(np.where(bad)[0], drop_start):
            v[row, s:s + 20] *= 0.3
            i[row, s:s + 20] *= 0.5
    return v.astype(np.float32), i.astype(np.float32)


def make_synthetic_arrays(n_cycles_per_run: int = 60, seed: int = 0,
                          extra_train_runs: int = 6, bad_fraction: float = 0.3,
                          unlabeled_fraction: float = 0.1):
    """Build (vi, labels, experiment, welding_run) covering every
    benchmark val/test id plus extra train-only runs."""
    rng = np.random.default_rng(seed)
    ids = get_val_test_ids()
    runs = list(ids["val_ids"]) + list(ids["test_ids"])
    runs += [(1, 100 + k) for k in range(extra_train_runs)]

    all_v, all_i, all_l, all_e, all_r = [], [], [], [], []
    for exp, run in runs:
        n = n_cycles_per_run
        labels = (rng.random(n) > bad_fraction).astype(np.int64)
        unl = rng.random(n) < unlabeled_fraction
        labels[unl] = -1
        lab_for_signal = np.where(labels == -1,
                                  rng.integers(0, 2, n), labels)
        v, i = synthetic_cycles(rng, n, lab_for_signal)
        all_v.append(v); all_i.append(i); all_l.append(labels)
        all_e.append(np.full(n, exp)); all_r.append(np.full(n, run))
    v = np.concatenate(all_v); i = np.concatenate(all_i)
    vi = np.stack([v, i], axis=-1)
    return (vi, np.concatenate(all_l), np.concatenate(all_e),
            np.concatenate(all_r))


def write_synthetic_csv(path: str, **kwargs):
    vi, labels, exp, run = make_synthetic_arrays(**kwargs)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = (["experiment", "welding_run", "labels"]
              + [f"V_{k}" for k in range(CYCLE_LEN)]
              + [f"I_{k}" for k in range(CYCLE_LEN)])
    table = np.concatenate([
        exp[:, None].astype(np.float64), run[:, None].astype(np.float64),
        labels[:, None].astype(np.float64), vi[:, :, 0], vi[:, :, 1]], axis=1)
    np.savetxt(path, table, delimiter=",", header=",".join(header),
               comments="", fmt="%.6g")
    return path
