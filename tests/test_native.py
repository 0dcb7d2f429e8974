"""Native C++ CSV parser tests: build, parse parity vs the Python
parser, malformed input handling."""
import os

import numpy as np
import pytest

from vq_vae_transformer_arc_welding_tpu.data.asimow import load_asimow_csv
from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
    write_synthetic_csv)
from vq_vae_transformer_arc_welding_tpu.native import (native_available,
                                                       parse_asimow_csv_native)

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no C++ toolchain")


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("nativecsv")
    return write_synthetic_csv(str(d / "data.csv"), n_cycles_per_run=10,
                               extra_train_runs=1)


@needs_native
def test_native_matches_python_parser(csv_path):
    py = load_asimow_csv(csv_path, use_native=False)
    nat = parse_asimow_csv_native(csv_path)
    assert nat is not None
    for a, b, name in zip(nat, py, ("vi", "labels", "exp", "run")):
        if name == "vi":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


@needs_native
def test_native_is_default_path(csv_path):
    nat = load_asimow_csv(csv_path)       # use_native=True default
    py = load_asimow_csv(csv_path, use_native=False)
    np.testing.assert_allclose(nat[0], py[0], rtol=1e-5, atol=1e-6)


@needs_native
def test_native_rejects_garbage(tmp_path):
    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("not,a,real,header\n1,2,3,4\n")
    assert parse_asimow_csv_native(bad) is None


@needs_native
def test_native_missing_file():
    assert parse_asimow_csv_native("/nonexistent/file.csv") is None
