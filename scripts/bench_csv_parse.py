"""Ingestion bench: native C++ CSV parser vs the pandas path.

The reference parses processed_asimow_dataset.csv with pandas and
feeds it through a torch DataLoader worker pool
(/root/reference/dataloader/asimow_dataloader.py:240-246). This
framework's ingestion is a single-pass streaming C++ parser writing
straight into packed (N, 200, 2) arrays (native/csv_parser.cpp,
ctypes ABI) with automatic pandas/numpy fallback. This script times
both arms on the same synthetic CSV (identical schema) and checks the
outputs are bit-identical.

Method: best-of-N wall clock per arm (min is the least
contention-sensitive statistic on a shared host); arms interleaved.
Writes results/bench_csv_parse_r3.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_rows_cycles=8000, reps=3):
    from vq_vae_transformer_arc_welding_tpu.data.asimow import (
        load_asimow_csv)
    from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
        write_synthetic_csv)
    from vq_vae_transformer_arc_welding_tpu.native.csv_loader import (
        parse_asimow_csv_native)

    path = "/tmp/bench_parse.csv"
    # ~n_rows_cycles rows x 403 cols; n_cycles_per_run chosen so the
    # split-table runs sum to roughly the target
    write_synthetic_csv(path, n_cycles_per_run=n_rows_cycles // 16,
                        extra_train_runs=0, seed=0)
    size_mb = os.path.getsize(path) / 1e6

    times = {"native": [], "pandas": []}
    outs = {}
    for _ in range(reps):
        t0 = time.perf_counter()
        outs["native"] = parse_asimow_csv_native(path)
        times["native"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs["pandas"] = load_asimow_csv(path, use_native=False)
        times["pandas"].append(time.perf_counter() - t0)

    assert outs["native"] is not None, "native lib unavailable"
    for a, b in zip(outs["native"], outs["pandas"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # peak RSS per arm, in clean subprocesses. Two gotchas: maxrss is
    # process-lifetime-cumulative (so in-process measurement would mix
    # the arms), AND ru_maxrss survives fork+exec — a child spawned
    # from this (by now large) parent inherits the parent's peak. The
    # double hop resets it: the outer child execs small, then forks
    # the real measurement.
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rss = {}
    for arm, snippet in {
        "native": ("from vq_vae_transformer_arc_welding_tpu.native."
                   "csv_loader import parse_asimow_csv_native as f"),
        "pandas": ("from vq_vae_transformer_arc_welding_tpu.data."
                   "asimow import load_asimow_csv as _f\n"
                   "f = lambda p: _f(p, use_native=False)"),
    }.items():
        inner = (f"import resource, sys; sys.path.insert(0, {repo!r})\n"
                 f"{snippet}\n"
                 f"f({path!r})\n"
                 "print(resource.getrusage(resource.RUSAGE_SELF)"
                 ".ru_maxrss / 1024)")
        outer = ("import subprocess, sys; "
                 f"r = subprocess.run([sys.executable, '-c', {inner!r}], "
                 "capture_output=True, text=True, check=True); "
                 "print(r.stdout.strip().splitlines()[-1])")
        out = subprocess.run([sys.executable, "-c", outer],
                             capture_output=True, text=True, check=True)
        rss[arm] = round(float(out.stdout.strip().splitlines()[-1]), 1)

    n = outs["native"][0].shape[0]
    res = {
        "csv_mb": round(size_mb, 1), "rows": n, "reps": reps,
        "native_s_min": round(min(times["native"]), 4),
        "pandas_s_min": round(min(times["pandas"]), 4),
        "native_all": [round(t, 4) for t in times["native"]],
        "pandas_all": [round(t, 4) for t in times["pandas"]],
        "speedup": round(min(times["pandas"]) / min(times["native"]), 2),
        "native_mb_s": round(size_mb / min(times["native"]), 1),
        "native_peak_rss_mb": rss["native"],
        "pandas_peak_rss_mb": rss["pandas"],
        "outputs_bit_identical": True,
    }
    out = os.path.join(os.path.dirname(__file__), "..", "results",
                       "bench_csv_parse_r3.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
