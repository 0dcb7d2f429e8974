"""Subprocess runner for the quality study's JAX legs on the TPU.

quality_study.py forces its own jax onto CPU (its bit-equality
assertions — twin latents vs framework latents, checkpoint roundtrip
indices — need one device class). The TRAINING legs themselves carry
no bit-equality contract (the quality metric is trained F1/loss), so
each CLI leg runs here in a fresh process on the DEFAULT backend (the
TPU when available) — which is both the target hardware and what makes
reference-default hparams feasible wall-clock on this 1-CPU host.

Invoked by quality_study.py; emits one `CLILEG_RESULT {json}` line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402  (NOT forced to CPU — default backend)

# CPU-fallback legs: JAX_PLATFORMS=cpu in the subprocess env is NOT
# honored here — this image's sitecustomize registers the tunneled
# TPU backend and wins over the env var (measured: JAX_PLATFORMS=cpu
# still reports platform "tpu"). The explicit config update below is
# the mechanism that does work (quality_study.py forces its own
# process to CPU the same way), so callers request the fallback via
# CLILEG_FORCE_PLATFORM instead.
_force_platform = os.environ.get("CLILEG_FORCE_PLATFORM")
if _force_platform:
    jax.config.update("jax_platforms", _force_platform)

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def _backend_watchdog(timeout_s: float = 240.0):
    """Exit fast (rc 3) if backend init stalls.

    The tunneled TPU's init intermittently hangs (observed ~0.5% CPU for
    20+ min; a fresh process succeeds). Callers retry on timeout, but a
    2400s leg timeout wastes ~40 min per stall; detecting the stall in
    the first minutes lets the retry fire immediately. jax.devices() in
    a daemon thread + a watchdog: if init hasn't completed in
    timeout_s, hard-exit with code 3 (os._exit — the stalled init
    thread can't be interrupted)."""
    import threading

    done = threading.Event()

    def _init():
        try:
            jax.devices()
        finally:
            done.set()

    def _watch():
        if not done.wait(timeout_s):
            sys.stderr.write(
                f"CLILEG_STALL backend init exceeded {timeout_s}s\n")
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=_init, daemon=True).start()
    threading.Thread(target=_watch, daemon=True).start()
    done.wait()  # block main until init completes (or _exit fires)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cli", required=True,
                    choices=["recon", "class", "transformer"])
    ap.add_argument("--argv-json", required=True,
                    help="JSON list of CLI argv tokens")
    a = ap.parse_args()
    argv = json.loads(a.argv_json)
    _backend_watchdog()

    if a.cli == "recon":
        from vq_vae_transformer_arc_welding_tpu.cli import (
            train_reconstruction_embedding as cli)
        result, test_metrics = cli.main(cli.build_parser().parse_args(argv))
        out = {"val/loss": float(result.best_score),
               "test/loss": float(test_metrics["test/loss"]),
               "test/recon_error": float(test_metrics["test/recon_error"]),
               "best_ckpt_path": os.path.abspath(result.best_ckpt_path)}
    elif a.cli == "class":
        from vq_vae_transformer_arc_welding_tpu.cli import (
            train_classification_model as cli)
        result, test_metrics = cli.main(cli.build_parser().parse_args(argv))
        out = {"val/f1_score_mean": float(result.best_score),
               "test/f1_score_mean": float(
                   test_metrics["test/f1_score_mean"])}
        # constant-predictor tripwire (ClassificationTask logs the full
        # classification_metrics set incl. per-class accuracies; the
        # trainer emits them batch-meaned under the raw metric name —
        # suffix _mean here to pair with the torch twin's keys)
        for k in ("acc", "acc_good", "acc_bad"):
            if f"test/{k}" in test_metrics:
                out[f"test/{k}_mean"] = float(test_metrics[f"test/{k}"])
    else:
        from vq_vae_transformer_arc_welding_tpu.cli import (
            train_transformer_mtasks as cli)
        _, results = cli.main(cli.build_parser().parse_args(argv))
        ct = results["class_test"]
        out = {"test/cl/f1_score": float(ct["test/cl/f1_score"]),
               "gen/loss": float(results["gen_test"]["test/loss"])}
        # constant-predictor tripwire (a head stuck on one class shows
        # acc_good/acc_bad = 1/0 or 0/1) — present when the class task
        # reports them (train/tasks.py::TransformerClassTask)
        for k in ("test/cl/acc", "test/cl/acc_good", "test/cl/acc_bad"):
            if k in ct:
                out[k] = float(ct[k])
    out["backend"] = jax.devices()[0].platform
    print("CLILEG_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
