"""Subprocess runner for the quality study's transformer JAX leg.

quality_study.py forces jax onto CPU (its small-component legs assert
bit-equal latents against torch twins, which needs one device class).
The transformer leg has no bit-equality assertion — both stacks consume
the same materialized token arrays — so its JAX side runs here in a
fresh process on the DEFAULT backend (the TPU when available), which is
what makes the scaled-up study config feasible wall-clock.

Invoked by quality_study.py; emits one JSON line on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402  (NOT forced to CPU — default backend)

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

from vq_vae_transformer_arc_welding_tpu.cli import (  # noqa: E402
    train_transformer_mtasks as cli_tr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tr-json", required=True,
                    help="JSON dict of the study's TR config")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--vqvae-model", required=True)
    ap.add_argument("--seed", type=int, required=True)
    a = ap.parse_args()
    tr = json.loads(a.tr_json)

    args = cli_tr.build_parser().parse_args([
        "--epoch_iter", str(tr["epoch_iter"]),
        "--batch-size", str(tr["bs"]), "--n-cycles", str(tr["n_cycles"]),
        "--d-model", str(tr["d_model"]), "--n-heads", str(tr["heads"]),
        "--n-blocks", str(tr["blocks"]),
        "--gen-epochs", str(tr["gen_epochs"]),
        "--class-epoch", str(tr["class_epochs"]),
        "--finetune-epochs", str(tr["finetune_epochs"]),
        "--vqvae-model", a.vqvae_model,
        "--data-dir", a.data_dir, "--seed", str(a.seed)])
    run, results = cli_tr.main(args)
    out = {
        "test/cl/f1_score": float(
            results["class_test"]["test/cl/f1_score"]),
        "gen/loss": float(results["gen_test"]["test/loss"]),
        "backend": jax.devices()[0].platform,
    }
    print("TRLEG_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
