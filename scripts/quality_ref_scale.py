"""JAX-only reference-scale transformer training on the TPU.

Trains the EXACT reference multitask config — d512, 8 blocks, 8 heads,
n_cycles 20 (seq_len 321), epoch_iter 3 x (15 gen + 2 class epochs) +
10 finetune, bs 16, accumulate 5 (reference
train_transformer_mtasks.py:213-236 defaults with the BASELINE.json
8-block config) — through this framework's real CLI entry points on a
synthetic ASIMoW dataset, over several seeds.

The torch-twin counterpart at this scale measures 134 s/step on this
1-CPU host (infeasible — QUALITY.md); the cross-stack anchor at this
exact config is tests/test_grad_parity.py::
test_transformer_trajectory_reference_scale. This script supplies the
non-degeneracy evidence: the class head escaping the constant-predictor
attractor at reference scale under this framework's training dynamics.

Writes --out (JSON) consumed by quality_study.py --ref-scale-json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax  # default backend: the TPU

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vq_vae_transformer_arc_welding_tpu.cli import (  # noqa: E402
    train_reconstruction_embedding as cli_recon,
    train_transformer_mtasks as cli_tr)
from vq_vae_transformer_arc_welding_tpu.data.synthetic import (  # noqa: E402
    write_synthetic_csv)

DATA = dict(n_cycles_per_run=400, extra_train_runs=10, seed=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/quality_ref_scale")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--regime", choices=["iid", "markov"], default="iid",
                    help="'markov' = the learnable Study-C regime "
                         "(bursty defects, signature_strength 0.5): on "
                         "iid data the class head can only learn "
                         "run-level base rates; on markov the "
                         "next-cycle label is genuinely predictable "
                         "(Bayes error ~= 1 - persistence)")
    args = ap.parse_args()
    out_json = args.out or os.path.join(args.out_dir, "ref_scale.json")

    os.makedirs(args.out_dir, exist_ok=True)
    data_dir = os.path.join(args.out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    csv = os.path.join(data_dir, "processed_asimow_dataset.csv")
    if not os.path.exists(csv):
        extra = ({"label_process": "markov", "signature_strength": 0.5}
                 if args.regime == "markov" else {})
        write_synthetic_csv(csv, n_cycles_per_run=DATA["n_cycles_per_run"],
                            extra_train_runs=DATA["extra_train_runs"],
                            seed=DATA["seed"], **extra)

    cwd = os.getcwd()
    os.chdir(args.out_dir)
    results = {"backend": jax.devices()[0].platform,
               "data": f"{DATA['n_cycles_per_run']} cycles/run, "
                       f"{DATA['extra_train_runs']} extra train runs, "
                       f"seed {DATA['seed']}, regime {args.regime}",
               "regime": args.regime,
               "seeds": {}}
    try:
        # one reference-default VQ-VAE (hidden 512, K 256, D 32, 8
        # resblocks — train_reconstruction_embedding.py:220-230) feeds
        # every transformer seed, mirroring the reference workflow
        vq_ckpt = os.path.join(args.out_dir, "vq_ref.ckpt")
        if not os.path.exists(vq_ckpt):
            print("=== reference-default VQ-VAE ===", flush=True)
            rargs = cli_recon.build_parser().parse_args([
                "--epochs", "15", "--batch-size", "1024",
                "--num-embeddings", "256", "--embedding-dim", "32",
                "--hidden-dim", "512", "--n-resblocks", "8",
                "--patch-size", "25", "--clipping-value", "0.7",
                "--data-dir", data_dir, "--seed", "0"])
            result, _ = cli_recon.main(rargs)
            import shutil
            shutil.copy(result.best_ckpt_path, vq_ckpt)

        for seed in args.seeds:
            print(f"=== reference-scale transformer, seed {seed} ===",
                  flush=True)
            targs = cli_tr.build_parser().parse_args([
                "--epoch_iter", "3", "--batch-size", "16",
                "--n-cycles", "20", "--d-model", "512",
                "--n-heads", "8", "--n-blocks", "8",
                "--gen-epochs", "15", "--class-epoch", "2",
                "--finetune-epochs", "10",
                "--vqvae-model", vq_ckpt,
                "--data-dir", data_dir, "--seed", str(seed)])
            _, res = cli_tr.main(targs)
            row = {
                "test/cl/f1_score": float(
                    res["class_test"]["test/cl/f1_score"]),
                "gen/loss": float(res["gen_test"]["test/loss"]),
            }
            # constant-predictor tripwire: all-good scores F1 = 2p/(1+p)
            # (~0.837 at p=0.72) — only acc_good AND acc_bad > 0
            # demonstrates a learned head (train/tasks.py)
            for k in ("test/cl/acc", "test/cl/acc_good", "test/cl/acc_bad"):
                if k in res["class_test"]:
                    row[k] = float(res["class_test"][k])
            results["seeds"][str(seed)] = row
            with open(out_json, "w") as f:
                json.dump(results, f, indent=2)
            print(json.dumps(results["seeds"][str(seed)]), flush=True)
    finally:
        os.chdir(cwd)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
