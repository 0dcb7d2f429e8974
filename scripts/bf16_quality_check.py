"""Trained-quality parity of the bf16 mixed-precision TRAINING mode.

VERDICT r1 #1 done-criteria: "QUALITY.md rows showing F1 within
0.5 pts" for the bf16 mode. Trains the quality-study VQ-VAE config
twice from the same init — exact f32 vs compute_dtype=bf16 — on the
synthetic dataset, then trains an identical (f32) latent-space MLP
classifier on each VQ-VAE's tokens: recon losses must agree and the
downstream F1 delta must be inside the 0.5-pt contract. Runs on the
default backend (TPU).

Emits one JSON line; results recorded in BENCHMARKS.md round 5.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vq_vae_transformer_arc_welding_tpu.cli.shared import (  # noqa: E402
    parse_split_ids)
from vq_vae_transformer_arc_welding_tpu.data import (  # noqa: E402
    ASIMoWDataModule, get_val_test_ids)
from vq_vae_transformer_arc_welding_tpu.data.latent import (  # noqa: E402
    LatentPredDataModule)
from vq_vae_transformer_arc_welding_tpu.data.synthetic import (  # noqa: E402
    write_synthetic_csv)
from vq_vae_transformer_arc_welding_tpu.models import (MLP,  # noqa: E402
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.train.loop import Trainer  # noqa: E402
from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam  # noqa: E402
from vq_vae_transformer_arc_welding_tpu.train.tasks import (  # noqa: E402
    ClassificationTask, ReconstructionTask)


# arm name -> (compute_dtype, compute_scope)
ARMS = {
    "f32": (None, "all"),
    "bf16": (jnp.bfloat16, "all"),
    "bf16_dec": (jnp.bfloat16, "decoder"),
    "bf16_enc": (jnp.bfloat16, "encoder"),
}


# VQ-VAE configs: 'study' = the quality-study config; 'reference' =
# the reference entry-point defaults
# (train_reconstruction_embedding.py:220-230)
VQ_SCALES = {
    "study": dict(hidden_dim=64, num_embeddings=32, embedding_dim=8,
                  n_resblocks=2),
    "reference": dict(hidden_dim=512, num_embeddings=256, embedding_dim=32,
                      n_resblocks=8),
}


def run_seed(d, ids, val_ids, test_ids, seed, arms, vq_scale):
    vq_kw = VQ_SCALES[vq_scale]
    out = {}
    vq_trained = {}
    for mode in arms:
        cd, scope = ARMS[mode]
        dm = ASIMoWDataModule(task="reconstruction", n_cycles=1,
                              val_data_ids=ids["val_ids"],
                              test_data_ids=ids["test_ids"],
                              batch_size=128, data_directory_path=d)
        dm.setup()
        model = VQVAEPatch(input_dim=2, learning_rate=1e-3,
                           batch_norm=False, compute_dtype=cd,
                           compute_scope=scope, **vq_kw)
        params, state = model.init(seed)
        tr = Trainer(max_epochs=15, monitor="val/loss", mode="min",
                     verbose=False, seed=seed)
        res = tr.fit(ReconstructionTask(model), dm, params, state,
                     make_radam(1e-3, clip_norm=0.7))
        test = tr.test(ReconstructionTask(model), dm, res.params, res.state)
        out[f"vq_{mode}_val_loss"] = round(float(res.best_score), 5)
        out[f"vq_{mode}_test_loss"] = round(float(test["test/loss"]), 5)
        # downstream classifier consumes EXACT-f32 latents of the
        # trained model (compute_dtype only affects training math)
        model_exact = VQVAEPatch(input_dim=2, learning_rate=1e-3,
                                 batch_norm=False, **vq_kw)
        vq_trained[mode] = (model_exact, res.params, res.state)

    for mode, triple in vq_trained.items():
        ldm = LatentPredDataModule(triple, task="classification",
                                   n_cycles=5, val_data_ids=val_ids,
                                   test_data_ids=test_ids, batch_size=128,
                                   data_directory_path=d)
        ldm.setup()
        in_dim = ldm.train.x.shape[1] * ldm.train.x.shape[2]
        mlp = MLP(input_size=ldm.train.x.shape[1],
                  in_dim=ldm.train.x.shape[2], output_size=2,
                  hidden_sizes=128, n_hidden_layers=2, dropout_p=0.032,
                  learning_rate=1e-3)
        del in_dim
        p, s = mlp.init(seed)
        task = ClassificationTask(mlp)
        tr = Trainer(max_epochs=20, monitor="val/f1_score_mean",
                     mode="max", verbose=False, seed=seed)
        res = tr.fit(task, ldm, p, s, make_radam(1e-3, clip_norm=0.42))
        test = tr.test(task, ldm, res.params, res.state)
        out[f"latent_mlp_f1_{mode}"] = round(
            float(test["test/f1_score_mean"]), 5)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--arms", nargs="+", default=["f32", "bf16"],
                    choices=sorted(ARMS))
    ap.add_argument("--vq-scale", default="study", choices=sorted(VQ_SCALES))
    a = ap.parse_args()

    d = tempfile.mkdtemp()
    write_synthetic_csv(os.path.join(d, "processed_asimow_dataset.csv"),
                        n_cycles_per_run=200, extra_train_runs=10)
    ids = get_val_test_ids()
    val_ids = parse_split_ids(ids["val_ids"])
    test_ids = parse_split_ids(ids["test_ids"])
    if "f32" not in a.arms:
        a.arms.insert(0, "f32")

    per_seed = []
    for seed in a.seeds:
        r = run_seed(d, ids, val_ids, test_ids, seed, a.arms, a.vq_scale)
        per_seed.append(r)
        print(f"seed {seed}: {json.dumps(r)}", file=sys.stderr, flush=True)

    f32 = np.array([r["latent_mlp_f1_f32"] for r in per_seed])
    out = {
        "backend": jax.devices()[0].platform,
        "seeds": a.seeds,
        "latent_mlp_f1_f32_mean": round(float(f32.mean()), 5),
        "latent_mlp_f1_f32_std": round(float(f32.std()), 5),
        "vq_val_loss_f32": [r["vq_f32_val_loss"] for r in per_seed],
    }
    # same acceptance form as the quality study: 0.5 F1 pts + seed noise
    for arm in a.arms:
        if arm == "f32":
            continue
        v = np.array([r[f"latent_mlp_f1_{arm}"] for r in per_seed])
        out[f"latent_mlp_f1_{arm}_mean"] = round(float(v.mean()), 5)
        out[f"latent_mlp_f1_{arm}_std"] = round(float(v.std()), 5)
        out[f"f1_delta_{arm}"] = round(float(v.mean() - f32.mean()), 5)
        out[f"vq_val_loss_{arm}"] = [r[f"vq_{arm}_val_loss"]
                                     for r in per_seed]
        out[f"within_contract_{arm}"] = bool(
            abs(v.mean() - f32.mean())
            <= 0.005 + float(f32.std()) + float(v.std()))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
