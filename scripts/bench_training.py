"""Training-path benchmark: all five BASELINE.json configs on the live
backend (TPU by default), f32 vs bf16 mixed-precision.

Times the actual Trainer epoch scan (train/loop.py) at the reference
entry-point default hparams — the loop the reference spends its
GPU-hours in (train_reconstruction_embedding.py:190-204,
train_classification_model.py, train_transformer_mtasks.py:178-197) —
on synthetic data of realistic per-epoch size. Reports windows-or-seq/s
(best post-compile epoch of --epochs; the tunneled TPU is shared, ~20%
per-group variance) and effective TFLOPS from XLA's own cost analysis
of the compiled epoch.

Usage:
  python scripts/bench_training.py                 # all configs, f32+bf16
  python scripts/bench_training.py --configs vqvae transformer --dtype f32
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vq_vae_transformer_arc_welding_tpu.data.datasets import ArraySplit
from vq_vae_transformer_arc_welding_tpu.models import (GRU, MLP,
                                                       TransformerDecoder,
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.train.loop import Trainer
from vq_vae_transformer_arc_welding_tpu.train.optim import (
    make_radam, make_transformer_optimizer)
from vq_vae_transformer_arc_welding_tpu.train.tasks import (
    ClassificationTask, ReconstructionTask, TransformerGenTask)

CYCLE_LEN = 200


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class SynthDataModule:
    drop_last = True

    def __init__(self, x, y=None, cond=None, batch_size=64, weights=None):
        self.train = ArraySplit(x, y, cond)
        self.val = ArraySplit(x[: max(1, len(x) // 10)],
                              None if y is None else y[: max(1, len(x) // 10)],
                              None if cond is None
                              else cond[: max(1, len(x) // 10)])
        self.batch_size = batch_size
        self.train_sampling = weights

    def setup(self, stage=None):
        pass


def _epoch_flops(task, tx, dm, trainer):
    """XLA's flop count for ONE compiled training epoch (includes fwd,
    bwd, and optimizer update), via AOT cost analysis.

    XLA counts a lax.scan body ONCE regardless of trip count, so we
    cost an epoch with a single accumulation group and scale by the
    real epoch's group count (the outer scan is the only
    count-dependent structure; the inner accumulation scan keeps its
    real length)."""
    try:
        arrays = task.batch_arrays(dm.train)
        params, state = task.model.init(0)
        opt_state = tx.init(params)
        epoch_fn = trainer._make_train_epoch(task, tx, dm.batch_size)
        idx = trainer._train_indices(
            jax.random.PRNGKey(0), len(dm.train.x), dm.batch_size,
            dm.train_sampling, dm.drop_last)
        n_groups = idx.shape[0]
        lowered = epoch_fn.lower(params, state, opt_state, idx[:1],
                                 jax.random.PRNGKey(1), arrays)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        # the inner accumulation scan is ALSO counted once; scale it too
        return (flops * n_groups * trainer.accum) or None
    except Exception as e:  # cost analysis is best-effort
        log(f"  (cost analysis unavailable: {e})")
        return None


def time_config(name, task, tx, dm, *, epochs, accum=1, seed=0,
                dropout_prng="threefry"):
    trainer = Trainer(max_epochs=epochs, seed=seed, verbose=False,
                      accumulate_grad_batches=accum,
                      check_val_every_n_epoch=10**9,
                      dropout_prng=dropout_prng)
    params, state = task.model.init(seed)
    flops = _epoch_flops(task, tx, dm, trainer)
    res = trainer.fit(task, dm, params, state, tx)
    rows = [h for h in res.history if "train_epoch/windows_per_s" in h]
    # epoch 0 pays the compile; report the best steady-state epoch
    steady = rows[1:] if len(rows) > 1 else rows
    best = max(r["train_epoch/windows_per_s"] for r in steady)
    best_t = min(r["train_epoch/time_s"] for r in steady)
    tflops = (flops / best_t / 1e12) if flops else None
    losses = [r["train_epoch/loss"] for r in rows if "train_epoch/loss" in r]
    log(f"{name}: {best:.1f} samples/s, epoch {best_t:.2f}s"
        + (f", {tflops:.1f} TFLOPS eff." if tflops else "")
        + (f", loss {losses[0]:.4f}->{losses[-1]:.4f}" if losses else ""))
    return {"config": name, "samples_per_s": round(best, 1),
            "epoch_s": round(best_t, 3),
            "tflops_effective": round(tflops, 2) if tflops else None}


def build(name, dtype, rng):
    # 'bf16_dec' / 'bf16_enc' scope the VQ-VAE cast to one half
    # (models/vqvae_patch.py compute_scope; BENCHMARKS.md round 5)
    cd = jnp.bfloat16 if dtype.startswith("bf16") else None
    scope = {"bf16_dec": "decoder", "bf16_enc": "encoder"}.get(dtype, "all")
    if scope != "all" and name != "vqvae":
        return None  # compute_scope is a VQ-VAE-only knob
    if name == "vqvae":
        # reference train_reconstruction_embedding.py defaults:
        # bs 1024, hidden 512, K 256, D 32, 8 resblocks, patch 25,
        # no BN, clip 0.7, RAdam
        model = VQVAEPatch(hidden_dim=512, input_dim=2, num_embeddings=256,
                           embedding_dim=32, n_resblocks=8,
                           learning_rate=1e-3, batch_norm=False,
                           compute_dtype=cd, compute_scope=scope)
        x = rng.standard_normal((16384, CYCLE_LEN, 2)).astype(np.float32)
        dm = SynthDataModule(x, batch_size=1024)
        task = ReconstructionTask(model)
        tx = make_radam(1e-3, clip_norm=0.7)
        return task, tx, dm, 1
    if name in ("mlp_raw", "mlp_latent"):
        # reference train_classification_model.py defaults: bs 512,
        # hidden 758, 6 layers, n_cycles 5, clip 0.42
        n_cycles = 5
        in_dim = (n_cycles * CYCLE_LEN * 2 if name == "mlp_raw"
                  else n_cycles * 16 * 32)
        model = MLP(input_size=in_dim, output_size=2, in_dim=1,
                    hidden_sizes=758, n_hidden_layers=6,
                    dropout_p=0.032015121309774644, learning_rate=1e-3,
                    compute_dtype=cd)
        x = rng.standard_normal((32768, in_dim)).astype(np.float32)
        y = rng.integers(0, 2, (32768,)).astype(np.int64)
        w = np.ones(len(x), np.float32)
        dm = SynthDataModule(x, y, batch_size=512, weights=w)
        task = ClassificationTask(model)
        tx = make_radam(1e-3, clip_norm=0.42)
        return task, tx, dm, 1
    if name == "gru_raw":
        if dtype == "bf16":
            return None  # GRU keeps f32 (sequential scan, not MXU-bound)
        # reference GRU layout: seq_len = n_cycles (5), in_dim = 400
        # (whole cycles as timesteps — reference
        # train_classification_model.py:90-92), hidden 758, 6 layers
        model = GRU(input_size=5, in_dim=400, output_size=2,
                    hidden_sizes=758, n_hidden_layers=6, dropout_p=0.032,
                    learning_rate=1e-3)
        x = rng.standard_normal((32768, 5 * CYCLE_LEN * 2)).astype(np.float32)
        y = rng.integers(0, 2, (32768,)).astype(np.int64)
        dm = SynthDataModule(x, y, batch_size=512,
                             weights=np.ones(len(x), np.float32))
        task = ClassificationTask(model)
        tx = make_radam(1e-3, clip_norm=0.42)
        return task, tx, dm, 1
    if name == "transformer":
        # reference train_transformer_mtasks.py defaults: bs 16,
        # n_cycles 20 (T=321), d512/8 heads, accumulate 5, clip 0.8;
        # 8 blocks per the BASELINE.json config set. Generation stage
        # (the schedule's 15-epochs-per-iter dominant task).
        # TR_BATCH (--tr-bs) overrides the batch to probe the
        # latency-bound-vs-MXU-bound claim at serving-style batches.
        vocab = 258
        seq = 20 * 16 + 1
        model = TransformerDecoder(d_model=512, n_classes=vocab, seq_len=seq,
                                   n_blocks=8, n_head=8,
                                   compute_dtype=cd)
        n = 4096
        x = rng.integers(0, 256, (n, seq)).astype(np.int64)
        y = np.concatenate([x[:, 1:], np.full((n, 1), -1)], 1).astype(np.int64)
        cond = rng.integers(0, 2, (n,)).astype(np.int64)
        dm = SynthDataModule(x, y, cond, batch_size=TR_BATCH)
        task = TransformerGenTask(model)
        params, _ = model.init(0)
        tx = make_transformer_optimizer(model, params, clip_norm=0.8)
        return task, tx, dm, 5
    raise ValueError(name)


CONFIGS = ["vqvae", "mlp_raw", "gru_raw", "mlp_latent", "transformer"]
TR_BATCH = 16  # reference default; --tr-bs overrides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=CONFIGS)
    ap.add_argument("--dtype", nargs="+",
                    choices=["f32", "bf16", "bf16_dec", "bf16_enc", "both"],
                    default=["both"])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--tr-bs", type=int, default=16,
                    help="transformer batch size (reference default 16)")
    ap.add_argument("--dropout-prng", default="threefry",
                    choices=["threefry", "rbg", "unsafe_rbg"],
                    help="Trainer dropout-mask PRNG (BENCHMARKS round 9)")
    args = ap.parse_args()
    global TR_BATCH
    TR_BATCH = args.tr_bs

    dev = jax.devices()[0]
    log(f"backend: {dev.platform}:{dev.device_kind}")
    dtypes = []
    for d in args.dtype:  # expand 'both' wherever it appears
        dtypes.extend(["f32", "bf16"] if d == "both" else [d])
    out = []
    for name in args.configs:
        for dtype in dtypes:
            rng = np.random.default_rng(0)
            built = build(name, dtype, rng)
            if built is None:
                continue
            task, tx, dm, accum = built
            try:
                row = time_config(f"{name}/{dtype}", task, tx, dm,
                                  epochs=args.epochs, accum=accum,
                                  dropout_prng=args.dropout_prng)
            except Exception as e:  # keep the sweep alive per config
                log(f"{name}/{dtype} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                row = {"config": f"{name}/{dtype}",
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            row["dtype"] = dtype
            out.append(row)
            print(json.dumps(out, indent=2), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
