"""Reference-pipeline torch baseline for the quality-parity study.

The reference repo's exact scripts cannot run in this image (no
pytorch-lightning / torchmetrics / vector-quantize-pytorch installed),
so this harness trains the reference ARCHITECTURES — via the
state_dict-compatible torch twins in tests/torch_twins.py, whose
forward math is parity-tested against both the reference layer specs
and our JAX models — with a hand-written loop that replicates the
Lightning training semantics the reference relies on:

- torch.optim.RAdam (autencoder_lightning_base.py:122-124,
  classification_model.py:175-177), the minGPT decay/no-decay split
  with betas (0.9, 0.95) and weight_decay 0.1 for the transformer
  (transformer_decoder.py:64-114)
- gradient-norm clipping (Lightning Trainer gradient_clip_val)
- WeightedRandomSampler class balancing for classification
  (asimow_dataloader.py:106-121, :349-354), drop_last=True
- per-batch metrics + epoch mean-of-batch F1 `val/f1_score_mean`
  (classification_model.py:85-162), checkpoint-on-best with
  min_delta 0.001, early-stop patience 5, best-state reload for test
- VQ-VAE loss = recon MSE + embedding loss, monitor val/loss min
  (autencoder_lightning_base.py:80-105)
- transformer alternating gen/class schedule with fresh-optimizer
  stages and accumulate_grad_batches=5, clip 0.8
  (train_transformer_mtasks.py:23-33,178-197)

Data comes from THIS framework's data modules (golden-tested against
the reference's preprocessing), so both sides of the study train on
bit-identical arrays.
"""
from __future__ import annotations

import copy
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


# ---------------------------------------------------------------------------
# metrics (numpy mirrors of train/metrics.py == torchmetrics semantics)

def binary_f1(preds: np.ndarray, y: np.ndarray) -> float:
    tp = float(np.sum((preds == 1) & (y == 1)))
    fp = float(np.sum((preds == 1) & (y == 0)))
    fn = float(np.sum((preds == 0) & (y == 1)))
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def _eval_batches(n: int, bs: int, drop_last: bool):
    nb = n // bs if drop_last else (n + bs - 1) // bs
    for b in range(nb):
        yield slice(b * bs, min((b + 1) * bs, n))


@torch.no_grad()
def eval_classifier(model, xs, ys, bs: int, drop_last: bool,
                    cond=None) -> dict:
    """Per-batch metrics then mean over batches (reference
    on_validation_epoch_end, classification_model.py:154-162)."""
    model.eval()
    f1s, accs, losses, agoods, abads = [], [], [], [], []
    labels = ys if cond is None else cond
    for sl in _eval_batches(len(xs), bs, drop_last):
        x = torch.from_numpy(np.ascontiguousarray(xs[sl]))
        y = torch.from_numpy(labels[sl])
        logits = model(x) if cond is None else model(x, generate=False)
        preds = logits.argmax(-1).numpy()
        yn = y.numpy()
        losses.append(float(F.cross_entropy(logits, y)))
        accs.append(float(np.mean(preds == yn)))
        f1s.append(binary_f1(preds, yn))
        # per-class accuracies, 0 when the class is absent from the
        # batch (classification_model.py:103-106) — the
        # constant-predictor tripwire mirrored on the torch side
        for cls, acc_l in ((1, agoods), (0, abads)):
            n = float(np.sum(yn == cls))
            acc_l.append(float(np.sum((preds == cls) & (yn == cls)) / n)
                         if n > 0 else 0.0)
    return {"loss": float(np.mean(losses)), "acc_mean": float(np.mean(accs)),
            "f1_score_mean": float(np.mean(f1s)),
            "acc_good_mean": float(np.mean(agoods)),
            "acc_bad_mean": float(np.mean(abads))}


def _weighted_indices(rng: np.random.Generator, weights, n: int):
    if weights is None:
        return rng.permutation(n)
    p = weights / weights.sum()
    return rng.choice(n, n, replace=True, p=p)


# ---------------------------------------------------------------------------
# classifier training (MLP / GRU, raw or latent)

def train_classifier(model, dm, *, epochs: int, lr: float, clip: float,
                     seed: int, patience: int = 5,
                     min_delta: float = 0.001) -> dict:
    opt = torch.optim.RAdam(model.parameters(), lr=lr)
    rng = np.random.default_rng(seed)
    bs, drop_last = dm.batch_size, getattr(dm, "drop_last", False)
    xs, ys = dm.train.x, dm.train.y
    best_score, best_sd, wait = None, None, 0
    for _ in range(epochs):
        model.train()
        idx = _weighted_indices(rng, dm.train_sampling, len(xs))
        for b in range(len(xs) // bs):
            sl = idx[b * bs:(b + 1) * bs]
            x = torch.from_numpy(np.ascontiguousarray(xs[sl]))
            y = torch.from_numpy(ys[sl])
            loss = F.cross_entropy(model(x), y)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
            opt.step()
        vm = eval_classifier(model, dm.val.x, dm.val.y, bs, drop_last)
        score = vm["f1_score_mean"]
        if best_score is None or score - best_score > min_delta:
            best_score, best_sd, wait = score, copy.deepcopy(
                model.state_dict()), 0
        else:
            wait += 1
            if wait >= patience:
                break
    model.load_state_dict(best_sd)
    val = eval_classifier(model, dm.val.x, dm.val.y, bs, drop_last)
    test = eval_classifier(model, dm.test.x, dm.test.y, bs, drop_last)
    return {"val/f1_score_mean": best_score,
            "val/acc_mean": val["acc_mean"],
            "test/f1_score_mean": test["f1_score_mean"],
            "test/acc_mean": test["acc_mean"],
            "test/acc_good_mean": test["acc_good_mean"],
            "test/acc_bad_mean": test["acc_bad_mean"]}


# ---------------------------------------------------------------------------
# VQ-VAE training (reconstruction)

@torch.no_grad()
def eval_vqvae(model, xs, bs: int, drop_last: bool) -> dict:
    model.eval()
    losses, recons, perps = [], [], []
    for sl in _eval_batches(len(xs), bs, drop_last):
        x = torch.from_numpy(np.ascontiguousarray(xs[sl]))
        emb_loss, x_hat, perp = model(x)
        recon = float(F.mse_loss(x_hat, x))
        losses.append(recon + float(emb_loss))
        recons.append(recon)
        perps.append(float(perp))
    return {"loss": float(np.mean(losses)),
            "recon_error": float(np.mean(recons)),
            "perplexity": float(np.mean(perps))}


def train_vqvae(model, dm, *, epochs: int, lr: float, clip: float,
                seed: int, patience: int = 5, min_delta: float = 0.0) -> dict:
    opt = torch.optim.RAdam(model.parameters(), lr=lr)
    rng = np.random.default_rng(seed)
    bs, drop_last = dm.batch_size, getattr(dm, "drop_last", True)
    xs = dm.train.x
    best_loss, wait = None, 0
    for _ in range(epochs):
        model.train()
        idx = rng.permutation(len(xs))
        for b in range(len(xs) // bs):
            x = torch.from_numpy(np.ascontiguousarray(xs[idx[b * bs:(b + 1) * bs]]))
            emb_loss, x_hat, _ = model(x)
            loss = F.mse_loss(x_hat, x) + emb_loss
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
            opt.step()
        vm = eval_vqvae(model, dm.val.x, bs, drop_last)
        if best_loss is None or best_loss - vm["loss"] > min_delta:
            best_loss, wait = vm["loss"], 0
        else:
            wait += 1
            if wait >= patience:
                break
    # reference tests with post-fit weights, not a best-ckpt reload
    # (train_reconstruction_embedding.py:204-211); best val/loss is the
    # checkpointing monitor we report
    val = eval_vqvae(model, dm.val.x, bs, drop_last)
    test = eval_vqvae(model, dm.test.x, bs, drop_last)
    return {"val/loss": best_loss, "val/loss_final": val["loss"],
            "val/recon_error": val["recon_error"],
            "val/perplexity": val["perplexity"], "test/loss": test["loss"]}


# ---------------------------------------------------------------------------
# transformer multitask (alternating generation / classification)

@torch.no_grad()
def eval_gen(model, split, bs: int) -> dict:
    model.eval()
    losses = []
    for sl in _eval_batches(len(split.x), bs, False):
        x = torch.from_numpy(split.x[sl])
        y = torch.from_numpy(split.y[sl])
        logits = model(x, generate=True)
        losses.append(float(F.cross_entropy(
            logits.reshape(-1, logits.shape[-1]), y.reshape(-1),
            ignore_index=-1)))
    return {"loss": float(np.mean(losses))}


def _transformer_optimizer(model, lr: float):
    """minGPT decay/no-decay split (transformer_decoder.py:64-114)."""
    decay, no_decay = [], []
    for mn, m in model.named_modules():
        for pn, p in m.named_parameters(recurse=False):
            fpn = f"{mn}.{pn}" if mn else pn
            if pn.endswith("bias") or isinstance(
                    m, (torch.nn.LayerNorm, torch.nn.Embedding)):
                no_decay.append(fpn)
            elif pn.endswith("weight") and isinstance(m, torch.nn.Linear):
                decay.append(fpn)
    pd = dict(model.named_parameters())
    groups = [
        {"params": [pd[n] for n in sorted(decay)], "weight_decay": 0.1},
        {"params": [pd[n] for n in sorted(no_decay)], "weight_decay": 0.0},
    ]
    return torch.optim.RAdam(groups, lr=lr, betas=(0.9, 0.95))


def _fit_transformer_stage(model, split, weights, *, gen: bool, epochs: int,
                           lr: float, bs: int, seed: int, accumulate: int = 5,
                           clip: float = 0.8, val_split=None,
                           monitor_class: bool = False, patience=None):
    """One reference stage: fresh optimizer (fresh Lightning Trainer re-runs
    configure_optimizers), accumulate 5, clip 0.8."""
    opt = _transformer_optimizer(model, lr)
    rng = np.random.default_rng(seed)
    best_score, wait = None, 0
    import time as _time
    for _ep in range(epochs):
        _t0 = _time.time()
        model.train()
        idx = (_weighted_indices(rng, weights, len(split.x))
               if not gen else rng.permutation(len(split.x)))
        opt.zero_grad()
        nb = len(split.x) // bs
        for b in range(nb):
            sl = idx[b * bs:(b + 1) * bs]
            x = torch.from_numpy(split.x[sl])
            if gen:
                y = torch.from_numpy(split.y[sl])
                logits = model(x, generate=True)
                loss = F.cross_entropy(logits.reshape(-1, logits.shape[-1]),
                                       y.reshape(-1), ignore_index=-1)
            else:
                c = torch.from_numpy(split.cond[sl])
                loss = F.cross_entropy(model(x, generate=False), c)
            (loss / accumulate).backward()
            if (b + 1) % accumulate == 0 or b == nb - 1:
                torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
                opt.step()
                opt.zero_grad()
        msg = (f"  [torch {'gen' if gen else 'class'}] epoch {_ep} "
               f"({_time.time() - _t0:.1f}s)")
        if monitor_class and val_split is not None:
            # early stopping only — the reference's finetune stage tests
            # with the weights at stop, not a best-ckpt reload
            # (train_transformer_mtasks.py:68-97,192-197)
            vm = eval_classifier(model, val_split.x, None, bs, False,
                                 cond=val_split.cond)
            score = vm["f1_score_mean"]
            msg += f" val/cl/f1={score:.4f}"
            print(msg, flush=True)
            if best_score is None or score - best_score > 0.001:
                best_score, wait = score, 0
            else:
                wait += 1
                if patience is not None and wait >= patience:
                    break
        else:
            print(msg, flush=True)
    return best_score


def train_transformer_multitask(model, gen_dm, class_dm, *, epoch_iter: int,
                                gen_epochs: int, class_epochs: int,
                                finetune_epochs: int, lr: float, bs: int,
                                seed: int) -> dict:
    """The reference alternating schedule
    (train_transformer_mtasks.py:178-197)."""
    for it in range(epoch_iter):
        _fit_transformer_stage(model, gen_dm.train, None, gen=True,
                               epochs=gen_epochs, lr=lr, bs=bs,
                               seed=seed + it)
        last = it == epoch_iter - 1
        # mid-iteration class stages are plain fits; only the final
        # finetune monitors val/cl/f1_score with patience 5 and reloads
        # the best state (train_transformer_mtasks.py:68-97,178-191)
        _fit_transformer_stage(
            model, class_dm.train, class_dm.train_sampling, gen=False,
            epochs=finetune_epochs if last else class_epochs, lr=lr, bs=bs,
            seed=seed + it, val_split=class_dm.val if last else None,
            monitor_class=last, patience=5 if last else None)
    val = eval_classifier(model, class_dm.val.x, None, bs, False,
                          cond=class_dm.val.cond)
    test = eval_classifier(model, class_dm.test.x, None, bs, False,
                           cond=class_dm.test.cond)
    gen_val = eval_gen(model, gen_dm.val, bs)
    gen_test = eval_gen(model, gen_dm.test, bs)
    return {"val/cl/f1_score": val["f1_score_mean"],
            "test/cl/f1_score": test["f1_score_mean"],
            "test/cl/acc": test["acc_mean"],
            "test/cl/acc_good": test["acc_good_mean"],
            "test/cl/acc_bad": test["acc_bad_mean"],
            "val/gen/loss": gen_val["loss"],
            "test/gen/loss": gen_test["loss"]}
