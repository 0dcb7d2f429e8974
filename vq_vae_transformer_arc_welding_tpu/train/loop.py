"""Training engine: jitted epoch scans over device-resident data.

Rebuild of the Lightning Trainer surface the reference relies on
(fit/test, ModelCheckpoint best+last, EarlyStopping, gradient clipping
via the optimizer chain, accumulate_grad_batches, weighted sampling) —
restructured TPU-first:

- the whole training epoch is ONE `lax.scan` over pre-gathered batch
  indices: no per-batch host round-trip, no DataLoader workers
  (SURVEY.md §2.2); per-batch metrics come back as stacked arrays once
  per epoch;
- weighted/uniform sampling happens on device with `jax.random`
  (choice with replacement == WeightedRandomSampler, permutation ==
  RandomSampler), seeded per epoch;
- drop_last=False tails are handled by a second fixed-shape jitted
  step so there are at most two compiled shapes per split;
- early stopping and best-checkpoint selection run between epochs on
  the host, matching Lightning semantics (min_delta, patience,
  mode min/max — reference train_*.py:120-139, 186-197).
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .tasks import Task


def _gather_batch(arrays, idx):
    return tuple(a[idx] for a in arrays)


@dataclass
class FitResult:
    params: Any                      # best by monitor (or final if none)
    state: Any
    best_score: float | None
    best_epoch: int
    history: list = field(default_factory=list)
    best_ckpt_path: str | None = None
    stopped_early: bool = False
    final_params: Any = None         # weights at the end of fit
    final_state: Any = None
    opt_state: Any = None


class Trainer:
    def __init__(self, max_epochs: int = 1, logger=None, monitor: str | None = None,
                 mode: str = "min", patience: int | None = None,
                 min_delta: float = 0.0, checkpoint_dir: str | None = None,
                 checkpoint_name: str = "best", save_last: bool = False,
                 accumulate_grad_batches: int = 1, log_every_n_batches: int = 50,
                 check_val_every_n_epoch: int = 1, seed: int = 0,
                 metric_prefix: str = "", epoch_metric_hook=None,
                 verbose: bool = True, mesh=None, param_rules=None,
                 profile_dir: str | None = None,
                 terminate_on_nan: bool = False,
                 streaming: bool = False,
                 dropout_prng: str = "threefry"):
        self.max_epochs = max_epochs
        self.logger = logger
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_name = checkpoint_name
        self.save_last = save_last
        self.accum = accumulate_grad_batches
        self.log_every = log_every_n_batches
        self.check_val_every = check_val_every_n_epoch
        self.seed = seed
        self.metric_prefix = metric_prefix
        self.epoch_metric_hook = epoch_metric_hook
        self.verbose = verbose
        self.mesh = mesh              # jax.sharding.Mesh for SPMD DP(+TP)
        self.param_rules = param_rules  # leaf-name -> PartitionSpec, or None
        # jax.profiler trace of the first post-compile epoch (the
        # reference has no profiling hooks at all — SURVEY.md §5)
        self.profile_dir = profile_dir
        # failure detection (absent in the reference, SURVEY.md §5):
        # abort the run on a non-finite training loss instead of
        # silently corrupting the checkpoint chain
        self.terminate_on_nan = terminate_on_nan
        # streaming: train data stays on HOST (e.g. a data/streaming.py
        # mmap for beyond-HBM datasets); each accumulation group is
        # gathered on host (native C++ row gather) and device_put per
        # jitted group step. Sampling streams are identical to the
        # resident path (bitwise-equal losses, tests/test_streaming.py).
        self.streaming = streaming
        if streaming and mesh is not None:
            raise NotImplementedError("streaming + mesh is not supported")
        # dropout_prng: PRNG implementation for the per-epoch DROPOUT
        # key only (sampling stays threefry so the batch stream is
        # bit-identical across settings). "rbg" rides the TPU's
        # hardware RNG instruction: threefry mask generation measured
        # 11.9 ms of a 37.2 ms VQ-VAE train step at the reference
        # config (32%, regenerated in the backward; BENCHMARKS.md
        # round 9), and dropout draws carry no cross-stack parity
        # contract — the reference's torch RNG differs anyway.
        if dropout_prng not in ("threefry", "rbg", "unsafe_rbg"):
            raise ValueError(f"dropout_prng: {dropout_prng}")
        self.dropout_prng = dropout_prng
        self._step_counter = 0
        self._eval_cache: dict = {}
        self._train_cache: dict = {}

    def _place(self, params, state, arrays):
        """Computation-follows-data SPMD placement: params per rules
        (default replicated), data arrays replicated; batch indices are
        sharded over 'data' at use sites. XLA then partitions the epoch
        scan and inserts the gradient/EMA all-reduces."""
        if self.mesh is None:
            return params, state, arrays, None, None
        from ..parallel.mesh import put_replicated
        from ..parallel.sharding import shard_params
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.param_rules is not None:
            params = shard_params(params, self.mesh, self.param_rules)
        else:
            params = put_replicated(params, self.mesh)
        state = put_replicated(state, self.mesh)
        arrays = tuple(put_replicated(a, self.mesh) for a in arrays)
        idx3 = NamedSharding(self.mesh, P(None, None, "data"))
        idx2 = NamedSharding(self.mesh, P(None, "data"))
        return params, state, arrays, idx3, idx2

    # -- compiled steps ----------------------------------------------------

    def _make_train_epoch(self, task: Task, tx, batch_size: int):
        """The epoch fn takes the dataset `arrays` as an explicit jit
        ARGUMENT (pytree), not a closure constant: closed-over arrays
        become jaxpr constants, which remote-compile backends serialize
        into the compile payload (a 335 MB dataset produced HTTP 413 on
        the tunneled TPU). As arguments they are device buffers passed
        by reference."""
        accum = self.accum

        def micro_loss(params, state, batch, rng):
            loss, metrics, new_state = task.loss_and_metrics(
                params, state, batch, train=True, rng=rng)
            return loss, (metrics, new_state)

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def one_group(arrays, carry, group_idx):
            params, state, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            if accum == 1:
                # no accumulation: skip the inner scan entirely (keeps
                # the compiled graph one level shallower)
                batch = _gather_batch(arrays, group_idx[0])
                (loss, (metrics, state)), grads = grad_fn(
                    params, state, batch, sub)
                losses = loss[None]
                metrics = jax.tree_util.tree_map(lambda m: m[None], metrics)
            else:
                def micro(c, idx):
                    g_acc, state, key = c
                    key, k2 = jax.random.split(key)
                    batch = _gather_batch(arrays, idx)
                    (loss, (metrics, new_state)), grads = grad_fn(
                        params, state, batch, k2)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, new_state, key), (loss, metrics)

                zero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (g_sum, state, _), (losses, metrics) = jax.lax.scan(
                    micro, (zero, state, sub), group_idx)
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, state, opt_state, rng), (losses, metrics)

        def epoch(params, state, opt_state, idx_groups, rng, arrays):
            (params, state, opt_state, _), (losses, metrics) = jax.lax.scan(
                functools.partial(one_group, arrays),
                (params, state, opt_state, rng), idx_groups)
            flat_metrics = jax.tree_util.tree_map(
                lambda m: m.reshape(-1), metrics)
            return params, state, opt_state, losses.reshape(-1), flat_metrics

        return jax.jit(epoch, donate_argnums=(0, 1, 2))

    def _make_train_epoch_streaming(self, task: Task, tx, train_split,
                                    batch_size: int):
        """Host-loop epoch for streaming datasets: same group math and
        rng sequence as the compiled scan epoch (bitwise-equal losses),
        but each group's batches are host-gathered (split.x[idx] — a
        native threaded mmap gather for data/streaming.py datasets) and
        device_put on the fly instead of living in HBM."""
        from ..data.datasets import ArraySplit

        accum = self.accum

        def micro_loss(params, state, batch, rng):
            loss, metrics, new_state = task.loss_and_metrics(
                params, state, batch, train=True, rng=rng)
            return loss, (metrics, new_state)

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def group_step(params, state, opt_state, batches, sub):
            if accum == 1:
                batch = jax.tree_util.tree_map(lambda a: a[0], batches)
                (loss, (metrics, state)), grads = grad_fn(
                    params, state, batch, sub)
                losses = loss[None]
                metrics = jax.tree_util.tree_map(lambda m: m[None], metrics)
            else:
                def micro(c, batch):
                    g_acc, state, key = c
                    key, k2 = jax.random.split(key)
                    (loss, (metrics, new_state)), grads = grad_fn(
                        params, state, batch, k2)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                    return (g_acc, new_state, key), (loss, metrics)

                zero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (g_sum, state, _), (losses, metrics) = jax.lax.scan(
                    micro, (zero, state, sub), batches)
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, state, opt_state, losses, metrics

        def host_gather_group(idx2d):
            flat = np.asarray(idx2d).reshape(-1)
            mini = ArraySplit(
                train_split.x[flat],
                None if train_split.y is None else train_split.y[flat],
                None if getattr(train_split, "cond", None) is None
                else train_split.cond[flat])
            arrs = task.batch_arrays(mini)
            return tuple(a.reshape((accum, batch_size) + a.shape[1:])
                         for a in arrs)

        def epoch(params, state, opt_state, idx_groups, rng):
            idx_groups = np.asarray(idx_groups)
            all_losses, all_metrics = [], []
            for g in range(idx_groups.shape[0]):
                rng, sub = jax.random.split(rng)
                batches = host_gather_group(idx_groups[g])
                params, state, opt_state, losses, metrics = group_step(
                    params, state, opt_state, batches, sub)
                all_losses.append(losses)
                all_metrics.append(metrics)
            losses = jnp.concatenate(all_losses)
            metrics = jax.tree_util.tree_map(
                lambda *ms: jnp.concatenate([m.reshape(-1) for m in ms]),
                *all_metrics)
            return params, state, opt_state, losses, metrics

        return epoch

    def _make_eval(self, task: Task):
        # arrays as an explicit argument — same remote-compile payload
        # rationale as _make_train_epoch
        def eval_batches(params, state, idx_batches, arrays):
            def one(carry, idx):
                batch = _gather_batch(arrays, idx)
                _, metrics, _ = task.loss_and_metrics(
                    params, state, batch, train=False, rng=None)
                return carry, metrics
            _, metrics = jax.lax.scan(one, None, idx_batches)
            return metrics

        return jax.jit(eval_batches)

    # -- sampling ----------------------------------------------------------

    def _train_indices(self, key, n: int, batch_size: int, weights,
                       drop_last: bool):
        """Per-epoch batch index matrix (n_groups, accum, batch_size).

        Weighted sampling with replacement == WeightedRandomSampler;
        uniform == RandomSampler. Batch counts that don't divide the
        accumulation factor are rounded UP by wrap-around resampling
        (fixed scan shape) instead of a partial final group — no data
        is dropped; the tail group sees a few resampled duplicates.
        """
        n_batches = n // batch_size if drop_last else -(-n // batch_size)
        n_groups = max(1, -(-n_batches // self.accum))
        total = n_groups * self.accum * batch_size
        if weights is not None:
            p = weights / weights.sum()
            idx = jax.random.choice(key, n, (total,), replace=True,
                                    p=jnp.asarray(p))
        else:
            reps = -(-total // n)
            perms = [jax.random.permutation(jax.random.fold_in(key, r), n)
                     for r in range(reps)]
            idx = jnp.concatenate(perms)[:total]
        return idx.reshape(n_groups, self.accum, batch_size)

    @staticmethod
    def _eval_indices(n: int, batch_size: int, drop_last: bool):
        full = n // batch_size
        main = np.arange(full * batch_size).reshape(full, batch_size)
        rem = None
        if not drop_last and n % batch_size:
            rem = np.arange(full * batch_size, n)
        return main, rem

    # -- metric plumbing ---------------------------------------------------

    def _ns(self, task, name, split):
        ns = getattr(task, "metric_namespace", None)
        core = f"{ns}/{name}" if ns else name
        return f"{self.metric_prefix}{split}/{core}"

    def _log(self, metrics: dict, step: int):
        if self.logger is not None:
            self.logger.log_metrics(metrics, step=step)

    def _log_ckpt_artifact(self, path: str):
        """Upload a saved checkpoint when the logger asks for it
        (reference WandbLogger(log_model=True) / MLflow log_model=True,
        train_reconstruction_embedding.py:144,150). Loggers without the
        flag or without log_artifact (CSV) no-op."""
        if self.logger is None or not getattr(self.logger, "log_model",
                                              False):
            return
        log_artifact = getattr(self.logger, "log_artifact", None)
        if log_artifact is not None:
            log_artifact(path, name=os.path.basename(path), type_="model")

    def evaluate(self, task: Task, params, state, split, batch_size: int,
                 drop_last: bool, split_name: str = "val"):
        """Per-batch metrics then batch-mean aggregation (the
        reference's f1_score_mean semantics, classification_model.py:154-171)."""
        n = len(split.x)
        idx2_sharding = None
        main_idx, rem = self._eval_indices(n, batch_size, drop_last)
        per_batch: dict[str, list] = {}
        # cache the compiled eval AND its device-resident arrays; the
        # strong refs to task/split keep id()s stable and avoid
        # re-uploading the split every epoch. Contract: the split's
        # arrays must not be swapped out under the same objects.
        cache_key = (id(task), id(split), split_name)
        if cache_key not in self._eval_cache:
            arrays = task.batch_arrays(split)
            if self.mesh is not None:
                params, state, arrays, _, idx2_sharding = self._place(
                    params, state, arrays)
                if batch_size % self.mesh.shape["data"]:
                    idx2_sharding = None
            eval_fn = self._make_eval(task)
            rem_fn = jax.jit(lambda p, s, idx, arrs: task.loss_and_metrics(
                p, s, _gather_batch(arrs, idx), train=False, rng=None)[1])
            self._eval_cache[cache_key] = (eval_fn, rem_fn, idx2_sharding,
                                           arrays, task, split)
        elif self.mesh is not None:
            params, state, _, _, _ = self._place(params, state, ())
        (eval_fn, rem_fn, idx2_sharding, arrays, _, _) = \
            self._eval_cache[cache_key]
        if len(main_idx):
            main_idx = jnp.asarray(main_idx)
            if idx2_sharding is not None:
                main_idx = jax.device_put(main_idx, idx2_sharding)
            stacked = eval_fn(params, state, main_idx, arrays)
            for k, v in stacked.items():
                per_batch.setdefault(k, []).extend(np.asarray(v).tolist())
        if rem is not None and len(rem):
            m = rem_fn(params, state, jnp.asarray(rem), arrays)
            for k, v in m.items():
                per_batch.setdefault(k, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in per_batch.items()}
        out = {self._ns(task, k, split_name): v for k, v in means.items()}
        if "f1_score" in means and getattr(task, "metric_namespace", None) is None:
            out[f"{self.metric_prefix}{split_name}/f1_score_mean"] = means["f1_score"]
            out[f"{self.metric_prefix}{split_name}/acc_mean"] = means["acc"]
        return out

    # -- fit/test ----------------------------------------------------------

    def fit(self, task: Task, datamodule, params, state, tx,
            opt_state=None, resume_from: str | None = None) -> FitResult:
        """resume_from: a last.ckpt written with save_last — restores
        params, state, optimizer moments, and the epoch counter (crash
        recovery beyond the reference's save_last-only story)."""
        if datamodule.train is None:
            datamodule.setup("fit")
        start_epoch = 0
        if resume_from is not None:
            from .checkpoint import load_checkpoint
            _, _, restore, extra = load_checkpoint(resume_from)
            opt_template = tx.init(params)
            params, state, opt_state = restore((params, state), opt_template)
            start_epoch = int(extra.get("epoch", -1)) + 1
        train_split = datamodule.train
        batch_size = datamodule.batch_size
        weights = (datamodule.train_sampling
                   if task.weighted_sampler else None)
        drop_last = getattr(datamodule, "drop_last", False)

        idx3_sharding = None
        if not self.streaming:
            arrays = task.batch_arrays(train_split)
            params, state, arrays, idx3_sharding, _ = self._place(
                params, state, arrays)
            if (idx3_sharding is not None
                    and batch_size % self.mesh.shape["data"]):
                idx3_sharding = None  # uneven batch: run replicated
        if opt_state is None:
            opt_state = tx.init(params)
        # cache the compiled epoch per (task, datamodule, optimizer):
        # repeated fit() calls on the same stage (the transformer's
        # alternating schedule) must not recompile — TPU compiles are
        # expensive. Strong refs pin the id()s; a DIFFERENT tx object
        # gets its own compiled epoch (the closure captures tx).
        tc_key = (id(task), id(datamodule), id(tx), batch_size)
        if tc_key not in self._train_cache:
            epoch_fn = (self._make_train_epoch_streaming(
                            task, tx, train_split, batch_size)
                        if self.streaming
                        else self._make_train_epoch(task, tx, batch_size))
            self._train_cache[tc_key] = (epoch_fn, task, datamodule, tx)
        epoch_fn = self._train_cache[tc_key][0]

        best_score, best_epoch = None, -1
        best_params, best_state = params, state
        best_path = None
        wait = 0
        history = []
        stopped = False
        sign = 1.0 if self.mode == "max" else -1.0

        epoch = start_epoch - 1
        for epoch in range(start_epoch, self.max_epochs):
            # per-epoch keys derive from (seed, epoch) so a resumed run
            # samples exactly what the uninterrupted run would have
            _, k_samp, k_epoch = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch), 3)
            if self.dropout_prng != "threefry":
                # dropout-mask key on the cheap PRNG; same (seed,
                # epoch) derivation so resume semantics are preserved
                k_epoch = jax.random.fold_in(
                    jax.random.key(self.seed, impl=self.dropout_prng),
                    epoch)
            idx_groups = self._train_indices(
                k_samp, len(train_split.x), batch_size, weights, drop_last)
            if idx3_sharding is not None:
                idx_groups = jax.device_put(idx_groups, idx3_sharding)
            t0 = time.perf_counter()
            profiling = self.profile_dir is not None and epoch == 1
            if profiling:  # epoch 0 is the compile epoch
                jax.profiler.start_trace(self.profile_dir)
            if self.streaming:
                params, state, opt_state, losses, tr_metrics = epoch_fn(
                    params, state, opt_state, idx_groups, k_epoch)
            else:
                params, state, opt_state, losses, tr_metrics = epoch_fn(
                    params, state, opt_state, idx_groups, k_epoch, arrays)
            losses = np.asarray(losses)
            if profiling:
                jax.profiler.stop_trace()
            dt = time.perf_counter() - t0
            if self.terminate_on_nan and not np.isfinite(losses).all():
                bad = int(np.flatnonzero(~np.isfinite(losses))[0])
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch}, "
                    f"micro-batch {bad}: {losses[bad]}")

            # train logging at log_every cadence (reference logs train
            # metrics every 50 batches, classification_model.py:115)
            tr_np = {k: np.asarray(v) for k, v in tr_metrics.items()}
            for b in range(0, len(losses), self.log_every):
                row = {self._ns(task, k, "train"): float(v[b])
                       for k, v in tr_np.items()}
                self._log(row, step=self._step_counter + b)
            self._step_counter += len(losses)

            row = {f"train_epoch/{k}": float(np.mean(v))
                   for k, v in tr_np.items()}
            row["epoch"] = epoch
            row["train_epoch/time_s"] = dt
            # losses already has one entry per micro-batch
            row["train_epoch/batches_per_s"] = len(losses) / dt
            # north-star-style throughput meter (SURVEY.md §5)
            row["train_epoch/windows_per_s"] = len(losses) * batch_size / dt

            if (epoch + 1) % self.check_val_every == 0:
                val_metrics = self.evaluate(task, params, state,
                                            datamodule.val, batch_size,
                                            drop_last, "val")
                if self.epoch_metric_hook:
                    self.epoch_metric_hook(epoch, val_metrics)
                row.update(val_metrics)
                self._log({**val_metrics, "epoch": epoch},
                          step=self._step_counter)
                if self.verbose:
                    mon = (f" {self.monitor}="
                           f"{val_metrics.get(self.monitor, float('nan')):.4f}"
                           if self.monitor else "")
                    print(f"epoch {epoch:3d} "
                          f"loss={float(np.mean(losses)):.4f}{mon} "
                          f"({dt:.1f}s)")

                if self.monitor is not None:
                    score = val_metrics.get(self.monitor)
                    if score is not None:
                        improved = (best_score is None
                                    or sign * (score - best_score) > self.min_delta)
                        if improved:
                            best_score, best_epoch = score, epoch
                            best_params = jax.tree_util.tree_map(
                                lambda x: np.asarray(x), params)
                            best_state = jax.tree_util.tree_map(
                                lambda x: np.asarray(x), state)
                            wait = 0
                            if self.checkpoint_dir:
                                best_path = os.path.join(
                                    self.checkpoint_dir,
                                    f"{self.checkpoint_name}.ckpt")
                                task.model.save(best_path, best_params,
                                                best_state,
                                                extra={"epoch": epoch,
                                                       self.monitor: score})
                                self._log_ckpt_artifact(best_path)
                        else:
                            wait += 1
                            if (self.patience is not None
                                    and wait >= self.patience):
                                history.append(row)
                                stopped = True
                                break
            history.append(row)

        if self.checkpoint_dir and self.save_last:
            last_path = os.path.join(self.checkpoint_dir, "last.ckpt")
            task.model.save(last_path, params, state, extra={"epoch": epoch},
                            opt_state=opt_state)
            self._log_ckpt_artifact(last_path)
        if self.monitor is None or best_score is None:
            best_params, best_state = params, state
        return FitResult(best_params, best_state, best_score, best_epoch,
                         history, best_path, stopped,
                         final_params=params, final_state=state,
                         opt_state=opt_state)

    def test(self, task: Task, datamodule, params, state,
             split_name: str = "test"):
        if datamodule.train is None:
            datamodule.setup("test")
        split = getattr(datamodule, split_name)
        drop_last = getattr(datamodule, "drop_last", False)
        metrics = self.evaluate(task, params, state, split,
                                datamodule.batch_size, drop_last, split_name)
        self._log(metrics, step=self._step_counter)
        if self.verbose:
            print(" ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
        return metrics
