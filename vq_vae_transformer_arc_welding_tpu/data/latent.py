"""Latent dataset materialization — fully on device.

Replaces the reference's offline encode loop
(dataloader/latentspace_dataloader.py:171-263), which round-trips
GPU->host numpy per batch per cycle-window; here the whole split is
encoded by one jitted function over fixed-size chunks: reshape
(N, n_cycles*window, C) -> (N*n_cycles, window, C), run the frozen
VQ-VAE encoder + nearest-code lookup, reshape back. The host sees only
the final token/latent arrays (the north-star host-round-trip
elimination, BASELINE.json).

Task semantics mirror the reference:
- 'classification': z_q vectors, (N, n_cycles, embedding_dim*enc_out_len)
- 'classification_ids': token ids, (N, n_cycles, enc_out_len)
- 'autoregressive_ids': ids flattened to (N, n_cycles*enc_out_len), no
  labels, built on the *reconstruction* base task (unfiltered labels,
  reference :41-48 quirk); 'autoregressive_ids_classification': same
  ids but with labels, built on the classification base task.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .asimow import ASIMoWDataModule, CYCLE_LEN
from .datasets import ArraySplit, make_autoregressive, sampling_weights

_ENCODE_CHUNK = 4096

LATENT_TASKS = ("classification", "classification_ids", "autoregressive_ids",
                "autoregressive_ids_classification")


def _chunked_device_map(fn, x: np.ndarray, chunk: int = _ENCODE_CHUNK,
                        pipeline_depth: int = 2):
    """Apply a jitted fn over fixed-size chunks. EVERY block — including
    sub-chunk requests — is padded up to `chunk`, so fn compiles exactly
    ONE shape regardless of request size (remote-TPU compiles cost 15s+;
    a padded chunk of throwaway rows costs microseconds). Contract
    asserted by tests/test_serve.py::test_small_requests_single_compile.

    `pipeline_depth` chunks are kept in flight (JAX dispatch is async):
    chunk i+1's host-side padding + H2D transfer + compute overlap with
    chunk i's D2H readback instead of serializing on `np.asarray`.
    Outputs are bit-identical to the depth-1 schedule — only the
    dispatch order changes. Device memory holds at most `pipeline_depth`
    chunk-sized input/output buffers."""
    n = len(x)
    outs = []
    pending = []  # (device pytree, valid row count) not yet read back

    def _drain(keep: int):
        while len(pending) > keep:
            out, valid = pending.pop(0)
            # fn may return a pytree of batch-leading arrays (e.g. the
            # serving classify path's (probs, saturation) pair) — crop
            # the padding from every leaf (np.asarray blocks until the
            # device result is ready)
            outs.append(jax.tree_util.tree_map(
                lambda y: np.asarray(y)[:valid], out))

    for s in range(0, n, chunk):
        block = x[s:s + chunk]
        pad = chunk - len(block)
        if pad > 0:
            block = np.concatenate([block, np.zeros((pad,) + block.shape[1:],
                                                    block.dtype)])
        pending.append((fn(jnp.asarray(block)), chunk - pad))
        _drain(max(pipeline_depth - 1, 0))
    _drain(0)
    if len(outs) == 1:
        return outs[0]
    return jax.tree_util.tree_map(lambda *ys: np.concatenate(ys), *outs)


class LatentPredDataModule:
    """Latent-space data module over a frozen VQ-VAE
    (reference LatentPredDataModule, latentspace_dataloader.py:294-343).

    `latent_space_model` is a (model, params, state) triple of our
    VQVAEPatch (use train.torch_import.load_vqvae_checkpoint for
    reference .ckpt files).
    """

    drop_last = False  # reference latent loaders don't set drop_last

    def __init__(self, latent_space_model, task: str, n_cycles: int,
                 val_data_ids, test_data_ids, model_name: str = "VQ-VAE-Patch",
                 model_id: str = "", batch_size: int = 32,
                 window_size: int = CYCLE_LEN, window_offset: int = 0,
                 shuffle_val_test: bool = True,
                 data_directory_path: str | None = None, seed: int = 42):
        if task not in LATENT_TASKS:
            raise ValueError(f"task {task} not supported")
        self.model, self.params, self.state = latent_space_model
        self.task = task
        self.n_cycles = n_cycles
        self.val_ids = val_data_ids
        self.test_ids = test_data_ids
        self.model_name = model_name
        self.model_id = model_id
        self.batch_size = batch_size
        self.window_size = window_size
        self.window_offset = window_offset
        self.shuffle_val_test = shuffle_val_test
        self.data_dir = data_directory_path
        self.seed = seed
        self.train = self.val = self.test = None
        self.train_sampling = None
        self.num_classes = None  # set for autoregressive tasks
        self._jitted_encode = None  # shared across splits (one compile)

    def _encode_split(self, x: np.ndarray) -> np.ndarray:
        """(N, n_cycles*window, C) -> per-task latent arrays (numpy)."""
        n, _, c = x.shape
        model, params, state = self.model, self.params, self.state
        per_cycle = x.reshape(n * self.n_cycles, self.window_size, c)

        if self._jitted_encode is None:
            if self.task == "classification":
                self._jitted_encode = jax.jit(
                    lambda b: model.encode_zq(params, state, b))
            else:
                self._jitted_encode = jax.jit(
                    lambda b: model.encode_indices(params, state, b))
        fn = self._jitted_encode

        if self.task == "classification":
            z = _chunked_device_map(fn, per_cycle)      # (N*n, 16, D)
            return z.reshape(n, self.n_cycles, -1).astype(np.float32)
        ids = _chunked_device_map(fn, per_cycle)        # (N*n, 16)
        ids = ids.reshape(n, self.n_cycles, -1).astype(np.int64)
        if self.task == "classification_ids":
            return ids
        return ids.reshape(n, -1)                        # autoregressive

    def setup(self, stage: str = "fit"):
        base_task = ("reconstruction" if self.task == "autoregressive_ids"
                     else "classification")
        base = ASIMoWDataModule(
            task=base_task, n_cycles=self.n_cycles, val_data_ids=self.val_ids,
            test_data_ids=self.test_ids, batch_size=self.batch_size,
            window_size=self.window_size, window_offset=self.window_offset,
            data_directory_path=self.data_dir, seed=self.seed, shuffle=False)
        base.setup(stage)

        rng = np.random.default_rng(self.seed)
        splits = {}
        for name, sp in (("train", base.train), ("val", base.val),
                         ("test", base.test)):
            z = self._encode_split(sp.x)
            y = sp.y
            if self.task in ("autoregressive_ids",
                             "autoregressive_ids_classification"):
                split, num_classes = make_autoregressive(z, y)
                self.num_classes = num_classes
            else:
                split = ArraySplit(z, y)
            splits[name] = split

        # reference shuffles val/test after materialization (:56-60)
        for name in ("val", "test"):
            if self.shuffle_val_test:
                sp = splits[name]
                idx = rng.permutation(len(sp.x))
                splits[name] = ArraySplit(
                    sp.x[idx], None if sp.y is None else sp.y[idx],
                    None if sp.cond is None else sp.cond[idx])
        self.train, self.val, self.test = (splits["train"], splits["val"],
                                           splits["test"])
        if self.task != "autoregressive_ids":
            labels = (self.train.cond if self.train.cond is not None
                      else self.train.y)
            self.train_sampling = sampling_weights(labels)

    def input_shape(self):
        return self.train.x.shape[1:]
