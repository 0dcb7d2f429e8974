"""Memory-mapped streaming datasets for beyond-HBM training.

The default Trainer path uploads whole splits to HBM once and runs each
epoch as a single compiled scan — unbeatable when the data fits. For
datasets that don't, `MmapDataset` keeps samples in one flat float32
file on disk, and the Trainer's streaming mode
(`Trainer(streaming=True)`, train/loop.py) materializes each
accumulation group on the host — a parallel C++ row gather
(native/batch_gather.cpp) straight from the mmap into a contiguous
buffer — and `device_put`s it per jitted group step. This replaces the
reference's 8 DataLoader worker processes (asimow_dataloader.py:357-365)
with zero worker processes and zero per-sample Python.

Sampling semantics (weighted/uniform, (seed, epoch)-keyed resume
determinism) are IDENTICAL to the resident path — the same index
streams drive both; tests assert bitwise-equal training losses.
"""
from __future__ import annotations

import json
import os

import numpy as np


class MmapDataset:
    """x: (N, *sample_shape) float32 rows in a flat .bin file (mmap),
    y: optional int64 labels (small, resident). Supports `x[idx]` batch
    gather via the native library with a numpy fallback."""

    def __init__(self, path: str):
        with open(path + ".json") as f:
            meta = json.load(f)
        self.sample_shape = tuple(meta["sample_shape"])
        self.n = int(meta["n"])
        self._row_elems = int(np.prod(self.sample_shape))
        self._mm = np.memmap(path + ".bin", np.float32, mode="r",
                             shape=(self.n, self._row_elems))
        ypath = path + ".labels.npy"
        self.y = np.load(ypath) if os.path.exists(ypath) else None
        self.x = _MmapRows(self._mm, self.sample_shape)

    def __len__(self):
        return self.n

    @staticmethod
    def write(path: str, x: np.ndarray, y: np.ndarray | None = None):
        """Persist (N, *shape) float32 samples (+labels) for streaming."""
        x = np.ascontiguousarray(x, np.float32)
        x.reshape(len(x), -1).tofile(path + ".bin")
        with open(path + ".json", "w") as f:
            json.dump({"n": int(len(x)),
                       "sample_shape": list(x.shape[1:])}, f)
        if y is not None:
            np.save(path + ".labels.npy", np.asarray(y, np.int64))
        return path


class _MmapRows:
    """Batch-gather view over the mmap: rows[idx] -> (B, *sample_shape)
    contiguous float32 (C++ threaded gather, numpy fallback)."""

    def __init__(self, mm: np.memmap, sample_shape):
        self._mm = mm
        self.sample_shape = tuple(sample_shape)

    def __len__(self):
        return self._mm.shape[0]

    @property
    def shape(self):
        return (len(self),) + self.sample_shape

    @property
    def dtype(self):
        return np.float32

    def __getitem__(self, idx):
        idx = np.asarray(idx, np.int64).ravel()
        out = np.empty((len(idx), self._mm.shape[1]), np.float32)
        if not _native_gather(self._mm, idx, out):
            out[:] = self._mm[idx]
        return out.reshape((len(idx),) + self.sample_shape)

    def __array__(self, dtype=None):
        # full materialization (evaluate() on small val/test splits)
        a = np.asarray(self._mm).reshape(self.shape)
        return a.astype(dtype) if dtype is not None else a


def _native_gather(mm: np.memmap, idx: np.ndarray, out: np.ndarray) -> bool:
    import ctypes

    from ..native.build import load_native_lib
    lib = load_native_lib()
    if lib is None:
        return False
    got = lib.gather_rows_f32(
        ctypes.cast(ctypes.c_void_p(mm.ctypes.data),
                    ctypes.POINTER(ctypes.c_float)),
        mm.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return got == len(idx)


class StreamingSplit:
    """ArraySplit-shaped adapter over an MmapDataset (x host-gathered
    per batch; y resident)."""

    def __init__(self, ds: MmapDataset):
        self.x = ds.x
        self.y = ds.y
        self.cond = None

    def __len__(self):
        return len(self.x)
