"""On-device sliding-window view over packed welding cycles.

The reference (and our default path) materializes n-cycle windows as a
new array — a seq_len-fold duplication of every cycle
(asimow_dataloader.py:185-206; at n_cycles=20 that is 20x the host AND
device memory of the underlying cycles, since the Trainer keeps whole
splits resident in HBM). TPU-first alternative: keep the packed
(N, window, C) cycles on device ONCE plus a (M,) table of window start
indices, and gather each batch's windows inside the jitted epoch —
an HBM gather that XLA fuses into the batch pipeline.

`WindowedArray` is registered as a jax pytree, so device placement
(`device_put`/`put_replicated`) and jit tracing pass straight through
it, and the Trainer's `arrays[idx]` batch gather works unchanged.
Batch values are bit-identical to the materialized path (same gather,
same scaling — tests/test_windowed.py).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class WindowedArray:
    """cycles: (N, window, C) scaled cycles; starts: (M,) int32 window
    start indices (window i = cycles[starts[i] : starts[i]+seq_len]).
    Indexing with a (B,) array materializes (B, seq_len*window, C)."""

    def __init__(self, cycles, starts, seq_len: int):
        self.cycles = cycles
        self.starts = starts
        self.seq_len = int(seq_len)

    def __len__(self):
        return int(self.starts.shape[0])

    @property
    def shape(self):
        n, w, c = self.cycles.shape
        return (len(self), self.seq_len * w, c)

    @property
    def dtype(self):
        return self.cycles.dtype

    def astype(self, dtype):
        return WindowedArray(jnp.asarray(self.cycles, dtype),
                             jnp.asarray(self.starts, jnp.int32),
                             self.seq_len)

    def __getitem__(self, idx):
        s = jnp.take(self.starts, jnp.asarray(idx))
        rows = s[:, None] + jnp.arange(self.seq_len)            # (B, seq)
        w = jnp.take(self.cycles, rows, axis=0)                 # (B,s,w,C)
        return w.reshape(w.shape[0], self.seq_len * w.shape[2], w.shape[3])

    def materialize(self) -> np.ndarray:
        """Host-side materialization (for tests / interop)."""
        return np.asarray(self[np.arange(len(self))])


jax.tree_util.register_pytree_node(
    WindowedArray,
    lambda wa: ((wa.cycles, wa.starts), wa.seq_len),
    lambda seq_len, children: WindowedArray(children[0], children[1],
                                            seq_len),
)


def window_counts(n_cycles_total: int, seq_len: int) -> np.ndarray:
    """How many sliding windows contain each cycle (windows i in
    [0, N-seq_len), window i covers cycles [i, i+seq_len))."""
    n = n_cycles_total - seq_len
    j = np.arange(n_cycles_total)
    i_min = np.maximum(0, j - seq_len + 1)
    i_max = np.minimum(n - 1, j)
    return np.maximum(0, i_max - i_min + 1).astype(np.int64)


def fit_scaler_on_windows(scaler, cycles: np.ndarray, seq_len: int):
    """Fit per-channel mean/std EXACTLY as a fit on the materialized
    window multiset would (the reference fits on windows, where
    edge cycles appear in fewer windows than interior ones —
    asimow_dataloader.py:174-177), via window-count weighting.

    cycles: (N, window, C) already offset-sliced."""
    c = window_counts(cycles.shape[0], seq_len).astype(np.float64)
    x = cycles.astype(np.float64)
    total = c.sum() * cycles.shape[1]
    mean = np.einsum("n,ntc->c", c, x) / total
    e2 = np.einsum("n,ntc->c", c, x * x) / total
    scaler.mean_ = mean
    scale = np.sqrt(np.maximum(e2 - mean * mean, 0.0))
    scaler.scale_ = np.where(scale == 0.0, 1.0, scale)
    return scaler
