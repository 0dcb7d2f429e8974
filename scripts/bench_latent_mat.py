"""Latent materialization bench: whole-split chunked on-device encode
(data/latent.py) vs a reference-style per-batch host-round-trip loop.

The reference materializes latent datasets by iterating a torch
DataLoader batch-by-batch and, INSIDE each batch, looping over the
seq_len cycle slices — each slice is a separate host->device transfer,
encode, and .cpu() pull — then growing the result with np.append
(a full-array copy per batch, O(N^2) host bytes)
(/root/reference/dataloader/latentspace_dataloader.py:171-263). This
framework's LatentPredDataModule._encode_split runs one jitted encoder
over 4096-cycle chunks (data/latent.py::_chunked_device_map) — one
dispatch + one host pull per 4096 cycles — and the training loop
afterwards is device-resident.

Three arms, sharing the same encoder weights:
  chunked_ours   — data/latent.py's path (jit over 4096-cycle chunks)
  ref_faithful   — the reference pattern: per-batch, per-cycle-slice
                   round-trips + np.append growth
  ref_batched    — a FAVORABLE reconstruction of the reference (one
                   encode + one host pull per batch, list append), so
                   the reported speedup is not an np.append artifact

Run on the TPU (default backend) for the honest number; --groups to
ride out tunnel contention (BENCHMARKS.md methodology: report the best
group, the shared-TPU variance is ~20%).

Usage: python scripts/bench_latent_mat.py [--cycles 65536] [--groups 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vq_vae_transformer_arc_welding_tpu.data.latent import (  # noqa: E402
    _ENCODE_CHUNK, _chunked_device_map)
from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch  # noqa: E402

CYCLE_LEN = 200


def build(hidden=512, k=256, d=32, n_res=8):
    """The BASELINE.json benchmark VQ-VAE config (bench.py)."""
    vq = VQVAEPatch(hidden_dim=hidden, input_dim=2, num_embeddings=k,
                    embedding_dim=d, n_resblocks=n_res, learning_rate=1e-3,
                    batch_norm=False)
    params, state = vq.init(0)
    return vq, params, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=65536,
                    help="split size in cycles (the ASIMoW train split "
                         "is ~57k cycles at n_cycles=1 windowing)")
    ap.add_argument("--ref-bs", type=int, default=128,
                    help="reference per-batch loop batch size "
                         "(latentspace_dataloader.py uses the datamodule "
                         "batch_size, 128 in the reference configs)")
    ap.add_argument("--groups", type=int, default=4)
    args = ap.parse_args()

    vq, params, state = build()
    x = np.random.default_rng(0).standard_normal(
        (args.cycles, CYCLE_LEN, 2)).astype(np.float32)
    print(f"backend={jax.default_backend()} cycles={args.cycles} "
          f"chunk={_ENCODE_CHUNK} ref_bs={args.ref_bs}", file=sys.stderr)

    enc = jax.jit(lambda b: vq.encode_indices(params, state, b))

    # windows of n_cycles=5 cycles, like the reference's latent tasks
    n_cycles = 5
    xw = x[: len(x) // n_cycles * n_cycles].reshape(
        -1, n_cycles * CYCLE_LEN, 2)

    def ours():
        return _chunked_device_map(enc, x)

    def ref_faithful():
        # the reference loop shape: per window batch, per cycle slice:
        # device transfer + encode + host pull; result grown by
        # np.append (latentspace_dataloader.py:186-201)
        out = np.empty((0, n_cycles, vq.enc_out_len), dtype=int)
        for s in range(0, len(xw), args.ref_bs):
            wb = xw[s:s + args.ref_bs]
            t_x = []
            for i in range(n_cycles):
                sl = wb[:, i * CYCLE_LEN:(i + 1) * CYCLE_LEN, :]
                ids = np.asarray(enc(jnp.asarray(sl)))
                t_x.append(ids.reshape(ids.shape[0], -1))
            out = np.append(out, np.array(t_x).swapaxes(0, 1), axis=0)
        return out

    def ref_batched():
        # favorable reconstruction: one encode + one pull per batch
        outs = []
        for s in range(0, len(x), args.ref_bs):
            block = x[s:s + args.ref_bs]
            outs.append(np.asarray(enc(jnp.asarray(block))))
        return np.concatenate(outs)

    # warmup/compile all shapes; correctness cross-check while at it
    a, b, c = ours(), ref_faithful(), ref_batched()
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(
        a[: len(xw) * n_cycles].reshape(b.shape), b)

    res = {}
    for name, fn in (("chunked_ours", ours), ("ref_faithful", ref_faithful),
                     ("ref_batched", ref_batched)):
        best = 0.0
        for _ in range(args.groups):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = max(best, args.cycles / dt)
        res[name] = best
        print(f"{name}: {best:,.0f} cycles/s", file=sys.stderr)

    res["speedup_vs_faithful"] = res["chunked_ours"] / res["ref_faithful"]
    res["speedup_vs_batched"] = res["chunked_ours"] / res["ref_batched"]
    print(json.dumps({"metric": "latent_materialization",
                      "unit": "cycles/s", **{k: round(v, 2)
                                             for k, v in res.items()}}))


if __name__ == "__main__":
    main()
