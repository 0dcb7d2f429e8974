"""Whole-block fusion variant timing on the real TPU.

Times the full north-star pipeline (encode + VQ + transformer-classify)
end-to-end — the only decision-grade measurement in this environment
(BENCHMARKS.md "Methodology notes") — across serving-path variants:

  qkv   — round-3 shipped path: fused qkv+attention+quant kernel,
          c_proj/ln2/MLP on XLA (quantized_backbone_fused)
  attn  — ln1 + qkv + attention + c_proj + residual + ln2 + quantize
          in one kernel per block; MLP on XLA (pallas_block_quant)
  full  — the whole transformer block as one kernel (MLP included)

Run: python scripts/bench_block_variants.py [batches...]  (TPU)
Each variant is timed as best-of-GROUPS groups of ITERS sequential
iterations (shared-TPU contention variance ~20%).
"""
from __future__ import annotations

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

sys.path.insert(0, "/root/repo")

import __graft_entry__ as g  # noqa: E402
from vq_vae_transformer_arc_welding_tpu.models.quantized import (  # noqa: E402
    calibrate_activation_absmax, quantize_transformer, quantized_classify)

N_CYCLES = 20
CYCLE_LEN = 200
ITERS = 10
GROUPS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [80]
    vq, tr, vq_params, vq_state, tr_params = g._build()

    for batch in batches:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (batch, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)
        calib_ids = jax.jit(lambda xx: vq.encode_indices(
            vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))(x[:8])
        calib_ids = calib_ids.reshape(8, -1)
        calib_ids = jnp.concatenate(
            [jnp.full((8, 1), vq.num_embeddings, calib_ids.dtype),
             calib_ids], axis=1)
        am = calibrate_activation_absmax(tr, tr_params, calib_ids)
        qparams = quantize_transformer(tr_params, act_absmax=am)

        def make(kw):
            def pipeline(vp, vs, xx):
                ids = vq.encode_indices(
                    vp, vs, xx.reshape(-1, CYCLE_LEN, 2))
                ids = ids.reshape(xx.shape[0], -1)
                ids = jnp.concatenate(
                    [jnp.full((xx.shape[0], 1), vq.num_embeddings,
                              ids.dtype), ids], axis=1)
                return quantized_classify(tr, qparams, ids, **kw)
            return jax.jit(pipeline)

        variants = {
            "qkv": make({"fused_attention": True}),
            "attn": make({"block_fusion": "attn"}),
            "full": make({"block_fusion": "full"}),
            "attn8": make({"block_fusion": "attn8"}),
            "full8": make({"block_fusion": "full8"}),
            "attn-bf16": make({"block_fusion": "attn-bf16"}),
            "full-bf16": make({"block_fusion": "full-bf16"}),
        }
        import os
        sel = os.environ.get("VARIANTS")
        if sel:
            variants = {k: variants[k] for k in sel.split(",")}
        args = (vq_params, vq_state, x)
        outs = {}
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            log(f"[b={batch}] {name}: compile+first "
                f"{time.perf_counter() - t0:.1f}s")
            outs[name] = np.asarray(out)
            for _ in range(3):
                jax.block_until_ready(fn(*args))
            best = float("inf")
            for _ in range(GROUPS):
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = fn(*args)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            wps = batch * ITERS / best
            log(f"[b={batch}] {name}: best {best / ITERS * 1e3:.2f} ms/iter"
                f" -> {wps:.0f} windows/s")
        if "qkv" not in outs:
            continue
        base = outs["qkv"]
        for name in variants:
            agree = (outs[name].argmax(-1) == base.argmax(-1)).mean()
            drift = np.abs(outs[name] - base).max()
            log(f"[b={batch}] {name}: label agreement vs qkv "
                f"{agree:.4f}, logit drift {drift:.2e}")


if __name__ == "__main__":
    main()
