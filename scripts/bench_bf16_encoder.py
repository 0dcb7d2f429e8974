"""bf16-encoder lever (the last untaken rung of the round-6 budget):
same-run A/B of the adopted serving pipeline with the encoder
resblock-chain matmuls in exact f32 vs bf16-inputs/f32-accumulation
(ops/pallas_encoder.py::compute_dtype).

Measures, at the bench config (VQ hidden 512/8 resblocks, d512/8-block
int8 transformer, b=80):
  - windows/s both arms, groups interleaved (contention-fair);
  - VQ index flip rate bf16 vs f32 across a large cycle sample;
  - end-to-end predicted-label agreement between the two pipelines.

The f32 arm IS the shipped bench.py path; the bf16 arm trades the
bit-comparable-index contract for MXU rate, same trade (and same
evidence bar) as the scoped bf16-training adoption in BENCHMARKS.md
round 5. Output: results/bench_bf16_encoder_r3.json + a table on
stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

BATCH = 80
N_CYCLES = 20
CYCLE_LEN = 200
ITERS = 10
GROUPS = 6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import __graft_entry__ as g
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_activation_absmax, quantize_transformer)
    from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (
        encode_indices_fused)

    vq, tr, vq_params, vq_state, tr_params = g._build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)

    calib_ids = jax.jit(lambda xx: vq.encode_indices(
        vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))(x[:8])
    calib_ids = calib_ids.reshape(8, -1)
    calib_ids = jnp.concatenate(
        [jnp.full((8, 1), vq.num_embeddings, calib_ids.dtype), calib_ids],
        axis=1)
    am = calibrate_activation_absmax(tr, tr_params, calib_ids)
    qparams = quantize_transformer(tr_params, act_absmax=am)

    fn_f32 = jax.jit(g.make_pipeline_quantized(vq, tr, qparams))
    fn_bf16 = jax.jit(g.make_pipeline_quantized(
        vq, tr, qparams, encoder_dtype=jnp.bfloat16))
    args = (vq_params, vq_state, x)

    # --- correctness deltas (before timing; separate dispatches) ---
    cycles = x.reshape(-1, CYCLE_LEN, 2)
    ids_f = np.asarray(jax.jit(
        lambda c: encode_indices_fused(vq, vq_params, vq_state, c))(cycles))
    ids_b = np.asarray(jax.jit(
        lambda c: encode_indices_fused(vq, vq_params, vq_state, c,
                                       compute_dtype=jnp.bfloat16))(cycles))
    flip = float((ids_f != ids_b).mean())
    log(f"index flips bf16 vs f32: {flip:.5f} "
        f"({(ids_f != ids_b).sum()} of {ids_f.size})")

    lab_f = np.asarray(fn_f32(*args)).argmax(-1)
    lab_b = np.asarray(fn_bf16(*args)).argmax(-1)
    agree = float((lab_f == lab_b).mean())
    log(f"label agreement: {agree:.4f} on {lab_f.size} windows")

    # --- same-run interleaved timing ---
    for fn in (fn_f32, fn_bf16):
        jax.block_until_ready(fn(*args))
        for _ in range(2):
            jax.block_until_ready(fn(*args))
    best = {"f32": float("inf"), "bf16": float("inf")}
    for gi in range(GROUPS):
        for name, fn in (("f32", fn_f32), ("bf16", fn_bf16)):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            log(f"group {gi} {name}: {BATCH * ITERS / dt:.1f} windows/s")
            best[name] = min(best[name], dt)
    wps = {k: BATCH * ITERS / v for k, v in best.items()}

    res = {
        "batch": BATCH,
        "windows_per_sec_f32_encoder": round(wps["f32"], 1),
        "windows_per_sec_bf16_encoder": round(wps["bf16"], 1),
        "speedup": round(wps["bf16"] / wps["f32"], 4),
        "index_flip_rate": flip,
        "label_agreement": agree,
        "groups": GROUPS,
        "iters": ITERS,
    }
    os.makedirs("results", exist_ok=True)
    with open("results/bench_bf16_encoder_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
