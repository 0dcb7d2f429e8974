"""Same-run speed-of-light budget for the ADOPTED serving pipeline.

The round-2 budget table in BENCHMARKS.md predates the round-4/5
kernels (fused Pallas encoder, attn-half whole-block fusion,
head-batched attention dots); this script re-runs the decomposition
for the path bench.py actually ships, at the bench batch, all within
ONE process/run (shared-TPU contention makes cross-run absolute
comparisons unreliable — BENCHMARKS.md methodology).

Timed stages (each best-of-GROUPS of ITERS sequential jitted iters):
  full        — make_pipeline_quantized (encode+VQ+int8 classify)
  encoder     — fused Pallas encoder alone (b*20 cycles -> ids)
  classify    — quantized_classify(block_fusion='attn') on fixed ids
  backbone    — the 8 attn-half blocks (kernel + XLA MLP chain), no head
  attn_half   — the 8 fused_attn_block_quant kernels alone (MLP skipped)
Derived:
  mlp_chain   = backbone - attn_half      (XLA int8 fc/gelu/m_proj)
  head_embed  = classify - backbone       (embedding + class head)
  dispatch    = full - encoder - classify (reshape/concat + gaps)

Also prints per-stage FLOP counts so floors can be stated against the
v5e peak (394 int8 TOPS / 197 bf16 TFLOPS paper; ~150 TOPS measured
effective for XLA int8 GEMMs at these shapes — BENCHMARKS.md round 2).

Run on TPU: python scripts/bench_budget_r3.py [--batch 80]
"""
from __future__ import annotations

import argparse
import json
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

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import __graft_entry__ as g  # noqa: E402
from vq_vae_transformer_arc_welding_tpu.models.quantized import (  # noqa: E402
    calibrate_activation_absmax, qdot, qdot_prequantized,
    quantize_transformer, quantized_classify)
from vq_vae_transformer_arc_welding_tpu.ops.pallas_block_quant import (  # noqa: E402
    fused_attn_block_quant)
from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (  # noqa: E402
    encode_indices_fused)

N_CYCLES, CYCLE_LEN = 20, 200
ITERS, GROUPS = 10, 4


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(GROUPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    a = ap.parse_args()
    b = a.batch

    vq, tr, vq_params, vq_state, tr_params = g._build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, N_CYCLES * CYCLE_LEN, 2)),
                    jnp.float32)
    cycles = x.reshape(b * N_CYCLES, CYCLE_LEN, 2)

    ids8 = jax.jit(lambda xx: vq.encode_indices(
        vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))(x[:8])
    ids8 = ids8.reshape(8, -1)
    ids8 = jnp.concatenate(
        [jnp.full((8, 1), vq.num_embeddings, ids8.dtype), ids8], axis=1)
    am = calibrate_activation_absmax(tr, tr_params, ids8)
    qparams = quantize_transformer(tr_params, act_absmax=am)

    full = jax.jit(g.make_pipeline_quantized(vq, tr, qparams))
    enc = jax.jit(lambda c: encode_indices_fused(vq, vq_params, vq_state, c))

    ids = jax.jit(lambda xx: vq.encode_indices(
        vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))(x)
    ids = ids.reshape(b, -1)
    ids = jnp.concatenate(
        [jnp.full((b, 1), vq.num_embeddings, ids.dtype), ids], axis=1)

    classify = jax.jit(lambda ii: quantized_classify(
        tr, qparams, ii, block_fusion="attn"))

    def backbone_fn(ii):
        from vq_vae_transformer_arc_welding_tpu.models.quantized import (
            quantized_backbone_block)
        return quantized_backbone_block(tr, qparams, ii)

    backbone = jax.jit(backbone_fn)

    def attn_half_fn(ii):
        # the 8 kernels alone: feed each block's kernel from the running
        # residual but SKIP the XLA MLP half (x_mid carries forward) —
        # isolates kernel time incl. their HBM traffic
        t = ii.shape[1]
        xx = jnp.take(qparams["tok_emb"], ii, axis=0) + tr.pe[None, :t]
        for blk in qparams["blocks"]:
            xx, _h8 = fused_attn_block_quant(xx, blk, n_head=tr.n_head)
        return xx

    attn_half = jax.jit(attn_half_fn)

    res = {
        "full": timeit(full, vq_params, vq_state, x),
        "encoder": timeit(enc, cycles),
        "classify": timeit(classify, ids),
        "backbone": timeit(backbone, ids),
        "attn_half": timeit(attn_half, ids),
    }
    res["mlp_chain"] = res["backbone"] - res["attn_half"]
    res["head_embed"] = res["classify"] - res["backbone"]
    res["dispatch"] = res["full"] - res["encoder"] - res["classify"]
    res["windows_per_s"] = b / (res["full"] / 1e3)

    # FLOP accounting at the bench config (d=512, T=321, 8 blocks)
    T, C, NB = tr.seq_len, tr.d_model, tr.n_blocks
    lin_flops = 2 * b * T * (C * 3 * C + C * C + 2 * C * 4 * C) * NB
    attn_flops = 2 * b * NB * tr.n_head * 2 * T * T * (C // tr.n_head)
    res["int8_linear_TOP"] = lin_flops / 1e12
    res["attn_matmul_TFLOP"] = attn_flops / 1e12

    print(f"backend={jax.default_backend()} batch={b}", file=sys.stderr)
    for k, v in res.items():
        print(f"  {k}: {v:.3f}", file=sys.stderr)
    print(json.dumps({"metric": "serving_budget_r3", "batch": b,
                      **{k: round(v, 3) for k, v in res.items()}}))


if __name__ == "__main__":
    main()
