"""Measure head-BATCHED attention dots vs the per-head loop inside the
serving block kernel (VERDICT r1 weak #6 'head pairing').

K=128 score pairing is mathematically unavailable (stacking heads
along the contraction sums their scores); the only leverable form is
batching the head dim into one (H,)-batched dot_general per matmul,
which Mosaic lowers on this toolchain. This script times the full int8
serving backbone (8 blocks, attn-half fusion + XLA MLP chain) both
ways at the bench config.
"""
from __future__ import annotations

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

from vq_vae_transformer_arc_welding_tpu.models import TransformerDecoder
from vq_vae_transformer_arc_welding_tpu.models.quantized import (
    calibrate_activation_absmax, qdot, qdot_prequantized,
    quantize_transformer)
from vq_vae_transformer_arc_welding_tpu.ops.activations import gelu, new_gelu
from vq_vae_transformer_arc_welding_tpu.ops.norm import layer_norm
from vq_vae_transformer_arc_welding_tpu.ops.pallas_block_quant import (
    fused_attn_block_quant)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_classify(model, qparams, attn_batched):
    def fn(x_ids):
        t = x_ids.shape[1]
        x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
        for blk in qparams["blocks"]:
            x_mid, h8 = fused_attn_block_quant(
                x, blk, n_head=model.n_head, attn_batched=attn_batched)
            mid = qdot_prequantized(h8, blk["c_fc"])
            x = x_mid + qdot(new_gelu(mid), blk["m_proj"])
        x = layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])
        h = qdot(x, qparams["class_head"]["l1"])
        h = gelu(h.squeeze(-1))
        return qdot(h, qparams["class_head"]["l2"])
    return jax.jit(fn)


def main():
    b, seq = 80, 321
    m = TransformerDecoder(d_model=512, n_classes=258, seq_len=seq,
                           n_blocks=8, n_head=8)
    params, _ = m.init(0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (b, seq)), jnp.int32)
    am = calibrate_activation_absmax(m, params, ids[:8])
    qp = quantize_transformer(params, act_absmax=am)

    results = {}
    outs = {}
    for batched in (False, True):
        fn = make_classify(m, qp, batched)
        t0 = time.perf_counter()
        out = fn(ids)
        jax.block_until_ready(out)
        log(f"attn_batched={batched}: compile+first "
            f"{time.perf_counter() - t0:.1f}s")
        outs[batched] = np.asarray(out)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(ids)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / 10 * 1e3
        log(f"attn_batched={batched}: {ms:.2f} ms/iter "
            f"({b * 10 / best:.0f} windows/s transformer-only)")
        results[f"batched_{batched}"] = round(ms, 3)
    lbl = float((outs[False].argmax(-1) == outs[True].argmax(-1)).mean())
    drift = float(np.max(np.abs(outs[False] - outs[True])))
    log(f"label agreement {lbl:.4f}, logit drift {drift:.2e}")
    results.update(label_agreement=lbl, logit_drift=drift)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
