"""KV-sampler decode benchmark: ms/token for the XLA step vs the
fused whole-block Pallas decode kernel (ops/pallas_decode.py round-2,
manual valid-prefix DMA + single-row write-back).

Bench config matches serve.sample_tokens at the flagship model
(d512 / 8 blocks / 8 heads, seq_len 321, batch 16): one prefill token
+ 320 KV-cached steps. The tunneled TPU is shared (~20% variance), so
the best of --groups timing groups is reported.

Usage: python scripts/bench_decode.py [--impls xla fused] [--steps 320]
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

from vq_vae_transformer_arc_welding_tpu.models import TransformerDecoder


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", nargs="+", default=["xla", "fused"])
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--n-blocks", type=int, default=8)
    args = ap.parse_args()

    seq = 20 * 16 + 1
    m = TransformerDecoder(d_model=args.d_model, n_classes=258, seq_len=seq,
                           n_blocks=args.n_blocks, n_head=8)
    params, _ = m.init(0)
    start = jnp.full((args.batch, 1), 256, jnp.int32)
    dev = jax.devices()[0]
    log(f"backend: {dev.platform}:{dev.device_kind}, batch {args.batch}, "
        f"{args.steps} steps")

    known = {"xla", "fused", "xla-bf16c", "xla-bf16w", "xla-bf16cw",
             "xla-seg", "xla-bf16c-seg", "xla-seg64", "xla-bf16c-seg64",
             "xla-bf16c-seg32", "xla-bf16cw-seg64",
             "xla-u2", "xla-u4", "xla-bf16c-seg64-u2"}
    unknown = set(args.impls) - known
    if unknown:  # a typo would silently bench the plain XLA path
        sys.exit(f"unknown impls {sorted(unknown)}; known: {sorted(known)}")

    results = {}
    outs = {}
    for impl in args.impls:
        kw = {"decode_impl": impl}
        if impl == "xla-bf16c":  # bf16 K/V cache storage, f32 scoring
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16}
        elif impl == "xla-bf16w":  # bf16 weight streaming, f32 caches
            kw = {"decode_impl": "xla", "param_dtype": jnp.bfloat16}
        elif impl == "xla-bf16cw":  # bf16 caches AND weights
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "param_dtype": jnp.bfloat16}
        elif impl == "xla-seg":  # segmented cache-prefix reads, f32
            kw = {"decode_impl": "xla", "cache_buckets": 128}
        elif impl == "xla-bf16c-seg":  # bf16 cache + segmented reads
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "cache_buckets": 128}
        elif impl == "xla-seg64":
            kw = {"decode_impl": "xla", "cache_buckets": 64}
        elif impl == "xla-bf16c-seg64":
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "cache_buckets": 64}
        elif impl == "xla-bf16c-seg32":
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "cache_buckets": 32}
        elif impl == "xla-bf16cw-seg64":
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "param_dtype": jnp.bfloat16, "cache_buckets": 64}
        elif impl == "xla-u2":  # scan-unrolled (multi-token stepping)
            kw = {"decode_impl": "xla", "scan_unroll": 2}
        elif impl == "xla-u4":
            kw = {"decode_impl": "xla", "scan_unroll": 4}
        elif impl == "xla-bf16c-seg64-u2":  # fast recipe + unroll
            kw = {"decode_impl": "xla", "cache_dtype": jnp.bfloat16,
                  "cache_buckets": 64, "scan_unroll": 2}
        fn = jax.jit(lambda p, s, kw=kw: m.generate_kv(
            p, s, do_sample=True, top_k=5, rng=jax.random.PRNGKey(7),
            num_steps=args.steps, **kw))
        t0 = time.perf_counter()
        out = fn(params, start)
        jax.block_until_ready(out)
        log(f"{impl}: compile+first {time.perf_counter() - t0:.1f}s")
        outs[impl] = np.asarray(out)
        best = float("inf")
        for _ in range(args.groups):
            t0 = time.perf_counter()
            out = fn(params, start)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms_tok = best / args.steps * 1e3
        log(f"{impl}: {best:.3f}s total -> {ms_tok:.3f} ms/token")
        results[impl] = round(ms_tok, 4)

    if len(outs) >= 2:
        base = list(outs)[0]
        for other in list(outs)[1:]:
            agree = float((outs[base] == outs[other]).mean())
            log(f"sampled-id agreement {other} vs {base}: {agree:.4f}")
            results[f"id_agreement_{other}"] = round(agree, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
