"""Int8 serving-pipeline variant timing on the real TPU.

Decomposes the north-star pipeline's remaining time (VERDICT round 1:
int8 bought only 17% because the f32 attention + lost elementwise
fusion dominate) by timing controlled variants of the quantized
transformer at the bench shape (b=48, T=321, d512, 8 blocks):

  A. current quantized_classify (baseline)
  B. attention removed (y = v)           -> bounds attention's total cost
  C. int8 attention (static-calibrated q/k/v scales, int8 score and
     probs@v matmuls, f32 softmax)
  D. bf16 residual stream between int8 matmuls (halved non-matmul HBM)
  E. C + D combined

Run: python scripts/bench_int8_variants.py   (TPU; one process at a time)
"""
from __future__ import annotations

import functools
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
    calibrate_activation_absmax, qdot, quantize_transformer,
    quantized_classify)
from vq_vae_transformer_arc_welding_tpu.ops.activations import (  # noqa: E402
    gelu, new_gelu)
from vq_vae_transformer_arc_welding_tpu.ops.attention import (  # noqa: E402
    causal_attention_core, merge_heads, split_heads)
from vq_vae_transformer_arc_welding_tpu.ops.norm import layer_norm  # noqa: E402

BATCH = 48
N_CYCLES = 20
CYCLE_LEN = 200
ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, args, iters=ITERS, warmup=4):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# variant backbones


def qkv_absmax(model, params, sample_ids):
    """Per-block absmax of q, k, v and attention probs=1 (for variant C)."""
    am = {}
    t = sample_ids.shape[1]
    x = jnp.take(params["tok_emb"], sample_ids, axis=0) + model.pe[None, :t]
    for i, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = jnp.dot(h, blk["attn"]["c_attn_w"]) + blk["attn"]["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        am[f"b{i}_q"] = float(jnp.max(jnp.abs(q))) * 1.25
        am[f"b{i}_k"] = float(jnp.max(jnp.abs(k))) * 1.25
        am[f"b{i}_v"] = float(jnp.max(jnp.abs(v))) * 1.25
        q, k, v = (split_heads(z, model.n_head) for z in (q, k, v))
        y = merge_heads(causal_attention_core(q, k, v))
        x = x + jnp.dot(y, blk["attn"]["c_proj_w"]) + blk["attn"]["c_proj_b"]
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        h = new_gelu(jnp.dot(h, blk["mlp"]["c_fc_w"]) + blk["mlp"]["c_fc_b"])
        x = x + jnp.dot(h, blk["mlp"]["c_proj_w"]) + blk["mlp"]["c_proj_b"]
    return am


def int8_attention(q, k, v, scales, causal_mask):
    """Static-scale int8 attention: int8 score matmul, f32 softmax,
    int8 probs@v. q,k,v: (B,H,T,D) f32."""
    sq, sk, sv = scales
    d = q.shape[-1]
    q8 = jnp.clip(jnp.round(q * (127.0 / sq)), -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(k * (127.0 / sk)), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v * (127.0 / sv)), -127, 127).astype(jnp.int8)
    att = jax.lax.dot_general(
        q8, k8, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    att = att * (sq * sk / (127.0 * 127.0) / np.sqrt(d))
    att = jnp.where(causal_mask, att, -jnp.inf)
    p = jax.nn.softmax(att, axis=-1)
    p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        p8, v8, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    return y * (sv / (127.0 * 127.0))


def make_backbone(model, *, attn: str, act_dtype, qkv_scales=None):
    """attn: 'f32' | 'none' | 'int8'."""

    def backbone(qparams, x_ids):
        t = x_ids.shape[1]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
        x = x.astype(act_dtype)
        for i, blk in enumerate(qparams["blocks"]):
            h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
            qkv = qdot(h, blk["c_attn"]).astype(act_dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (split_heads(z, model.n_head) for z in (q, k, v))
            if attn == "none":
                y = v
            elif attn == "int8":
                y = int8_attention(
                    q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32),
                    (qkv_scales[f"b{i}_q"], qkv_scales[f"b{i}_k"],
                     qkv_scales[f"b{i}_v"]), causal)
            else:
                y = causal_attention_core(q, k, v)
            y = merge_heads(y.astype(act_dtype))
            x = x + qdot(y, blk["c_proj"]).astype(act_dtype)
            h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
            h = new_gelu(qdot(h, blk["c_fc"])).astype(act_dtype)
            x = x + qdot(h, blk["m_proj"]).astype(act_dtype)
        x = layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])
        h = qdot(x.astype(jnp.float32), qparams["class_head"]["l1"])
        h = gelu(h.squeeze(-1))
        return qdot(h, qparams["class_head"]["l2"])

    return backbone


def main():
    vq, tr, vq_params, vq_state, tr_params = g._build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (BATCH, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)

    enc = jax.jit(lambda xx: vq.encode_indices(
        vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))
    ids = np.asarray(enc(x)).reshape(BATCH, -1)
    ids = np.concatenate(
        [np.full((BATCH, 1), vq.num_embeddings, ids.dtype), ids], axis=1)
    ids = jnp.asarray(ids)

    am = calibrate_activation_absmax(tr, tr_params, ids[:8])
    qparams = quantize_transformer(tr_params, act_absmax=am)
    qkv_am = qkv_absmax(tr, tr_params, ids[:8])

    ref_logits = None
    results = {}
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        quantized_classify as qc)
    variants = {
        "A_current": make_backbone(tr, attn="f32", act_dtype=jnp.float32),
        "B_no_attn": make_backbone(tr, attn="none", act_dtype=jnp.float32),
        "C_int8_attn": make_backbone(tr, attn="int8",
                                     act_dtype=jnp.float32,
                                     qkv_scales=qkv_am),
        "D_bf16_resid": make_backbone(tr, attn="f32",
                                      act_dtype=jnp.bfloat16),
        "E_int8attn_bf16": make_backbone(tr, attn="int8",
                                         act_dtype=jnp.bfloat16,
                                         qkv_scales=qkv_am),
        "F_fused_pallas": lambda qp, ii: qc(tr, qp, ii,
                                            fused_attention=True),
        "I_fused_mlp": lambda qp, ii: qc(tr, qp, ii, fused_attention=True,
                                         fused_mlp=True),
    }
    # sanity: A matches the shipped quantized_classify
    shipped = jax.jit(functools.partial(quantized_classify, tr, qparams))
    a_fn = jax.jit(variants["A_current"])
    d = float(jnp.max(jnp.abs(shipped(ids) - a_fn(qparams, ids))))
    log(f"A vs shipped max |d|: {d:.2e}")

    f32_fn = jax.jit(lambda i: tr.apply(tr_params, None, i,
                                        generate=False)[0])
    ref_logits = np.asarray(f32_fn(ids))
    ref_labels = ref_logits.argmax(-1)

    for name, bk in variants.items():
        fn = jax.jit(bk)
        ms = time_fn(fn, (qparams, ids)) * 1e3
        logits = np.asarray(fn(qparams, ids))
        agree = float((logits.argmax(-1) == ref_labels).mean())
        drift = float(np.max(np.abs(logits - ref_logits)))
        results[name] = (ms, agree, drift)
        log(f"{name:18s} {ms:7.2f} ms  label-agree {agree:.3f}  "
            f"max-drift {drift:.2e}")

    # full-pipeline timing of the best-looking variants incl. encode
    for name in ("A_current", "F_fused_pallas"):
        bk = variants[name]

        def pipe(vp, vs, xx, bk=bk):
            b = xx.shape[0]
            cyc = xx.reshape(b * N_CYCLES, CYCLE_LEN, 2)
            ii = vq.encode_indices(vp, vs, cyc).reshape(b, -1)
            ii = jnp.concatenate(
                [jnp.full((b, 1), vq.num_embeddings, ii.dtype), ii], axis=1)
            return bk(qparams, ii)

        fn = jax.jit(pipe)
        ms = time_fn(fn, (vq_params, vq_state, x)) * 1e3
        log(f"pipeline {name:18s} {ms:7.2f} ms -> "
            f"{BATCH / (ms / 1e3):.0f} windows/s")


if __name__ == "__main__" and "--sweep" not in sys.argv:
    main()


def batch_sweep():
    """Fused-attention pipeline throughput vs batch size."""
    vq, tr, vq_params, vq_state, tr_params = g._build()
    rng = np.random.default_rng(0)

    for batch in (48, 64, 96, 128, 192):
        x = jnp.asarray(rng.standard_normal(
            (batch, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)
        enc = jax.jit(lambda xx: vq.encode_indices(
            vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))
        ids = np.asarray(enc(x[:8])).reshape(8, -1)
        ids = np.concatenate(
            [np.full((8, 1), vq.num_embeddings, ids.dtype), ids], axis=1)
        am = calibrate_activation_absmax(tr, tr_params, jnp.asarray(ids))
        qparams = quantize_transformer(tr_params, act_absmax=am)

        def pipe(vp, vs, xx):
            b = xx.shape[0]
            cyc = xx.reshape(b * N_CYCLES, CYCLE_LEN, 2)
            ii = vq.encode_indices(vp, vs, cyc).reshape(b, -1)
            ii = jnp.concatenate(
                [jnp.full((b, 1), vq.num_embeddings, ii.dtype), ii], axis=1)
            return quantized_classify(tr, qparams, ii, fused_attention=True)

        fn = jax.jit(pipe)
        ms = time_fn(fn, (vq_params, vq_state, x)) * 1e3
        log(f"fused pipeline b={batch:4d}: {ms:7.2f} ms -> "
            f"{batch / (ms / 1e3):.0f} windows/s")


if __name__ == "__main__" and "--sweep" in sys.argv:
    batch_sweep()
    sys.exit(0)
