"""Int8 weight quantization for transformer serving.

v5e MXUs run int8 matmuls at ~2x the bf16 rate; for the serving path
(logits only, no gradients) we quantize every transformer Linear to
per-output-channel symmetric int8 and quantize activations dynamically
per tensor at each matmul: x -> int8 via 127/absmax, int8 x int8 ->
int32 accumulate on the MXU, dequantize by the two scales. LayerNorm,
softmax, residuals and the attention score math stay f32. The VQ-VAE
encoder keeps f32 (it is 1% of pipeline time — profiled in round 1).

Use: qparams = quantize_transformer(params);
     logits = quantized_classify(model, qparams, ids).
Accuracy contract checked in tests: logits within ~1e-1 of f32 and
identical argmax labels on random inputs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QLinear(NamedTuple):
    w_int8: jnp.ndarray   # (in, out) int8
    scale: jnp.ndarray    # (out,) f32 per-output-channel dequant scale
    bias: jnp.ndarray | None
    act_scale: jnp.ndarray | None = None  # () calibrated 127/absmax(x)


def quantize_linear(w: jnp.ndarray, bias=None, act_absmax=None) -> QLinear:
    absmax = jnp.max(jnp.abs(w), axis=0)           # per output column
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    act_scale = (None if act_absmax is None
                 else jnp.asarray(127.0 / max(float(act_absmax), 1e-6),
                                  jnp.float32))
    return QLinear(w_q, scale.astype(jnp.float32), bias, act_scale)


def qdot(x: jnp.ndarray, q: QLinear) -> jnp.ndarray:
    """f32 activations -> int8 -> MXU int8 matmul -> f32.

    With a calibrated act_scale the quantization is a pure elementwise
    op; without one, a dynamic per-tensor absmax reduction picks the
    scale (slower but calibration-free)."""
    if q.act_scale is not None:
        s_x = q.act_scale
    else:
        ax = jnp.max(jnp.abs(x))
        s_x = jnp.where(ax > 0, 127.0 / ax, 1.0)
    x_q = jnp.clip(jnp.round(x * s_x), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(
        x_q, q.w_int8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = o.astype(jnp.float32) * (q.scale / s_x)
    if q.bias is not None:
        y = y + q.bias
    return y


def qdot_prequantized(x_int8: jnp.ndarray, q: QLinear) -> jnp.ndarray:
    """Like qdot but for activations ALREADY quantized to int8 with
    q.act_scale (e.g. by the fused attention kernel,
    ops/pallas_attn_quant.py). Skips the quantize elementwise pass."""
    o = jax.lax.dot_general(
        x_int8, q.w_int8, (((x_int8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = o.astype(jnp.float32) * (q.scale / q.act_scale)
    if q.bias is not None:
        y = y + q.bias
    return y


def quantize_transformer(params, act_absmax: dict | None = None) -> dict:
    """Quantize all Linear weights of a TransformerDecoder param tree
    (list-of-blocks layout). `act_absmax` (from
    calibrate_activation_absmax) bakes static activation scales in —
    the fast serving path; without it scales are dynamic per call."""
    am = act_absmax or {}

    def g(site):
        return am.get(site)

    qp = {
        "tok_emb": params["tok_emb"],
        "ln_f_scale": params["ln_f_scale"], "ln_f_bias": params["ln_f_bias"],
        "lm_head": quantize_linear(params["lm_head_w"],
                                   act_absmax=g("lm_in")),
        "class_head": {
            "l1": quantize_linear(params["class_head"]["l1_w"],
                                  params["class_head"].get("l1_b"),
                                  act_absmax=g("l1_in")),
            "l2": quantize_linear(params["class_head"]["l2_w"],
                                  params["class_head"].get("l2_b"),
                                  act_absmax=g("l2_in")),
        },
        "blocks": [],
    }
    for i, blk in enumerate(params["blocks"]):
        qp["blocks"].append({
            "ln1_scale": blk["ln1_scale"], "ln1_bias": blk["ln1_bias"],
            "ln2_scale": blk["ln2_scale"], "ln2_bias": blk["ln2_bias"],
            "c_attn": quantize_linear(blk["attn"]["c_attn_w"],
                                      blk["attn"]["c_attn_b"],
                                      act_absmax=g(f"b{i}_attn_in")),
            "c_proj": quantize_linear(blk["attn"]["c_proj_w"],
                                      blk["attn"]["c_proj_b"],
                                      act_absmax=g(f"b{i}_proj_in")),
            "c_fc": quantize_linear(blk["mlp"]["c_fc_w"],
                                    blk["mlp"]["c_fc_b"],
                                    act_absmax=g(f"b{i}_fc_in")),
            "m_proj": quantize_linear(blk["mlp"]["c_proj_w"],
                                      blk["mlp"]["c_proj_b"],
                                      act_absmax=g(f"b{i}_mproj_in")),
        })
    return qp


def calibrate_activation_absmax(model, params, sample_ids,
                                margin: float = 1.25) -> dict:
    """Run the f32 forward on calibration data and record the absmax of
    every quantized matmul's input (x margin for headroom)."""
    from ..ops.norm import layer_norm
    from ..ops.attention import causal_attention_core, merge_heads, split_heads
    from ..ops.activations import gelu, new_gelu

    am: dict[str, float] = {}

    def rec(site, x):
        am[site] = float(jnp.max(jnp.abs(x))) * margin
        return x

    t = sample_ids.shape[1]
    x = jnp.take(params["tok_emb"], sample_ids, axis=0) + model.pe[None, :t]
    for i, blk in enumerate(params["blocks"]):
        h = rec(f"b{i}_attn_in",
                layer_norm(x, blk["ln1_scale"], blk["ln1_bias"]))
        qkv = jnp.dot(h, blk["attn"]["c_attn_w"]) + blk["attn"]["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(z, model.n_head) for z in (q, k, v))
        y = rec(f"b{i}_proj_in", merge_heads(causal_attention_core(q, k, v)))
        x = x + jnp.dot(y, blk["attn"]["c_proj_w"]) + blk["attn"]["c_proj_b"]
        h = rec(f"b{i}_fc_in",
                layer_norm(x, blk["ln2_scale"], blk["ln2_bias"]))
        h = rec(f"b{i}_mproj_in", new_gelu(
            jnp.dot(h, blk["mlp"]["c_fc_w"]) + blk["mlp"]["c_fc_b"]))
        x = x + jnp.dot(h, blk["mlp"]["c_proj_w"]) + blk["mlp"]["c_proj_b"]
    x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"])
    rec("lm_in", x)
    rec("l1_in", x)
    h = jnp.dot(x, params["class_head"]["l1_w"])
    if "l1_b" in params["class_head"]:
        h = h + params["class_head"]["l1_b"]
    rec("l2_in", gelu(h.squeeze(-1)))
    return am


def quantized_backbone(model, qparams, x_ids, sat_stats: dict | None = None,
                       sat_rows: list | None = None):
    from ..ops.activations import new_gelu
    from ..ops.attention import causal_attention_core, merge_heads, split_heads
    from ..ops.norm import layer_norm

    # NB: keep the XLA attention here — the fused Pallas kernel wins in
    # isolation (2.46 vs 3.92 ms at bench shape) but breaks XLA's fusion
    # of attention with the surrounding quant/dequant elementwise ops,
    # costing ~25% end-to-end (measured 2492 vs 3418 windows/s)
    def sat(site, a, q):
        # fraction of activations the calibrated scale CLIPS (round(x*s)
        # outside ±127); a distribution shift beyond calibration×margin
        # shows up here before it silently degrades labels
        if q.act_scale is not None:
            if sat_stats is not None:
                sat_stats[site] = jnp.mean((jnp.abs(a) * q.act_scale) > 127.5)
            if sat_rows is not None:
                sat_rows.append(_row_clip_frac(a, q.act_scale))
        return a

    t = x_ids.shape[1]
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
    for i, blk in enumerate(qparams["blocks"]):
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = qdot(sat(f"b{i}_attn_in", h, blk["c_attn"]), blk["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(z, model.n_head) for z in (q, k, v))
        y = merge_heads(causal_attention_core(q, k, v))
        x = x + qdot(sat(f"b{i}_proj_in", y, blk["c_proj"]), blk["c_proj"])
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        mid = new_gelu(qdot(sat(f"b{i}_fc_in", h, blk["c_fc"]),
                            blk["c_fc"]))
        x = x + qdot(sat(f"b{i}_mproj_in", mid, blk["m_proj"]),
                     blk["m_proj"])
    return layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])


def saturation_stats(model, qparams, x_ids):
    """Per-site clipped-activation fractions of the calibrated int8
    path on `x_ids`, plus the overall mean — the serve-time guard
    against silent distribution shift (scales clip anything beyond
    calibration absmax × 1.25; see calibrate_activation_absmax).

    Runs the unfused XLA int8 chain (same scales and quantization
    points as the fused serving kernels — the int8 boundaries
    bit-match, ops/pallas_block_quant.py). Returns (overall, per_site)
    with device scalars; jit-compatible."""
    from ..ops.activations import gelu
    stats: dict = {}
    x = quantized_backbone(model, qparams, x_ids, sat_stats=stats)
    ch = qparams["class_head"]
    if ch["l1"].act_scale is not None:
        stats["l1_in"] = jnp.mean((jnp.abs(x) * ch["l1"].act_scale) > 127.5)
    h = gelu(qdot(x, ch["l1"]).squeeze(-1))
    if ch["l2"].act_scale is not None:
        stats["l2_in"] = jnp.mean((jnp.abs(h) * ch["l2"].act_scale) > 127.5)
    if not stats:
        raise ValueError("saturation_stats needs calibrated act scales")
    overall = sum(stats.values()) / len(stats)
    return overall, stats


def quantized_backbone_fused(model, qparams, x_ids, *, fused_mlp=False,
                             fused_qkv=True, attn_block_rows=None):
    """Backbone with the fused Pallas attention+quant kernel
    (ops/pallas_attn_quant.py): scores never touch HBM and the
    attention output lands pre-quantized for the int8 proj matmul.
    Requires calibrated activation scales (act_absmax at quantize time).
    Round-2 measurement at the bench shape (b=48): 11.5 -> 8.6 ms.

    fused_mlp additionally routes the MLP through ops/pallas_mlp_quant
    — measured ~0.6 ms SLOWER than XLA's fused int8 MLP chain at the
    bench shape (XLA already keeps the quant/gelu elementwise fused and
    overlaps the two matmuls better), so it stays opt-in for other
    shapes.

    fused_qkv (default) additionally pulls the int8 qkv projection
    itself into the kernel (ops/pallas_attn_quant.fused_qkv_attention_
    quant): the (B, T, 3C) f32 qkv tensor — 96 MB per block at the
    bench shape — never touches HBM. Bit-identical numerics."""
    from ..ops.norm import layer_norm
    from ..ops.pallas_attn_quant import (fused_causal_attention_quant,
                                         fused_qkv_attention_quant)
    from ..ops.activations import new_gelu

    t = x_ids.shape[1]
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
    for blk in qparams["blocks"]:
        if blk["c_proj"].act_scale is None:
            raise ValueError("fused path needs calibrated act scales")
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        if fused_qkv:
            if blk["c_attn"].act_scale is None:
                raise ValueError("fused path needs calibrated act scales")
            ca = blk["c_attn"]
            y8 = fused_qkv_attention_quant(
                h, ca.w_int8, ca.scale / ca.act_scale, ca.bias,
                ca.act_scale, blk["c_proj"].act_scale, n_head=model.n_head,
                block_rows=attn_block_rows)
        else:
            qkv = qdot(h, blk["c_attn"])              # (B, T, 3C) f32
            y8 = fused_causal_attention_quant(
                qkv, blk["c_proj"].act_scale, n_head=model.n_head)
        x = x + qdot_prequantized(y8, blk["c_proj"])
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        if fused_mlp:
            from ..ops.pallas_mlp_quant import fused_mlp_quant
            fc, mp = blk["c_fc"], blk["m_proj"]
            x = x + fused_mlp_quant(h, fc.w_int8, fc.scale, fc.bias,
                                    fc.act_scale, mp.w_int8, mp.scale,
                                    mp.bias, mp.act_scale)
        else:
            x = x + qdot(new_gelu(qdot(h, blk["c_fc"])), blk["m_proj"])
    return layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])


def _row_clip_frac_prequant(h8: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) int8 activations -> per-row clipped fraction (B,).

    Clipped activations sit at the clamp rail ±127, so the counter is a
    pure observation of an already-computed tensor (zero extra compute
    passes). Values whose pre-clip |x|·s lands in (126.5, 127.5] round
    to 127 legitimately, so this over-counts saturation_stats' >127.5
    criterion by at most that boundary bin — and is exactly 0 on the
    calibration distribution (the ×1.25 headroom margin caps
    calibration activations at |x|·s ≈ 102)."""
    return jnp.mean((jnp.abs(h8.astype(jnp.int32)) >= 127)
                    .astype(jnp.float32), axis=tuple(range(1, h8.ndim)))


def _row_clip_frac(a: jnp.ndarray, act_scale) -> jnp.ndarray:
    """Per-row clipped fraction of f32 activations about to be
    quantized with act_scale — same >127.5 criterion as
    saturation_stats; the compare+mean fuses into the producer."""
    return jnp.mean((jnp.abs(a) * act_scale > 127.5).astype(jnp.float32),
                    axis=tuple(range(1, a.ndim)))


def quantized_backbone_block(model, qparams, x_ids, *, full_block=False,
                             int8_attn=False, stream_dtype=None,
                             sat_rows: list | None = None):
    """Backbone with whole-block Pallas fusion
    (ops/pallas_block_quant.py): per block the residual stream crosses
    HBM once (x-in / x-out for full_block=True; plus the int8 fc input
    for the attn-half variant, whose MLP stays on XLA's fused chain).
    Requires calibrated activation scales. Int8 boundaries (h8, matmul
    operands) bit-match quantized_backbone in interpret mode; f32
    logits agree to ~1e-3 with identical labels (the in-kernel
    attention normalizes after the PV matmul — see
    ops/pallas_block_quant.py module docstring).

    sat_rows (attn-half variants only): a list that collects per-row
    clipped-activation fractions (B,) from the sites visible OUTSIDE
    the Pallas kernel — the kernel's pre-quantized int8 fc input (free:
    rail-count on an existing tensor) and the f32 m_proj input (the
    compare fuses into the gelu producer). This is the in-path serving
    drift monitor (serve.WeldingQualityPipeline.monitor_saturation);
    the attention-internal sites are covered by the opt-in
    saturation_stats probe."""
    from ..ops.activations import new_gelu
    from ..ops.norm import layer_norm
    from ..ops.pallas_block_quant import (fused_attn_block_quant,
                                          fused_block_quant)

    if sat_rows is not None and full_block:
        raise ValueError(
            "in-path saturation monitoring needs the attn-half block "
            "fusion (the full-block kernel exposes no quantization "
            "sites); use block_fusion='attn' or the saturation_stats "
            "probe")
    t = x_ids.shape[1]
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
    if stream_dtype is not None:
        # bf16 residual stream between kernels: halves the remaining
        # HBM stream traffic; kernels compute f32 internally
        x = x.astype(stream_dtype)
    for blk in qparams["blocks"]:
        if full_block:
            x = fused_block_quant(x, blk, n_head=model.n_head,
                                  int8_attn=int8_attn)
        else:
            x_mid, h8 = fused_attn_block_quant(x, blk, n_head=model.n_head,
                                               int8_attn=int8_attn)
            mid = qdot_prequantized(h8, blk["c_fc"])
            g = new_gelu(mid)
            if sat_rows is not None:
                sat_rows.append(_row_clip_frac_prequant(h8))
                if blk["m_proj"].act_scale is not None:
                    sat_rows.append(
                        _row_clip_frac(g, blk["m_proj"].act_scale))
            x = x_mid + qdot(g, blk["m_proj"])
            if stream_dtype is not None:
                x = x.astype(stream_dtype)
    x = x.astype(jnp.float32)
    return layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])


def quantized_classify(model, qparams, x_ids, *, fused_attention=False,
                       block_fusion: str | None = None,
                       sat_rows: list | None = None, **fused_kw):
    """block_fusion: None | 'attn' | 'full' | 'attn8' | 'full8' —
    whole-block Pallas fusion (quantized_backbone_block); the '8'
    variants also run score/probs@V matmuls on the int8 MXU. A '-bf16'
    suffix (e.g. 'attn-bf16') carries the residual stream between
    kernels in bfloat16. Overrides fused_attention.

    sat_rows: pass a list to collect per-row clipped-activation
    fractions (B,) from the sites visible in-path (see
    quantized_backbone_block) plus the class head — the ~zero-cost
    serving drift monitor. Supported on the unfused and 'attn'-fusion
    paths (the adopted serving path)."""
    from ..ops.activations import gelu
    if block_fusion is not None:
        if fused_attention or fused_kw:
            raise ValueError(
                "block_fusion replaces the fused_attention path; do not "
                "combine it with fused_attention/fused_* options")
        bf, stream_dtype = block_fusion, None
        if bf.endswith("-bf16"):
            bf, stream_dtype = bf[:-5], jnp.bfloat16
        x = quantized_backbone_block(
            model, qparams, x_ids,
            full_block=bf.startswith("full"),
            int8_attn=bf.endswith("8"),
            stream_dtype=stream_dtype, sat_rows=sat_rows)
    elif fused_attention:
        if sat_rows is not None:
            raise ValueError(
                "in-path saturation monitoring is wired for the unfused "
                "and block_fusion='attn' paths; use saturation_stats")
        x = quantized_backbone_fused(model, qparams, x_ids, **fused_kw)
    else:
        if fused_kw:
            raise ValueError("fused_* options need fused_attention=True")
        x = quantized_backbone(model, qparams, x_ids, sat_rows=sat_rows)
    ch = qparams["class_head"]
    if sat_rows is not None and ch["l1"].act_scale is not None:
        sat_rows.append(_row_clip_frac(x, ch["l1"].act_scale))
    h = qdot(x, ch["l1"])
    h = gelu(h.squeeze(-1))
    if sat_rows is not None and ch["l2"].act_scale is not None:
        sat_rows.append(_row_clip_frac(h, ch["l2"].act_scale))
    return qdot(h, ch["l2"])


def quantized_lm_logits(model, qparams, x_ids):
    x = quantized_backbone(model, qparams, x_ids)
    return qdot(x, qparams["lm_head"])


# -- int8 KV-cached autoregressive sampling ---------------------------------
#
# For full-int8 deployments: same control flow as the f32 generate_kv
# with every Linear on the int8 MXU and weights stored int8 (4x less
# HBM for the model). Measured at the bench config (d512/8 blocks,
# batch 16, 320 steps): NO latency win over f32 (1.00x) — the KV loop
# is latency-bound, not weight-bandwidth-bound — so serve.sample_tokens
# keeps the f32 sampler (reference-output-equal); use this when weight
# memory is the constraint.


def _q_attn_cached(model, blk, x_tok, k_cache, v_cache, pos):
    """One-token attention against (B, H, T, D) caches with int8
    projections (mirrors TransformerDecoder._attn_cached)."""
    from ..ops.attention import merge_heads, split_heads

    qkv = qdot(x_tok, blk["c_attn"])                  # (B, 1, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (split_heads(t, model.n_head) for t in (q, k, v))
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, pos, 0))
    d = q.shape[-1]
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache,
                     preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    valid = jnp.arange(k_cache.shape[2])[None, None, None, :] <= pos
    att = jax.nn.softmax(jnp.where(valid, att, -jnp.inf), axis=-1)
    y = jnp.einsum("bhqk,bhkd->bhqd", att, v_cache,
                   preferred_element_type=jnp.float32)
    return qdot(merge_heads(y), blk["c_proj"]), k_cache, v_cache


def _q_token_step(model, qparams, tok, pos, caches):
    from ..ops.activations import new_gelu
    from ..ops.norm import layer_norm

    x = jnp.take(qparams["tok_emb"], tok, axis=0)[:, None, :] \
        + jnp.take(model.pe, pos, axis=0)[None, None, :]
    new_caches = []
    for blk, (k_c, v_c) in zip(qparams["blocks"], caches):
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        a, k_c, v_c = _q_attn_cached(model, blk, h, k_c, v_c, pos)
        x = x + a
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        x = x + qdot(new_gelu(qdot(h, blk["c_fc"])), blk["m_proj"])
        new_caches.append((k_c, v_c))
    x = layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])
    return qdot(x[:, 0], qparams["lm_head"]), new_caches


def _q_prefill(model, qparams, x_ids, caches):
    """Batched single-forward prompt prefill with int8 matmuls,
    writing every block's K/V (mirrors TransformerDecoder._prefill)."""
    from ..ops.activations import new_gelu
    from ..ops.attention import (causal_attention_core, merge_heads,
                                 split_heads)
    from ..ops.norm import layer_norm

    b, t0 = x_ids.shape
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t0]
    new_caches = []
    for blk, (k_c, v_c) in zip(qparams["blocks"], caches):
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = qdot(h, blk["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, model.n_head) for t in (q, k, v))
        k_c = jax.lax.dynamic_update_slice(k_c, k, (0, 0, 0, 0))
        v_c = jax.lax.dynamic_update_slice(v_c, v, (0, 0, 0, 0))
        y = merge_heads(causal_attention_core(q, k, v))
        x = x + qdot(y, blk["c_proj"])
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        x = x + qdot(new_gelu(qdot(h, blk["c_fc"])), blk["m_proj"])
        new_caches.append((k_c, v_c))
    x = layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])
    return qdot(x[:, -1], qparams["lm_head"]), new_caches


def quantized_generate_kv(model, qparams, x_ids, *, do_sample: bool = False,
                          top_k: int | None = None, rng=None,
                          num_steps: int | None = None):
    """Int8 KV-cached sampling, same control flow as
    TransformerDecoder.generate_kv (batched prefill; KV steps while the
    context fits seq_len; full-recompute tail once the reference's
    context cropping kicks in) with every Linear on the int8 MXU.

    Self-consistency contract (tests): greedy output equals a greedy
    scan over quantized_lm_logits full-recompute forwards."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    steps = model.seq_len if num_steps is None else num_steps
    b, t0 = x_ids.shape
    total = t0 + steps
    keys = jax.random.split(rng, steps)
    buf = jnp.concatenate(
        [x_ids, jnp.zeros((b, steps), x_ids.dtype)], axis=1)

    def window_logits(window):
        return quantized_lm_logits(model, qparams, window)

    n_kv = max(0, min(steps, model.seq_len - t0 + 1))
    if n_kv == 0:
        return model._recompute_scan(None, buf, t0, keys, total=total,
                                     do_sample=do_sample, top_k=top_k,
                                     logits_fn=window_logits)

    cache_len = model.seq_len
    hd = model.d_model // model.n_head
    caches = [(jnp.zeros((b, model.n_head, cache_len, hd)),
               jnp.zeros((b, model.n_head, cache_len, hd)))
              for _ in qparams["blocks"]]
    logits, caches = _q_prefill(model, qparams, x_ids, caches)

    flat = []
    for k_c, v_c in caches:
        flat.extend([k_c, v_c])

    def step(carry, key):
        buf, cur, logits, *flat_caches = carry
        caches = [(flat_caches[2 * i], flat_caches[2 * i + 1])
                  for i in range(model.n_blocks)]
        nxt = model._sample_from_logits(logits, key, do_sample, top_k)
        buf = jax.lax.dynamic_update_slice(
            buf, nxt[:, None].astype(buf.dtype), (0, cur))
        new_logits, caches = _q_token_step(
            model, qparams, nxt.astype(jnp.int32),
            jnp.minimum(cur, cache_len - 1), caches)
        flat2 = []
        for k_c, v_c in caches:
            flat2.extend([k_c, v_c])
        return (buf, cur + 1, new_logits, *flat2), None

    carry = (buf, jnp.asarray(t0), logits, *flat)
    carry, _ = jax.lax.scan(step, carry, keys[:n_kv])
    buf = carry[0]
    if steps > n_kv:
        buf = model._recompute_scan(None, buf, t0 + n_kv, keys[n_kv:],
                                    total=total, do_sample=do_sample,
                                    top_k=top_k, logits_fn=window_logits)
    return buf


# -- opt-in int8 VQ-VAE encoder for serving ---------------------------------
#
# The f32 encoder is ~25% of the serving iter (BENCHMARKS.md round-3
# budget) and is pinned f32 on the DEFAULT path by the bit-comparable-
# codebook-indices contract (BASELINE.md). This opt-in quantizes the
# encoder's center-tap matmuls (the FLOP carriers — ops/conv.py
# center_tap_dense, 2 per resblock + sep_conv) to calibrated int8;
# patch-embed (K=25, ~1% of encoder FLOPs), GELU, eval-BatchNorm and
# the VQ distance/argmin stay f32. Indices are NO LONGER guaranteed
# bit-comparable: quantization noise can flip codes near Voronoi
# boundaries. Measure the flip rate and downstream label agreement on
# YOUR checkpoint before enabling (serve.WeldingQualityPipeline
# encoder_precision='int8'; bench.py keeps the f32 contract path).


def calibrate_encoder_absmax(model, params, state, sample_cycles,
                             margin: float = 1.25) -> dict:
    """Eval-mode encoder forward on calibration cycles, recording the
    absmax input of every center-tap matmul (x margin)."""
    from ..ops.activations import gelu
    from ..ops.norm import batch_norm_apply
    from ..ops.patching import patch_embed

    am: dict[str, float] = {}

    def rec(site, x):
        am[site] = float(jnp.max(jnp.abs(x))) * margin
        return x

    h = patch_embed(sample_cycles, params["patch_embed"]["kernel"],
                    params["patch_embed"]["bias"], model.patch_size)
    bns = state.get("encoder_bn") if model.batch_norm else None
    for i, p in enumerate(params["encoder"]):
        a = rec(f"b{i}_c1", gelu(h))
        c = jnp.einsum("bpi,oi->bpo", a,
                       p["conv1_w"][:, :, p["conv1_w"].shape[-1] // 2]
                       ) + p["conv1_b"]
        if model.batch_norm:
            c, _ = batch_norm_apply(c, p["bn1_scale"], p["bn1_bias"],
                                    bns[i]["bn1"], train=False)
        a = rec(f"b{i}_c2", gelu(c))
        c = jnp.einsum("bpi,oi->bpo", a,
                       p["conv2_w"][:, :, p["conv2_w"].shape[-1] // 2]
                       ) + p["conv2_b"]
        if model.batch_norm:
            c, _ = batch_norm_apply(c, p["bn2_scale"], p["bn2_bias"],
                                    bns[i]["bn2"], train=False)
        h = h + c
    rec("sep", h)
    return am


def quantize_encoder(model, params, enc_absmax: dict) -> dict:
    """Per-output-channel int8 QLinears for every center-tap matmul of
    the encoder (torch kernel layout (O, I, k) -> center tap (I, O))."""
    qenc = {"blocks": []}
    for i, p in enumerate(params["encoder"]):
        qenc["blocks"].append({
            "c1": quantize_linear(
                p["conv1_w"][:, :, p["conv1_w"].shape[-1] // 2].T,
                p["conv1_b"], act_absmax=enc_absmax[f"b{i}_c1"]),
            "c2": quantize_linear(
                p["conv2_w"][:, :, p["conv2_w"].shape[-1] // 2].T,
                p["conv2_b"], act_absmax=enc_absmax[f"b{i}_c2"]),
        })
    w_sep = params["sep_conv"]["w"]
    qenc["sep"] = quantize_linear(w_sep[:, :, w_sep.shape[-1] // 2].T,
                                  params["sep_conv"]["b"],
                                  act_absmax=enc_absmax["sep"])
    return qenc


def encode_indices_quantized(model, qenc, params, state, x):
    """Eval-mode encode + nearest-code ids with int8 center-tap matmuls.
    Mirrors VQVAEPatch.encode/encode_indices (vqvae_patch.py:177-246);
    the VQ distance/argmin stays f32 on the int8 z_e."""
    from ..ops.activations import gelu
    from ..ops.norm import batch_norm_apply
    from ..ops.patching import patch_embed
    from ..ops.vq import nearest_codes

    h = patch_embed(x, params["patch_embed"]["kernel"],
                    params["patch_embed"]["bias"], model.patch_size)
    bns = state.get("encoder_bn") if model.batch_norm else None
    for i, (p, q) in enumerate(zip(params["encoder"], qenc["blocks"])):
        c = qdot(gelu(h), q["c1"])
        if model.batch_norm:
            c, _ = batch_norm_apply(c, p["bn1_scale"], p["bn1_bias"],
                                    bns[i]["bn1"], train=False)
        c = qdot(gelu(c), q["c2"])
        if model.batch_norm:
            c, _ = batch_norm_apply(c, p["bn2_scale"], p["bn2_bias"],
                                    bns[i]["bn2"], train=False)
        h = h + c
    z_e = qdot(h, qenc["sep"])
    if model.use_improved_vq:
        from ..ops import vq_ema
        return vq_ema.nearest_ema(z_e, state["vq"])
    flat = z_e.reshape(-1, model.embedding_dim)
    return nearest_codes(flat, params["vq"]["codebook"]).reshape(z_e.shape[:-1])
