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


def quantized_backbone(model, qparams, x_ids):
    from ..ops.activations import new_gelu
    from ..ops.attention import causal_attention_core, merge_heads, split_heads
    from ..ops.norm import layer_norm

    # NB: keep the XLA attention here — the fused Pallas kernel wins in
    # isolation (2.46 vs 3.92 ms at bench shape) but breaks XLA's fusion
    # of attention with the surrounding quant/dequant elementwise ops,
    # costing ~25% end-to-end (measured 2492 vs 3418 windows/s)
    t = x_ids.shape[1]
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
    for blk in qparams["blocks"]:
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = qdot(h, blk["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(z, model.n_head) for z in (q, k, v))
        y = merge_heads(causal_attention_core(q, k, v))
        x = x + qdot(y, blk["c_proj"])
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
        x = x + qdot(new_gelu(qdot(h, blk["c_fc"])), blk["m_proj"])
    return layer_norm(x, qparams["ln_f_scale"], qparams["ln_f_bias"])


def quantized_backbone_fused(model, qparams, x_ids, *, fused_mlp=False):
    """Backbone with the fused Pallas attention+quant kernel
    (ops/pallas_attn_quant.py): scores never touch HBM and the
    attention output lands pre-quantized for the int8 proj matmul.
    Requires calibrated activation scales (act_absmax at quantize time).
    Round-2 measurement at the bench shape (b=48): 11.5 -> 8.6 ms.

    fused_mlp additionally routes the MLP through ops/pallas_mlp_quant
    — measured ~0.6 ms SLOWER than XLA's fused int8 MLP chain at the
    bench shape (XLA already keeps the quant/gelu elementwise fused and
    overlaps the two matmuls better), so it stays opt-in for other
    shapes."""
    from ..ops.norm import layer_norm
    from ..ops.pallas_attn_quant import fused_causal_attention_quant
    from ..ops.activations import new_gelu

    t = x_ids.shape[1]
    x = jnp.take(qparams["tok_emb"], x_ids, axis=0) + model.pe[None, :t]
    for blk in qparams["blocks"]:
        if blk["c_proj"].act_scale is None:
            raise ValueError("fused path needs calibrated act scales")
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        qkv = qdot(h, blk["c_attn"])                  # (B, T, 3C) f32
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


def quantized_classify(model, qparams, x_ids, *, fused_attention=False,
                       **fused_kw):
    from ..ops.activations import gelu
    if fused_attention:
        x = quantized_backbone_fused(model, qparams, x_ids, **fused_kw)
    else:
        assert not fused_kw, "fused_* options need fused_attention=True"
        x = quantized_backbone(model, qparams, x_ids)
    h = qdot(x, qparams["class_head"]["l1"])
    h = gelu(h.squeeze(-1))
    return qdot(h, qparams["class_head"]["l2"])


def quantized_lm_logits(model, qparams, x_ids):
    x = quantized_backbone(model, qparams, x_ids)
    return qdot(x, qparams["lm_head"])
