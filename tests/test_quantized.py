"""Int8 quantized transformer serving path: accuracy contract."""
import numpy as np

import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.models import TransformerDecoder
from vq_vae_transformer_arc_welding_tpu.models.quantized import (
    quantize_transformer, quantized_classify, quantized_lm_logits)


def test_quantized_matches_f32_labels(rng):
    m = TransformerDecoder(d_model=64, n_classes=34, seq_len=17, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    qp = quantize_transformer(params)
    ids = jnp.asarray(rng.integers(0, 32, (8, 17)), jnp.int32)

    ref, _ = m.apply(params, None, ids, generate=False)
    out = quantized_classify(m, qp, ids)
    assert np.asarray(jnp.abs(ref - out)).max() < 0.05
    np.testing.assert_array_equal(np.asarray(ref.argmax(-1)),
                                  np.asarray(out.argmax(-1)))

    ref_lm, _ = m.apply(params, None, ids, generate=True)
    out_lm = quantized_lm_logits(m, qp, ids)
    # next-token argmax agreement on the vast majority of positions
    agree = np.mean(np.asarray(ref_lm.argmax(-1) == out_lm.argmax(-1)))
    assert agree > 0.9


def test_bf16_serving_mode_label_parity(rng):
    """compute_dtype=bfloat16 keeps classification labels identical and
    logits within bf16 noise of the exact f32 forward."""
    import jax.numpy as jnp
    kw = dict(d_model=64, n_classes=34, seq_len=17, n_blocks=2, n_head=4)
    m32 = TransformerDecoder(**kw)
    mbf = TransformerDecoder(**kw, compute_dtype=jnp.bfloat16)
    assert mbf.hparams == m32.hparams  # runtime-only option
    params, _ = m32.init(0)
    ids = jnp.asarray(rng.integers(0, 32, (8, 17)), jnp.int32)
    ref, _ = m32.apply(params, None, ids, generate=False)
    out, _ = mbf.apply(params, None, ids, generate=False)
    assert float(jnp.max(jnp.abs(ref - out.astype(jnp.float32)))) < 0.05
    np.testing.assert_array_equal(np.asarray(ref.argmax(-1)),
                                  np.asarray(out.argmax(-1)))


def test_quantization_is_symmetric_int8(rng):
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        quantize_linear, qdot)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    q = quantize_linear(w)
    assert q.w_int8.dtype == jnp.int8
    assert np.abs(np.asarray(q.w_int8)).max() <= 127
    # dequantized weight close to original
    wd = np.asarray(q.w_int8, np.float32) * np.asarray(q.scale)
    np.testing.assert_allclose(wd, np.asarray(w), atol=np.asarray(q.scale).max())
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    # int8 quantization noise at K=32: absolute tolerance, not relative
    # (near-zero outputs have unbounded relative error)
    np.testing.assert_allclose(np.asarray(qdot(x, q)), np.asarray(x @ w),
                               atol=0.5)


def test_fused_attn_quant_matches_xla_int8(rng):
    """The fused Pallas attention+quant path (interpret mode on CPU)
    must be BIT-IDENTICAL to the XLA int8 path: the kernel computes the
    same attention math and the same round/clip quantization qdot would
    apply, just without HBM round-trips."""
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_activation_absmax)
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    ids = jnp.asarray(rng.integers(0, 16, (5, 11)), jnp.int32)
    am = calibrate_activation_absmax(m, params, ids)
    qp = quantize_transformer(params, act_absmax=am)

    base = np.asarray(quantized_classify(m, qp, ids))
    for kw in ({}, {"fused_mlp": True}, {"fused_qkv": False},
               {"attn_block_rows": 8}):  # causal row-block skipping
        # seq_len=11 with block_rows=8 also exercises the pad-to-16 path
        fused = np.asarray(quantized_classify(m, qp, ids,
                                              fused_attention=True, **kw))
        np.testing.assert_array_equal(base, fused), kw

    # f32 label agreement (the serving contract)
    ref, _ = m.apply(params, None, ids, generate=False)
    fused = np.asarray(quantized_classify(m, qp, ids, fused_attention=True))
    np.testing.assert_array_equal(np.asarray(ref.argmax(-1)),
                                  fused.argmax(-1))


def test_block_fusion_label_parity(rng):
    """Whole-block Pallas fusion (ops/pallas_block_quant.py): the f32
    residual stream lives inside the kernel, so bit-identity to the XLA
    chain is not guaranteed (attention op-order drift is no longer
    absorbed by an int8 round-trip at every block boundary). Contract:
    identical labels, logit drift at float-noise scale, and the int8
    tensors at the first quantization boundary bit-match."""
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_activation_absmax)
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    ids = jnp.asarray(rng.integers(0, 16, (5, 11)), jnp.int32)
    am = calibrate_activation_absmax(m, params, ids)
    qp = quantize_transformer(params, act_absmax=am)

    base = np.asarray(quantized_classify(m, qp, ids))
    for bf, tol in (("attn", 1e-3), ("full", 1e-3), ("attn8", 2e-2),
                    ("attn-bf16", 5e-2), ("full-bf16", 5e-2)):
        out = np.asarray(quantized_classify(m, qp, ids, block_fusion=bf))
        np.testing.assert_array_equal(base.argmax(-1), out.argmax(-1)), bf
        assert np.abs(base - out).max() < tol, bf

    # the attn-half kernel's h8 output (the next int8 boundary) matches
    # the XLA chain exactly: drift is absorbed by the quantization
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        qdot, qdot_prequantized)
    from vq_vae_transformer_arc_welding_tpu.ops.norm import layer_norm
    from vq_vae_transformer_arc_welding_tpu.ops.attention import (
        causal_attention_core, merge_heads, split_heads)
    from vq_vae_transformer_arc_welding_tpu.ops.pallas_block_quant import (
        fused_attn_block_quant)
    t = ids.shape[1]
    x = jnp.take(qp["tok_emb"], ids, axis=0) + m.pe[None, :t]
    blk = qp["blocks"][0]
    h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
    qkv = qdot(h, blk["c_attn"])
    q, k, v = (split_heads(z, m.n_head)
               for z in jnp.split(qkv, 3, axis=-1))
    y = merge_heads(causal_attention_core(q, k, v))
    y8 = jnp.clip(jnp.round(y * blk["c_proj"].act_scale),
                  -127, 127).astype(jnp.int8)
    x_mid_ref = x + qdot_prequantized(y8, blk["c_proj"])
    h2 = layer_norm(x_mid_ref, blk["ln2_scale"], blk["ln2_bias"])
    h8_ref = jnp.clip(jnp.round(h2 * blk["c_fc"].act_scale),
                      -127, 127).astype(jnp.int8)
    x_mid, h8 = fused_attn_block_quant(x, blk, n_head=m.n_head)
    np.testing.assert_array_equal(np.asarray(h8_ref), np.asarray(h8))
    assert float(jnp.abs(x_mid - x_mid_ref).max()) < 1e-3


def test_block_fusion_requires_calibration(rng):
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=1,
                           n_head=4)
    params, _ = m.init(0)
    qp = quantize_transformer(params)  # dynamic scales, no calibration
    ids = jnp.asarray(rng.integers(0, 16, (3, 11)), jnp.int32)
    for bf in ("attn", "full"):
        try:
            quantized_classify(m, qp, ids, block_fusion=bf)
            assert False, "expected ValueError for missing act scales"
        except ValueError:
            pass


def test_fused_attn_quant_requires_calibration(rng):
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=1,
                           n_head=4)
    params, _ = m.init(0)
    qp = quantize_transformer(params)  # dynamic scales, no calibration
    ids = jnp.asarray(rng.integers(0, 16, (3, 11)), jnp.int32)
    try:
        quantized_classify(m, qp, ids, fused_attention=True)
        assert False, "expected ValueError for missing act scales"
    except ValueError:
        pass


def test_quantized_kv_sampler_consistency(rng):
    """Int8 KV-cached sampling machinery: per-token cached logits over a
    FORCED sequence must match the batched quantized full forward at
    every position (same calibrated scales -> same quantization), and
    the free-running sampler must produce valid sequences for prompts
    of any length, overrun past seq_len included."""
    import jax
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        _q_prefill, _q_token_step, calibrate_activation_absmax,
        quantized_generate_kv, quantized_lm_logits)

    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=10, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    ids = jnp.asarray(rng.integers(0, 16, (4, 10)), jnp.int32)
    am = calibrate_activation_absmax(m, params, ids)
    qp = quantize_transformer(params, act_absmax=am)

    # forced-sequence equivalence: prefill 3 tokens, step through the
    # rest, compare each step's logits to the full-recompute forward
    full = np.asarray(quantized_lm_logits(m, qp, ids))
    hd = m.d_model // m.n_head
    caches = [(jnp.zeros((4, m.n_head, m.seq_len, hd)),
               jnp.zeros((4, m.n_head, m.seq_len, hd)))
              for _ in qp["blocks"]]
    logits, caches = _q_prefill(m, qp, ids[:, :3], caches)
    np.testing.assert_allclose(np.asarray(logits), full[:, 2],
                               rtol=1e-4, atol=1e-4)
    for pos in range(3, 10):
        logits, caches = _q_token_step(m, qp, ids[:, pos], pos, caches)
        np.testing.assert_allclose(np.asarray(logits), full[:, pos],
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(logits).argmax(-1) == full[:, pos].argmax(-1)).all()

    # free-running sampler: shapes/validity incl. cropping overrun
    start = jnp.full((2, 1), 16, jnp.int32)
    out = quantized_generate_kv(m, qp, start, do_sample=True, top_k=5,
                                rng=jax.random.PRNGKey(1), num_steps=15)
    assert out.shape == (2, 16)
    o = np.asarray(out)
    assert (o >= 0).all() and (o < 18).all()

    prompt = jnp.asarray(rng.integers(0, 16, (2, 4)), jnp.int32)
    out2 = quantized_generate_kv(m, qp, prompt, do_sample=False)
    assert out2.shape == (2, 4 + 10)
    np.testing.assert_array_equal(np.asarray(out2[:, :4]), np.asarray(prompt))


def test_int8_encoder_opt_in(rng):
    """Opt-in int8 VQ-VAE encoder (encode_indices_quantized): quantizes
    only the center-tap matmuls; indices are NOT bit-comparable (the
    BASELINE.md contract stays on the default f32 path) but the flip
    rate must stay small and the shapes/ranges exact."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_encoder_absmax, quantize_encoder, encode_indices_quantized)

    vq = VQVAEPatch(hidden_dim=64, input_dim=2, num_embeddings=32,
                    embedding_dim=16, n_resblocks=2, learning_rate=1e-3,
                    patch_size=25)
    params, state = vq.init(0)
    x = jnp.asarray(rng.standard_normal((64, 200, 2)), jnp.float32)
    am = calibrate_encoder_absmax(vq, params, state, x[:16])
    assert set(am) == {"b0_c1", "b0_c2", "b1_c1", "b1_c2", "sep"}
    qenc = quantize_encoder(vq, params, am)
    ids_q = np.asarray(encode_indices_quantized(vq, qenc, params, state, x))
    ids_f = np.asarray(vq.encode_indices(params, state, x))
    assert ids_q.shape == ids_f.shape
    assert (ids_q >= 0).all() and (ids_q < 32).all()
    flip = (ids_q != ids_f).mean()
    assert flip < 0.05, flip  # ~1% measured on random weights


def test_fused_encoder_resblock_parity(rng):
    """Fused f32 encoder resblock kernel (ops/pallas_encoder.py):
    interpret mode matches the XLA encode_indices path exactly on test
    data (the in-kernel A&S-erf GELU differs from XLA's erfc form by
    <=1.5e-7, which can flip an argmin only on a near-exact tie)."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (
        encode_indices_fused)

    for bn in (True, False):
        vq = VQVAEPatch(hidden_dim=64, input_dim=2, num_embeddings=32,
                        embedding_dim=16, n_resblocks=2, learning_rate=1e-3,
                        patch_size=25, batch_norm=bn)
        params, state = vq.init(0)
        x = jnp.asarray(rng.standard_normal((48, 200, 2)), jnp.float32)
        ids_f = np.asarray(vq.encode_indices(params, state, x))
        # tile_rows=64 also exercises the row-padding path (48*16=768)
        ids_k = np.asarray(encode_indices_fused(vq, params, state, x,
                                                tile_rows=64))
        flips = (ids_f != ids_k).mean()
        assert flips == 0.0, (bn, flips)
        # mono variant (whole stack in one kernel; VMEM-bound to small
        # configs on real TPU) must match the per-block kernel exactly
        from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (
            encode_indices_fused_mono)
        ids_m = np.asarray(encode_indices_fused_mono(vq, params, state, x,
                                                     tile_rows=64))
        np.testing.assert_array_equal(ids_k, ids_m)
        # edges variant: patch-embed in the first kernel, sep_conv + VQ
        # argmin (first-index tie-break emulation) in the last
        from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (
            encode_indices_fused_edges)
        ids_e = np.asarray(encode_indices_fused_edges(
            vq, params, state, x, tile_rows=64, group_size=1))
        np.testing.assert_array_equal(ids_k, ids_e)


def test_fused_encoder_bf16_compute(rng):
    """Opt-in bf16 encoder compute (compute_dtype=jnp.bfloat16): the
    contraction inputs round to bf16 (f32 accumulation, f32
    elementwise), so indices may flip only where the argmin margin is
    within bf16 rounding of z_e — a small fraction on random weights.
    The default (compute_dtype=None) path stays bit-exact and is
    covered by test_fused_encoder_resblock_parity."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    from vq_vae_transformer_arc_welding_tpu.ops.pallas_encoder import (
        encode_indices_fused)

    vq = VQVAEPatch(hidden_dim=64, input_dim=2, num_embeddings=32,
                    embedding_dim=16, n_resblocks=2, learning_rate=1e-3,
                    patch_size=25)
    params, state = vq.init(0)
    x = jnp.asarray(rng.standard_normal((48, 200, 2)), jnp.float32)
    ids_f = np.asarray(vq.encode_indices(params, state, x))
    ids_b = np.asarray(encode_indices_fused(vq, params, state, x,
                                            tile_rows=64,
                                            compute_dtype=jnp.bfloat16))
    assert ids_b.shape == ids_f.shape and ids_b.dtype == ids_f.dtype
    flips = (ids_f != ids_b).mean()
    assert flips < 0.10, flips  # bf16 rounding, not a broken kernel
    # group_size=1 must also route through the grouped kernel (the
    # per-block fused_resblock_eval has no bf16 path), same result
    ids_b1 = np.asarray(encode_indices_fused(vq, params, state, x,
                                             tile_rows=64, group_size=1,
                                             compute_dtype=jnp.bfloat16))
    np.testing.assert_array_equal(ids_b, ids_b1)


def test_int8_encoder_ema_vq(rng):
    """encode_indices_quantized must dispatch to nearest_ema for
    use_improved_vq models (regression: it crashed on the empty
    params['vq'] dict)."""
    from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_encoder_absmax, quantize_encoder, encode_indices_quantized)

    vq = VQVAEPatch(hidden_dim=32, input_dim=2, num_embeddings=16,
                    embedding_dim=8, n_resblocks=1, learning_rate=1e-3,
                    patch_size=25, use_improved_vq=True)
    params, state = vq.init(0)
    x = jnp.asarray(rng.standard_normal((8, 200, 2)), jnp.float32)
    am = calibrate_encoder_absmax(vq, params, state, x)
    qenc = quantize_encoder(vq, params, am)
    ids = np.asarray(encode_indices_quantized(vq, qenc, params, state, x))
    ref = np.asarray(vq.encode_indices(params, state, x))
    assert ids.shape == ref.shape
    assert (ids >= 0).all() and (ids < 16).all()


def test_fused_decode_attn_matches_xla_step(rng):
    """Fused decode-step kernel (ops/pallas_decode.py): interpret mode
    matches the XLA _attn_cached block half within float noise and
    updates the caches identically. (Measured slower end-to-end than
    the XLA step at the bench config — kept as a tested reference, see
    module docstring.)"""
    import jax.numpy as jnp
    from vq_vae_transformer_arc_welding_tpu.ops.pallas_decode import (
        fused_decode_attn)
    from vq_vae_transformer_arc_welding_tpu.ops.norm import layer_norm

    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    B, H, T, D = 3, 4, 11, 8
    blk = params["blocks"][0]
    kc = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, 1, 32)), jnp.float32)
    for pos in (0, 5, 10):
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
        a_ref, kc_ref, vc_ref = m._attn_cached(blk, h, kc, vc, pos)
        xmid_ref = x + a_ref
        xmid, kc2, vc2 = fused_decode_attn(x, blk, kc, vc, pos, n_head=H)
        assert float(jnp.abs(xmid - xmid_ref).max()) < 1e-5, pos
        np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc_ref))
        np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc_ref))
