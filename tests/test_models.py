"""Model-level golden parity: framework forward == torch twin forward.

Twins (tests/torch_twins.py) are independently-built torch models with
reference-compatible state_dict names; weights flow through
train/torch_import.py, exercising both the checkpoint-import mapping
and the model math in one shot. All comparisons in eval mode (dropout
off) on CPU.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.models import (GRU, MLP,
                                                       TransformerDecoder,
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.train import torch_import as ti

from torch_twins import (TwinGRU, TwinMLP, TwinTransformer, TwinVQVAEPatch)


@pytest.mark.parametrize("batch_norm", [False, True])
def test_vqvae_forward_matches_twin(rng, batch_norm):
    h, d, k, n_res, patch = 32, 8, 16, 2, 25
    twin = TwinVQVAEPatch(h, 2, k, d, n_res, patch=patch, bn=batch_norm)
    twin.eval()
    model = VQVAEPatch(hidden_dim=h, input_dim=2, num_embeddings=k,
                       embedding_dim=d, n_resblocks=n_res, learning_rate=1e-3,
                       patch_size=patch, batch_norm=batch_norm)
    params, state = ti.vqvae_params_from_state_dict(
        twin.state_dict(), n_resblocks=n_res, batch_norm=batch_norm)

    x = rng.standard_normal((4, 200, 2)).astype(np.float32)
    with torch.no_grad():
        ref_loss, ref_xhat, ref_perp = twin(torch.tensor(x))
    out, _ = model.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out.x_hat), ref_xhat.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.embedding_loss),
                               ref_loss.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.perplexity), ref_perp.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_vqvae_encode_indices_bit_match(rng):
    """North-star check: codebook indices bit-identical on same weights."""
    h, d, k, n_res = 32, 8, 16, 2
    twin = TwinVQVAEPatch(h, 2, k, d, n_res)
    twin.eval()
    model = VQVAEPatch(hidden_dim=h, input_dim=2, num_embeddings=k,
                       embedding_dim=d, n_resblocks=n_res, learning_rate=1e-3,
                       batch_norm=False)
    params, state = ti.vqvae_params_from_state_dict(
        twin.state_dict(), n_resblocks=n_res, batch_norm=False)
    x = rng.standard_normal((8, 200, 2)).astype(np.float32)
    with torch.no_grad():
        z_e = twin.encoder(twin.patch_embed(torch.tensor(x)))
        _, _, _, _, ref_idx = twin.vector_quantization(z_e)
    ours = model.encode_indices(params, state, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ours).reshape(-1),
                                  ref_idx.numpy().reshape(-1))


def test_transformer_both_heads_match_twin(rng):
    d, n_classes, seq_len, blocks, heads = 32, 18, 11, 2, 4
    twin = TwinTransformer(d, n_classes, seq_len, blocks, heads)
    twin.eval()
    model = TransformerDecoder(d_model=d, n_classes=n_classes, seq_len=seq_len,
                               n_blocks=blocks, n_head=heads)
    params, state = ti.transformer_params_from_state_dict(
        twin.state_dict(), n_blocks=blocks)
    ids = rng.integers(0, n_classes, (3, seq_len)).astype(np.int32)
    with torch.no_grad():
        ref_gen = twin(torch.tensor(ids, dtype=torch.long), generate=True)
        ref_cls = twin(torch.tensor(ids, dtype=torch.long), generate=False)
    gen, _ = model.apply(params, state, jnp.asarray(ids), generate=True)
    cls, _ = model.apply(params, state, jnp.asarray(ids), generate=False)
    np.testing.assert_allclose(np.asarray(gen), ref_gen.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_transformer_generate_greedy_matches_twin(rng):
    d, n_classes, seq_len, blocks, heads = 32, 18, 8, 2, 4
    twin = TwinTransformer(d, n_classes, seq_len, blocks, heads)
    twin.eval()
    model = TransformerDecoder(d_model=d, n_classes=n_classes, seq_len=seq_len,
                               n_blocks=blocks, n_head=heads)
    params, _ = ti.transformer_params_from_state_dict(
        twin.state_dict(), n_blocks=blocks)

    start = np.full((2, 1), n_classes - 2, np.int32)
    # torch-side greedy loop (reference transformer_decoder.py:203-224)
    x = torch.tensor(start, dtype=torch.long)
    with torch.no_grad():
        for _ in range(seq_len):
            x_cond = x if x.size(1) <= seq_len else x[:, -seq_len:]
            logits = twin(x_cond)
            probs = torch.softmax(logits, dim=-1)[:, -1]
            idx_next = probs.topk(1, dim=-1).indices
            x = torch.cat([x, idx_next], dim=-1)
    ours = model.generate(params, jnp.asarray(start), do_sample=False)
    np.testing.assert_array_equal(np.asarray(ours), x.numpy())


def test_stacked_blocks_forward_equivalence(rng):
    """scan-over-layers (stack_blocks) == python-loop backbone."""
    import jax.numpy as jnp
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=11, n_blocks=3,
                           n_head=4)
    params, _ = m.init(0)
    ids = jnp.asarray(rng.integers(0, 18, (4, 11)), jnp.int32)
    for gen in (True, False):
        a, _ = m.apply(params, None, ids, generate=gen)
        b, _ = m.apply(m.stack_blocks(params), None, ids, generate=gen)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_generate_kv_matches_generate(rng):
    """KV-cached sampling must reproduce the full-recompute path
    exactly (greedy and sampled with identical key streams)."""
    import jax.numpy as jnp
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=10, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    start = jnp.full((3, 1), 16, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, start, do_sample=False)),
        np.asarray(m.generate_kv(params, start, do_sample=False)))
    k = jax.random.PRNGKey(7)
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, start, do_sample=True, top_k=5, rng=k)),
        np.asarray(m.generate_kv(params, start, do_sample=True, top_k=5,
                                 rng=k)))


def test_generate_kv_scan_unroll_bit_identical(rng):
    """scan_unroll replicates the scan body for XLA pipelining
    (multi-token stepping); the math is untouched, so sampled ids must
    be bit-identical at every factor, with and without cache_buckets
    segmentation, including non-dividing segment lengths."""
    import jax.numpy as jnp
    m = TransformerDecoder(d_model=16, n_classes=10, seq_len=33, n_blocks=2,
                           n_head=2)
    params, _ = m.init(0)
    start = jnp.full((3, 1), 8, jnp.int32)
    k = jax.random.PRNGKey(7)
    base = np.asarray(m.generate_kv(params, start, do_sample=True, top_k=3,
                                    rng=k, num_steps=20))
    for kw in ({"scan_unroll": 2}, {"scan_unroll": 4},
               {"scan_unroll": 2, "cache_buckets": 8}):
        got = m.generate_kv(params, start, do_sample=True, top_k=3, rng=k,
                            num_steps=20, **kw)
        ref = (base if "cache_buckets" not in kw else
               m.generate_kv(params, start, do_sample=True, top_k=3, rng=k,
                             num_steps=20, cache_buckets=8))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got), kw)
    with pytest.raises(ValueError, match="scan_unroll"):
        m.generate_kv(params, start, decode_impl="fused", scan_unroll=2)


def test_generate_kv_long_prompt_and_cropping(rng):
    """generate_kv must match generate when (a) the prompt has t0 > 1
    tokens (batched prefill), (b) generation overruns seq_len so the
    reference's context cropping kicks in, and (c) the prompt itself is
    already longer than seq_len."""
    import jax.numpy as jnp
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=10, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    k = jax.random.PRNGKey(3)

    # t0=4 prompt, default steps (total 14 > seq_len 10: cropping tail)
    prompt = jnp.asarray(rng.integers(0, 16, (3, 4)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, prompt, do_sample=False)),
        np.asarray(m.generate_kv(params, prompt, do_sample=False)))
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, prompt, do_sample=True, top_k=5,
                              rng=k)),
        np.asarray(m.generate_kv(params, prompt, do_sample=True, top_k=5,
                                 rng=k)))

    # steps far past seq_len from a single start token
    start = jnp.full((2, 1), 16, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, start, do_sample=False, num_steps=25)),
        np.asarray(m.generate_kv(params, start, do_sample=False,
                                 num_steps=25)))

    # prompt longer than the context window (pure recompute fallback)
    long_prompt = jnp.asarray(rng.integers(0, 16, (2, 13)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(m.generate(params, long_prompt, do_sample=False,
                              num_steps=6)),
        np.asarray(m.generate_kv(params, long_prompt, do_sample=False,
                                 num_steps=6)))


def test_mlp_matches_twin(rng):
    twin = TwinMLP(input_size=10, in_dim=4, hidden=16, n_hidden=2)
    twin.eval()
    model = MLP(input_size=10, output_size=2, in_dim=4, hidden_sizes=16,
                n_hidden_layers=2)
    params, state = ti.mlp_params_from_state_dict(twin.state_dict(),
                                                  n_hidden_layers=2)
    x = rng.standard_normal((5, 10, 4)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.tensor(x)).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_gru_matches_twin(rng):
    twin = TwinGRU(in_dim=8, hidden=12, n_layers=2)
    twin.eval()
    model = GRU(input_size=6, in_dim=8, output_size=2, hidden_sizes=12,
                n_hidden_layers=2)
    params, state = ti.gru_params_from_state_dict(twin.state_dict(),
                                                  n_hidden_layers=2)
    x = rng.standard_normal((5, 6, 8)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.tensor(x)).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                       batch_norm=True)
    params, state = model.init(3)
    path = str(tmp_path / "m.ckpt")
    model.save(path, params, state, extra={"epoch": 5})
    model2, p2, s2 = VQVAEPatch.load(path)
    assert model2.hparams == model.hparams
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lightning_ckpt_export_roundtrip(tmp_path, rng):
    """Our params -> Lightning .ckpt -> torch twin == our forward, and
    re-import through our own loader."""
    from vq_vae_transformer_arc_welding_tpu.train.torch_import import (
        export_vqvae_to_lightning, load_vqvae_checkpoint)

    model = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                       embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                       batch_norm=False)
    params, state = model.init(7)
    path = str(tmp_path / "exported.ckpt")
    export_vqvae_to_lightning(model, params, state, path)

    # torch twin consumes the exported state_dict
    twin = TwinVQVAEPatch(16, 2, 8, 4, 1)
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    twin.load_state_dict(sd)
    twin.eval()
    x = rng.standard_normal((3, 200, 2)).astype(np.float32)
    with torch.no_grad():
        _, ref_xhat, _ = twin(torch.tensor(x))
    out, _ = model.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out.x_hat), ref_xhat.numpy(),
                               rtol=1e-4, atol=1e-4)

    # and back through our importer
    m2, p2, s2 = load_vqvae_checkpoint(path)
    out2, _ = m2.apply(p2, s2, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out2.x_hat),
                               np.asarray(out.x_hat), rtol=1e-5, atol=1e-6)


def test_transformer_export_roundtrip(tmp_path, rng):
    from vq_vae_transformer_arc_welding_tpu.train.torch_import import (
        export_transformer_to_lightning)
    model = TransformerDecoder(d_model=32, n_classes=18, seq_len=9,
                               n_blocks=2, n_head=4)
    params, _ = model.init(3)
    path = str(tmp_path / "tr.ckpt")
    export_transformer_to_lightning(model, params, path)
    twin = TwinTransformer(32, 18, 9, 2, 4)
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    twin.load_state_dict(sd)
    twin.eval()
    ids = rng.integers(0, 18, (3, 9)).astype(np.int64)
    with torch.no_grad():
        ref = twin(torch.tensor(ids), generate=False).numpy()
    ours, _ = model.apply(params, None, jnp.asarray(ids, jnp.int32),
                          generate=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_lightning_ckpt_import(tmp_path):
    """A reference-layout Lightning .ckpt loads into our VQVAEPatch."""
    twin = TwinVQVAEPatch(16, 2, 8, 4, 1)
    ckpt = {"state_dict": twin.state_dict(),
            "hyper_parameters": dict(hidden_dim=16, input_dim=2,
                                     num_embeddings=8, embedding_dim=4,
                                     n_resblocks=1, learning_rate=1e-3,
                                     dropout_p=0.1, patch_size=25,
                                     seq_len=200, batch_norm=False,
                                     beta=0.25, use_improved_vq=False,
                                     kmeans_iters=0,
                                     threshold_ema_dead_code=2)}
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)
    model, params, state = ti.load_vqvae_checkpoint(path)
    assert model.num_embeddings == 8
    x = np.random.default_rng(1).standard_normal((2, 200, 2)).astype(np.float32)
    out, _ = model.apply(params, state, jnp.asarray(x), train=False)
    twin.eval()
    with torch.no_grad():
        _, ref_xhat, _ = twin(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out.x_hat), ref_xhat.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_generate_kv_cache_dtype_and_fused_decode(rng):
    """Opt-in sampler variants against the exact XLA f32 step on a tiny
    model: bf16 K/V cache storage (BENCHMARKS round 5: 1.55x on TPU)
    and the fused whole-block Pallas decode (interpret mode here) must
    reproduce the greedy sample exactly at this scale."""
    import jax.numpy as jnp
    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=9,
                           n_blocks=2, n_head=4)
    params, _ = m.init(0)
    prompt = jnp.asarray(rng.integers(0, 16, (3, 4)), jnp.int32)
    ref = m.generate_kv(params, prompt, do_sample=False, num_steps=5)
    bf16c = m.generate_kv(params, prompt, do_sample=False, num_steps=5,
                          cache_dtype=jnp.bfloat16)
    fused = m.generate_kv(params, prompt, do_sample=False, num_steps=5,
                          decode_impl="fused")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(bf16c))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))
    bf16w = m.generate_kv(params, prompt, do_sample=False, num_steps=5,
                          param_dtype=jnp.bfloat16)
    bf16cw = m.generate_kv(params, prompt, do_sample=False, num_steps=5,
                           cache_dtype=jnp.bfloat16,
                           param_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(bf16w))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(bf16cw))
    # segmented cache-prefix reads: same masked-softmax entries; at
    # this tiny scale the greedy sample matches exactly (at bench
    # scale sampled ids can flip at ties from einsum reduction-order
    # ulp drift — BENCHMARKS.md round 5). Buckets smaller than, equal
    # to, and larger than the prompt:
    for g in (2, 4, 16):
        seg = m.generate_kv(params, prompt, do_sample=False, num_steps=5,
                            cache_buckets=g)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(seg))
    with pytest.raises(ValueError):
        m.generate_kv(params, prompt, decode_impl="fused",
                      param_dtype=jnp.bfloat16)
    with pytest.raises(ValueError):
        m.generate_kv(params, prompt, decode_impl="fused",
                      cache_buckets=4)
