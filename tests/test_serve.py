"""Serving pipeline tests: checkpoint loading, batched inference,
padding correctness, sampling."""
import numpy as np

from vq_vae_transformer_arc_welding_tpu.models import (TransformerDecoder,
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.serve import WeldingQualityPipeline


def _tiny_pipeline(tmp_path, n_cycles=2, max_batch=4):
    vq = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                    embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                    batch_norm=False)
    vq_params, vq_state = vq.init(0)
    seq_len = n_cycles * vq.enc_out_len + 1
    tr = TransformerDecoder(d_model=16, n_classes=10, seq_len=seq_len,
                            n_blocks=1, n_head=2)
    tr_params, _ = tr.init(0)
    vq_path = str(tmp_path / "vq.ckpt")
    tr_path = str(tmp_path / "tr.ckpt")
    vq.save(vq_path, vq_params, vq_state)
    tr.save(tr_path, tr_params, {})
    return WeldingQualityPipeline.from_checkpoints(
        vq_path, tr_path, n_cycles=n_cycles, max_batch=max_batch)


def test_pipeline_classify_and_padding(tmp_path, rng):
    pipe = _tiny_pipeline(tmp_path)
    x = rng.standard_normal((7, 2 * 200, 2)).astype(np.float32)  # ragged
    labels, probs = pipe.classify(x)
    assert labels.shape == (7,) and probs.shape == (7, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # tail padding must not change results vs one-by-one
    l2, p2 = pipe.classify(x[5:])
    np.testing.assert_allclose(probs[5:], p2, rtol=1e-5, atol=1e-6)


def test_pipeline_tokens_and_ood(tmp_path, rng):
    pipe = _tiny_pipeline(tmp_path)
    x = rng.standard_normal((3, 2 * 200, 2)).astype(np.float32)
    ids = pipe.encode_tokens(x)
    assert ids.shape == (3, 2 * 16)
    assert ids.max() < 8
    cycles = rng.standard_normal((5, 200, 2)).astype(np.float32)
    scores = pipe.ood_score(cycles)
    assert scores.shape == (5,) and (scores >= 0).all()


def test_pipeline_sampling(tmp_path):
    pipe = _tiny_pipeline(tmp_path)
    toks = pipe.sample_tokens(2, top_k=4, seed=1)
    assert toks.shape == (2, pipe.tr_model.seq_len)
    assert (toks >= 0).all() and (toks < 10).all()
