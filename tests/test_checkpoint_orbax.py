"""Orbax checkpoint backend: roundtrip incl. NamedTuple state, and
sharded-params save/restore on the virtual mesh."""
import numpy as np

import jax

from vq_vae_transformer_arc_welding_tpu.models import (TransformerDecoder,
                                                       VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.train.checkpoint import (
    load_checkpoint_orbax, save_checkpoint_orbax)


def test_orbax_roundtrip(tmp_path):
    m = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                   embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                   batch_norm=True, use_improved_vq=True)
    params, state = m.init(4)
    d = str(tmp_path / "ck")
    save_checkpoint_orbax(d, "VQVAEPatch", m.hparams, params, state,
                          {"epoch": 2})
    hdr, p2, s2 = load_checkpoint_orbax(d, m.init(0))
    assert hdr["model"] == "VQVAEPatch" and hdr["extra"]["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves((params, state)),
                    jax.tree_util.tree_leaves((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_preserves_tp_sharding(tmp_path):
    from vq_vae_transformer_arc_welding_tpu.parallel import (
        make_mesh, shard_params, transformer_tp_rules)
    from jax.sharding import PartitionSpec as P

    m = TransformerDecoder(d_model=32, n_classes=18, seq_len=9, n_blocks=2,
                           n_head=4)
    params, _ = m.init(0)
    mesh = make_mesh(n_data=2, n_model=4)
    params_tp = shard_params(params, mesh, transformer_tp_rules)
    d = str(tmp_path / "cktp")
    save_checkpoint_orbax(d, "TransformerDecoder", m.hparams, params_tp, {})
    # restore against the SHARDED template: arrays come back sharded
    hdr, p2, _ = load_checkpoint_orbax(d, (params_tp, {}))
    spec = p2["blocks"][0]["attn"]["c_attn_w"].sharding.spec
    assert spec == P(None, "model")
    np.testing.assert_allclose(
        np.asarray(p2["blocks"][0]["attn"]["c_attn_w"]),
        np.asarray(params["blocks"][0]["attn"]["c_attn_w"]))
