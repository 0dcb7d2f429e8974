"""MLPEmbedding parity + end-to-end classification_ids pipeline."""
import numpy as np
import torch
from torch import nn

import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.models import MLPEmbedding, VQVAEPatch
from vq_vae_transformer_arc_welding_tpu.train import torch_import as ti
from vq_vae_transformer_arc_welding_tpu.train.metrics import cross_entropy


class TwinMLPEmbedding(nn.Module):
    """Torch twin of reference model/mlp_embedding.py:11-42."""

    def __init__(self, input_size, in_dim, hidden, n_hidden, out=2, p=0.0):
        super().__init__()
        self.embedding = nn.Embedding(256, 16)
        layers = [nn.Linear(16 * in_dim * input_size, hidden),
                  nn.BatchNorm1d(hidden), nn.LeakyReLU()]
        for _ in range(n_hidden):
            layers += [nn.Linear(hidden, hidden), nn.BatchNorm1d(hidden),
                       nn.LeakyReLU()]
        layers += [nn.Dropout(p), nn.Linear(hidden, out)]
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        x = self.embedding(x).reshape(x.shape[0], -1)
        for l in self.layers:
            x = l(x)
        return x


def test_mlp_embedding_matches_twin(rng):
    twin = TwinMLPEmbedding(input_size=3, in_dim=4, hidden=16, n_hidden=1)
    twin.eval()
    model = MLPEmbedding(input_size=3, output_size=2, in_dim=4,
                         hidden_sizes=16, n_hidden_layers=1)
    params, state = model.init(0)
    params_t, state_t = ti.mlp_params_from_state_dict(
        {k: v for k, v in twin.state_dict().items()
         if not k.startswith("embedding")}, n_hidden_layers=1)
    params["layers"] = params_t["layers"]
    params["head"] = params_t["head"]
    params["embedding"] = jnp.asarray(
        twin.embedding.weight.detach().numpy())
    state = state_t

    ids = rng.integers(0, 256, (5, 12)).astype(np.int64)
    with torch.no_grad():
        ref = twin(torch.tensor(ids)).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(ids, jnp.int32),
                          train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_classification_ids_pipeline_trains(tmp_path, rng):
    """LatentPredDataModule(classification_ids) -> MLPEmbedding training."""
    import os

    from vq_vae_transformer_arc_welding_tpu.data import (LatentPredDataModule,
                                                         get_val_test_ids)
    from vq_vae_transformer_arc_welding_tpu.data.synthetic import (
        write_synthetic_csv)
    from vq_vae_transformer_arc_welding_tpu.train.loop import Trainer
    from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam
    from vq_vae_transformer_arc_welding_tpu.train.tasks import (
        ClassificationTask)

    d = str(tmp_path)
    write_synthetic_csv(os.path.join(d, "processed_asimow_dataset.csv"),
                        n_cycles_per_run=20, extra_train_runs=2)
    vq = VQVAEPatch(hidden_dim=16, input_dim=2, num_embeddings=8,
                    embedding_dim=4, n_resblocks=1, learning_rate=1e-3,
                    batch_norm=False)
    vqp, vqs = vq.init(0)
    ids = get_val_test_ids()
    dm = LatentPredDataModule((vq, vqp, vqs), task="classification_ids",
                              n_cycles=2, val_data_ids=ids["val_ids"],
                              test_data_ids=ids["test_ids"], batch_size=16,
                              data_directory_path=d)
    dm.setup()
    model = MLPEmbedding(input_size=2, output_size=2,
                         in_dim=vq.enc_out_len, hidden_sizes=16,
                         n_hidden_layers=1)
    params, state = model.init(0)
    task = ClassificationTask(model, ids_input=True)
    tr = Trainer(max_epochs=2, verbose=False)
    res = tr.fit(task, dm, params, state, make_radam(1e-3))
    m = tr.test(task, dm, res.final_params, res.final_state)
    assert np.isfinite(m["test/loss"])
