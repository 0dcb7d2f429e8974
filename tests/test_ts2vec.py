"""TS2Vec subpackage tests: encoder/loss parity vs torch, training
convergence, encode pooling modes, eval protocols."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from vq_vae_transformer_arc_welding_tpu.ts2vec import (
    TS2Vec, eval_classification, hierarchical_contrastive_loss,
    ts_encoder_apply, ts_encoder_init)
from vq_vae_transformer_arc_welding_tpu.ts2vec.utils import take_per_row


class TorchSamePadConv(nn.Module):
    def __init__(self, ci, co, k, dilation=1):
        super().__init__()
        rf = (k - 1) * dilation + 1
        self.conv = nn.Conv1d(ci, co, k, padding=rf // 2, dilation=dilation)
        self.remove = 1 if rf % 2 == 0 else 0

    def forward(self, x):
        out = self.conv(x)
        return out[:, :, :-self.remove] if self.remove else out


class TorchConvBlock(nn.Module):
    def __init__(self, ci, co, k, dilation, final=False):
        super().__init__()
        self.conv1 = TorchSamePadConv(ci, co, k, dilation)
        self.conv2 = TorchSamePadConv(co, co, k, dilation)
        self.projector = (nn.Conv1d(ci, co, 1)
                          if ci != co or final else None)

    def forward(self, x):
        res = x if self.projector is None else self.projector(x)
        x = self.conv2(F.gelu(self.conv1(F.gelu(x))))
        return x + res


def _torch_encoder(input_dims, output_dims, hidden, depth):
    fc = nn.Linear(input_dims, hidden)
    channels = [hidden] * depth + [output_dims]
    blocks, ci = [], hidden
    for i, co in enumerate(channels):
        blocks.append(TorchConvBlock(ci, co, 3, 2 ** i,
                                     final=(i == len(channels) - 1)))
        ci = co
    return fc, nn.Sequential(*blocks)


def test_ts_encoder_matches_torch_twin(rng):
    input_dims, output_dims, hidden, depth = 2, 12, 8, 3
    fc, net = _torch_encoder(input_dims, output_dims, hidden, depth)
    params = ts_encoder_init(jax.random.PRNGKey(0), input_dims, output_dims,
                             hidden, depth)
    # copy torch weights into our params
    params["input_fc"]["w"] = jnp.asarray(fc.weight.detach().numpy().T)
    params["input_fc"]["b"] = jnp.asarray(fc.bias.detach().numpy())
    for i, blk in enumerate(net):
        params["blocks"][i]["conv1"] = {
            "w": jnp.asarray(blk.conv1.conv.weight.detach().numpy()),
            "b": jnp.asarray(blk.conv1.conv.bias.detach().numpy())}
        params["blocks"][i]["conv2"] = {
            "w": jnp.asarray(blk.conv2.conv.weight.detach().numpy()),
            "b": jnp.asarray(blk.conv2.conv.bias.detach().numpy())}
        if blk.projector is not None:
            params["blocks"][i]["projector"] = {
                "w": jnp.asarray(blk.projector.weight.detach().numpy()),
                "b": jnp.asarray(blk.projector.bias.detach().numpy())}
        else:
            params["blocks"][i]["projector"] = None

    x = rng.standard_normal((3, 40, input_dims)).astype(np.float32)
    with torch.no_grad():
        h = fc(torch.tensor(x))
        ref = net(h.transpose(1, 2)).transpose(1, 2).numpy()
    ours = np.asarray(ts_encoder_apply(params, jnp.asarray(x),
                                       mask="all_true", train=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_hierarchical_loss_matches_torch(rng):
    """Golden check of the contrastive loss against a direct torch
    evaluation of the published formulas."""
    z1 = rng.standard_normal((4, 8, 6)).astype(np.float32)
    z2 = rng.standard_normal((4, 8, 6)).astype(np.float32)

    def torch_inst(z1, z2):
        b = z1.size(0)
        z = torch.cat([z1, z2], dim=0).transpose(0, 1)
        sim = z @ z.transpose(1, 2)
        logits = torch.tril(sim, diagonal=-1)[:, :, :-1] \
            + torch.triu(sim, diagonal=1)[:, :, 1:]
        logits = -F.log_softmax(logits, dim=-1)
        i = torch.arange(b)
        return (logits[:, i, b + i - 1].mean()
                + logits[:, b + i, i].mean()) / 2

    def torch_temp(z1, z2):
        t = z1.size(1)
        z = torch.cat([z1, z2], dim=1)
        sim = z @ z.transpose(1, 2)
        logits = torch.tril(sim, diagonal=-1)[:, :, :-1] \
            + torch.triu(sim, diagonal=1)[:, :, 1:]
        logits = -F.log_softmax(logits, dim=-1)
        i = torch.arange(t)
        return (logits[:, i, t + i - 1].mean()
                + logits[:, t + i, i].mean()) / 2

    def torch_hier(z1, z2, alpha=0.5, tu=0):
        loss, d = torch.tensor(0.0), 0
        while z1.size(1) > 1:
            loss = loss + alpha * torch_inst(z1, z2)
            if d >= tu:
                loss = loss + (1 - alpha) * torch_temp(z1, z2)
            d += 1
            z1 = F.max_pool1d(z1.transpose(1, 2), 2).transpose(1, 2)
            z2 = F.max_pool1d(z2.transpose(1, 2), 2).transpose(1, 2)
        if z1.size(1) == 1:
            loss = loss + alpha * torch_inst(z1, z2)
            d += 1
        return loss / d

    ref = torch_hier(torch.tensor(z1), torch.tensor(z2)).numpy()
    ours = np.asarray(hierarchical_contrastive_loss(jnp.asarray(z1),
                                                    jnp.asarray(z2)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_take_per_row(rng):
    a = rng.standard_normal((4, 10, 2)).astype(np.float32)
    idx = np.array([0, 2, 1, 3])
    out = take_per_row(a, idx, 5)
    for i in range(4):
        np.testing.assert_array_equal(out[i], a[i, idx[i]:idx[i] + 5])


def test_ts2vec_fit_and_encode(rng):
    data = rng.standard_normal((24, 32, 2)).astype(np.float32)
    model = TS2Vec(input_dims=2, output_dims=16, hidden_dims=8, depth=2,
                   batch_size=8, seed=0)
    losses = model.fit(data, n_epochs=3)
    assert len(losses) == 3
    assert np.isfinite(losses).all()

    rep = model.encode(data, encoding_window="full_series")
    assert rep.shape == (24, 16)
    rep_t = model.encode(data)
    assert rep_t.shape == (24, 32, 16)
    rep_s = model.encode(data, sliding_length=8, sliding_padding=4,
                         encoding_window="full_series")
    assert rep_s.shape == (24, 16)
    rep_m = model.encode(data, encoding_window="multiscale")
    assert rep_m.shape[0] == 24 and rep_m.shape[1] == 32


def test_ts2vec_eval_classification(rng):
    # separable toy problem: class shifts the series mean
    y = rng.integers(0, 2, 40)
    data = (rng.standard_normal((40, 16, 2)) * 0.1
            + y[:, None, None] * 1.0).astype(np.float32)
    model = TS2Vec(input_dims=2, output_dims=8, hidden_dims=8, depth=1,
                   batch_size=8, seed=0)
    model.fit(data, n_epochs=2)
    _, res = eval_classification(model, data, y, data, y, data, y,
                                 eval_protocol="linear")
    assert set(res) == {"0/val/acc", "0/test/acc", "0/val/auprc",
                        "0/test/auprc", "0/val/f1score", "0/test/f1score"}
    assert res["0/test/acc"] > 0.9  # trivially separable


def test_ts2vec_save_load(tmp_path, rng):
    data = rng.standard_normal((8, 16, 2)).astype(np.float32)
    m1 = TS2Vec(input_dims=2, output_dims=8, hidden_dims=8, depth=1,
                batch_size=4, seed=0)
    m1.fit(data, n_epochs=1)
    fn = str(tmp_path / "ts2vec.msgpack")
    m1.save(fn)
    m2 = TS2Vec(input_dims=2, output_dims=8, hidden_dims=8, depth=1,
                batch_size=4, seed=1)
    m2.load(fn)
    np.testing.assert_allclose(
        m1.encode(data, encoding_window="full_series"),
        m2.encode(data, encoding_window="full_series"), rtol=1e-5)
