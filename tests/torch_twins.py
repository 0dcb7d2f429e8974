"""Torch golden-model twins used only by the test suite.

Independently-written torch.nn reconstructions of the reference
architectures (attribute names follow the reference so state_dicts are
key-compatible with train/torch_import.py). These are test fixtures:
the ground truth our TPU ops must reproduce, never imported by the
framework itself.
"""
import math

import torch
from torch import nn


class TwinResBlock(nn.Module):
    def __init__(self, ch, p=0.1, bn=True):
        super().__init__()
        mk_bn = (lambda: nn.BatchNorm1d(ch)) if bn else (lambda: nn.Identity())
        self.block = nn.Sequential(
            nn.GELU(), nn.Conv1d(ch, ch, 3, 1, 1), mk_bn(),
            nn.GELU(), nn.Conv1d(ch, ch, 3, 1, 1), mk_bn(), nn.Dropout(p))

    def forward(self, x):
        return x + self.block(x)


class TwinCNNBlock(nn.Module):
    def __init__(self, ch, separate, n_res, p=0.1, bn=True):
        super().__init__()
        self.separate = separate
        self.shared_conv = nn.Sequential(
            *[TwinResBlock(ch, p, bn) for _ in range(n_res)])

    def forward(self, x):
        if self.separate:
            return torch.cat([self.shared_conv(x[:, :, i].unsqueeze(2))
                              for i in range(x.shape[2])], dim=2)
        return self.shared_conv(x)


class TwinSepCNN(nn.Module):
    def __init__(self, h, d):
        super().__init__()
        self.shared_conv = nn.Conv1d(h, d, 1)

    def forward(self, x):
        out = torch.cat([self.shared_conv(x[:, :, i].unsqueeze(2))
                         for i in range(x.shape[2])], dim=2)
        return out.permute(0, 2, 1)


class TwinPatchEmbed(nn.Module):
    def __init__(self, patch, h):
        super().__init__()
        self.proj = nn.Conv1d(1, h, patch, patch)

    def forward(self, x):
        x = x.permute(0, 2, 1).reshape(x.shape[0], -1).unsqueeze(1)
        return self.proj(x)


class TwinPatchEmbedInverse(nn.Module):
    def __init__(self, patch, h, input_dim):
        super().__init__()
        plans = {25: (5, 5), 10: (2, 5), 50: (10, 5)}
        k1, k2 = plans[patch]
        self.proj = nn.Sequential(
            nn.ConvTranspose1d(h, h, k1, k1), nn.BatchNorm1d(h), nn.GELU(),
            nn.ConvTranspose1d(h, 1, k2, k2))
        self.input_dim = input_dim

    def forward(self, x):
        x = self.proj(x)
        return x.reshape(x.shape[0], -1, self.input_dim)


class TwinVQ(nn.Module):
    def __init__(self, k, d, beta):
        super().__init__()
        self.n_e, self.e_dim, self.beta = k, d, beta
        self.embedding = nn.Embedding(k, d)
        self.embedding.weight.data.uniform_(-1.0 / k, 1.0 / k)

    def forward(self, z):
        zf = z.reshape(-1, self.e_dim)
        d = (zf**2).sum(1, keepdim=True) + (self.embedding.weight**2).sum(1) \
            - 2 * zf @ self.embedding.weight.t()
        idx = d.argmin(1)
        z_q = self.embedding.weight[idx].view(z.shape)
        loss = ((z_q.detach() - z)**2).mean() \
            + self.beta * ((z_q - z.detach())**2).mean()
        z_q = z + (z_q - z).detach()
        onehot = torch.nn.functional.one_hot(idx, self.n_e).float()
        e_mean = onehot.mean(0)
        perp = torch.exp(-(e_mean * torch.log(e_mean + 1e-10)).sum())
        return loss, z_q, perp, onehot, idx.unsqueeze(1)


class TwinVQVAEPatch(nn.Module):
    def __init__(self, h, input_dim, k, d, n_res, p=0.1, patch=25, bn=False,
                 beta=0.25):
        super().__init__()
        self.patch_embed = TwinPatchEmbed(patch, h)
        self.encoder = nn.Sequential(TwinCNNBlock(h, True, n_res, p, bn),
                                     TwinSepCNN(h, d))
        self.vector_quantization = TwinVQ(k, d, beta)
        self.decoder = nn.Sequential(nn.Conv1d(d, h, 1),
                                     TwinCNNBlock(h, False, n_res, p, bn))
        self.reverse_patch_embed = TwinPatchEmbedInverse(patch, h, input_dim)
        for m in self.modules():
            if isinstance(m, (nn.Conv1d, nn.ConvTranspose1d)):
                nn.init.xavier_uniform_(m.weight.data)
                m.bias.data.fill_(0)

    def forward(self, x):
        h = self.patch_embed(x)
        z_e = self.encoder(h)
        loss, z_q, perp, _, _ = self.vector_quantization(z_e)
        x_hat = self.decoder(z_q.permute(0, 2, 1))
        return loss, self.reverse_patch_embed(x_hat), perp


class TwinNewGELU(nn.Module):
    def forward(self, x):
        return 0.5 * x * (1.0 + torch.tanh(
            math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


class TwinAttention(nn.Module):
    def __init__(self, d, seq_len, heads, res_dropout=0.1, att_dropout=0.0):
        super().__init__()
        self.c_attn = nn.Linear(d, 3 * d)
        self.c_proj = nn.Linear(d, d)
        self.n_head, self.n_embd = heads, d
        # dropouts match the reference training semantics
        # (transformer_block.py:32-33,56,62); identity in eval, so the
        # eval-parity tests are unaffected (no params in state_dict)
        self.attn_dropout = nn.Dropout(att_dropout)
        self.resid_dropout = nn.Dropout(res_dropout)
        # buffer name 'bias' matches the reference state_dict layout
        self.register_buffer("bias", torch.tril(torch.ones(seq_len, seq_len))
                             .view(1, 1, seq_len, seq_len))

    def forward(self, x):
        b, t, c = x.size()
        q, k, v = self.c_attn(x).split(self.n_embd, dim=2)
        shape = (b, t, self.n_head, c // self.n_head)
        q, k, v = (z.view(shape).transpose(1, 2) for z in (q, k, v))
        att = (q @ k.transpose(-2, -1)) / math.sqrt(k.size(-1))
        att = att.masked_fill(self.bias[:, :, :t, :t] == 0, float("-inf"))
        att = self.attn_dropout(torch.softmax(att, dim=-1))
        y = (att @ v).transpose(1, 2).reshape(b, t, c)
        return self.resid_dropout(self.c_proj(y))


class TwinBlock(nn.Module):
    def __init__(self, d, seq_len, heads, res_dropout=0.1, att_dropout=0.0):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = TwinAttention(d, seq_len, heads, res_dropout,
                                  att_dropout)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.ModuleDict(dict(
            c_fc=nn.Linear(d, 4 * d), c_proj=nn.Linear(4 * d, d),
            act=TwinNewGELU(), dropout=nn.Dropout(res_dropout)))

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        m = self.mlp
        return x + m.dropout(m.c_proj(m.act(m.c_fc(self.ln_2(x)))))


class TwinTransformer(nn.Module):
    def __init__(self, d, n_classes, seq_len, n_blocks, heads, pe_max=512):
        super().__init__()
        self.seq_len = seq_len
        emb = nn.Module()
        emb.latent_embedding = nn.Embedding(n_classes, d)
        pos_mod = nn.Module()  # buffer path matches the reference:
        pe = torch.zeros(pe_max, d)  # embedding.positional_embedding.pe
        pos = torch.arange(pe_max).float().unsqueeze(1)
        div = (torch.arange(0, d, 2).float() * -(math.log(10000.0) / d)).exp()
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        pos_mod.register_buffer("pe", pe.unsqueeze(0))
        emb.positional_embedding = pos_mod
        self.embedding = emb
        self.transformer = nn.ModuleDict(dict(
            h=nn.ModuleList([TwinBlock(d, seq_len, heads)
                             for _ in range(n_blocks)]),
            ln_f=nn.LayerNorm(d)))
        self.lm_head = nn.Linear(d, n_classes, bias=False)
        self.class_head = nn.ModuleDict(dict(
            linear_1=nn.Linear(d, 1, bias=False),
            activation=nn.GELU(),
            linear_2=nn.Linear(seq_len, 2, bias=False)))
        self.apply(self._init)
        for pn, p in self.named_parameters():
            if pn.endswith("c_proj.weight"):
                nn.init.normal_(p, 0.0, 0.02 / math.sqrt(2 * n_blocks))

    @staticmethod
    def _init(m):
        if isinstance(m, nn.Linear):
            nn.init.normal_(m.weight, 0.0, 0.02)
            if m.bias is not None:
                nn.init.zeros_(m.bias)
        elif isinstance(m, nn.Embedding):
            nn.init.normal_(m.weight, 0.0, 0.02)

    def forward(self, x, generate=True):
        x = self.embedding.latent_embedding(x) \
            + self.embedding.positional_embedding.pe[:, :x.size(1)]
        for blk in self.transformer.h:
            x = blk(x)
        x = self.transformer.ln_f(x)
        if generate:
            return self.lm_head(x)
        h = self.class_head.linear_1(x)
        h = self.class_head.activation(h.squeeze(-1))
        return self.class_head.linear_2(h)


class TwinMLP(nn.Module):
    def __init__(self, input_size, in_dim, hidden, n_hidden, out=2, p=0.1):
        super().__init__()
        layers = [nn.Linear(input_size * in_dim, hidden),
                  nn.BatchNorm1d(hidden), nn.LeakyReLU()]
        for _ in range(n_hidden):
            layers += [nn.Linear(hidden, hidden), nn.BatchNorm1d(hidden),
                       nn.LeakyReLU()]
        layers += [nn.Dropout(p), nn.Linear(hidden, out)]
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        x = x.reshape(x.shape[0], -1)
        for l in self.layers:
            x = l(x)
        return x


class TwinGRU(nn.Module):
    def __init__(self, in_dim, hidden, n_layers, out=2, p=0.2):
        super().__init__()
        self.in_dim = in_dim
        self.gru = nn.GRU(in_dim, hidden, n_layers, batch_first=True)
        self.dropout = nn.Dropout(p)
        self.output_layer = nn.Linear(hidden, out)

    def forward(self, x):
        x = x.reshape(x.shape[0], -1, self.in_dim)
        x, _ = self.gru(x)
        return self.output_layer(self.dropout(x[:, -1, :]))
