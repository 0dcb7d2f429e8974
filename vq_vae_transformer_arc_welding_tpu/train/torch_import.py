"""Import reference PyTorch-Lightning checkpoints into framework params.

The reference chains its three CLI stages through Lightning .ckpt files
(SURVEY.md §1 "control crosses layers only through ... .ckpt"); to let a
reference-trained VQ-VAE seed our on-device latent pipeline (and to
verify bit-comparable codebook indices, BASELINE.md), we map the
reference state_dict key namespace onto our pytrees. Key names cited
per model from /root/reference/model/*.py module attribute paths.

torch is used only here (CPU, file IO) — never in the compute path.
"""
from __future__ import annotations

import numpy as np

from ..ops.norm import BatchNormState


def _np(t):
    # copy: torch .numpy() shares storage, and in-place torch updates
    # must never alias the arrays we hand to the framework
    return np.array(t.detach().cpu().numpy(), dtype=np.float32, copy=True)


def load_lightning_state_dict(path):
    """Read a Lightning .ckpt -> (hyper_parameters dict, state_dict)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return dict(ckpt.get("hyper_parameters", {})), ckpt["state_dict"]


# -- VQ-VAE-Patch (model/vq_vae_patch_embedd.py) ---------------------------

def _resblock_from_sd(sd, prefix, batch_norm):
    p = {
        "conv1_w": _np(sd[f"{prefix}.block.1.weight"]),
        "conv1_b": _np(sd[f"{prefix}.block.1.bias"]),
        "conv2_w": _np(sd[f"{prefix}.block.4.weight"]),
        "conv2_b": _np(sd[f"{prefix}.block.4.bias"]),
    }
    st = None
    if batch_norm:
        p["bn1_scale"] = _np(sd[f"{prefix}.block.2.weight"])
        p["bn1_bias"] = _np(sd[f"{prefix}.block.2.bias"])
        p["bn2_scale"] = _np(sd[f"{prefix}.block.5.weight"])
        p["bn2_bias"] = _np(sd[f"{prefix}.block.5.bias"])
        st = {"bn1": BatchNormState(_np(sd[f"{prefix}.block.2.running_mean"]),
                                    _np(sd[f"{prefix}.block.2.running_var"])),
              "bn2": BatchNormState(_np(sd[f"{prefix}.block.5.running_mean"]),
                                    _np(sd[f"{prefix}.block.5.running_var"]))}
    return p, st


def vqvae_params_from_state_dict(sd, *, n_resblocks: int, batch_norm: bool):
    """Map reference VQVAEPatch state_dict -> (params, state).

    Only the classic VectorQuantizer path carries an importable codebook
    (`vector_quantization.embedding.weight`, vector_quantizer.py:73-74);
    improved-VQ checkpoints store vector_quantize_pytorch internals
    (`vector_quantization.vq.layers.0._codebook.embed`).
    """
    pe_w = _np(sd["patch_embed.proj.weight"])  # (H, 1, patch)
    params = {
        "patch_embed": {"kernel": pe_w[:, 0, :].T,
                        "bias": _np(sd["patch_embed.proj.bias"])},
    }
    enc, enc_bn = [], []
    dec, dec_bn = [], []
    for i in range(n_resblocks):
        p, st = _resblock_from_sd(sd, f"encoder.0.shared_conv.{i}", batch_norm)
        enc.append(p); enc_bn.append(st)
        p, st = _resblock_from_sd(sd, f"decoder.1.shared_conv.{i}", batch_norm)
        dec.append(p); dec_bn.append(st)
    params["encoder"] = enc
    params["sep_conv"] = {"w": _np(sd["encoder.1.shared_conv.weight"]),
                          "b": _np(sd["encoder.1.shared_conv.bias"])}

    if "vector_quantization.embedding.weight" in sd:
        params["vq"] = {"codebook": _np(sd["vector_quantization.embedding.weight"])}
        improved = False
    elif "vector_quantization.vq.layers.0._codebook.embed" in sd:
        params["vq"] = {}
        improved = True
    else:
        raise KeyError("no recognizable vector quantizer in state_dict")

    params["decoder_in"] = {"w": _np(sd["decoder.0.weight"]),
                            "b": _np(sd["decoder.0.bias"])}
    params["decoder"] = dec
    params["inverse"] = {
        "ct1_kernel": _np(sd["reverse_patch_embed.proj.0.weight"]),
        "ct1_bias": _np(sd["reverse_patch_embed.proj.0.bias"]),
        "bn_scale": _np(sd["reverse_patch_embed.proj.1.weight"]),
        "bn_bias": _np(sd["reverse_patch_embed.proj.1.bias"]),
        "ct2_kernel": _np(sd["reverse_patch_embed.proj.3.weight"]),
        "ct2_bias": _np(sd["reverse_patch_embed.proj.3.bias"]),
    }
    state = {"inverse_bn": BatchNormState(
        _np(sd["reverse_patch_embed.proj.1.running_mean"]),
        _np(sd["reverse_patch_embed.proj.1.running_var"]))}
    if batch_norm:
        state["encoder_bn"] = enc_bn
        state["decoder_bn"] = dec_bn
    if improved:
        from ..ops.vq_ema import EMAState
        embed = _np(sd["vector_quantization.vq.layers.0._codebook.embed"])
        embed = embed[0] if embed.ndim == 3 else embed  # (heads?, K, D)
        cluster = sd.get("vector_quantization.vq.layers.0._codebook.cluster_size")
        cluster = (_np(cluster) if cluster is not None
                   else np.ones((embed.shape[0],), np.float32))
        cluster = cluster[0] if cluster.ndim == 2 else cluster
        avg = sd.get("vector_quantization.vq.layers.0._codebook.embed_avg")
        avg = _np(avg) if avg is not None else embed * cluster[:, None]
        avg = avg[0] if avg.ndim == 3 else avg
        state["vq"] = EMAState(embed, cluster, avg,
                               np.ones((), np.int32))
    return params, state


def load_vqvae_checkpoint(path):
    """Lightning .ckpt -> (VQVAEPatch model, params, state)."""
    from ..models.vqvae_patch import VQVAEPatch
    hp, sd = load_lightning_state_dict(path)
    keys = ("hidden_dim", "input_dim", "num_embeddings", "embedding_dim",
            "n_resblocks", "learning_rate", "dropout_p", "patch_size",
            "seq_len", "batch_norm", "beta", "use_improved_vq",
            "kmeans_iters", "threshold_ema_dead_code")
    kwargs = {k: hp[k] for k in keys if k in hp}
    model = VQVAEPatch(**kwargs)
    params, state = vqvae_params_from_state_dict(
        sd, n_resblocks=model.n_resblocks, batch_norm=model.batch_norm)
    if model.use_improved_vq and "vq" not in state:
        raise ValueError("improved-VQ checkpoint missing codebook state")
    return model, params, state


# -- Transformer (model/transformer_decoder.py) ----------------------------

def transformer_params_from_state_dict(sd, *, n_blocks: int,
                                       class_h_bias: bool = False):
    params = {
        "tok_emb": _np(sd["embedding.latent_embedding.weight"]),
        "blocks": [],
        "ln_f_scale": _np(sd["transformer.ln_f.weight"]),
        "ln_f_bias": _np(sd["transformer.ln_f.bias"]),
        "lm_head_w": _np(sd["lm_head.weight"]).T,
        "class_head": {"l1_w": _np(sd["class_head.linear_1.weight"]).T,
                       "l2_w": _np(sd["class_head.linear_2.weight"]).T},
    }
    if class_h_bias:
        params["class_head"]["l1_b"] = _np(sd["class_head.linear_1.bias"])
        params["class_head"]["l2_b"] = _np(sd["class_head.linear_2.bias"])
    for i in range(n_blocks):
        pre = f"transformer.h.{i}"
        params["blocks"].append({
            "ln1_scale": _np(sd[f"{pre}.ln_1.weight"]),
            "ln1_bias": _np(sd[f"{pre}.ln_1.bias"]),
            "attn": {"c_attn_w": _np(sd[f"{pre}.attn.c_attn.weight"]).T,
                     "c_attn_b": _np(sd[f"{pre}.attn.c_attn.bias"]),
                     "c_proj_w": _np(sd[f"{pre}.attn.c_proj.weight"]).T,
                     "c_proj_b": _np(sd[f"{pre}.attn.c_proj.bias"])},
            "ln2_scale": _np(sd[f"{pre}.ln_2.weight"]),
            "ln2_bias": _np(sd[f"{pre}.ln_2.bias"]),
            "mlp": {"c_fc_w": _np(sd[f"{pre}.mlp.c_fc.weight"]).T,
                    "c_fc_b": _np(sd[f"{pre}.mlp.c_fc.bias"]),
                    "c_proj_w": _np(sd[f"{pre}.mlp.c_proj.weight"]).T,
                    "c_proj_b": _np(sd[f"{pre}.mlp.c_proj.bias"])},
        })
    return params, {}


# -- MLP / GRU (model/mlp.py, model/gru.py) --------------------------------

def export_transformer_to_lightning(model, params, path: str):
    """Write our TransformerDecoder params as a reference-layout
    Lightning .ckpt (inverse of transformer_params_from_state_dict)."""
    import numpy as np
    import torch

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    sd = {
        "embedding.latent_embedding.weight": t(params["tok_emb"]),
        # reference-registered buffers (embedding.py:21, transformer_block.py:35)
        "embedding.positional_embedding.pe": t(model.pe).unsqueeze(0),
        "transformer.ln_f.weight": t(params["ln_f_scale"]),
        "transformer.ln_f.bias": t(params["ln_f_bias"]),
        "lm_head.weight": t(params["lm_head_w"]).T,
        "class_head.linear_1.weight": t(params["class_head"]["l1_w"]).T,
        "class_head.linear_2.weight": t(params["class_head"]["l2_w"]).T,
    }
    if model.class_h_bias:
        sd["class_head.linear_1.bias"] = t(params["class_head"]["l1_b"])
        sd["class_head.linear_2.bias"] = t(params["class_head"]["l2_b"])
    tril = torch.tril(torch.ones(model.seq_len, model.seq_len)).view(
        1, 1, model.seq_len, model.seq_len)
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.h.{i}"
        sd[f"{pre}.attn.bias"] = tril.clone()
        sd[f"{pre}.ln_1.weight"] = t(blk["ln1_scale"])
        sd[f"{pre}.ln_1.bias"] = t(blk["ln1_bias"])
        sd[f"{pre}.attn.c_attn.weight"] = t(blk["attn"]["c_attn_w"]).T
        sd[f"{pre}.attn.c_attn.bias"] = t(blk["attn"]["c_attn_b"])
        sd[f"{pre}.attn.c_proj.weight"] = t(blk["attn"]["c_proj_w"]).T
        sd[f"{pre}.attn.c_proj.bias"] = t(blk["attn"]["c_proj_b"])
        sd[f"{pre}.ln_2.weight"] = t(blk["ln2_scale"])
        sd[f"{pre}.ln_2.bias"] = t(blk["ln2_bias"])
        sd[f"{pre}.mlp.c_fc.weight"] = t(blk["mlp"]["c_fc_w"]).T
        sd[f"{pre}.mlp.c_fc.bias"] = t(blk["mlp"]["c_fc_b"])
        sd[f"{pre}.mlp.c_proj.weight"] = t(blk["mlp"]["c_proj_w"]).T
        sd[f"{pre}.mlp.c_proj.bias"] = t(blk["mlp"]["c_proj_b"])
    torch.save({"state_dict": sd, "hyper_parameters": dict(model.hparams),
                "epoch": 0, "global_step": 0,
                "pytorch-lightning_version": "2.0.0"}, path)
    return path


def mlp_params_from_state_dict(sd, *, n_hidden_layers: int):
    layers, bn = [], []
    n_stacks = n_hidden_layers + 1
    for i in range(n_stacks):
        li, bi = 3 * i, 3 * i + 1
        layers.append({
            "w": _np(sd[f"layers.{li}.weight"]).T,
            "b": _np(sd[f"layers.{li}.bias"]),
            "bn_scale": _np(sd[f"layers.{bi}.weight"]),
            "bn_bias": _np(sd[f"layers.{bi}.bias"]),
        })
        bn.append(BatchNormState(_np(sd[f"layers.{bi}.running_mean"]),
                                 _np(sd[f"layers.{bi}.running_var"])))
    head_i = 3 * n_stacks + 1
    params = {"layers": layers,
              "head": {"w": _np(sd[f"layers.{head_i}.weight"]).T,
                       "b": _np(sd[f"layers.{head_i}.bias"])}}
    return params, {"bn": bn}


def export_vqvae_to_lightning(model, params, state, path: str):
    """Write our VQVAEPatch params/state as a reference-layout Lightning
    .ckpt (inverse of vqvae_params_from_state_dict), so models trained
    in this framework can be consumed by the reference PyTorch pipeline
    (BASELINE.json asks for identical checkpoint formats both ways)."""
    import numpy as np
    import torch

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    sd = {}
    pe = params["patch_embed"]
    sd["patch_embed.proj.weight"] = t(pe["kernel"]).T.unsqueeze(1)  # (H,1,patch)
    sd["patch_embed.proj.bias"] = t(pe["bias"])

    def put_resblock(prefix, p, st):
        sd[f"{prefix}.block.1.weight"] = t(p["conv1_w"])
        sd[f"{prefix}.block.1.bias"] = t(p["conv1_b"])
        sd[f"{prefix}.block.4.weight"] = t(p["conv2_w"])
        sd[f"{prefix}.block.4.bias"] = t(p["conv2_b"])
        if model.batch_norm and st is not None:
            sd[f"{prefix}.block.2.weight"] = t(p["bn1_scale"])
            sd[f"{prefix}.block.2.bias"] = t(p["bn1_bias"])
            sd[f"{prefix}.block.2.running_mean"] = t(st["bn1"].mean)
            sd[f"{prefix}.block.2.running_var"] = t(st["bn1"].var)
            sd[f"{prefix}.block.2.num_batches_tracked"] = torch.tensor(0)
            sd[f"{prefix}.block.5.weight"] = t(p["bn2_scale"])
            sd[f"{prefix}.block.5.bias"] = t(p["bn2_bias"])
            sd[f"{prefix}.block.5.running_mean"] = t(st["bn2"].mean)
            sd[f"{prefix}.block.5.running_var"] = t(st["bn2"].var)
            sd[f"{prefix}.block.5.num_batches_tracked"] = torch.tensor(0)

    for i in range(model.n_resblocks):
        enc_bn = (state.get("encoder_bn", [None] * model.n_resblocks)[i]
                  if model.batch_norm else None)
        dec_bn = (state.get("decoder_bn", [None] * model.n_resblocks)[i]
                  if model.batch_norm else None)
        put_resblock(f"encoder.0.shared_conv.{i}", params["encoder"][i], enc_bn)
        put_resblock(f"decoder.1.shared_conv.{i}", params["decoder"][i], dec_bn)

    sd["encoder.1.shared_conv.weight"] = t(params["sep_conv"]["w"])
    sd["encoder.1.shared_conv.bias"] = t(params["sep_conv"]["b"])
    if model.use_improved_vq:
        cb = t(state["vq"].codebook)
        sd["vector_quantization.vq.layers.0._codebook.embed"] = cb.unsqueeze(0)
        sd["vector_quantization.vq.layers.0._codebook.cluster_size"] = \
            t(state["vq"].cluster_size).unsqueeze(0)
        sd["vector_quantization.vq.layers.0._codebook.embed_avg"] = \
            t(state["vq"].embed_avg).unsqueeze(0)
    else:
        sd["vector_quantization.embedding.weight"] = t(params["vq"]["codebook"])
    sd["decoder.0.weight"] = t(params["decoder_in"]["w"])
    sd["decoder.0.bias"] = t(params["decoder_in"]["b"])
    inv = params["inverse"]
    sd["reverse_patch_embed.proj.0.weight"] = t(inv["ct1_kernel"])
    sd["reverse_patch_embed.proj.0.bias"] = t(inv["ct1_bias"])
    sd["reverse_patch_embed.proj.1.weight"] = t(inv["bn_scale"])
    sd["reverse_patch_embed.proj.1.bias"] = t(inv["bn_bias"])
    sd["reverse_patch_embed.proj.1.running_mean"] = t(state["inverse_bn"].mean)
    sd["reverse_patch_embed.proj.1.running_var"] = t(state["inverse_bn"].var)
    sd["reverse_patch_embed.proj.1.num_batches_tracked"] = torch.tensor(0)
    sd["reverse_patch_embed.proj.3.weight"] = t(inv["ct2_kernel"])
    sd["reverse_patch_embed.proj.3.bias"] = t(inv["ct2_bias"])

    torch.save({"state_dict": sd, "hyper_parameters": dict(model.hparams),
                "epoch": 0, "global_step": 0,
                "pytorch-lightning_version": "2.0.0"}, path)
    return path


def gru_params_from_state_dict(sd, *, n_hidden_layers: int):
    layers = []
    for i in range(n_hidden_layers):
        layers.append({
            "w_ih": _np(sd[f"gru.weight_ih_l{i}"]),
            "w_hh": _np(sd[f"gru.weight_hh_l{i}"]),
            "b_ih": _np(sd[f"gru.bias_ih_l{i}"]),
            "b_hh": _np(sd[f"gru.bias_hh_l{i}"]),
        })
    params = {"gru": layers,
              "head": {"w": _np(sd["output_layer.weight"]).T,
                       "b": _np(sd["output_layer.bias"])}}
    return params, {}
