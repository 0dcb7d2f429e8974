"""VQ-VAE with patch embedding, TPU-first.

Capability parity with reference model/vq_vae_patch_embedd.py:117-167
(VQVAEPatch) but restructured for the MXU:

- patch embedding = one einsum over non-overlapping patches
  (ops/patching.py) instead of a strided Conv1d;
- the encoder's "seperate=True" CNNBlock — a Python loop launching the
  shared ResBlock stack once per patch position on length-1 slices
  (reference :103-114, flagged pathological in SURVEY.md §3.4) — is a
  single batched center-tap matmul over all positions (ops/conv.py),
  bit-matching the loop's math;
- the decoder CNNBlock (seperate=False) is a real k3/p1 conv over the
  16-patch sequence (reference :142-145);
- VQ nearest-neighbor runs in f32 with first-index tie-break so
  codebook indices are bit-comparable (ops/vq.py), with a Pallas
  kernel behind ``vq_impl='pallas'``.

Layer widths at defaults (hidden 512, D 32, K 256) are already
128-multiples — MXU-aligned by construction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.activations import gelu
from ..ops.conv import center_tap_dense, conv1d_same, conv1d_same_im2col
from ..ops.norm import BatchNormState, batch_norm_apply
from ..ops.patching import (INVERSE_PATCH_PLANS, patch_embed,
                            patch_embed_inverse)
from ..ops.vq import vq_lookup, vq_quantize
from ..ops import vq_ema
from ..utils.random import dropout
from .base import Module
from .initializers import uniform, xavier_conv1d, xavier_conv_transpose1d


class VQVAEOut(NamedTuple):
    embedding_loss: jnp.ndarray
    x_hat: jnp.ndarray
    perplexity: jnp.ndarray


class VQVAEPatch(Module):
    """hparams mirror the reference constructor (vq_vae_patch_embedd.py:119-121)."""

    def __init__(self, hidden_dim: int, input_dim: int, num_embeddings: int,
                 embedding_dim: int, n_resblocks: int, learning_rate: float,
                 dropout_p: float = 0.1, patch_size: int = 25, seq_len: int = 200,
                 batch_norm: bool = True, beta: float = 0.25,
                 use_improved_vq: bool = False, kmeans_iters: int = 0,
                 threshold_ema_dead_code: int = 2, vq_impl: str = "xla",
                 compute_dtype=None, compute_scope: str = "all",
                 conv_impl: str = "lax"):
        if patch_size not in INVERSE_PATCH_PLANS:
            raise NotImplementedError(f"Patch size not implemented: {patch_size}")
        self.hidden_dim = hidden_dim
        self.input_dim = input_dim
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.n_resblocks = n_resblocks
        self.learning_rate = learning_rate
        self.dropout_p = dropout_p
        self.patch_size = patch_size
        self.seq_len = seq_len
        self.batch_norm = batch_norm
        self.beta = beta
        self.use_improved_vq = use_improved_vq
        self.kmeans_iters = kmeans_iters
        self.threshold_ema_dead_code = threshold_ema_dead_code
        # runtime option (not an hparam): 'xla' or 'pallas' nearest-code path
        self.vq_impl = vq_impl
        # runtime option (not an hparam): decoder k3 conv lowering —
        # 'lax' (lax.conv) or 'im2col' (single GEMM; faster backward,
        # ulp-level rounding difference — ops/conv.py docstring)
        if conv_impl not in ("lax", "im2col"):
            raise ValueError(f"conv_impl: {conv_impl}")
        self.conv_impl = conv_impl
        # runtime option (not an hparam): compute_dtype=jnp.bfloat16 runs
        # the conv/dense matmul INPUTS in bf16 with f32 MXU accumulation
        # (2x matmul throughput); the residual stream, BatchNorm, GELU,
        # VQ nearest-neighbor distances, and the loss all stay f32, so
        # codebook indices remain computed from f32 distances. Mixed-
        # precision TRAINING mode: master weights/optimizer stay f32
        # (the cast happens inside the forward). None = exact f32.
        # compute_scope narrows the cast to one half of the model:
        # 'all' | 'encoder' | 'decoder'. Measured (BENCHMARKS.md round
        # 5): scope='all' trains to equal-or-better recon loss but the
        # latent space loses ~2 F1 pts of downstream class
        # separability; scope='decoder' keeps the encoder/VQ math
        # exact f32 so the straight-through gradient is the only bf16
        # touchpoint on the latent path.
        if compute_scope not in ("all", "encoder", "decoder"):
            raise ValueError(f"compute_scope: {compute_scope}")
        self.compute_dtype = compute_dtype
        self.compute_scope = compute_scope
        self._enc_dtype = (compute_dtype
                           if compute_scope in ("all", "encoder") else None)
        self._dec_dtype = (compute_dtype
                           if compute_scope in ("all", "decoder") else None)
        # tokens per cycle: 200//25 * 2 = 16 (reference :149)
        self.enc_out_len = seq_len // patch_size * input_dim
        self.n_patches = (seq_len * input_dim) // patch_size
        self.hparams = dict(
            hidden_dim=hidden_dim, input_dim=input_dim,
            num_embeddings=num_embeddings, embedding_dim=embedding_dim,
            n_resblocks=n_resblocks, learning_rate=learning_rate,
            dropout_p=dropout_p, patch_size=patch_size, seq_len=seq_len,
            batch_norm=batch_norm, beta=beta, use_improved_vq=use_improved_vq,
            kmeans_iters=kmeans_iters,
            threshold_ema_dead_code=threshold_ema_dead_code)

    # -- init -------------------------------------------------------------

    def _init_resblock(self, key, ch: int):
        k1, k2 = jax.random.split(key)
        w1, b1 = xavier_conv1d(k1, ch, ch, 3)
        w2, b2 = xavier_conv1d(k2, ch, ch, 3)
        p = {"conv1_w": w1, "conv1_b": b1, "conv2_w": w2, "conv2_b": b2}
        if self.batch_norm:
            p["bn1_scale"] = jnp.ones((ch,))
            p["bn1_bias"] = jnp.zeros((ch,))
            p["bn2_scale"] = jnp.ones((ch,))
            p["bn2_bias"] = jnp.zeros((ch,))
        return p

    def init(self, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        ks = iter(jax.random.split(key, 8 + 2 * self.n_resblocks))
        h, d = self.hidden_dim, self.embedding_dim

        pe_w, pe_b = xavier_conv1d(next(ks), h, 1, self.patch_size)
        params = {
            # store transposed (patch, hidden) for the einsum path
            "patch_embed": {"kernel": pe_w[:, 0, :].T, "bias": pe_b},
            "encoder": [self._init_resblock(next(ks), h)
                        for _ in range(self.n_resblocks)],
        }
        sep_w, sep_b = xavier_conv1d(next(ks), d, h, 1)
        params["sep_conv"] = {"w": sep_w, "b": sep_b}

        if self.use_improved_vq:
            params["vq"] = {}
        else:
            # reference vector_quantizer.py:74: U(-1/K, 1/K)
            params["vq"] = {"codebook": uniform(
                next(ks), (self.num_embeddings, d), 1.0 / self.num_embeddings)}

        dec_w, dec_b = xavier_conv1d(next(ks), h, d, 1)
        params["decoder_in"] = {"w": dec_w, "b": dec_b}
        params["decoder"] = [self._init_resblock(next(ks), h)
                             for _ in range(self.n_resblocks)]

        k1, k2 = INVERSE_PATCH_PLANS[self.patch_size]
        ct1_w, ct1_b = xavier_conv_transpose1d(next(ks), h, h, k1)
        ct2_w, ct2_b = xavier_conv_transpose1d(next(ks), h, 1, k2)
        params["inverse"] = {
            "ct1_kernel": ct1_w, "ct1_bias": ct1_b,
            "bn_scale": jnp.ones((h,)), "bn_bias": jnp.zeros((h,)),
            "ct2_kernel": ct2_w, "ct2_bias": ct2_b,
        }

        state = {"inverse_bn": BatchNormState.create(h)}
        if self.batch_norm:
            state["encoder_bn"] = [
                {"bn1": BatchNormState.create(h), "bn2": BatchNormState.create(h)}
                for _ in range(self.n_resblocks)]
            state["decoder_bn"] = [
                {"bn1": BatchNormState.create(h), "bn2": BatchNormState.create(h)}
                for _ in range(self.n_resblocks)]
        if self.use_improved_vq:
            state["vq"] = vq_ema.EMAState.create(
                self.num_embeddings, d)
        return params, state

    # -- forward pieces ---------------------------------------------------

    def _cast_conv(self, conv_fn, cd):
        """Wrap a conv primitive so its matmul INPUTS run in dtype cd
        (bf16 multiply, f32 accumulate via the ops'
        preferred_element_type=f32); identity when cd is None. Bias
        adds stay f32."""
        if cd is None:
            return conv_fn
        return lambda x, w, b: conv_fn(x.astype(cd), w.astype(cd), b)

    def _resblock(self, p, bn_state, x, conv_fn, *, train, rng):
        """GELU-conv-BN?-GELU-conv-BN?-dropout with residual add
        (reference vq_vae_patch_embedd.py:60-74)."""
        h = gelu(x)
        h = conv_fn(h, p["conv1_w"], p["conv1_b"])
        new_bn = {}
        if self.batch_norm:
            h, new_bn["bn1"] = batch_norm_apply(
                h, p["bn1_scale"], p["bn1_bias"], bn_state["bn1"], train=train)
        h = gelu(h)
        h = conv_fn(h, p["conv2_w"], p["conv2_b"])
        if self.batch_norm:
            h, new_bn["bn2"] = batch_norm_apply(
                h, p["bn2_scale"], p["bn2_bias"], bn_state["bn2"], train=train)
        h = dropout(rng, h, self.dropout_p, train)
        return x + h, new_bn

    def _run_blocks(self, blocks, bn_states, x, conv_fn, *, train, rng):
        new_states = []
        for i, p in enumerate(blocks):
            sub = jax.random.fold_in(rng, i) if rng is not None else None
            bn = bn_states[i] if bn_states is not None else None
            x, new_bn = self._resblock(p, bn, x, conv_fn, train=train, rng=sub)
            new_states.append(new_bn)
        return x, new_states

    def encode(self, params, state, x, *, train=False, rng=None):
        """(B, seq_len, input_dim) -> z_e (B, enc_out_len, embedding_dim)."""
        cd = self._enc_dtype
        pe = params["patch_embed"]
        h = (patch_embed(x, pe["kernel"], pe["bias"], self.patch_size)
             if cd is None else
             patch_embed(x.astype(cd), pe["kernel"].astype(cd), pe["bias"],
                         self.patch_size))
        bn = state.get("encoder_bn") if self.batch_norm else None
        ctd = self._cast_conv(center_tap_dense, cd)
        h, enc_bn = self._run_blocks(params["encoder"], bn, h, ctd,
                                     train=train, rng=rng)
        # SepCNNBlock: shared 1x1 conv hidden->embed per position (:77-91).
        # z_e comes out f32 (accumulator dtype) — the VQ distance math
        # downstream is always f32
        z_e = ctd(h, params["sep_conv"]["w"], params["sep_conv"]["b"])
        return z_e, enc_bn

    def _nearest_fn(self):
        if self.vq_impl == "pallas":
            from ..ops.pallas_vq import nearest_codes_pallas
            return nearest_codes_pallas
        return None  # ops.vq default

    def quantize(self, params, state, z_e, *, train=False, rng=None):
        """Dispatch classic vs improved (EMA/kmeans) VQ. Returns
        (VQOutput, new_vq_state)."""
        if self.use_improved_vq:
            return vq_ema.quantize_ema(
                z_e, state["vq"], beta=self.beta, train=train, rng=rng,
                kmeans_iters=self.kmeans_iters,
                threshold_ema_dead_code=self.threshold_ema_dead_code)
        return vq_quantize(z_e, params["vq"]["codebook"], self.beta,
                           nearest_fn=self._nearest_fn()), None

    def decode(self, params, state, z_q, *, train=False, rng=None):
        """z_q (B, enc_out_len, D) -> x_hat (B, seq_len, input_dim)."""
        cd = self._dec_dtype
        ctd = self._cast_conv(center_tap_dense, cd)
        h = ctd(z_q, params["decoder_in"]["w"], params["decoder_in"]["b"])
        bn = state.get("decoder_bn") if self.batch_norm else None
        k3 = (conv1d_same_im2col if self.conv_impl == "im2col"
              else conv1d_same)
        h, dec_bn = self._run_blocks(params["decoder"], bn, h,
                                     self._cast_conv(k3, cd),
                                     train=train, rng=rng)
        inv = params["inverse"]
        if cd is not None:
            inv = dict(inv, ct1_kernel=inv["ct1_kernel"].astype(cd),
                       ct2_kernel=inv["ct2_kernel"].astype(cd))
            # patch_embed_inverse's einsums accumulate f32; cast only
            # the first stage's input (the BN between stages re-floats)
            h = h.astype(cd)
        x_hat, inv_bn = patch_embed_inverse(
            h, inv, state["inverse_bn"], patch_size=self.patch_size,
            input_dim=self.input_dim, train=train)
        return x_hat, dec_bn, inv_bn

    # -- public API -------------------------------------------------------

    def apply(self, params, state, x, *, train=False, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_enc, r_vq, r_dec = jax.random.split(rng, 3)
        z_e, enc_bn = self.encode(params, state, x, train=train, rng=r_enc)
        vq_out, vq_state = self.quantize(params, state, z_e, train=train, rng=r_vq)
        x_hat, dec_bn, inv_bn = self.decode(params, state, vq_out.z_q,
                                            train=train, rng=r_dec)
        new_state = dict(state)
        new_state["inverse_bn"] = inv_bn
        if self.batch_norm:
            new_state["encoder_bn"] = enc_bn
            new_state["decoder_bn"] = dec_bn
        if vq_state is not None:
            new_state["vq"] = vq_state
        return VQVAEOut(vq_out.loss, x_hat, vq_out.perplexity), new_state

    def encode_indices(self, params, state, x):
        """Frozen-encoder token ids (B, enc_out_len) — the on-device
        replacement for the reference's per-batch GPU->host round-trip
        (latentspace_dataloader.py:154-161)."""
        z_e, _ = self.encode(params, state, x, train=False)
        if self.use_improved_vq:
            return vq_ema.nearest_ema(z_e, state["vq"])
        from ..ops.vq import nearest_codes
        find = self._nearest_fn() or nearest_codes
        flat = z_e.reshape(-1, self.embedding_dim)
        return find(flat, params["vq"]["codebook"]).reshape(z_e.shape[:-1])

    def encode_zq(self, params, state, x):
        """Frozen-encoder quantized vectors (B, enc_out_len, D)."""
        idx = self.encode_indices(params, state, x)
        cb = (state["vq"].codebook if self.use_improved_vq
              else params["vq"]["codebook"])
        return vq_lookup(idx, cb)

    def forward_ood(self, params, state, x):
        """Per-sample OOD score via latent quantization error
        (reference vector_quantizer.py:41-56). x: (B, seq_len, C) -> (B,)."""
        z_e, _ = self.encode(params, state, x, train=False)
        if self.use_improved_vq:
            return vq_ema.quantize_ood(z_e, state["vq"])
        from ..ops.vq import nearest_codes
        find = self._nearest_fn() or nearest_codes
        idx = find(z_e.reshape(-1, self.embedding_dim),
                   params["vq"]["codebook"]).reshape(z_e.shape[:-1])
        z_q = vq_lookup(idx, params["vq"]["codebook"])
        return jnp.mean((jax.lax.stop_gradient(z_q) - z_e) ** 2, axis=(1, 2))

    def loss_fn(self, params, state, x, *, train, rng):
        """MSE recon + embedding loss (reference autencoder_lightning_base.py:80-84)."""
        out, new_state = self.apply(params, state, x, train=train, rng=rng)
        recon_error = jnp.mean((out.x_hat - x) ** 2)
        loss = recon_error + out.embedding_loss
        metrics = {"loss": loss, "recon_error": recon_error,
                   "perplexity": out.perplexity}
        return loss, (metrics, new_state)
