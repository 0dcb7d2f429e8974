"""Improved VQ: kmeans init + EMA codebook + dead-code expiry.

First-class TPU replacement for the `vector_quantize_pytorch.ResidualVQ`
dependency (reference model/vector_quantizer.py:9-56, num_quantizers=1,
kmeans_init=True, EMA decay 0.8, threshold_ema_dead_code): the codebook
lives in *state*, updated by exponential moving averages of batch
statistics rather than by gradients. Everything — kmeans init, the EMA
update, and expiry — runs inside jit via lax.cond/fori_loop.

Distributed correctness: the reference's EMA statistics are per-rank
under DDP (its torch.distributed helpers at vector_quantizer.py:134-152
are never called — SURVEY.md §2.1 #26 flags this gap). Here the batch
code counts and vector sums are `lax.psum`'d over the data axis when
`axis_name` is given, so codebooks stay identical across devices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .vq import VQOutput, nearest_codes

DECAY = 0.8       # vq-pytorch VectorQuantize default
EPS = 1e-5
COMMITMENT_WEIGHT = 1.0


class EMAState(NamedTuple):
    codebook: jnp.ndarray      # (K, D)
    cluster_size: jnp.ndarray  # (K,) EMA of code usage counts
    embed_avg: jnp.ndarray     # (K, D) EMA of assigned-vector sums
    initialized: jnp.ndarray   # () int32 0/1 — kmeans init ran?

    @staticmethod
    def create(num_embeddings: int, dim: int) -> "EMAState":
        return EMAState(
            codebook=jnp.zeros((num_embeddings, dim), jnp.float32),
            cluster_size=jnp.zeros((num_embeddings,), jnp.float32),
            embed_avg=jnp.zeros((num_embeddings, dim), jnp.float32),
            initialized=jnp.zeros((), jnp.int32),
        )


def _kmeans(z_flat, k: int, iters: int, rng, axis_name: str | None = None):
    """Lloyd's kmeans on the first training batch (codebook bootstrap).

    Under an explicit data axis (shard_map/pmap) the per-iteration
    statistics are psum'd and the initial means pmean'd so every device
    bootstraps the identical codebook."""
    n = z_flat.shape[0]
    idx = jax.random.randint(rng, (k,), 0, n)
    means = z_flat[idx]
    if axis_name is not None:
        means = jax.lax.pmean(means, axis_name)

    def body(_, means):
        assign = nearest_codes(z_flat, means)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = onehot.T @ z_flat
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, means)

    means = jax.lax.fori_loop(0, max(iters, 1), body, means)
    assign = nearest_codes(z_flat, means)
    counts = jax.nn.one_hot(assign, k, dtype=jnp.float32).sum(0)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    return means, counts


def nearest_ema(z_e, state: EMAState):
    flat = z_e.reshape(-1, z_e.shape[-1])
    return nearest_codes(flat, state.codebook).reshape(z_e.shape[:-1])


def quantize_ema(z_e, state: EMAState, *, beta: float = 0.25, train: bool,
                 rng=None, kmeans_iters: int = 10,
                 threshold_ema_dead_code: int = 2, axis_name: str | None = None):
    """EMA vector quantization forward + state update.

    Returns (VQOutput, new_state). `beta` is unused for the loss (the
    improved path returns vq-pytorch's commitment loss, weight 1.0 —
    reference vector_quantizer.py:37-39) but kept for signature parity.
    """
    del beta
    k, d = state.codebook.shape
    flat = z_e.reshape(-1, d).astype(jnp.float32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_init, r_expire = jax.random.split(rng)

    if train:
        def do_init(s):
            means, counts = _kmeans(flat, k, kmeans_iters, r_init,
                                    axis_name=axis_name)
            return EMAState(means, counts, means * counts[:, None],
                            jnp.ones((), jnp.int32))
        state = jax.lax.cond(state.initialized == 0, do_init, lambda s: s, state)

    idx_flat = nearest_codes(flat, state.codebook)
    z_q = jnp.take(state.codebook, idx_flat, axis=0).reshape(z_e.shape)

    sg = jax.lax.stop_gradient
    commit_loss = COMMITMENT_WEIGHT * jnp.mean((sg(z_q) - z_e) ** 2)
    z_q_st = z_e + sg(z_q - z_e)

    counts = jnp.zeros((k,), jnp.float32).at[idx_flat].add(1.0)
    e_mean = counts / idx_flat.shape[0]
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))

    new_state = state
    if train:
        onehot = jax.nn.one_hot(idx_flat, k, dtype=jnp.float32)
        batch_counts = counts
        batch_sums = onehot.T @ flat
        if axis_name is not None:
            batch_counts = jax.lax.psum(batch_counts, axis_name)
            batch_sums = jax.lax.psum(batch_sums, axis_name)
        cluster_size = state.cluster_size * DECAY + batch_counts * (1 - DECAY)
        embed_avg = state.embed_avg * DECAY + batch_sums * (1 - DECAY)
        n = cluster_size.sum()
        smoothed = (cluster_size + EPS) / (n + k * EPS) * n
        codebook = embed_avg / smoothed[:, None]

        # dead-code expiry: re-seed starved codes from the current batch
        if threshold_ema_dead_code > 0:
            dead = cluster_size < threshold_ema_dead_code
            sample_idx = jax.random.randint(r_expire, (k,), 0, flat.shape[0])
            samples = flat[sample_idx]
            if axis_name is not None:
                # keep replicas' codebooks identical: average the
                # per-device candidate rows (a distributional tweak of
                # vq-pytorch's local-batch sampling, which would desync
                # codebooks under an explicit data axis)
                samples = jax.lax.pmean(samples, axis_name)
            codebook = jnp.where(dead[:, None], samples, codebook)
            cluster_size = jnp.where(dead, jnp.asarray(threshold_ema_dead_code,
                                                       jnp.float32), cluster_size)
            embed_avg = jnp.where(dead[:, None], samples * threshold_ema_dead_code,
                                  embed_avg)
        new_state = EMAState(codebook, cluster_size, embed_avg, state.initialized)

    out = VQOutput(commit_loss, z_q_st, perplexity,
                   idx_flat.reshape(z_e.shape[:-1]))
    return out, new_state


def quantize_ood(z_e, state: EMAState):
    """Per-sample out-of-distribution score: mean squared distance of
    each sample's latents to their nearest codes (reference
    vector_quantizer.py:41-56 forward_ood). z_e: (B, T, D) -> (B,)."""
    idx = nearest_ema(z_e, state)
    z_q = jnp.take(state.codebook, idx, axis=0)
    return jnp.mean((jax.lax.stop_gradient(z_q) - z_e) ** 2, axis=(1, 2))
