"""minGPT-style causal transformer decoder over latent tokens.

Capability parity with reference model/transformer_decoder.py:13-230
(MyTransformerDecoder): sinusoidal-PE token embedding (max_len 512,
reference :22-23), pre-LN blocks with tanh-GELU MLPs, a bias-free
lm_head for next-token generation and a two-stage class head (d->1,
exact GELU, seq_len->2) for binary quality classification, GPT-2 init
with residual-projection scaling, and the decay/no-decay optimizer
split (:64-114) exposed as a pytree mask.

Reference quirks reproduced knowingly:
- `transformer.drop` and the optional class-head dropout are created
  but never applied in forward (reference :25-41 vs :116-131); we
  simply don't apply them either.
- generation recomputes the full forward per step (no KV cache,
  reference :203-224); our `generate` is a fixed-shape lax.scan so it
  jits, and `generate_kv` is the output-equal fast path (batched
  prefill + per-token KV cache, recompute tail once cropping starts).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import gelu, new_gelu
from ..ops.attention import (causal_attention_core, causal_self_attention,
                             merge_heads, split_heads)
from ..ops.norm import layer_norm
from ..utils.random import dropout
from .base import Module
from .initializers import gpt2_embedding, gpt2_linear


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sin/cos table (reference model/embedding.py:6-24)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class TransformerDecoder(Module):
    def __init__(self, d_model: int = 64, n_classes: int = 131,
                 seq_len: int = 100, n_blocks: int = 2, n_head: int = 6,
                 res_dropout: float = 0.1, att_dropout: float = 0.0,
                 learning_rate: float = 1e-3, class_h_bias: bool = False,
                 class_h_dropout: bool = False, pe_max_len: int = 512,
                 attention_impl: str = "xla", compute_dtype=None):
        assert d_model % n_head == 0
        # the reference hard-codes a 512-entry PE table
        # (transformer_decoder.py:22-23) and would crash past it; grow
        # the table to cover seq_len so long-context models stay
        # loadable while hparams remain reference-compatible
        pe_max_len = max(pe_max_len, seq_len)
        self.d_model = d_model
        self.n_classes = n_classes
        self.seq_len = seq_len
        self.n_blocks = n_blocks
        self.n_head = n_head
        self.res_dropout = res_dropout
        self.att_dropout = att_dropout
        self.learning_rate = learning_rate
        self.class_h_bias = class_h_bias
        self.class_h_dropout = class_h_dropout
        self.betas = (0.9, 0.95)
        self.weight_decay = 0.1
        self.attention_impl = attention_impl
        # runtime option (not an hparam): bf16 activations halve the
        # HBM traffic of the serving forward; None keeps exact f32
        self.compute_dtype = compute_dtype
        self.pe = jnp.asarray(sinusoidal_pe(pe_max_len, d_model))
        self.hparams = dict(d_model=d_model, n_classes=n_classes,
                            seq_len=seq_len, n_blocks=n_blocks, n_head=n_head,
                            res_dropout=res_dropout, att_dropout=att_dropout,
                            learning_rate=learning_rate,
                            class_h_bias=class_h_bias,
                            class_h_dropout=class_h_dropout)

    # -- checkpointing ------------------------------------------------------

    @classmethod
    def load(cls, path):
        """Module.load plus stacked-layout tolerance: a checkpoint
        trained through parallel/pipeline.py::PipelinedDecoder stores
        the blocks STACKED (leading n_blocks axis) rather than as the
        per-block list — both layouts run through the same backbone."""
        from ..train.checkpoint import load_checkpoint
        name, hparams, restore, _ = load_checkpoint(path)
        if name != cls.__name__:
            raise ValueError(f"checkpoint is for {name}, not {cls.__name__}")
        model = cls(**hparams)
        tpl_params, tpl_state = model.init(0)
        try:
            params, state = restore((tpl_params, tpl_state))
        except (KeyError, ValueError):
            params, state = restore((cls.stack_blocks(tpl_params),
                                     tpl_state))
        return model, params, state

    # -- init -------------------------------------------------------------

    def init(self, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        ks = iter(jax.random.split(key, 4 + 6 * self.n_blocks))
        d = self.d_model
        proj_std = 0.02 / math.sqrt(2 * self.n_blocks)

        blocks = []
        for _ in range(self.n_blocks):
            ca_w, ca_b = gpt2_linear(next(ks), d, 3 * d)
            cp_w, _ = gpt2_linear(next(ks), d, d, std=proj_std)
            fc_w, fc_b = gpt2_linear(next(ks), d, 4 * d)
            mp_w, _ = gpt2_linear(next(ks), 4 * d, d, std=proj_std)
            blocks.append({
                "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
                "attn": {"c_attn_w": ca_w, "c_attn_b": ca_b,
                         "c_proj_w": cp_w, "c_proj_b": jnp.zeros((d,))},
                "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
                "mlp": {"c_fc_w": fc_w, "c_fc_b": fc_b,
                        "c_proj_w": mp_w, "c_proj_b": jnp.zeros((d,))},
            })

        lm_w, _ = gpt2_linear(next(ks), d, self.n_classes)
        l1_w, _ = gpt2_linear(next(ks), d, 1)
        l2_w, _ = gpt2_linear(next(ks), self.seq_len, 2)
        params = {
            "tok_emb": gpt2_embedding(next(ks), self.n_classes, d),
            "blocks": blocks,
            "ln_f_scale": jnp.ones((d,)), "ln_f_bias": jnp.zeros((d,)),
            "lm_head_w": lm_w,
            "class_head": {"l1_w": l1_w, "l2_w": l2_w},
        }
        if self.class_h_bias:
            params["class_head"]["l1_b"] = jnp.zeros((1,))
            params["class_head"]["l2_b"] = jnp.zeros((2,))
        return params, {}

    def decay_mask(self, params):
        """True where torch RAdam applies weight decay 0.1 (Linear
        weights only — reference transformer_decoder.py:72-107).
        lm_head/class_head weights are Linear weights => decay."""
        def mask_like(tree, fn):
            return jax.tree_util.tree_map_with_path(fn, tree)

        def is_decay(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            name = keys[-1] if keys else ""
            if name == "tok_emb":
                return False
            if name is None:
                return False
            return name.endswith("_w")

        return mask_like(params, is_decay)

    # -- forward ----------------------------------------------------------

    @staticmethod
    def stack_blocks(params):
        """Stack the per-block param list into one leading-axis pytree.

        The backbone then runs blocks under `lax.scan`, so XLA compiles
        ONE block body instead of n_blocks copies — a large compile-time
        win on TPU. Forward math is identical (tests); use for
        serving/bench or long-block models; the list layout stays the
        default for torch-checkpoint interop.
        """
        out = dict(params)
        out["blocks"] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *params["blocks"])
        return out

    def _acc_dtype(self):
        # exact-parity mode accumulates and CARRIES f32; bf16 mode keeps
        # activations (and so HBM traffic) in bf16 between ops
        return (jnp.float32 if self.compute_dtype is None
                else self.compute_dtype)

    def _block_body(self, x, blk, *, train, rng, layer_idx):
        sub = (jax.random.fold_in(rng, layer_idx)
               if rng is not None else None)
        r_att, r_mlp = (jax.random.split(sub) if sub is not None
                        else (None, None))
        acc = self._acc_dtype()
        h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"]).astype(acc)
        a = causal_self_attention(
            h, blk["attn"], n_head=self.n_head,
            attn_dropout_p=self.att_dropout,
            resid_dropout_p=self.res_dropout, train=train, rng=r_att,
            impl=self.attention_impl)
        x = x + a.astype(x.dtype)
        h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"]).astype(acc)
        m = blk["mlp"]
        h = new_gelu(jnp.dot(h, m["c_fc_w"],
                             preferred_element_type=acc) + m["c_fc_b"])
        h = jnp.dot(h, m["c_proj_w"],
                    preferred_element_type=acc) + m["c_proj_b"]
        return x + dropout(r_mlp, h, self.res_dropout, train).astype(x.dtype)

    def embed(self, params, x_ids):
        """Token embedding + positional encoding + the compute-dtype
        policy cast. Returns (params, x) with both cast. Shared by
        backbone() and the pipelined backbone (parallel/pipeline.py) so
        the two paths cannot drift."""
        t = x_ids.shape[1]
        x = jnp.take(params["tok_emb"], x_ids, axis=0) + self.pe[None, :t]
        if self.compute_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(self.compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            x = x.astype(self.compute_dtype)
        return params, x

    def heads(self, params, x, *, generate: bool = True):
        """Dual output heads (reference transformer_decoder.py:150-171)
        over post-ln_f activations — shared by apply() and
        parallel/pipeline.py::pipeline_apply."""
        if generate:
            return jnp.dot(x, params["lm_head_w"],
                           preferred_element_type=jnp.float32)
        ch = params["class_head"]
        h = jnp.dot(x, ch["l1_w"], preferred_element_type=jnp.float32)
        if self.class_h_bias:
            h = h + ch["l1_b"]
        h = gelu(h.squeeze(-1))                # (B, T)
        logits = jnp.dot(h, ch["l2_w"], preferred_element_type=jnp.float32)
        if self.class_h_bias:
            logits = logits + ch["l2_b"]
        return logits

    def backbone(self, params, x_ids, *, train=False, rng=None):
        params, x = self.embed(params, x_ids)
        blocks = params["blocks"]
        if isinstance(blocks, list):
            for i, blk in enumerate(blocks):
                x = self._block_body(x, blk, train=train, rng=rng,
                                     layer_idx=i)
        else:  # stacked layout (see stack_blocks): scan over layers
            def body(x, scanned):
                blk, idx = scanned
                return self._block_body(x, blk, train=train, rng=rng,
                                        layer_idx=idx), None

            x, _ = jax.lax.scan(body, x,
                                (blocks, jnp.arange(self.n_blocks)))
        return layer_norm(x, params["ln_f_scale"], params["ln_f_bias"])

    def apply(self, params, state, x_ids, *, train=False, rng=None,
              generate: bool = True):
        x = self.backbone(params, x_ids, train=train, rng=rng)
        return self.heads(params, x, generate=generate), state

    # -- losses (reference :226-230) --------------------------------------

    @staticmethod
    def loss_gen(logits, labels):
        """Token-level CE with ignore_index=-1."""
        v = logits.shape[-1]
        flat_logits = logits.reshape(-1, v)
        flat_labels = labels.reshape(-1)
        valid = flat_labels != -1
        safe = jnp.where(valid, flat_labels, 0)
        logp = jax.nn.log_softmax(flat_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)

    @staticmethod
    def loss_class(logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    # -- autoregressive sampling (reference :203-224) ----------------------

    @staticmethod
    def _sample_from_logits(last, key, do_sample, top_k):
        """Top-k filter + categorical/argmax (reference :211-222)."""
        if top_k is not None:
            kth = jnp.sort(last, axis=-1)[:, -top_k][:, None]
            last = jnp.where(last < kth, -jnp.inf, last)
        if do_sample:
            return jax.random.categorical(key, last, axis=-1)
        return jnp.argmax(last, axis=-1)

    def _recompute_scan(self, params, buf, cur0: int, keys, *, total: int,
                        do_sample: bool, top_k: int | None,
                        logits_fn=None):
        """Full-forward-per-step sampling over the buffer, starting at
        position cur0 — the reference's context-cropping loop
        (transformer_decoder.py:203-224). The context window is a
        seq_len-sized dynamic slice of the growing buffer; garbage tail
        positions are harmless because causal attention never lets them
        reach the query at the current length.

        logits_fn(window) overrides the forward (e.g. the int8 serving
        forward, models/quantized.py); defaults to the f32 apply."""
        b = buf.shape[0]
        if logits_fn is None:
            def logits_fn(window):
                return self.apply(params, None, window, train=False)[0]

        def step(carry, key):
            buf, cur = carry
            start = jnp.maximum(0, cur - self.seq_len)
            window = jax.lax.dynamic_slice(
                buf, (0, start), (b, min(self.seq_len, total)))
            logits = logits_fn(window)
            pos = jnp.minimum(cur, self.seq_len) - 1
            last = jax.lax.dynamic_slice(
                logits, (0, pos, 0), (b, 1, logits.shape[-1]))[:, 0]
            nxt = self._sample_from_logits(last, key, do_sample, top_k)
            buf = jax.lax.dynamic_update_slice(
                buf, nxt[:, None].astype(buf.dtype), (0, cur))
            return (buf, cur + 1), None

        (buf, _), _ = jax.lax.scan(step, (buf, jnp.asarray(cur0)), keys)
        return buf

    def generate(self, params, x_ids, *, do_sample: bool = False,
                 top_k: int | None = None, rng=None, num_steps: int | None = None):
        """Append `num_steps` (default seq_len) sampled tokens."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        steps = self.seq_len if num_steps is None else num_steps
        b, t0 = x_ids.shape
        buf = jnp.concatenate(
            [x_ids, jnp.zeros((b, steps), x_ids.dtype)], axis=1)
        return self._recompute_scan(
            params, buf, t0, jax.random.split(rng, steps),
            total=t0 + steps, do_sample=do_sample, top_k=top_k)

    # -- KV-cached sampling (O(T^2) total vs the reference's O(T^3)) -------

    def _attn_cached(self, blk, x_tok, k_cache, v_cache, pos,
                     attn_len=None):
        """One-token attention against a (B, H, T, D) cache; writes the
        new k/v at `pos` and attends to positions <= pos.

        attn_len (static) restricts the score/PV reads to the cache
        prefix [:attn_len] — callers guarantee pos < attn_len, so the
        masked tail that XLA would otherwise stream from HBM each step
        is simply never read (generate_kv cache_buckets)."""
        p = blk["attn"]
        # weights may be stored bf16 (generate_kv param_dtype): the
        # one-row activation is cast to the weight dtype so the MXU
        # runs a homogeneous bf16 dot; accumulation stays f32
        qkv = jnp.dot(x_tok.astype(p["c_attn_w"].dtype), p["c_attn_w"],
                      preferred_element_type=jnp.float32) + p["c_attn_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)         # (B, 1, C)
        q, k, v = (split_heads(t, self.n_head) for t in (q, k, v))
        # caches may be stored bf16 (generate_kv cache_dtype): K/V round
        # to the cache dtype at write; scores/PV accumulate f32
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, 0, pos, 0))
        d = q.shape[-1]
        k_r = k_cache if attn_len is None else k_cache[:, :, :attn_len]
        v_r = v_cache if attn_len is None else v_cache[:, :, :attn_len]
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k_r,
                         preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(d, jnp.float32))
        valid = jnp.arange(k_r.shape[2])[None, None, None, :] <= pos
        att = jnp.where(valid, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v_r,
                       preferred_element_type=jnp.float32)
        y = merge_heads(y)
        y = jnp.dot(y.astype(p["c_proj_w"].dtype), p["c_proj_w"],
                    preferred_element_type=jnp.float32) + p["c_proj_b"]
        return y, k_cache, v_cache

    def _token_step_fused(self, params, tok, pos, caches):
        """_token_step with every block as ONE Pallas kernel
        (ops/pallas_decode.fused_block_decode): caches stay in HBM, the
        kernel DMAs only the valid prefix and writes back one row.
        Caches here are (B, T, C) time-major (see the kernel docstring).
        Same math; logits agree to fp tolerance."""
        from ..ops.pallas_decode import fused_block_decode
        x = jnp.take(params["tok_emb"], tok, axis=0)[:, None, :] \
            + jnp.take(self.pe, pos, axis=0)[None, None, :]
        new_caches = []
        for blk, (k_c, v_c) in zip(params["blocks"], caches):
            x, k_c, v_c = fused_block_decode(x, blk, k_c, v_c, pos,
                                             n_head=self.n_head)
            new_caches.append((k_c, v_c))
        x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"])
        logits = jnp.dot(x[:, 0], params["lm_head_w"],
                         preferred_element_type=jnp.float32)
        return logits, new_caches

    def _token_step(self, params, tok, pos, caches, attn_len=None):
        """Embed one token at absolute position `pos` and run all
        blocks against the KV caches. Returns (logits_row, new_caches)."""
        x = jnp.take(params["tok_emb"], tok, axis=0)[:, None, :] \
            + jnp.take(self.pe, pos, axis=0)[None, None, :]
        new_caches = []
        for blk, (k_c, v_c) in zip(params["blocks"], caches):
            h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
            a, k_c, v_c = self._attn_cached(blk, h, k_c, v_c, pos,
                                            attn_len=attn_len)
            x = x + a
            h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
            m = blk["mlp"]
            h = new_gelu(jnp.dot(h.astype(m["c_fc_w"].dtype), m["c_fc_w"],
                                 preferred_element_type=jnp.float32)
                         + m["c_fc_b"])
            x = x + jnp.dot(h.astype(m["c_proj_w"].dtype), m["c_proj_w"],
                            preferred_element_type=jnp.float32) + m["c_proj_b"]
            new_caches.append((k_c, v_c))
        x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"])
        logits = jnp.dot(x[:, 0].astype(params["lm_head_w"].dtype),
                         params["lm_head_w"],
                         preferred_element_type=jnp.float32)
        return logits, new_caches

    def _prefill(self, params, x_ids, caches):
        """One batched forward over the whole prompt, writing every
        block's K/V into the caches at positions [0, t0). Returns
        (last-position logits, caches). Same f32 math as _token_step."""
        b, t0 = x_ids.shape
        x = jnp.take(params["tok_emb"], x_ids, axis=0) + self.pe[None, :t0]
        new_caches = []
        for blk, (k_c, v_c) in zip(params["blocks"], caches):
            h = layer_norm(x, blk["ln1_scale"], blk["ln1_bias"])
            p = blk["attn"]
            qkv = jnp.dot(h, p["c_attn_w"],
                          preferred_element_type=jnp.float32) + p["c_attn_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (split_heads(t, self.n_head) for t in (q, k, v))
            k_c = jax.lax.dynamic_update_slice(
                k_c, k.astype(k_c.dtype), (0, 0, 0, 0))
            v_c = jax.lax.dynamic_update_slice(
                v_c, v.astype(v_c.dtype), (0, 0, 0, 0))
            y = merge_heads(causal_attention_core(q, k, v))
            y = jnp.dot(y, p["c_proj_w"],
                        preferred_element_type=jnp.float32) + p["c_proj_b"]
            x = x + y
            h = layer_norm(x, blk["ln2_scale"], blk["ln2_bias"])
            m = blk["mlp"]
            h = new_gelu(jnp.dot(h, m["c_fc_w"],
                                 preferred_element_type=jnp.float32)
                         + m["c_fc_b"])
            x = x + jnp.dot(h, m["c_proj_w"],
                            preferred_element_type=jnp.float32) + m["c_proj_b"]
            new_caches.append((k_c, v_c))
        x = layer_norm(x, params["ln_f_scale"], params["ln_f_bias"])
        logits = jnp.dot(x[:, -1], params["lm_head_w"],
                         preferred_element_type=jnp.float32)
        return logits, new_caches

    def generate_kv(self, params, x_ids, *, do_sample: bool = False,
                    top_k: int | None = None, rng=None,
                    num_steps: int | None = None,
                    decode_impl: str = "xla", cache_dtype=None,
                    param_dtype=None, cache_buckets: int | None = None,
                    scan_unroll: int = 1):
        """KV-cached autoregressive sampling; same output contract as
        `generate` for any prompt length and step count.

        The prompt is prefilled in ONE batched forward (not
        token-by-token). Steps whose context still fits in seq_len run
        on the KV cache (O(T) per step); once the reference's context
        cropping would kick in (current length > seq_len,
        transformer_decoder.py:203-224) the remaining steps fall back to
        the full-window recompute, which is the only way to match the
        cropped positional embeddings exactly.

        decode_impl: 'xla' (default, exact reference-equal f32 chain)
        or 'fused' (one Pallas kernel per block per token,
        ops/pallas_decode.fused_block_decode — same math, logits to fp
        tolerance, so sampled ids can differ at probability ties;
        measured 2.5x SLOWER than the XLA step at the bench config —
        BENCHMARKS.md — kept as a tested reference).

        cache_dtype: storage dtype for the K/V caches (e.g.
        jnp.bfloat16 halves cache HBM traffic; scores still accumulate
        f32, so logits drift by bf16 rounding of cached K/V — sampled
        ids can differ near probability ties). None = f32 (exact).

        param_dtype: streaming dtype for the decode-step WEIGHT
        matrices (e.g. jnp.bfloat16). Single-token decode reads every
        weight matrix from HBM each step (~101 MB f32 at d512/8b —
        the dominant term of the decode floor, BENCHMARKS.md round 5);
        bf16 storage halves that traffic. Weights are cast ONCE before
        the scan; matmuls run bf16xbf16 with f32 accumulation. The
        prefill forward and the context-cropping recompute tail keep
        exact f32 weights. None = f32 (exact). XLA impl only.

        cache_buckets: segment the decode scan so a step whose context
        fits in the first G, 2G, ... cache positions reads only that
        static prefix instead of streaming the whole (B, H, T, D)
        cache from HBM every step (~32% of the per-step cache traffic
        at the bench config with G=128 is masked-tail reads). Segment
        boundaries are Python ints (prompt length and step count are
        static), so each segment is its own lax.scan over a
        statically-sliced cache — no dynamic shapes. Every step's
        masked softmax sees exactly the same valid entries (tail
        entries are -inf -> exact zeros), but the smaller einsum's
        reduction ORDER can differ at the ulp level: greedy decoding
        matches the unsegmented path exactly in tests, while sampled
        ids near probability ties can flip (~0.1% measured at the
        bench scale — BENCHMARKS.md round 5). None = one scan over
        the full cache. XLA impl only.

        scan_unroll: unroll factor for the decode lax.scan (the
        scan-body equivalent of multi-token stepping: XLA sees
        `scan_unroll` sequential token steps in one loop body and can
        pipeline/fuse across them). Identical math and ids — the body
        is replicated, not reordered. XLA impl only.
        """
        if param_dtype is not None and decode_impl != "xla":
            raise ValueError("param_dtype requires decode_impl='xla'")
        if scan_unroll != 1 and decode_impl != "xla":
            raise ValueError("scan_unroll requires decode_impl='xla'")
        if cache_buckets is not None and decode_impl != "xla":
            raise ValueError("cache_buckets requires decode_impl='xla'")
        if cache_dtype is not None and decode_impl != "xla":
            # fused_block_decode DMAs the HBM cache into f32 VMEM
            # scratch; a bf16 cache would die with a cryptic Mosaic
            # dtype error instead of this message
            raise ValueError("cache_dtype requires decode_impl='xla'")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        steps = self.seq_len if num_steps is None else num_steps
        b, t0 = x_ids.shape
        total = t0 + steps
        keys = jax.random.split(rng, steps)
        buf = jnp.concatenate(
            [x_ids, jnp.zeros((b, steps), x_ids.dtype)], axis=1)
        # a step appending at position `cur` can use the cache only while
        # the uncropped context [0, cur) fits: cur <= seq_len
        n_kv = max(0, min(steps, self.seq_len - t0 + 1))
        if n_kv == 0:  # prompt already longer than the context window
            return self._recompute_scan(params, buf, t0, keys, total=total,
                                        do_sample=do_sample, top_k=top_k)

        cache_len = self.seq_len
        if decode_impl == "fused":
            from ..ops.pallas_decode import DECODE_CHUNK
            cache_len = -(-self.seq_len // DECODE_CHUNK) * DECODE_CHUNK
        hd = self.d_model // self.n_head
        cd = jnp.float32 if cache_dtype is None else cache_dtype
        caches = [(jnp.zeros((b, self.n_head, cache_len, hd), cd),
                   jnp.zeros((b, self.n_head, cache_len, hd), cd))
                  for _ in params["blocks"]]
        logits, caches = self._prefill(params, x_ids, caches)
        if decode_impl == "fused":
            # fused kernel cache layout: (B, T, C) time-major (one-time
            # relayout after prefill; see fused_block_decode docstring)
            caches = [
                (k.transpose(0, 2, 1, 3).reshape(b, cache_len, self.d_model),
                 v.transpose(0, 2, 1, 3).reshape(b, cache_len, self.d_model))
                for k, v in caches]

        flat = []
        for k_c, v_c in caches:
            flat.extend([k_c, v_c])

        token_step = (self._token_step_fused if decode_impl == "fused"
                      else self._token_step)

        step_params = params
        if param_dtype is not None:
            def _cast_block(bp):
                return dict(
                    bp,
                    attn=dict(bp["attn"],
                              c_attn_w=bp["attn"]["c_attn_w"]
                              .astype(param_dtype),
                              c_proj_w=bp["attn"]["c_proj_w"]
                              .astype(param_dtype)),
                    mlp=dict(bp["mlp"],
                             c_fc_w=bp["mlp"]["c_fc_w"].astype(param_dtype),
                             c_proj_w=bp["mlp"]["c_proj_w"]
                             .astype(param_dtype)))
            step_params = dict(
                params,
                blocks=[_cast_block(bp) for bp in params["blocks"]],
                lm_head_w=params["lm_head_w"].astype(param_dtype))

        def make_step(attn_len):
            def step(carry, key):
                buf, cur, logits, *flat_caches = carry
                caches = [(flat_caches[2 * i], flat_caches[2 * i + 1])
                          for i in range(self.n_blocks)]
                nxt = self._sample_from_logits(logits, key, do_sample, top_k)
                buf = jax.lax.dynamic_update_slice(
                    buf, nxt[:, None].astype(buf.dtype), (0, cur))
                # logits for the appended token (the clamp only ever
                # fires on the final KV step, whose logits are never
                # consumed)
                kw = ({"attn_len": attn_len}
                      if decode_impl == "xla" else {})
                new_logits, caches = token_step(
                    step_params, nxt.astype(jnp.int32),
                    jnp.minimum(cur, cache_len - 1), caches, **kw)
                flat2 = []
                for k_c, v_c in caches:
                    flat2.extend([k_c, v_c])
                return (buf, cur + 1, new_logits, *flat2), None
            return step

        carry = (buf, jnp.asarray(t0), logits, *flat)
        if cache_buckets:
            bounds = list(range(cache_buckets, cache_len, cache_buckets))
        else:
            bounds = []
        done = 0
        for bound in bounds:
            # segment handles scan steps i (write pos t0+i) with
            # t0 + i + 1 <= bound
            hi = min(n_kv, bound - t0)
            if hi <= done:
                continue
            carry, _ = jax.lax.scan(make_step(bound), carry,
                                    keys[done:hi], unroll=scan_unroll)
            done = hi
        if done < n_kv:  # final segment: full cache (None = no slice)
            carry, _ = jax.lax.scan(make_step(None), carry,
                                    keys[done:n_kv], unroll=scan_unroll)
        buf = carry[0]
        if steps > n_kv:  # context-cropping tail, reference semantics
            buf = self._recompute_scan(params, buf, t0 + n_kv, keys[n_kv:],
                                       total=total, do_sample=do_sample,
                                       top_k=top_k)
        return buf
