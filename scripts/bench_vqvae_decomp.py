"""Decompose the VQ-VAE training step's time at the reference config.

VERDICT r4 #4: VQ-VAE training measured 43.5 TFLOPS effective (~41% of
the fenced 105 TFLOPS f32 roof) while the serving-side fused encoder
kernel proves ~97% on the same math. Before building a train-mode
kernel, measure WHERE the rest goes: forward vs backward vs
dropout-RNG vs optimizer.

MEASUREMENT METHODOLOGY (load-bearing on this tunneled backend; every
deviation was caught producing impossible numbers, up to 10,597
"TFLOPS" f32):
  1. the tunnel caches (executable, inputs) -> result server-side, so
     every TIMED call must carry an input the server has never seen;
  2. `block_until_ready` does not reliably fence — only a host read of
     a value data-dependent on the full computation does;
  3. per-sync RTT is ~30-45 ms, so N chained repetitions run inside
     ONE jitted lax.scan and two trip counts are differenced:
     per_step = (wall(n_hi) - wall(n_lo)) / (n_hi - n_lo).
Validation: chained-matmul roofs measured this way land at 110.6
TFLOPS f32 / 186.9 bf16 (4096^3) — physical v5e-class numbers,
consistent with BENCHMARKS.md's fenced roofs.

Usage: python scripts/bench_vqvae_decomp.py [--n1 4 --n2 20] [--batch 1024]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vq_vae_transformer_arc_welding_tpu.models import VQVAEPatch
from vq_vae_transformer_arc_welding_tpu.train.optim import make_radam

_rng = np.random.default_rng(12345)


def _host_fence(tree):
    """Force real completion: host-read a scalar depending on the output."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def per_step_time(name, make_run, fresh_x, n1, n2, repeats=3):
    """Δwall/Δsteps between two trip counts, fresh x per timed call."""
    r1, r2 = make_run(n1), make_run(n2)
    t0 = time.perf_counter()
    w = fresh_x()
    _host_fence(r1(w)), _host_fence(r2(w))  # compile+warm
    print(f"  [{name}] compiled in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    def timed(r):
        x = fresh_x()
        _host_fence(x)  # upload complete before the clock starts
        t0 = time.perf_counter()
        _host_fence(r(x))
        return time.perf_counter() - t0

    t1 = min(timed(r1) for _ in range(repeats))
    t2 = min(timed(r2) for _ in range(repeats))
    per = (t2 - t1) / (n2 - n1)
    print(f"  [{name}] t1={t1:.3f}s t2={t2:.3f}s -> {per*1e3:.2f} ms/step",
          file=sys.stderr, flush=True)
    return per


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--variants", default="all",
                    help="comma list of variants to measure (tunnel "
                         "flaps kill long runs; retries can resume "
                         "with just the missing ones)")
    a = ap.parse_args()

    want = (None if a.variants == "all"
            else set(a.variants.split(",")))

    def _want(name):
        return want is None or name in want

    B = a.batch
    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)

    def build(p_drop, conv_impl="lax"):
        m = VQVAEPatch(hidden_dim=512, input_dim=2, num_embeddings=256,
                       embedding_dim=32, n_resblocks=8, learning_rate=1e-3,
                       dropout_p=p_drop, batch_norm=False,
                       conv_impl=conv_impl)
        params, state = m.init(0)
        return m, params, state

    model, params, state = build(a.dropout)
    tx = make_radam(1e-3, clip_norm=0.7)
    opt_state = tx.init(params)

    def fresh_x():
        return jnp.asarray(
            _rng.standard_normal((B, 200, 2)).astype(np.float32))

    results = {}

    # 1. full training step (loss+grad+RAdam), params chained in-graph —
    #    the Trainer's epoch scan body without the batch gather
    def full_scan(mdl, p0, s0, o0, rng_impl=None):
        def make(n):
            @jax.jit
            def run(x):
                def step(carry, i):
                    p, s, o = carry
                    base = (jax.random.PRNGKey(1) if rng_impl is None
                            else jax.random.key(1, impl=rng_impl))
                    rng = jax.random.fold_in(base, i)
                    (_, (_, ns)), g = jax.value_and_grad(
                        mdl.loss_fn, has_aux=True)(p, s, x, train=True,
                                                   rng=rng)
                    up, o = tx.update(g, o, p)
                    p = jax.tree_util.tree_map(lambda a_, b_: a_ + b_, p, up)
                    return (p, ns, o), ()
                carry, _ = jax.lax.scan(step, (p0, s0, o0), jnp.arange(n))
                return carry[0]
            return run
        return make

    if _want("full_step"):
        results["full_step"] = per_step_time(
            "full_step", full_scan(model, params, state, opt_state),
            fresh_x, a.n1, a.n2)

    # 2. grad only (no optimizer update) — isolates the RAdam/clip cost
    def grad_scan(n):
        @jax.jit
        def run(x):
            def step(carry, i):
                p, s = carry
                rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
                (_, (_, ns)), g = jax.value_and_grad(
                    model.loss_fn, has_aux=True)(p, s, x, train=True,
                                                 rng=rng)
                p = jax.tree_util.tree_map(
                    lambda a_, g_: a_ + 1e-12 * g_, p, g)
                return (p, ns), ()
            carry, _ = jax.lax.scan(step, (params, state), jnp.arange(n))
            return carry[0]
        return run

    if _want("grad_only"):
        results["grad_only"] = per_step_time("grad_only", grad_scan,
                                             fresh_x, a.n1, a.n2)

    # 3. forward only (train mode, dropout active), x chained via loss
    def fwd_scan(train):
        def make(n):
            @jax.jit
            def run(x):
                def step(xx, i):
                    rng = jax.random.fold_in(jax.random.PRNGKey(1), i)
                    loss, _ = model.loss_fn(params, state, xx, train=train,
                                            rng=rng)
                    return xx + 1e-9 * loss, ()
                xx, _ = jax.lax.scan(step, x, jnp.arange(n))
                return xx
            return run
        return make

    if _want("fwd_train"):
        results["fwd_train"] = per_step_time("fwd_train", fwd_scan(True),
                                             fresh_x, a.n1, a.n2)
    if _want("fwd_eval"):
        results["fwd_eval"] = per_step_time("fwd_eval", fwd_scan(False),
                                            fresh_x, a.n1, a.n2)

    # 4. full step without dropout (p=0: XLA drops mask gen + apply)
    if _want("full_step_nodrop"):
        model0, params0, state0 = build(0.0)
        results["full_step_nodrop"] = per_step_time(
            "full_step_nodrop",
            full_scan(model0, params0, state0, tx.init(params0)), fresh_x,
            a.n1, a.n2)

    # 5. full step with the im2col decoder-conv lowering (the measured
    #    optimization attempt — ops/conv.py::conv1d_same_im2col)
    if _want("full_step_im2col"):
        model_i, params_i, state_i = build(a.dropout, conv_impl="im2col")
        results["full_step_im2col"] = per_step_time(
            "full_step_im2col",
            full_scan(model_i, params_i, state_i, tx.init(params_i)),
            fresh_x, a.n1, a.n2)

    # 6. full step with dropout masks on the TPU hardware RNG (rbg) —
    #    the measured lever behind Trainer(dropout_prng="rbg"): threefry
    #    mask generation is ~1/3 of the step and is regenerated in the
    #    backward
    if _want("full_step_rbg"):
        results["full_step_rbg"] = per_step_time(
            "full_step_rbg",
            full_scan(model, params, state, opt_state, rng_impl="rbg"),
            fresh_x, a.n1, a.n2)

    # FLOP counts (XLA cost analysis of one step body)
    def one_full(p, s, o, x):
        rng = jax.random.PRNGKey(1)
        (_, (_, ns)), g = jax.value_and_grad(
            model.loss_fn, has_aux=True)(p, s, x, train=True, rng=rng)
        up, o = tx.update(g, o, p)
        return jax.tree_util.tree_map(lambda a_, b_: a_ + b_, p, up), ns, o

    x0 = fresh_x()
    fl_full = flops_of(one_full, params, state, opt_state, x0)
    fl_fwd = flops_of(
        lambda p, s, x: model.loss_fn(p, s, x, train=True,
                                      rng=jax.random.PRNGKey(1)),
        params, state, x0)

    r = results  # partial-variant runs only emit what they measured

    def _diff(a_, b_):
        return (r[a_] - r[b_]) * 1e3 if a_ in r and b_ in r else None

    out = {
        "batch": B,
        "ms": {k: v * 1e3 for k, v in r.items()},
        "flops_full_step": fl_full,
        "flops_fwd": fl_fwd,
        "derived_ms": {
            "optimizer": _diff("full_step", "grad_only"),
            "backward": _diff("grad_only", "fwd_train"),
            "dropout_total": _diff("full_step", "full_step_nodrop"),
            "train_vs_eval_fwd": _diff("fwd_train", "fwd_eval"),
        },
    }
    if "full_step" in r:
        out["windows_per_s_full_step"] = B / r["full_step"]
        out["tflops_eff_full_step"] = fl_full / r["full_step"] / 1e12
    if "fwd_train" in r:
        out["tflops_eff_fwd"] = fl_fwd / r["fwd_train"] / 1e12
    if "full_step" in r and "full_step_im2col" in r:
        out["im2col_speedup"] = r["full_step"] / r["full_step_im2col"]
    if "full_step_rbg" in r:
        out["windows_per_s_rbg"] = B / r["full_step_rbg"]
        if "full_step" in r:
            out["rbg_speedup"] = r["full_step"] / r["full_step_rbg"]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
