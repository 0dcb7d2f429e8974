"""North-star benchmark: welding windows/sec through the fused
encode + VQ + transformer-classify pipeline on TPU (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N}

vs_baseline compares against the reference architecture executed with
torch on the CPU of this host (the reference's GPU is not available
here; the reference publishes no numbers of its own — BASELINE.md). A
window = n_cycles(=20) welding cycles = 4000 samples x 2 channels,
classified end-to-end: patch-embed -> conv encoder -> codebook
nearest-neighbor -> 321-token causal transformer -> quality logits.

Model config matches the benchmark config set: VQ-VAE hidden 512,
K=256, D=32, 8 resblocks, patch 25; transformer d512, 8 blocks,
8 heads (BASELINE.json configs).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

# persistent compile cache: repeated driver runs skip the (slow, remote)
# TPU compile when the graph is unchanged
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp

BATCH = 80  # fused-qkv kernel sweet spot on v5e (48-80 flat, 88+ drops)
N_CYCLES = 20
CYCLE_LEN = 200
WARMUP = 3
ITERS = 10
GROUPS = 6  # report the best timing group: the tunneled TPU is shared,
#             and per-group contention variance is ~20% (measured)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tpu_windows_per_sec(batch=BATCH, iters=ITERS, groups=GROUPS):
    import __graft_entry__ as g
    # serving precision: VQ encode stays f32 through the fused Pallas
    # resblock kernel (ops/pallas_encoder.py — 0 index flips in
    # interpret mode, 0.25% erf-ulp flips on TPU, 100% label
    # agreement); the transformer runs calibrated int8 on the MXU with
    # whole-block Pallas fusion (ln1+qkv+attention+proj+residual+ln2+
    # quant per kernel) — 100% label agreement, <5e-3 logit drift vs
    # f32 (models/quantized.py, ops/pallas_block_quant.py;
    # calibration happens here on samples)
    from vq_vae_transformer_arc_welding_tpu.models.quantized import (
        calibrate_activation_absmax, quantize_transformer)
    vq, tr, vq_params, vq_state, tr_params = g._build()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)

    calib_ids = jax.jit(lambda xx: vq.encode_indices(
        vq_params, vq_state, xx.reshape(-1, CYCLE_LEN, 2)))(x[:8])
    calib_ids = calib_ids.reshape(8, -1)
    calib_ids = jnp.concatenate(
        [jnp.full((8, 1), vq.num_embeddings, calib_ids.dtype), calib_ids],
        axis=1)
    am = calibrate_activation_absmax(tr, tr_params, calib_ids)
    qparams = quantize_transformer(tr_params, act_absmax=am)

    fn = jax.jit(g.make_pipeline_quantized(vq, tr, qparams))
    args = (vq_params, vq_state, x)

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    log(f"compile+first: {time.perf_counter() - t0:.1f}s on "
        f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}")

    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    wps = _timed_groups(lambda xx: fn(vq_params, vq_state, xx), x,
                        batch, iters, groups)
    log(f"best of {groups} groups: {wps:.1f} windows/s")
    return wps


def _timed_groups(run1, x, batch, iters, groups):
    """Cache-proof, serialization-proof timing of `run1(x)`.

    Round-5 finding (BENCHMARKS.md round 9): the tunneled TPU caches
    (executable, inputs) -> result server-side and does not reliably
    fence `jax.block_until_ready`, so repeat-timing IDENTICAL calls can
    report arbitrarily inflated throughput (measured up to 10,597
    "TFLOPS" on chained matmuls). Three rules, each load-bearing:
      1. every timed call gets input content the server has never seen;
      2. call i+1's input data-depends on call i's output, forcing
         serial execution (a shared pool parallelizes independent
         dispatches);
      3. the clock stops on a HOST READ of a value that depends on the
         final output, not on block_until_ready.
    On an honestly-fenced runtime this measures the same thing as the
    r1-r4 identical-args loop: the chain adds one eager elementwise
    add per iter (~2.5 MB traffic, well under 0.1% of a pipeline
    call), so numbers stay comparable across rounds."""
    rng = np.random.default_rng(20260820)
    best = float("inf")
    for _ in range(groups):
        fresh = [jnp.asarray(rng.standard_normal(x.shape).astype(x.dtype))
                 for _ in range(iters)]
        # fence the uploads out of the timed section (host read)
        float(jnp.sum(jnp.stack([jnp.sum(f) for f in fresh])))
        out = None
        t0 = time.perf_counter()
        for i in range(iters):
            xi = fresh[i]
            if out is not None:
                leaf = jax.tree_util.tree_leaves(out)[0]
                xi = xi + (1e-5 * jnp.tanh(
                    jnp.sum(leaf.astype(jnp.float32)))).astype(xi.dtype)
            out = run1(xi)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))  # host-read fence
        dt = time.perf_counter() - t0
        log(f"tpu: {iters} iters x {batch} windows in {dt:.3f}s "
            f"-> {batch * iters / dt:.1f} windows/s")
        best = min(best, dt)
    return batch * iters / best


def torch_cpu_baseline(batch=16, iters=2, groups=3):
    """Reference-architecture pipeline with torch on host CPU.

    Methodology (pinned, VERDICT r3 weak #6): fixed batch/iters, best
    of `groups` timing groups — min-of-groups discards contended
    groups the same way the TPU arm does, instead of publishing one
    2-iter sample whose denominator swings 2x with background host
    load.
    """
    try:
        import torch
        from torch import nn
    except ImportError:
        return None
    torch.set_num_threads(max(1, torch.get_num_threads()))

    h, k, d, n_res, patch = 512, 256, 32, 8, 25
    d_model, n_blocks, n_heads = 512, 8, 8
    seq_len = N_CYCLES * 16 + 1

    class Res(nn.Module):
        def __init__(self):
            super().__init__()
            self.b = nn.Sequential(nn.GELU(), nn.Conv1d(h, h, 3, 1, 1),
                                   nn.GELU(), nn.Conv1d(h, h, 3, 1, 1))

        def forward(self, x):
            return x + self.b(x)

    patch_conv = nn.Conv1d(1, h, patch, patch)
    enc_blocks = nn.Sequential(*[Res() for _ in range(n_res)])
    sep = nn.Conv1d(h, d, 1)
    codebook = torch.randn(k, d)
    tok_emb = nn.Embedding(k + 2, d_model)
    blocks = nn.ModuleList()
    for _ in range(n_blocks):
        blk = nn.ModuleDict(dict(
            ln1=nn.LayerNorm(d_model), attn=nn.Linear(d_model, 3 * d_model),
            proj=nn.Linear(d_model, d_model), ln2=nn.LayerNorm(d_model),
            fc=nn.Linear(d_model, 4 * d_model),
            fproj=nn.Linear(4 * d_model, d_model)))
        blocks.append(blk)
    ln_f = nn.LayerNorm(d_model)
    l1 = nn.Linear(d_model, 1, bias=False)
    l2 = nn.Linear(seq_len, 2, bias=False)
    mask = torch.tril(torch.ones(seq_len, seq_len)) == 0

    def forward(x):  # x (B, 4000, 2)
        b = x.shape[0]
        cyc = x.reshape(b * N_CYCLES, CYCLE_LEN, 2)
        flat = cyc.permute(0, 2, 1).reshape(cyc.shape[0], 1, -1)
        hpe = patch_conv(flat)                       # (B*n, h, 16)
        # reference per-position loop (vq_vae_patch_embedd.py:103-114)
        outs = [enc_blocks(hpe[:, :, i].unsqueeze(2)) for i in range(16)]
        henc = torch.cat(outs, dim=2)
        z = torch.cat([sep(henc[:, :, i].unsqueeze(2)) for i in range(16)],
                      dim=2).permute(0, 2, 1)        # (B*n, 16, d)
        zf = z.reshape(-1, d)
        dist = (zf ** 2).sum(1, keepdim=True) + (codebook ** 2).sum(1) \
            - 2 * zf @ codebook.t()
        ids = dist.argmin(1).reshape(b, -1)
        ids = torch.cat([torch.full((b, 1), k, dtype=torch.long), ids], 1)
        t = tok_emb(ids)
        for blk in blocks:
            hh = blk["ln1"](t)
            q, kk, v = blk["attn"](hh).split(d_model, dim=2)
            shp = (b, seq_len, n_heads, d_model // n_heads)
            q, kk, v = (z2.view(shp).transpose(1, 2) for z2 in (q, kk, v))
            att = (q @ kk.transpose(-2, -1)) / (d_model // n_heads) ** 0.5
            att = att.masked_fill(mask, float("-inf")).softmax(-1)
            t = t + blk["proj"]((att @ v).transpose(1, 2).reshape(
                b, seq_len, d_model))
            hh = blk["ln2"](t)
            t = t + blk["fproj"](torch.nn.functional.gelu(blk["fc"](hh),
                                                          approximate="tanh"))
        t = ln_f(t)
        return l2(torch.nn.functional.gelu(l1(t).squeeze(-1)))

    x = torch.randn(batch, N_CYCLES * CYCLE_LEN, 2)
    best = float("inf")
    with torch.no_grad():
        forward(x)  # warmup
        for _ in range(groups):
            t0 = time.perf_counter()
            for _ in range(iters):
                forward(x)
            best = min(best, time.perf_counter() - t0)
    wps = batch * iters / best
    log(f"torch-cpu baseline: best of {groups} x ({iters} x {batch} "
        f"windows) -> {wps:.1f} windows/s")
    return wps


_PINNED_BASELINE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "results", "torch_cpu_baseline_pinned.json")


def baseline_windows_per_sec():
    """The vs_baseline denominator.

    Prefers the PINNED calibration (results/torch_cpu_baseline_pinned
    .json, measured once at recorded host load with the best-of-groups
    methodology above; re-measure with `python bench.py --pin-baseline`
    whenever the baseline arm's code changes). The pin exists because
    the driver runs this bench at round end, when background study legs
    may be timesharing the single host CPU — a live denominator under
    load swings 2x between sessions (VERDICT r3 weak #6) while the TPU
    numerator doesn't. Falls back to a live measurement (load noted on
    stderr) when no pin exists.
    """
    if os.path.exists(_PINNED_BASELINE):
        with open(_PINNED_BASELINE) as f:
            pin = json.load(f)
        log(f"baseline: pinned {pin['windows_per_sec']:.2f} windows/s "
            f"(measured {pin['date']} at load1={pin['load1']})")
        return pin["windows_per_sec"], "pinned"
    load1 = os.getloadavg()[0]
    log(f"baseline: no pin — measuring live at load1={load1:.2f}")
    return torch_cpu_baseline(), "live"


def pin_baseline():
    load1 = os.getloadavg()[0]
    wps = torch_cpu_baseline(groups=4)
    os.makedirs(os.path.dirname(_PINNED_BASELINE), exist_ok=True)
    with open(_PINNED_BASELINE, "w") as f:
        json.dump({"windows_per_sec": round(wps, 3),
                   "load1": round(load1, 2),
                   "date": time.strftime("%Y-%m-%d"),
                   "methodology": "best of 4 groups x (2 iters x 16 "
                                  "windows), torch CPU, reference "
                                  "architecture pipeline"}, f, indent=2)
    print(f"pinned {wps:.3f} windows/s (load1={load1:.2f}) -> "
          f"{_PINNED_BASELINE}")


def _probe_backend(timeout_s: int = 300) -> bool:
    """True iff the default backend initializes within timeout_s AND is
    actually a TPU, probed in a SUBPROCESS: when the shared pool is
    unavailable the in-process init blocks ~30 min before raising
    (observed 2026-08-18), which would eat the whole bench window. The
    platform assert keeps a CPU-initialized JAX (no libtpu, or a leaked
    JAX_PLATFORMS=cpu) from publishing an unlabeled CPU number as the
    TPU headline — such hosts take the labeled cpu_fallback path."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform == 'tpu'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def cpu_fallback_windows_per_sec(batch=16, iters=3, groups=2):
    """Outage fallback: the exact-f32 XLA pipeline (the Pallas serving
    kernels would run in interpret mode on CPU — meaningless timing)."""
    import __graft_entry__ as g
    vq, tr, vq_params, vq_state, tr_params = g._build()
    fn = jax.jit(g.make_pipeline(vq, tr))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, N_CYCLES * CYCLE_LEN, 2)), jnp.float32)
    jax.block_until_ready(fn(vq_params, vq_state, tr_params, x))
    wps = _timed_groups(lambda xx: fn(vq_params, vq_state, tr_params, xx),
                        x, batch, iters, groups)
    log(f"cpu-fallback (f32 XLA pipeline): {wps:.1f} windows/s")
    return wps


def main():
    backend = "tpu"
    if not _probe_backend():
        # shared-pool outage: fall back to host CPU so the round still
        # records a (clearly labeled) number instead of a hang
        log("TPU tunnel unavailable — falling back to CPU (labeled)")
        jax.config.update("jax_platforms", "cpu")
        backend = "cpu_fallback"
    wps = (tpu_windows_per_sec() if backend == "tpu"
           else cpu_fallback_windows_per_sec())
    base, base_src = baseline_windows_per_sec()
    vs = (wps / base) if base else None
    out = {
        "metric": "windows_per_sec_encode_vq_transformer_classify",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "baseline_source": base_src,
    }
    if backend != "tpu":
        out["backend"] = backend
    print(json.dumps(out))


if __name__ == "__main__":
    if "--pin-baseline" in sys.argv:
        pin_baseline()
    else:
        main()
