"""Multi-chip scaling harness: DP(+TP) training step over 1/2/4/8
virtual devices.

Real ICI numbers need real chips (this image exposes one); what this
harness validates on the 8-virtual-CPU-device mesh is (a) the sharded
training step COMPILES AND RUNS at every mesh size, (b) the loss is
invariant to the mesh layout (the SPMD partitioning is semantics-
preserving), and (c) the per-step overhead trend as the mesh grows —
the partitioner/collective overhead you'd pay on top of ideal scaling.

Run: python bench_multichip.py [--global-batch 64] [--steps 8]
Prints one JSON line per mesh config plus a summary.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vq_vae_transformer_arc_welding_tpu.models import (  # noqa: E402
    TransformerDecoder, VQVAEPatch)
from vq_vae_transformer_arc_welding_tpu.parallel import (  # noqa: E402
    make_mesh, shard_params, transformer_tp_rules)
from vq_vae_transformer_arc_welding_tpu.parallel.mesh import (  # noqa: E402
    put_replicated)
from vq_vae_transformer_arc_welding_tpu.train.optim import (  # noqa: E402
    make_transformer_optimizer)

CYCLE_LEN = 200
N_CYCLES = 2


def build_models(seed=0):
    vq = VQVAEPatch(hidden_dim=32, input_dim=2, num_embeddings=16,
                    embedding_dim=8, n_resblocks=1, learning_rate=1e-3,
                    batch_norm=False)
    seq_len = N_CYCLES * vq.enc_out_len + 1
    tr = TransformerDecoder(d_model=128, n_classes=18, seq_len=seq_len,
                            n_blocks=4, n_head=4)
    vq_params, vq_state = vq.init(seed)
    tr_params, _ = tr.init(seed)
    return vq, tr, vq_params, vq_state, tr_params


def run_config(n_data: int, n_model: int, global_batch: int, steps: int,
               vq, tr, vq_params, vq_state, tr_params_host):
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[:n_data * n_model])
    vqp = put_replicated(vq_params, mesh)
    vqs = put_replicated(vq_state, mesh)
    trp = (shard_params(tr_params_host, mesh, transformer_tp_rules)
           if n_model > 1 else put_replicated(tr_params_host, mesh))
    tx = make_transformer_optimizer(tr, trp, clip_norm=0.8)
    opt_state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P()))
        if hasattr(a, "shape") else a, tx.init(tr_params_host))

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal(
            (global_batch, N_CYCLES * CYCLE_LEN, 2)), jnp.float32),
        NamedSharding(mesh, P("data", None, None)))
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, 2, (global_batch,)), jnp.int32),
        NamedSharding(mesh, P("data")))
    start_token = vq.num_embeddings

    @jax.jit
    def train_step(trp, opt_state, x, labels):
        def loss_fn(p):
            b = x.shape[0]
            cycles = x.reshape(b * N_CYCLES, CYCLE_LEN, 2)
            ids = vq.encode_indices(vqp, vqs, cycles)
            ids = ids.reshape(b, N_CYCLES * vq.enc_out_len)
            ids = jnp.concatenate(
                [jnp.full((b, 1), start_token, ids.dtype), ids], axis=1)
            logits, _ = tr.apply(p, None, ids, generate=False)
            return tr.loss_class(logits, labels)
        loss, grads = jax.value_and_grad(loss_fn)(trp)
        updates, opt_state = tx.update(grads, opt_state, trp)
        return optax.apply_updates(trp, updates), opt_state, loss

    t0 = time.perf_counter()
    trp, opt_state, loss = train_step(trp, opt_state, x, labels)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    first_loss = float(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        trp, opt_state, loss = train_step(trp, opt_state, x, labels)
    jax.block_until_ready(loss)
    step_ms = (time.perf_counter() - t0) / steps * 1e3
    return {"mesh": f"{n_data}x{n_model}", "n_devices": n_data * n_model,
            "step_ms": round(step_ms, 2), "compile_s": round(compile_s, 1),
            "first_loss": first_loss, "final_loss": float(loss)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--global-batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    a = ap.parse_args()

    models = build_models()
    configs = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2)]
    rows = []
    for n_data, n_model in configs:
        r = run_config(n_data, n_model, a.global_batch, a.steps, *models)
        rows.append(r)
        print(json.dumps(r), flush=True)

    # correctness: the first-step loss must be mesh-invariant (same
    # global batch, same init) up to reduction-order float noise
    losses = [r["first_loss"] for r in rows]
    spread = max(losses) - min(losses)
    ok = spread < 1e-4
    base = rows[0]["step_ms"]
    print(json.dumps({
        "summary": "dp_tp_scaling_virtual_cpu",
        "loss_spread_across_meshes": spread,
        "loss_invariant": ok,
        "step_ms_by_mesh": {r["mesh"]: r["step_ms"] for r in rows},
        "relative_step_time": {r["mesh"]: round(r["step_ms"] / base, 3)
                               for r in rows},
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
