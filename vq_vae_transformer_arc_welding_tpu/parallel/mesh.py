"""Device mesh construction and data-parallel placement.

The reference's only parallelism is single-node DDP over NCCL
(Lightning DDPStrategy, train_transformer_mtasks.py:23-33; SURVEY.md
§5). The TPU-native equivalent: a `jax.sharding.Mesh` whose 'data'
axis rides ICI; batches are sharded over it, parameters replicated,
and XLA's SPMD partitioner inserts the gradient all-reduce — no NCCL
calls to translate. A second 'model' axis supports tensor parallelism
for the transformer (capability headroom; see sharding.py). The DCN
axis for multi-slice would nest outside 'data' but is not required for
parity (reference is single-node).

Placement is "computation follows data": we `device_put` params
replicated and batch indices sharded, then the Trainer's existing
jitted epoch scan runs SPMD unchanged — cross-replica VQ codebook
statistics come out correct because XLA reduces them when producing
the replicated EMA state (fixing the reference's DDP gap,
vector_quantizer.py:134-152 dead code).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if n_data < 1 or len(devices) < need:
        platform = devices[0].platform if devices else "none"
        raise ValueError(
            f"make_mesh needs n_data*n_model = {n_data}*{n_model} = {need} "
            f"devices but only {len(devices)} are available "
            f"(platform '{platform}'). To simulate a multi-chip mesh, force "
            f"virtual CPU devices before any jax device use: "
            f"jax.config.update('jax_platforms', 'cpu'); "
            f"jax.config.update('jax_num_cpu_devices', {max(need, 2)}).")
    use = devices[:need]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def make_mesh_dp_pp(n_data: int | None = None, n_pipe: int = 1,
                    devices=None) -> Mesh:
    """Mesh with ('data', 'pipe') axes for dp x pipeline-parallel
    training (parallel/pipeline.py::PipelinedDecoder). 'data' rides the
    outer ICI dimension so gradient psums stay dense; 'pipe' carries
    only the stage-to-stage ppermute ring."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_pipe
    need = n_data * n_pipe
    if n_pipe < 1 or n_data < 1 or len(devices) < need:
        raise ValueError(
            f"make_mesh_dp_pp needs n_data*n_pipe = {n_data}*{n_pipe} = "
            f"{need} devices but only {len(devices)} are available.")
    arr = np.array(devices[:need]).reshape(n_data, n_pipe)
    return Mesh(arr, ("data", "pipe"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_spec(mesh: Mesh, batch_axis_index: int = 0) -> NamedSharding:
    """Shard the given axis over 'data', replicate the rest."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = "data"
    return NamedSharding(mesh, P(*spec))


def put_replicated(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
