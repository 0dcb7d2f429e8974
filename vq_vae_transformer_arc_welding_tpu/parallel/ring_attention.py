"""Sequence-parallel causal ring attention.

The reference has no sequence parallelism (max 321 tokens, SURVEY.md §5
"long-context: absent"); this module is the framework's scaling path
for sequences that outgrow one chip: Q/K/V are sharded over a mesh
axis, K/V shards rotate around the ring via `lax.ppermute` (XLA lowers
this onto ICI), and each device accumulates its queries' attention
with a numerically-stable online softmax — flash attention's
accumulation, distributed. Communication overlaps compute on TPU
because ppermute is asynchronous under XLA's scheduler.

Verified against the dense causal core on an 8-virtual-device mesh
(tests/test_parallel.py) and exercised by dryrun_multichip over the
'model' mesh axis whenever that axis has more than one device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pvary(x, axis_names):
    """Mark x as device-varying over the given axes.

    jax >= 0.9 renamed `lax.pvary` to `lax.pcast(..., to='varying')`;
    keep a shim so no DeprecationWarning fires and older jax still works.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_names, to="varying")
    return jax.lax.pvary(x, axis_names)


def _ring_body(q, k, v, *, axis_name: str, t_local: int, scale: float):
    """Per-device shard_map body. q,k,v: (B, H, T_local, D)."""
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    b, h, tl, d = q.shape
    q_pos = my_idx * t_local + jnp.arange(t_local)          # global q rows

    # the accumulators become device-varying after step 1, so the scan
    # carry must be marked varying over the ring axis from the start
    m = _pvary(jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32), (axis_name,))
    l = _pvary(jnp.zeros((b, h, tl, 1), jnp.float32), (axis_name,))
    acc = _pvary(jnp.zeros((b, h, tl, d), jnp.float32), (axis_name,))

    def step(carry, step_idx):
        k_blk, v_blk, m, l, acc = carry
        src = (my_idx - step_idx) % n_dev                   # block we hold now
        k_pos = src * t_local + jnp.arange(t_local)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        causal = q_pos[:, None] >= k_pos[None, :]
        s = jnp.where(causal[None, None], s, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # fully-masked rows keep m=-inf; guard the exp shift
        m_safe = jnp.where(jnp.isinf(m_new), 0.0, m_new)
        p = jnp.exp(s - m_safe)
        p = jnp.where(causal[None, None], p, 0.0)
        corr = jnp.where(jnp.isinf(m), 0.0, jnp.exp(m - m_safe))
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk, preferred_element_type=jnp.float32)

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, m, l, acc), jnp.arange(n_dev))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_causal_attention(q, k, v, mesh: Mesh, axis_name: str = "model"):
    """q, k, v: (B, H, T, D) with T divisible by the mesh axis size.
    Returns (B, H, T, D), numerically matching dense causal attention."""
    import math

    n_dev = mesh.shape[axis_name]
    t = q.shape[2]
    assert t % n_dev == 0, "sequence must divide the ring size"
    t_local = t // n_dev
    scale = 1.0 / math.sqrt(q.shape[-1])

    try:
        from jax import shard_map  # jax >= 0.6
    except ImportError:
        from jax.experimental.shard_map import shard_map
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(_ring_body, axis_name=axis_name, t_local=t_local,
                          scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)
