"""Parameter sharding rules (tensor parallelism for the transformer).

Megatron-style TP over the 'model' mesh axis: attention qkv and MLP
up-projections are column-sharded (output dim), the following
projections row-sharded (input dim), so each block needs a single
all-reduce per sublayer — which XLA inserts automatically from these
placements. Everything else (LN, embeddings, heads) stays replicated.
Not required for reference parity (seq_len <= 321, d_model 512) but a
first-class scaling axis of this framework.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def transformer_tp_rules(path_key: str) -> P:
    """PartitionSpec for a transformer param leaf by its name."""
    if path_key in ("c_attn_w", "c_fc_w"):
        return P(None, "model")     # column parallel
    if path_key == "c_attn_b" or path_key == "c_fc_b":
        return P("model")
    if path_key in ("c_proj_w",):
        return P("model", None)     # row parallel
    return P()


def shard_params(params, mesh: Mesh, rules=transformer_tp_rules):
    """device_put each leaf according to `rules` over its leaf name."""
    def place(path, leaf):
        name = None
        for p in reversed(path):
            k = getattr(p, "key", None)
            if isinstance(k, str):
                name = k
                break
        spec = rules(name) if rules else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
