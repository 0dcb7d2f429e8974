"""Checkpoint save/load with embedded hyperparameters.

Rebuild of Lightning's ModelCheckpoint + save_hyperparameters contract
(reference autencoder_lightning_base.py:41, utils.py:30): a single
`.ckpt` file carries the model class name, the constructor kwargs, and
all arrays, so `Model.load(path)` reconstructs the module without
external config. Format: flax msgpack of numpy arrays + a JSON header —
no pickle, portable across hosts.

`torch_import.py` converts reference Lightning .ckpt files into this
format so reference-trained VQ-VAEs can seed the latent pipeline for
F1-parity evaluation (SURVEY.md §7 "Checkpoint compatibility").
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, model_name: str, hparams: dict, params, state,
                    extra: dict | None = None, opt_state=None):
    payload = {
        "header": json.dumps({
            "model": model_name,
            "hparams": hparams,
            "extra": extra or {},
            "format_version": 1,
            "has_opt_state": opt_state is not None,
        }),
        "params": serialization.to_state_dict(_to_numpy_tree(params)),
        "state": serialization.to_state_dict(_to_numpy_tree(state)),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(
            _to_numpy_tree(opt_state))
    blob = serialization.msgpack_serialize(payload)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _broadcast_scalar_counts(template_sd, saved_sd):
    """Migrate pre-per-parameter-count optimizer state dicts.

    scale_by_torch_radam originally kept ONE global step count; it now
    keeps a count per parameter leaf (torch RAdam semantics, see
    optim.py). A checkpoint saved before that change stores `count` as a
    0-d scalar where the template now expects a whole subtree.
    Broadcasting the scalar to every leaf reproduces the old behavior
    exactly (a global count means every param stepped every update, so
    all per-param counts equal the global one)."""
    if isinstance(template_sd, dict):
        if not isinstance(saved_sd, dict):
            arr = np.asarray(saved_sd)
            if arr.ndim != 0:
                return saved_sd  # not a scalar/tree mismatch we migrate
            return {k: _broadcast_scalar_counts(v, saved_sd)
                    for k, v in template_sd.items()}
        return {k: (_broadcast_scalar_counts(template_sd[k], v)
                    if k in template_sd else v)
                for k, v in saved_sd.items()}
    if isinstance(saved_sd, dict):
        return saved_sd
    return saved_sd


def load_checkpoint(path):
    """Returns (model_name, hparams, restore_fn, extra).

    restore_fn takes the template (params, state) from ``model.init()``
    and returns them filled with the checkpoint arrays (pytree structure
    — NamedTuples etc. — restored via flax.serialization).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    header = json.loads(payload["header"])

    def restore(templates, opt_template=None):
        t_params, t_state = templates
        params = serialization.from_state_dict(t_params, payload["params"])
        state = serialization.from_state_dict(t_state, payload["state"])
        if opt_template is not None:
            if "opt_state" not in payload:
                raise ValueError("checkpoint carries no optimizer state")
            saved_opt = _broadcast_scalar_counts(
                serialization.to_state_dict(_to_numpy_tree(opt_template)),
                payload["opt_state"])
            opt = serialization.from_state_dict(opt_template, saved_opt)
            return params, state, opt
        return params, state

    return header["model"], header["hparams"], restore, header.get("extra", {})


# -- orbax backend (sharded / async-capable, for large-scale runs) ----------

def save_checkpoint_orbax(path, model_name: str, hparams: dict, params,
                          state, extra: dict | None = None):
    """Directory-based orbax checkpoint: sharding-aware array storage
    (each leaf keeps its NamedSharding on restore-by-template), the
    standard for multi-host TPU runs. Same header contract as the
    msgpack format."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"),
               {"params": params, "state": state}, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "header.json"), "w") as f:
        json.dump({"model": model_name, "hparams": hparams,
                   "extra": extra or {}, "format_version": 1,
                   "backend": "orbax"}, f)


def load_checkpoint_orbax(path, templates):
    """Restore (header_dict, params, state) from an orbax checkpoint;
    `templates` = model.init(...) output providing structure/shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "header.json")) as f:
        header = json.load(f)
    t_params, t_state = templates
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(path, "arrays"),
                             {"params": t_params, "state": t_state})
    return header, restored["params"], restored["state"]
