"""Model plumbing: functional modules with explicit params/state pytrees.

Every model exposes:
  - ``hparams``: a JSON-serializable constructor-argument dict (the
    rebuild of Lightning's save_hyperparameters, reference
    autencoder_lightning_base.py:41 etc.), embedded in checkpoints so
    ``Model.load(path)`` reconstructs the module.
  - ``init(seed) -> (params, state)``: pure initialization.
  - ``apply(params, state, x, *, train, rng) -> (outputs, new_state)``:
    pure forward; BatchNorm/codebook-EMA state is threaded, never
    mutated, so the whole train step jits and shards cleanly.
"""
from __future__ import annotations

import jax


class Module:
    hparams: dict

    def init(self, seed: int = 0):
        raise NotImplementedError

    def apply(self, params, state, x, *, train=False, rng=None):
        raise NotImplementedError

    # -- checkpointing ----------------------------------------------------
    def save(self, path, params, state, extra: dict | None = None,
             opt_state=None):
        from ..train.checkpoint import save_checkpoint
        save_checkpoint(path, type(self).__name__, self.hparams, params, state,
                        extra or {}, opt_state=opt_state)

    @classmethod
    def load(cls, path):
        """Returns (model, params, state). Mirrors Model.load_from_checkpoint."""
        from ..train.checkpoint import load_checkpoint
        name, hparams, restore, _ = load_checkpoint(path)
        if name != cls.__name__:
            raise ValueError(f"checkpoint is for {name}, not {cls.__name__}")
        model = cls(**hparams)
        params, state = restore(model.init(0))
        return model, params, state

    def param_count(self, params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))
