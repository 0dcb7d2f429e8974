"""Persistent XLA compilation cache.

TPU compiles in this environment are expensive (remote compiler,
30s-10min cold); the persistent cache makes every chained pipeline
stage and repeated run reuse compiled executables across processes —
measured: latent-stage epochs drop from ~10min cold compile to ~0.1s
on a cache hit. Enabled by every CLI entry point; override the
location with JAX_COMPILATION_CACHE_DIR.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 2.0) -> None:
    import jax
    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or "/tmp/jax_comp_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the knobs: run uncached
