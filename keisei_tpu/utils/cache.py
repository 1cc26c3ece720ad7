"""Shared JAX persistent-compilation-cache setup for all entry points."""

from __future__ import annotations

import os


def ensure_compile_cache(path: str | None = None) -> str:
    """Point JAX at a persistent compilation cache (idempotent).

    Must run BEFORE jax compiles anything; safe to call after jax import.
    Honors an existing JAX_COMPILATION_CACHE_DIR.
    """
    current = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if current:
        return current
    cache = path or os.path.expanduser("~/.cache/keisei-tpu-jax")
    os.makedirs(cache, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
    return cache
