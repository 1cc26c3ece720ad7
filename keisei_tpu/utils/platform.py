"""Backend selection helpers for host tooling.

The axon TPU environment's sitecustomize imports jax at interpreter
startup and pins jax_platforms to "axon,cpu" (remote TPU first), so the
JAX_PLATFORMS env var alone cannot move a script to CPU. Scripts that must
run host-side (the oracle-equivalence campaign, CI smoke runs) call
force_cpu() before touching any jax API.
"""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int | None = None) -> None:
    """Pin this process's JAX to the CPU backend, optionally with N
    virtual devices. Safe to call before or after `import jax`, but must
    run before any computation has been dispatched."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    if virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{virtual_devices}"
            ).strip()
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()


def enable_compile_cache() -> None:
    """Point JAX at the shared persistent compilation cache used by the
    training CLI (training/loop.py main). Standalone tools (bench sweeps,
    corpus generation, profilers) share the production-shape programs,
    whose b40c256 compiles run minutes each — without this every script
    invocation recompiles from scratch."""
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        cache_dir = os.path.expanduser("~/.cache/keisei-tpu-jax")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
