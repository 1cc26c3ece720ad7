"""Multi-host initialization: jax.distributed + process-role context.

The reference's torchrun/DDP machinery (keisei/training/distributed.py)
maps to JAX's single-controller-per-host SPMD model: every host calls
`jax.distributed.initialize`, after which `jax.devices()` spans the whole
slice and the SAME jitted program runs everywhere — gradient psums ride
ICI/DCN via the mesh, no explicit process groups, no broadcast/barrier
choreography (SURVEY §5.8).

Host-side roles still matter: only the main process writes the DB /
checkpoints / league store (the reference's rank-0 discipline). The
context here is the frozen snapshot of that topology.

Activation (mirrors torchrun env-var detection):
  KEISEI_COORDINATOR   host:port of process 0
  KEISEI_NUM_PROCESSES total host processes
  KEISEI_PROCESS_ID    this host's index
On Cloud TPU pods, all three are discovered automatically by
jax.distributed.initialize() with no arguments — set
KEISEI_DISTRIBUTED=auto for that path.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import jax

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class DistributedContext:
    process_id: int = 0
    num_processes: int = 1
    coordinator: str | None = None
    auto: bool = False

    @property
    def is_main(self) -> bool:
        return self.process_id == 0

    @property
    def is_distributed(self) -> bool:
        return self.num_processes > 1 or self.auto


def get_distributed_context(env: dict | None = None) -> DistributedContext:
    """Parse the launch environment (reference distributed.py:39-94)."""
    env = env if env is not None else os.environ
    if env.get("KEISEI_DISTRIBUTED", "").lower() == "auto":
        return DistributedContext(auto=True)
    coord = env.get("KEISEI_COORDINATOR")
    if not coord:
        return DistributedContext()
    try:
        n = int(env.get("KEISEI_NUM_PROCESSES", "1"))
        pid = int(env.get("KEISEI_PROCESS_ID", "0"))
    except ValueError as e:
        raise ValueError(f"bad distributed env vars: {e}") from e
    if n <= 1:
        # a coordinator with num_processes=1 is a misconfigured launch
        # (forgotten KEISEI_NUM_PROCESSES): silently training standalone
        # would let several processes write checkpoints/DB concurrently
        raise ValueError(
            "KEISEI_COORDINATOR is set but KEISEI_NUM_PROCESSES is "
            f"{n} — set it to the total process count (or unset the "
            "coordinator for single-process runs)"
        )
    if not 0 <= pid < n:
        raise ValueError(f"KEISEI_PROCESS_ID {pid} out of range for {n} processes")
    return DistributedContext(process_id=pid, num_processes=n, coordinator=coord)


def setup_distributed(ctx: DistributedContext) -> None:
    """Join the multi-host runtime. Idempotent no-op when single-process."""
    if not ctx.is_distributed:
        return
    if ctx.auto:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=ctx.coordinator,
            num_processes=ctx.num_processes,
            process_id=ctx.process_id,
        )
    logger.info(
        "distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def process_seed(base_seed: int, ctx: DistributedContext) -> int:
    """Per-process host-side seed (reference seed_all_ranks: base + rank).
    Device RNG inside jit should fold in axis indices instead."""
    return base_seed + ctx.process_id


def broadcast_from_main(tree, is_source: bool | None = None):
    """Broadcast a pytree of arrays from process 0 to every process.

    The multi-host league path uses this for host-side decisions that only
    process 0 can make (it owns the opponent store): cohort keys and, when
    they change, the stacked opponent weight trees. The reference instead
    declares league mode incompatible with DDP (katago_loop.py:472-478);
    here the SPMD rollout program stays identical on every host because its
    host-side inputs are broadcast before entry.

    Single-process: identity (no device shuffling, no numpy round trip).
    Multi-process: jax.experimental.multihost_utils.broadcast_one_to_all —
    a psum over a global mesh (DCN/ICI), returning host numpy on all
    processes. Non-source processes must pass shape/dtype-matched
    placeholders (see league_ops.stacked_cohort_template)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree, is_source=is_source)
