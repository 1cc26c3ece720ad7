"""Device mesh + sharding helpers for SPMD data parallelism.

Replaces the reference's DDP machinery (keisei/training/distributed.py):
instead of per-rank processes with NCCL allreduce, we build a
`jax.sharding.Mesh`, shard the environment batch over the data axis, keep
parameters replicated, and let XLA insert `psum`s for gradients and global
BatchNorm statistics inside the single jitted train step. The reference's
checkpoint-broadcast / barrier dance (katago_loop.py:725-817) collapses
into single-controller orchestration.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all)."""
    devices = jax.devices()
    if num_devices:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (env-batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of (N, ...) arrays with the leading dim sharded.

    Scalars/0-d leaves are replicated.
    """
    bsh = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(x):
        return jax.device_put(x, bsh if getattr(x, "ndim", 0) >= 1 else rep)

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
