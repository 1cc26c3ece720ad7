"""Checkpoint save/load via Orbax (atomic) + JSON metadata sidecar.

Capability parity with the reference's checkpointing (keisei/training/
checkpoint.py:79-177): atomic writes, model + optimizer + step/epoch +
architecture tag + RNG state, architecture-mismatch rejection on load,
`skip_optimizer` for the SL -> RL transition. Orbax provides the
atomic-rename discipline (the reference hand-rolled .pt.tmp + rename).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from .ppo import TrainState

_META_NAME = "keisei_meta.json"


class CheckpointError(RuntimeError):
    pass


def _restore(ckptr, path, item, **kw):
    """Restore with template shardings/dtypes, wrapping Orbax's strict
    shape-incompatibility ValueError in CheckpointError so callers get one
    exception type for 'this checkpoint does not fit this model'."""
    try:
        return ckptr.restore(
            path,
            item=item,
            # template shardings let Orbax place leaves directly on their
            # target devices instead of reading the sharding sidecar file
            # (slower, and wrong on a different topology)
            restore_args=ocp.checkpoint_utils.construct_restore_args(item),
            **kw,
        )
    except ValueError as e:
        raise CheckpointError(f"checkpoint restore failed: {e}") from e


def jnp_like(template, value):
    """Cast a raw-restored array to the template leaf's dtype/shape."""
    arr = np.asarray(value)
    if arr.shape != np.shape(template):
        raise CheckpointError(
            f"checkpoint leaf shape {arr.shape} != expected {np.shape(template)}"
        )
    return jax.numpy.asarray(arr, dtype=template.dtype)


def save_checkpoint(
    path: str,
    state: TrainState,
    *,
    epoch: int,
    architecture: str,
    rng_key,
    extra_meta: dict | None = None,
) -> None:
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        # plain numpy, NOT a device array: a host-local SingleDeviceSharding
        # array is unserializable in a multi-host save ("Cannot serialize
        # host local jax.Array"), caught by the cross-process restore test
        "rng_key": np.asarray(jax.random.key_data(rng_key)),
    }
    ckptr = ocp.PyTreeCheckpointer()
    # the Orbax save is a COLLECTIVE in multi-host runs (every process
    # writes its array shards; Orbax coordinates finalization internally),
    # so all processes must reach this call — but the hand-written meta
    # sidecar is plain JSON on a shared filesystem: two processes dumping
    # to the same .tmp path can interleave and os.replace installs corrupt
    # JSON that kills every later load_meta()/resume (review r2). Only
    # process 0 writes it.
    ckptr.save(path, payload, force=True)
    if jax.process_index() != 0:
        return
    meta = {
        "epoch": int(epoch),
        "architecture": architecture,
        "format_version": 1,
        **(extra_meta or {}),
    }
    tmp = os.path.join(path, _META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META_NAME))


def load_meta(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), _META_NAME)) as f:
        return json.load(f)


def load_checkpoint(
    path: str,
    template_state: TrainState,
    *,
    architecture: str,
    skip_optimizer: bool = False,
):
    """Restore (state, meta, rng_key). `template_state` supplies the pytree
    structure/shapes (from a freshly initialized model + optimizer)."""
    path = os.path.abspath(path)
    meta = load_meta(path)
    if meta["architecture"] != architecture:
        raise CheckpointError(
            f"checkpoint architecture {meta['architecture']!r} does not match "
            f"configured architecture {architecture!r}"
        )
    ckptr = ocp.PyTreeCheckpointer()
    if skip_optimizer:
        # the saved optimizer may have a different structure entirely (e.g.
        # the SL trainer's cosine-schedule Adam) — partial-restore ONLY the
        # weights/rng: materializing the discarded Adam state too would
        # transiently triple host memory at the SL->RL warm start
        item = {
            "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "rng_key": np.zeros((2,), np.uint32),
        }
        restored = _restore(ckptr, path, item, partial_restore=True)
        state = TrainState(
            params=jax.tree.map(jnp_like, template_state.params, restored["params"]),
            batch_stats=jax.tree.map(
                jnp_like, template_state.batch_stats, restored["batch_stats"]
            ),
            opt_state=template_state.opt_state,
            step=template_state.step,
        )
        rng_key = jax.random.wrap_key_data(
            np.asarray(restored["rng_key"], np.uint32)
        )
        return state, meta, rng_key
    template = {
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "rng_key": np.zeros((2,), np.uint32),
    }
    restored = _restore(ckptr, path, template)
    state = TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    rng_key = jax.random.wrap_key_data(np.asarray(restored["rng_key"], np.uint32))
    return state, meta, rng_key
