"""Glue between the trainer loop and the league: cohort loading, results.

Kept separate from the jit-facing rollout code (training/league_rollout.py)
so the host-side store/DB machinery never leaks into traced functions.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

from .store import OpponentEntry, OpponentStore

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k", "dtype"))
def _stack_k(k: int, dtype, *leaves_lists):
    del k  # only keys the jit cache per cohort size

    def stack(xs):
        out = jnp.stack(xs)
        if dtype is not None and jnp.issubdtype(out.dtype, jnp.floating):
            out = out.astype(dtype)
        return out

    return [stack(xs) for xs in leaves_lists]


def stack_cohort_variables(
    store: OpponentStore, cohort: list[OpponentEntry], template: dict,
    dtype=None,
):
    """Load each cohort entry's variables (LRU-cached, device-resident)
    and stack along K — inside one jitted program so the stack is a single
    dispatch of device-to-device concats, not hundreds of eager host ops.

    dtype=jnp.bfloat16 halves the stacked tree's HBM footprint. It is
    action-identical for league opponents: the rollout discards opponent
    value/score outputs, and the whole policy path computes in bf16
    (se_resnet.py dtype policy), so flax casts every float leaf to bf16 at
    apply time anyway — pre-casting just stores what compute already sees.
    """
    loaded = [store.load_variables_cached(e, template=template, dtype=dtype)
              for e in cohort]
    # normalize batch_stats presence across entries
    def norm(v):
        if "batch_stats" in template and "batch_stats" not in v:
            return {**v, "batch_stats": template["batch_stats"]}
        return v

    loaded = [norm(v) for v in loaded]
    treedef = jax.tree.structure(loaded[0])
    leaves = [jax.tree.leaves(v) for v in loaded]
    stacked = _stack_k(len(loaded), dtype,
                       *[list(xs) for xs in zip(*leaves)])
    return jax.tree.unflatten(treedef, stacked)


def stacked_cohort_template(template: dict, k: int, dtype=None):
    """Zero tree with the exact structure/shape/dtypes stack_cohort_variables
    produces for a K-cohort of `template`-shaped entries.

    Non-main processes in a multi-host league run build this as their
    contribution to the cohort-weight broadcast (broadcast_one_to_all
    requires every process to supply a structurally identical tree; only
    process 0's values survive the psum). The cast rule must mirror
    _stack_k: float leaves to `dtype`, everything else unchanged."""
    def zeros(x):
        dt = x.dtype
        if dtype is not None and jnp.issubdtype(dt, jnp.floating):
            dt = jnp.dtype(dtype)
        return jnp.zeros((k,) + x.shape, dt)

    return jax.tree.map(zeros, template)


def record_epoch_results(
    store: OpponentStore,
    scheduler,
    learner_entry_id: int,
    cohort: list[OpponentEntry],
    league_stats,
    epoch: int,
    k_factor: float,
    role_elo_k: dict[str, float],
    elo_floor: float = 0.0,
) -> None:
    """Record learner-vs-cohort outcomes from one rollout epoch: Elo +
    league_results + head-to-head per distinct opponent, and the rolling
    tier win rates for challenge-threshold sampling
    (katago_loop.py:1676-1698 semantics)."""
    # cohort may contain repeats (cycled to fill K blocks) — aggregate
    agg: dict[int, list[int]] = {}
    for k, entry in enumerate(cohort):
        w = int(league_stats.opp_wins[k])
        l_ = int(league_stats.opp_losses[k])
        d = int(league_stats.opp_draws[k])
        if w + l_ + d == 0:
            continue
        bucket = agg.setdefault(entry.id, [0, 0, 0])
        bucket[0] += w
        bucket[1] += l_
        bucket[2] += d
    for opp_id, (w, l_, d) in agg.items():
        if opp_id == learner_entry_id:
            continue  # self-pairing (bootstrap cohort) carries no Elo info
        try:
            store.record_result(
                learner_entry_id, opp_id, epoch=epoch,
                wins_a=w, wins_b=l_, draws=d,
                match_type="training", k=k_factor, role_elo_k=role_elo_k,
                elo_floor=elo_floor,
            )
            opp = store.get_entry(opp_id)
            scheduler.record_learner_result(opp.role, won=w > l_)
        except Exception:
            logger.exception("epoch result recording failed for opponent %d", opp_id)
