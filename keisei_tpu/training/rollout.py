"""Fused self-play rollout: T env steps + policy inference in one lax.scan.

This is the TPU-native replacement for the reference's rollout hot loop
(katago_loop.py:1162-1534, no-league branch): instead of a Python loop
crossing the PyO3/host boundary every step, the env step, masked sampling,
transition recording, truncation bootstrap, and episode statistics all run
inside a single jitted scan — rollouts never leave the device.

Perspective semantics for two-player credit assignment follow the
reference's no-league protocol: each transition is stored from its mover's
perspective, rewards come from the engine in last-mover perspective, and
bootstrap overrides handle both truncation (-V(terminal_obs)) and ply
alternation (-values[t+1]); see katago_loop.py:1496-1590.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..env.vec_env import EnvCore
from .gae import alternating_perspective_overrides
from .ppo import (SCORE_NORMALIZATION, Trajectory, compute_value_cats,
                  masked_policy_sample)


@struct.dataclass
class RolloutStats:
    """Device-side episode statistics (mirrors vec_env.rs counters +
    katago_loop win tracking)."""

    episodes: jax.Array  # () i32
    wins_black: jax.Array
    wins_white: jax.Array
    draws: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    total_ply: jax.Array


def make_selfplay_rollout(
    env_core: EnvCore, model, adapter, num_steps: int, forward_fn=None
):
    """Build rollout(variables, env_states, obs, mask, rng) -> ... (jittable).

    forward_fn optionally replaces `model.apply(vars, obs, train=False)` for
    all eval forwards in the scan - e.g. the fused Pallas inference path
    (models/fused_infer.py). Signature: forward_fn(variables, obs4d) -> output
    satisfying the model contract. Single-device only for the Pallas path.
    """
    env_step = env_core.step_fn()
    N = env_core.num_envs
    C = env_core.num_channels
    apply_eval = forward_fn or (
        lambda variables, obs4d: model.apply(variables, obs4d, train=False)
    )

    def policy_forward(variables, obs_flat, legal_masks, rng):
        out = apply_eval(variables, obs_flat.reshape(N, C, 9, 9))
        return masked_policy_sample(out, legal_masks, rng, adapter)

    def rollout(variables: Any, env_states, obs, legal_masks, rng):
        def step_fn(carry, _):
            env_states, obs, masks, rng = carry
            rng, k = jax.random.split(rng)
            actions, log_probs, values = policy_forward(variables, obs, masks, k)

            env_states2, eo = env_step(env_states, actions)
            dones = eo.terminated | eo.truncated
            cats = compute_value_cats(eo.reward, eo.terminated)
            score_targets = eo.material.astype(jnp.float32) / SCORE_NORMALIZATION

            # Truncation bootstrap: -V(terminal_obs) (perspective alternates
            # every ply). Cheap-path: skip the extra forward when no env
            # truncated this step (katago_loop.py:1496-1521). The predicate
            # is a SCALAR at scan level (not vmapped), so lax.cond compiles
            # to a real runtime branch on TPU — the b40c256 forward in the
            # true branch only executes on the rare steps where some game
            # actually hit max_ply, not as a select.
            trunc_only = eo.truncated & ~eo.terminated

            def with_term_v(_):
                tout = apply_eval(variables, eo.terminal_obs.reshape(N, C, 9, 9))
                tv = adapter.scalar_value_blended(tout)
                return jnp.where(trunc_only, -tv, jnp.nan)

            override = jax.lax.cond(
                trunc_only.any(), with_term_v, lambda _: jnp.full((N,), jnp.nan), None
            )

            trans = Trajectory(
                obs=obs,
                actions=actions,
                log_probs=log_probs,
                values=values,
                rewards=eo.reward,
                dones=dones,
                terminated=eo.terminated,
                legal_masks=masks,
                value_cats=cats,
                score_targets=score_targets,
                next_value_override=override,
            )

            # per-step episode stats (winner color from last-mover reward)
            last_mover = env_states.stm.astype(jnp.int32)  # pre-step stm
            win_b = ((eo.reward > 0) & (last_mover == 0)) | ((eo.reward < 0) & (last_mover == 1))
            win_w = ((eo.reward > 0) & (last_mover == 1)) | ((eo.reward < 0) & (last_mover == 0))
            stat = RolloutStats(
                episodes=dones.sum(),
                wins_black=(win_b & eo.terminated).sum(),
                wins_white=(win_w & eo.terminated).sum(),
                draws=(eo.terminated & (eo.reward == 0)).sum(),
                terminated=eo.terminated.sum(),
                truncated=trunc_only.sum(),
                total_ply=jnp.where(dones, eo.ply_count, 0).sum(),
            )
            return (env_states2, eo.obs, eo.legal_mask, rng), (trans, stat)

        (env_states, obs, legal_masks, rng), (traj, stats) = jax.lax.scan(
            step_fn, (env_states, obs, legal_masks, rng), None, length=num_steps
        )

        # Alternating-perspective interior overrides + final bootstrap
        traj = traj.replace(
            next_value_override=alternating_perspective_overrides(
                traj.values, traj.terminated, traj.next_value_override
            )
        )
        out = apply_eval(variables, obs.reshape(N, C, 9, 9))
        next_value = -adapter.scalar_value_blended(out)  # katago_loop.py:1581-1589

        stats = jax.tree.map(lambda x: x.sum(axis=0).astype(jnp.int32), stats)
        return (env_states, obs, legal_masks, rng), traj, next_value, stats

    return rollout
