"""Split-merge league rollout: learner vs K frozen opponents in one scan.

TPU-native port of the reference's split-merge stepping + PendingTransitions
credit-assignment protocol (katago_loop.py:284-431, :139-250, :1285-1365):

* Each env is statically assigned one of K cohort opponents (env e -> slot
  e // (N/K)); the reference samples per-env dynamically, but static equal
  blocks keep every per-opponent forward a fixed-shape batch (no dynamic
  partitioning inside jit). All cohort members must share the learner's
  architecture.
* Every step runs the learner forward over the FULL batch and the K
  opponent forwards over their blocks, then selects per env by seat. This
  costs 2x model FLOPs versus the reference's exact-subset forwards — the
  price of static shapes; the reference's dynamic gather would force
  padding or retraces on TPU anyway.
* Learner colors are per-env and re-rolled on episode end
  (katago_loop.py:1129-1145, :1421-1437).
* PendingTransitions becomes carried scan state: a learner move OPENS a
  pending transition; subsequent rewards ACCUMULATE in learner perspective;
  the transition FINALIZES into the (T, N) trajectory slot of the step
  where the outcome resolved (done, or turn returning to the learner).
  Slots where nothing finalized are marked invalid and carry weight 0 in
  the update (their obs is the current real board so BatchNorm statistics
  stay on-distribution).
* Truncation bootstraps -V(terminal_obs) sign-corrected to the learner's
  perspective (sign_correct_bootstrap, katago_loop.py:125-136).

The trailing un-finalized pendings are appended as a (T+1)-th trajectory
row bootstrapped by the final sign-corrected V(obs_T).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..env.vec_env import EnvCore
from .ppo import SCORE_NORMALIZATION, Trajectory, compute_value_cats
from .rollout import RolloutStats


@struct.dataclass
class PendingState:
    """Per-env learner transition awaiting outcome (katago_loop.py:139-250)."""

    valid: jax.Array  # (N,) bool
    obs: jax.Array  # (N, C, 81) f32
    action: jax.Array  # (N,) i32
    log_prob: jax.Array  # (N,) f32
    value: jax.Array  # (N,) f32
    legal_mask: jax.Array  # (N, A) bool
    reward: jax.Array  # (N,) f32 accumulated, learner perspective
    score_target: jax.Array  # (N,) f32


def init_pending(num_envs: int, obs_shape: tuple, action_space: int) -> PendingState:
    return PendingState(
        valid=jnp.zeros(num_envs, bool),
        obs=jnp.zeros((num_envs, *obs_shape), jnp.float32),
        action=jnp.zeros(num_envs, jnp.int32),
        log_prob=jnp.zeros(num_envs, jnp.float32),
        value=jnp.zeros(num_envs, jnp.float32),
        legal_mask=jnp.zeros((num_envs, action_space), bool),
        reward=jnp.zeros(num_envs, jnp.float32),
        score_target=jnp.zeros(num_envs, jnp.float32),
    )


def stack_opponent_variables(variables_list: list[dict]) -> dict:
    """Stack K same-architecture variable pytrees along a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


@struct.dataclass
class LeagueStats:
    """RolloutStats + per-opponent outcome counts from the learner's side."""

    base: RolloutStats
    opp_wins: jax.Array  # (K,) learner wins vs opponent k
    opp_losses: jax.Array  # (K,)
    opp_draws: jax.Array  # (K,)


def make_league_rollout(env_core: EnvCore, model, adapter, num_steps: int,
                        k_opp: int, color_randomization: bool = True):
    """Build rollout(learner_vars, opp_vars_stacked, env_states, obs, mask,
    learner_color, rng) -> (carry, traj(T+1,N), next_value, stats)."""
    env_step = env_core.step_fn()
    N = env_core.num_envs
    C = env_core.num_channels
    A = env_core.action_space
    if N % k_opp != 0:
        raise ValueError(f"num_envs {N} must divide by cohort size {k_opp}")
    B = N // k_opp  # block size per opponent

    def forward(variables, obs_flat, masks, rng):
        out = model.apply(variables, obs_flat.reshape(-1, C, 9, 9), train=False)
        flat = out.policy_logits.reshape(obs_flat.shape[0], -1).astype(jnp.float32)
        masked = jnp.where(masks, flat, -1e9)
        actions = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
        logp_all = jax.nn.log_softmax(masked, axis=-1)
        log_probs = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
        values = adapter.scalar_value_blended(out)
        return actions, log_probs, values

    def opp_forward(opp_vars, obs_flat, masks, rng):
        """K block forwards, unrolled over the stacked opponent params.

        NOT a vmap: vmapping conv kernels lowers to grouped convolutions
        and fails whenever K does not divide the channel counts (the
        11,259-way policy head has 139 output channels). K static forwards
        of a full (N/K) batch each cost the same FLOPs and keep the MXU
        shapes identical to the learner's.
        """
        obs_k = obs_flat.reshape(k_opp, B, -1)
        masks_k = masks.reshape(k_opp, B, A)
        keys = jax.random.split(rng, k_opp)
        actions = []
        for i in range(k_opp):
            v_i = jax.tree.map(lambda x: x[i], opp_vars)
            a, _, _ = forward(v_i, obs_k[i], masks_k[i], keys[i])
            actions.append(a)
        return jnp.concatenate(actions)

    def rollout(learner_vars: Any, opp_vars: Any, env_states, obs, legal_masks,
                learner_color, rng):
        pending0 = init_pending(N, (C, 81), A)

        def step_fn(carry, _):
            env_states, obs, masks, learner_color, pend, rng = carry
            rng, k_l, k_o, k_c = jax.random.split(rng, 4)

            pre_stm = env_states.stm.astype(jnp.int32)
            learner_to_move = pre_stm == learner_color

            a_l, logp_l, v_l = forward(learner_vars, obs, masks, k_l)
            a_o = opp_forward(opp_vars, obs, masks, k_o)
            actions = jnp.where(learner_to_move, a_l, a_o)

            env_states2, eo = env_step(env_states, actions)
            done = eo.terminated | eo.truncated
            # reward in learner perspective (to_learner_perspective,
            # katago_loop.py:111-123)
            r_l = jnp.where(learner_to_move, eo.reward, -eo.reward)
            post_stm_pre_reset = 1 - pre_stm  # mover alternates, pre-auto-reset
            learner_next = (eo.current_player.astype(jnp.int32) == learner_color)

            # 1. accumulate into prior pendings
            pend = pend.replace(
                reward=pend.reward + jnp.where(pend.valid, r_l, 0.0)
            )

            # 2. finalize prior pendings (done or turn returns to learner)
            fin_prior = pend.valid & (done | learner_next)
            # 4. immediate finalize: learner's own move ended the episode
            #    (disjoint from fin_prior — strict alternation guarantees no
            #    valid pending exists when the learner moves)
            emit_imm = learner_to_move & done & ~pend.valid
            valid_slot = fin_prior | emit_imm

            score_target = eo.material.astype(jnp.float32) / SCORE_NORMALIZATION
            sel = fin_prior[:, None, None]
            slot_obs = jnp.where(sel, pend.obs, obs)
            slot_action = jnp.where(fin_prior, pend.action, a_l)
            slot_logp = jnp.where(fin_prior, pend.log_prob, logp_l)
            slot_value = jnp.where(fin_prior, pend.value, v_l)
            slot_mask = jnp.where(fin_prior[:, None], pend.legal_mask, masks)
            slot_reward = jnp.where(fin_prior, pend.reward, r_l)
            slot_score = jnp.where(fin_prior, pend.score_target, score_target)
            slot_done = valid_slot & done
            slot_term = valid_slot & eo.terminated
            cats = jnp.where(
                valid_slot, compute_value_cats(slot_reward, slot_term), -1
            ).astype(jnp.int32)

            # truncation bootstrap: -V(terminal_obs) sign-corrected to the
            # learner (sign_correct_bootstrap, katago_loop.py:125-136)
            trunc = eo.truncated & ~eo.terminated

            def with_term_v(_):
                tout = model.apply(
                    learner_vars, eo.terminal_obs.reshape(N, C, 9, 9), train=False
                )
                tv = adapter.scalar_value_blended(tout)
                tv_l = jnp.where(post_stm_pre_reset == learner_color, tv, -tv)
                return jnp.where(trunc & valid_slot, tv_l, jnp.nan)

            override = jax.lax.cond(
                (trunc & valid_slot).any(), with_term_v,
                lambda _: jnp.full((N,), jnp.nan), None,
            )

            trans = Trajectory(
                obs=slot_obs,
                actions=slot_action,
                log_probs=slot_logp,
                values=slot_value,
                rewards=jnp.where(valid_slot, slot_reward, 0.0),
                dones=slot_done,
                terminated=slot_term,
                legal_masks=slot_mask,
                value_cats=cats,
                score_targets=jnp.where(valid_slot, slot_score, 0.0),
                next_value_override=override,
                valid=valid_slot,
            )

            # 3. open new pendings where the learner moved mid-game
            create = learner_to_move & ~done
            cs = create[:, None]
            pend = PendingState(
                valid=(pend.valid & ~fin_prior) | create,
                obs=jnp.where(create[:, None, None], obs, pend.obs),
                action=jnp.where(create, a_l, pend.action),
                log_prob=jnp.where(create, logp_l, pend.log_prob),
                value=jnp.where(create, v_l, pend.value),
                legal_mask=jnp.where(cs, masks, pend.legal_mask),  # cs = (N,1)
                reward=jnp.where(create, r_l, jnp.where(fin_prior, 0.0, pend.reward)),
                score_target=jnp.where(create, score_target, pend.score_target),
            )

            if color_randomization:
                # re-roll learner color on episode end (katago_loop.py:1421-1437)
                new_color = jax.random.bernoulli(k_c, 0.5, (N,)).astype(jnp.int32)
                learner_color = jnp.where(done, new_color, learner_color)

            # stats: learner-perspective outcomes, per opponent block
            term_out = eo.terminated
            l_win = term_out & (r_l > 0)
            l_loss = term_out & (r_l < 0)
            l_draw = term_out & (r_l == 0)
            win_b = ((eo.reward > 0) & (pre_stm == 0)) | ((eo.reward < 0) & (pre_stm == 1))
            win_w = ((eo.reward > 0) & (pre_stm == 1)) | ((eo.reward < 0) & (pre_stm == 0))
            stat = LeagueStats(
                base=RolloutStats(
                    episodes=done.sum(),
                    wins_black=(win_b & term_out).sum(),
                    wins_white=(win_w & term_out).sum(),
                    draws=l_draw.sum(),
                    terminated=term_out.sum(),
                    truncated=(eo.truncated & ~eo.terminated).sum(),
                    total_ply=jnp.where(done, eo.ply_count, 0).sum(),
                ),
                opp_wins=l_win.reshape(k_opp, B).sum(axis=1),
                opp_losses=l_loss.reshape(k_opp, B).sum(axis=1),
                opp_draws=l_draw.reshape(k_opp, B).sum(axis=1),
            )
            carry = (env_states2, eo.obs, eo.legal_mask, learner_color, pend, rng)
            return carry, (trans, stat)

        carry0 = (env_states, obs, legal_masks, learner_color, pending0, rng)
        carry, (traj, stats) = jax.lax.scan(step_fn, carry0, None, length=num_steps)
        env_states, obs, legal_masks, learner_color, pend, rng = carry

        # trailing finalize of still-open pendings, bootstrapped by the
        # sign-corrected value of the CURRENT position
        out = model.apply(learner_vars, obs.reshape(N, C, 9, 9), train=False)
        v_now = adapter.scalar_value_blended(out)
        stm_now = env_states.stm.astype(jnp.int32)
        next_value = jnp.where(stm_now == learner_color, v_now, -v_now)

        tail = Trajectory(
            obs=pend.obs[None],
            actions=pend.action[None],
            log_probs=pend.log_prob[None],
            values=pend.value[None],
            rewards=jnp.where(pend.valid, pend.reward, 0.0)[None],
            dones=jnp.zeros((1, N), bool),
            terminated=jnp.zeros((1, N), bool),
            legal_masks=pend.legal_mask[None],
            value_cats=jnp.full((1, N), -1, jnp.int32),
            score_targets=jnp.where(pend.valid, pend.score_target, 0.0)[None],
            next_value_override=jnp.full((1, N), jnp.nan),
            valid=pend.valid[None],
        )
        traj = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), traj, tail
        )

        stats = jax.tree.map(lambda x: x.sum(axis=0).astype(jnp.int32), stats)
        new_carry = (env_states, obs, legal_masks, learner_color, rng)
        return new_carry, traj, next_value, stats

    return rollout
