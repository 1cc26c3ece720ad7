"""Split-merge league rollout: learner vs K frozen opponents in one scan.

TPU-native port of the reference's split-merge stepping + PendingTransitions
credit-assignment protocol (katago_loop.py:284-431, :139-250, :1285-1365).
Two implementations:

* **Compact (parity-locked) path** — the default. Shogi strictly alternates
  movers and auto-reset always starts a fresh game with Black (stm=0) to
  move, so the rollout *chooses* each env's learner color at reset such that
  "learner to move" is a deterministic function of (global step parity, env
  half): envs [0, N/2) have the learner move on even plies, envs [N/2, N) on
  odd plies. Every step then runs ONE learner forward over a static
  half-batch slice and K/2 opponent forwards over full static blocks of the
  other half — exactly N samples of model forward per env step, the same
  cost as self-play, versus 2N for the round-1 full-batch select scheme and
  versus the reference's dynamic exact-subset forwards
  (katago_loop.py:284-431) which cannot be jitted with static shapes.

  The trajectory is emitted *compacted*: each scan iteration covers two
  plies (one learner move per env) and yields one (N,)-wide row holding
  every env's finalized learner transition, so the PPO update sees
  (T/2+1, N) nearly-dense rows instead of (T+1, N) half-empty ones —
  halving update FLOPs as well. Learner moves that themselves end an
  episode are *deferred* one ply into the env's own compacted slot (a fresh
  game's first reply can never end it, so the slot is provably free).

  Color assignment consequence: learner colors are no longer Bernoulli
  re-rolls but the deterministic parity-consistent choice; every reset
  cohort is exactly 50/50 black/white across the batch (the reference's
  randomization targets the same balance in expectation,
  katago_loop.py:1421-1437). A per-step `parity_mismatch` counter in
  LeagueStats verifies the invariant at runtime (always 0 unless a caller
  breaks the color contract — see `parity_colors`).

* **Dynamic (full-batch) path** — fallback when parity-locking cannot apply
  (fixed learner colors, odd K, or odd T). Runs the learner forward over
  the FULL batch and K opponent block forwards every step and selects per
  env by seat: 2x model FLOPs, the round-1 scheme.

Shared semantics (both paths, pinned by tests/test_league_rollout.py):
rewards accumulate in learner perspective; transitions FINALIZE into the
trajectory at the step where the outcome resolved; truncation bootstraps
-V(terminal_obs) sign-corrected to the learner (sign_correct_bootstrap,
katago_loop.py:125-136); trailing un-finalized pendings are appended as a
final trajectory row bootstrapped by the sign-corrected V(obs_T).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..env.vec_env import EnvCore
from .ppo import (SCORE_NORMALIZATION, Trajectory, compute_value_cats,
                  masked_policy_sample)
from .rollout import RolloutStats


@struct.dataclass
class PendingState:
    """Per-env learner transition awaiting outcome (katago_loop.py:139-250).

    The compact path extends the round-1 protocol with deferral fields:
    a learner move that ends its episode still OPENS a pending (carrying
    final done/terminated flags and any truncation bootstrap) and emits one
    ply later into the env's compacted slot.
    """

    valid: jax.Array  # (N,) bool
    obs: jax.Array  # (N, C, 81) f32
    action: jax.Array  # (N,) i32
    log_prob: jax.Array  # (N,) f32
    value: jax.Array  # (N,) f32
    legal_mask: jax.Array  # (N, A) bool
    reward: jax.Array  # (N,) f32 accumulated, learner perspective
    score_target: jax.Array  # (N,) f32
    done: jax.Array  # (N,) bool — episode already over (deferred emit)
    terminated: jax.Array  # (N,) bool — deferred terminal flag
    override: jax.Array  # (N,) f32 — deferred truncation bootstrap (NaN none)


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
        done=jnp.zeros(num_envs, bool),
        terminated=jnp.zeros(num_envs, bool),
        override=jnp.full(num_envs, jnp.nan, jnp.float32),
    )


def stack_opponent_variables(variables_list: list[dict]) -> dict:
    """Stack K same-architecture variable pytrees along a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


def parity_colors(num_envs: int) -> jax.Array:
    """Initial learner colors satisfying the parity-lock invariant.

    Color c_e must make learner_to_move(e, t=0) = (stm == c_e) equal the
    static pattern (parity_0 == half_e): with all envs fresh (stm=0) that
    is c_e = half_e — first half plays Black, second half White. Exactly
    50/50 by construction.
    """
    return (jnp.arange(num_envs) >= num_envs // 2).astype(jnp.int32)


def compact_supported(num_steps: int, k_opp: int,
                      color_randomization: bool = True) -> bool:
    """Whether the parity-locked compact rollout applies.

    Needs re-rollable colors (the lock IS a color assignment), an even K
    (K/2 opponent blocks per env half), and an even T (the scan advances
    two plies per iteration and epoch boundaries must preserve parity).
    """
    return bool(color_randomization) and k_opp % 2 == 0 and num_steps % 2 == 0


@struct.dataclass
class LeagueStats:
    """RolloutStats + per-opponent outcome counts from the learner's side."""

    base: RolloutStats
    opp_wins: jax.Array  # (K,) learner wins vs opponent k
    opp_losses: jax.Array  # (K,)
    opp_draws: jax.Array  # (K,)
    # compact path: count of envs whose dynamic (stm == color) disagreed
    # with the static parity pattern. Always 0 when callers respect the
    # parity_colors contract; nonzero means actions went to the wrong seat.
    parity_mismatch: jax.Array  # () i32


def make_league_rollout(env_core: EnvCore, model, adapter, num_steps: int,
                        k_opp: int, color_randomization: bool = True):
    """Build rollout(learner_vars, opp_vars_stacked, env_states, obs, mask,
    learner_color, rng) -> (carry, traj, next_value, stats).

    traj is (T/2+1, N) on the compact path, (T+1, N) on the dynamic path.
    All cohort members must share the learner's architecture. Env e is
    statically assigned opponent slot e // (N/K).
    """
    if env_core.num_envs % k_opp != 0:
        raise ValueError(
            f"num_envs {env_core.num_envs} must divide by cohort size {k_opp}"
        )
    if compact_supported(num_steps, k_opp, color_randomization):
        return _make_compact_rollout(env_core, model, adapter, num_steps, k_opp)
    return _make_dynamic_rollout(
        env_core, model, adapter, num_steps, k_opp, color_randomization
    )


# ---------------------------------------------------------------------------
# Compact (parity-locked) path
# ---------------------------------------------------------------------------


def _make_compact_rollout(env_core: EnvCore, model, adapter, num_steps: int,
                          k_opp: int):
    env_step = env_core.step_fn()
    N = env_core.num_envs
    C = env_core.num_channels
    A = env_core.action_space
    B = N // k_opp  # block size per opponent
    H = N // 2
    KH = k_opp // 2  # opponent blocks per env half
    T2 = num_steps // 2
    # env half id: 0 for [0, H), 1 for [H, N). The learner moves in half p
    # at plies of parity p; opponent block k (envs [kB, (k+1)B)) therefore
    # moves at plies of parity (1 - half of its block).
    b_env = (jnp.arange(N) >= H).astype(jnp.int32)

    def forward(variables, obs_flat, masks, rng):
        out = model.apply(variables, obs_flat.reshape(-1, C, 9, 9), train=False)
        return masked_policy_sample(out, masks, rng, adapter)

    def make_sub_step(learner_vars, opp_vars):
        return lambda p, carry, k_l, k_o: _sub_step(
            learner_vars, opp_vars, p, carry, k_l, k_o
        )

    def _sub_step(learner_vars, opp_vars, p: int, carry, k_l, k_o):
        """One ply at static parity p: learner half [pH, (p+1)H) moves."""
        env_states, obs, masks, learner_color, pend = carry
        lo, hi = p * H, (p + 1) * H  # learner half
        flo = (1 - p) * H  # finalize half offset (last ply's learner half)
        learner_to_move = b_env == p

        a_l, logp_l, v_l = forward(learner_vars, obs[lo:hi], masks[lo:hi], k_l)
        # K/2 opponent forwards, unrolled over the non-learner half's blocks.
        # NOT a vmap: vmapping conv kernels lowers to grouped convolutions
        # and fails whenever K does not divide the channel counts (the
        # 11,259-way policy head has 139 output channels).
        kb0 = KH if p == 0 else 0
        keys = jax.random.split(k_o, KH)
        a_parts = []
        for j in range(KH):
            kb = kb0 + j
            v_i = jax.tree.map(lambda x: x[kb], opp_vars)
            s0 = kb * B
            a, _, _ = forward(v_i, obs[s0:s0 + B], masks[s0:s0 + B], keys[j])
            a_parts.append(a)
        a_opp = jnp.concatenate(a_parts) if KH > 1 else a_parts[0]
        actions = (
            jnp.concatenate([a_l, a_opp]) if p == 0
            else jnp.concatenate([a_opp, a_l])
        )

        # scatter learner outputs to full width (static slice update)
        a_l_full = jnp.zeros(N, jnp.int32).at[lo:hi].set(a_l)
        logp_l_full = jnp.zeros(N, jnp.float32).at[lo:hi].set(logp_l)
        v_l_full = jnp.zeros(N, jnp.float32).at[lo:hi].set(v_l)

        pre_stm = env_states.stm.astype(jnp.int32)
        mismatch = (learner_to_move != (pre_stm == learner_color)).sum()

        env_states2, eo = env_step(env_states, actions)
        done = eo.terminated | eo.truncated
        # reward in learner perspective (to_learner_perspective,
        # katago_loop.py:111-123); the engine reports last-mover perspective
        r_l = jnp.where(learner_to_move, eo.reward, -eo.reward)

        # 1. accumulate into open pendings (deferred-closed ones are final)
        pend = pend.replace(
            reward=pend.reward + jnp.where(pend.valid & ~pend.done, r_l, 0.0)
        )

        # 2. finalize. Strict alternation + parity lock mean every pending
        # opened last ply (by this ply's non-movers) finalizes NOW: the turn
        # either returned to the learner or the episode ended — `done |
        # learner_next` of the round-1 protocol is identically true here.
        fin = pend.valid
        # A deferred pending's episode is already over; this ply's done
        # belongs to the env's NEW game, whose first reply can never end it
        # (no mate-in-1 from startpos, no ply-1 repetition/impasse/max_ply).
        slot_done = fin & (pend.done | done)
        slot_term = fin & (pend.terminated | (eo.terminated & ~pend.done))
        cats = jnp.where(
            fin, compute_value_cats(pend.reward, slot_term), -1
        ).astype(jnp.int32)

        # truncation bootstrap: -V(terminal_obs) sign-corrected to the
        # learner (sign_correct_bootstrap, katago_loop.py:125-136). One
        # cond-guarded full forward serves both finalize-time truncations
        # and learner-move truncations being deferred.
        trunc = eo.truncated & ~eo.terminated
        need_tv = (trunc & (fin | learner_to_move)).any()

        def with_term_v(_):
            tout = model.apply(
                learner_vars, eo.terminal_obs.reshape(N, C, 9, 9), train=False
            )
            tv = adapter.scalar_value_blended(tout)
            post_stm = 1 - pre_stm  # mover alternates, pre-auto-reset
            return jnp.where(post_stm == learner_color, tv, -tv)

        tv_l = jax.lax.cond(
            need_tv, with_term_v, lambda _: jnp.zeros(N, jnp.float32), None
        )
        slot_override = jnp.where(
            pend.done, pend.override,
            jnp.where(trunc & fin, tv_l, jnp.nan),
        )

        # 3. emit the compacted row for the finalize half
        fs = slice(flo, flo + H)
        fin_f = fin[fs]
        row = Trajectory(
            obs=jnp.where(fin_f[:, None, None], pend.obs[fs], obs[fs]),
            actions=jnp.where(fin_f, pend.action[fs], 0),
            log_probs=jnp.where(fin_f, pend.log_prob[fs], 0.0),
            values=jnp.where(fin_f, pend.value[fs], 0.0),
            rewards=jnp.where(fin_f, pend.reward[fs], 0.0),
            dones=slot_done[fs],
            terminated=slot_term[fs],
            legal_masks=jnp.where(fin_f[:, None], pend.legal_mask[fs], masks[fs]),
            value_cats=cats[fs],
            score_targets=jnp.where(fin_f, pend.score_target[fs], 0.0),
            next_value_override=slot_override[fs],
            valid=fin_f,
        )

        # 4. open new pendings for the learner half — even on done (deferred)
        create = learner_to_move
        score_now = eo.material.astype(jnp.float32) / SCORE_NORMALIZATION
        pend = PendingState(
            valid=create,
            obs=jnp.where(create[:, None, None], obs, pend.obs),
            action=jnp.where(create, a_l_full, pend.action),
            log_prob=jnp.where(create, logp_l_full, pend.log_prob),
            value=jnp.where(create, v_l_full, pend.value),
            legal_mask=jnp.where(create[:, None], masks, pend.legal_mask),
            reward=jnp.where(create, r_l, 0.0),
            score_target=jnp.where(create, score_now, pend.score_target),
            done=create & done,
            terminated=create & eo.terminated,
            override=jnp.where(create & trunc, tv_l, jnp.nan),
        )

        # 5. parity-locked color (re)assignment on episode end: the fresh
        # game (stm=0) must have the learner move iff next ply's parity
        # equals the env's half -> color = next_parity XOR half.
        new_color = jnp.bitwise_xor(b_env, 1 - p)
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
            parity_mismatch=mismatch.astype(jnp.int32),
        )
        carry = (env_states2, eo.obs, eo.legal_mask, learner_color, pend)
        return carry, row, stat

    def rollout(learner_vars: Any, opp_vars: Any, env_states, obs, legal_masks,
                learner_color, rng):
        sub_step = make_sub_step(learner_vars, opp_vars)
        pending0 = init_pending(N, (C, 81), A)

        def dstep(carry, _):
            env_states, obs, masks, learner_color, pend, rng = carry
            rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
            c = (env_states, obs, masks, learner_color, pend)
            c, row0, st0 = sub_step(0, c, k1, k2)
            c, row1, st1 = sub_step(1, c, k3, k4)
            env_states, obs, masks, learner_color, pend = c
            # combined (N,)-wide row: columns [0, H) finalized at parity 1
            # (row1 = half 0's transitions), [H, N) at parity 0 (row0)
            row = jax.tree.map(
                lambda x0, x1: jnp.concatenate([x1, x0], axis=0), row0, row1
            )
            stat = jax.tree.map(lambda a, b: a + b, st0, st1)
            return (env_states, obs, masks, learner_color, pend, rng), (row, stat)

        carry0 = (env_states, obs, legal_masks, learner_color, pending0, rng)
        carry, (traj, stats) = jax.lax.scan(dstep, carry0, None, length=T2)
        env_states, obs, legal_masks, learner_color, pend, rng = carry

        # trailing row: second-half envs hold a pending opened at the final
        # ply — deferred-done ones are complete transitions; open ones are
        # bootstrapped by the sign-corrected value of the CURRENT position
        out = model.apply(learner_vars, obs.reshape(N, C, 9, 9), train=False)
        v_now = adapter.scalar_value_blended(out)
        stm_now = env_states.stm.astype(jnp.int32)
        next_value = jnp.where(stm_now == learner_color, v_now, -v_now)

        tail_done = pend.valid & pend.done
        tail_term = pend.valid & pend.terminated
        tail_cats = jnp.where(
            tail_done, compute_value_cats(pend.reward, tail_term), -1
        ).astype(jnp.int32)
        tail = Trajectory(
            obs=pend.obs[None],
            actions=pend.action[None],
            log_probs=pend.log_prob[None],
            values=pend.value[None],
            rewards=jnp.where(pend.valid, pend.reward, 0.0)[None],
            dones=tail_done[None],
            terminated=tail_term[None],
            legal_masks=pend.legal_mask[None],
            value_cats=tail_cats[None],
            score_targets=jnp.where(pend.valid, pend.score_target, 0.0)[None],
            next_value_override=jnp.where(tail_done, pend.override, jnp.nan)[None],
            valid=pend.valid[None],
        )
        traj = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), traj, tail
        )

        stats = jax.tree.map(lambda x: x.sum(axis=0).astype(jnp.int32), stats)
        new_carry = (env_states, obs, legal_masks, learner_color, rng)
        return new_carry, traj, next_value, stats

    return rollout


# ---------------------------------------------------------------------------
# Dynamic (full-batch select) fallback path — the round-1 scheme
# ---------------------------------------------------------------------------


def _make_dynamic_rollout(env_core: EnvCore, model, adapter, num_steps: int,
                          k_opp: int, color_randomization: bool):
    env_step = env_core.step_fn()
    N = env_core.num_envs
    C = env_core.num_channels
    A = env_core.action_space
    B = N // k_opp  # block size per opponent

    def forward(variables, obs_flat, masks, rng):
        out = model.apply(variables, obs_flat.reshape(-1, C, 9, 9), train=False)
        return masked_policy_sample(out, masks, rng, adapter)

    def opp_forward(opp_vars, obs_flat, masks, rng):
        """K block forwards, unrolled over the stacked opponent params."""
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
            pend = pend.replace(
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
                parity_mismatch=jnp.int32(0),
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
