"""Split-merge league rollout: masked GAE, pending-transition protocol.

Acceptance fixtures modeled on the reference's split-merge/reward
attribution regression tests (tests/test_split_merge*.py,
test_reward_attribution.py): perspective sign conventions, finalize
timing, and sparse-slot GAE equivalence to a compacted dense sequence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.env.vec_env import EnvCore
from keisei_tpu.models.registry import build_model
from keisei_tpu.training.gae import compute_gae, compute_gae_masked
from keisei_tpu.training.league_rollout import (
    compact_supported,
    make_league_rollout,
    parity_colors,
    stack_opponent_variables,
)
from keisei_tpu.training.ppo import KataGoPPOParams, TrainState, make_optimizer, make_ppo_update
from keisei_tpu.training.value_adapter import get_value_adapter


class TestMaskedGAE:
    def test_dense_valid_equals_compute_gae(self):
        rng = np.random.default_rng(0)
        T, N = 12, 3
        rewards = rng.normal(size=(T, N)).astype(np.float32)
        values = rng.normal(size=(T, N)).astype(np.float32)
        dones = rng.random((T, N)) < 0.15
        nv = rng.normal(size=N).astype(np.float32)
        a1 = compute_gae_masked(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.ones((T, N), bool), jnp.asarray(nv), 0.99, 0.95,
        )
        a2 = compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
            jnp.asarray(nv), 0.99, 0.95,
        )
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5)

    def test_sparse_equals_compacted_dense(self):
        """Sparse (T, 1) grid == dense GAE on the compacted sequence."""
        rng = np.random.default_rng(1)
        T = 20
        valid = rng.random(T) < 0.5
        valid[0] = valid[-1] = True
        rewards = np.where(valid, rng.normal(size=T), 0.0).astype(np.float32)
        values = np.where(valid, rng.normal(size=T), 0.0).astype(np.float32)
        dones = np.zeros(T, bool)
        dones[np.flatnonzero(valid)[2]] = True  # one episode boundary
        nv = np.float32(0.7)

        sparse = compute_gae_masked(
            jnp.asarray(rewards[:, None]), jnp.asarray(values[:, None]),
            jnp.asarray(dones[:, None]), jnp.asarray(valid[:, None]),
            jnp.asarray([nv]), 0.99, 0.95,
        )
        idx = np.flatnonzero(valid)
        dense = compute_gae(
            jnp.asarray(rewards[idx][:, None]), jnp.asarray(values[idx][:, None]),
            jnp.asarray(dones[idx][:, None]), jnp.asarray([nv]), 0.99, 0.95,
        )
        np.testing.assert_allclose(
            np.asarray(sparse[:, 0])[idx], np.asarray(dense[:, 0]), rtol=1e-5
        )
        # invalid slots produce exactly zero advantage
        assert (np.asarray(sparse[:, 0])[~valid] == 0).all()

    def test_override_survives_done_cut(self):
        """League truncation slots have dones=True AND an override; the
        override IS the bootstrap and must not be zeroed by the done cut
        (regression: the -V(terminal) bootstrap was dead in league mode)."""
        adv = compute_gae_masked(
            jnp.asarray([[1.0]]), jnp.asarray([[0.5]]), jnp.asarray([[True]]),
            jnp.asarray([[True]]), jnp.asarray([9.9]), 0.5, 1.0,
            next_value_override=jnp.asarray([[2.0]]),
        )
        # delta = 1 + 0.5*2.0 - 0.5 = 1.5; chain still cut by done
        assert float(adv[0, 0]) == pytest.approx(1.5)
        # terminated slot WITHOUT an override: bootstrap stays zeroed
        adv2 = compute_gae_masked(
            jnp.asarray([[1.0]]), jnp.asarray([[0.5]]), jnp.asarray([[True]]),
            jnp.asarray([[True]]), jnp.asarray([9.9]), 0.5, 1.0,
        )
        assert float(adv2[0, 0]) == pytest.approx(0.5)  # 1 + 0 - 0.5

    def test_override_used_for_delta(self):
        adv = compute_gae_masked(
            jnp.asarray([[1.0]]), jnp.asarray([[0.5]]), jnp.asarray([[False]]),
            jnp.asarray([[True]]), jnp.asarray([9.9]), 0.5, 1.0,
            next_value_override=jnp.asarray([[2.0]]),
        )
        # delta = 1 + 0.5*2.0 - 0.5 = 1.5 (bootstrap 9.9 replaced by 2.0)
        assert float(adv[0, 0]) == pytest.approx(1.5)


def build_league(n=4, k=2, t=24, max_ply=48, color_randomization=True):
    env_core = EnvCore(num_envs=n, max_ply=max_ply, num_channels=50)
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    adapter = get_value_adapter("scalar")
    learner = model.init(
        jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )
    opps = [
        model.init(jax.random.key(i + 1), jnp.zeros((1, 50, 9, 9), jnp.float32),
                   train=False)
        for i in range(k)
    ]
    rollout = jax.jit(make_league_rollout(
        env_core, model, adapter, t, k, color_randomization=color_randomization
    ))
    return env_core, model, adapter, learner, stack_opponent_variables(opps), rollout


def traj_rows(t, k, color_randomization=True):
    """Expected trajectory row count: compact path emits one row per
    double-ply plus the trailing-pending row; dynamic path one per ply."""
    if compact_supported(t, k, color_randomization):
        return t // 2 + 1
    return t + 1


@pytest.mark.integration
class TestLeagueRolloutProtocol:
    def test_structure_and_signs(self):
        n, k, t = 4, 2, 24
        env_core, model, adapter, learner, opps, rollout = build_league(n, k, t)
        env_states, obs, mask = env_core.init()
        color = parity_colors(n)
        carry, traj, next_value, stats = rollout(
            learner, opps, env_states, obs, mask, color, jax.random.key(7)
        )
        valid = np.asarray(traj.valid)
        assert valid.shape == (traj_rows(t, k), n)
        assert valid.any(), "no learner transitions finalized in 24 plies"

        rewards = np.asarray(traj.rewards)
        dones = np.asarray(traj.dones)
        terminated = np.asarray(traj.terminated)
        cats = np.asarray(traj.value_cats)

        # invariants pinned by the reference protocol
        assert (rewards[~valid] == 0).all()
        assert not dones[~valid].any() and not terminated[~valid].any()
        assert (cats[~valid] == -1).all()
        # terminal learner transitions carry +-1/0; cats match reward signs
        term_valid = terminated & valid
        if term_valid.any():
            r = rewards[term_valid]
            assert set(np.unique(r)) <= {-1.0, 0.0, 1.0}
            c = cats[term_valid]
            assert ((r > 0) == (c == 0)).all() and ((r < 0) == (c == 2)).all()
        # non-terminal finalized slots have untouched-by-terminal rewards 0
        # (no shaping rewards exist in shogi) and cat ignore-index
        nonterm_valid = valid & ~terminated & ~dones
        assert (cats[nonterm_valid] == -1).all()

        # the compact layout is nearly dense: every env finalizes one
        # learner transition per double-ply; only the first row's second
        # half (no pending yet) and the tail's first half are empty
        n_moves = valid.sum()
        assert n_moves == (t // 2) * n

        assert np.isfinite(np.asarray(next_value)).all()
        st = jax.tree.map(np.asarray, stats)
        assert int(st.opp_wins.sum() + st.opp_losses.sum() + st.opp_draws.sum()) == int(
            st.base.terminated
        )
        # the parity-lock invariant held at every ply
        assert int(st.parity_mismatch) == 0

    def test_conv_model_opponents(self):
        """Stacked-opponent dispatch must work for CONV models: vmapping
        conv kernels lowers to grouped convs and fails when K doesn't
        divide the channel counts (139-ch policy head, K=2)."""
        from keisei_tpu.training.league_rollout import (
            make_league_rollout,
            stack_opponent_variables,
        )
        from keisei_tpu.training.value_adapter import get_value_adapter

        n, k, t = 4, 2, 4
        env_core = EnvCore(num_envs=n, max_ply=16, num_channels=50)
        model, _ = build_model(
            "se_resnet",
            {"num_blocks": 1, "channels": 16, "se_reduction": 4,
             "global_pool_channels": 8, "policy_channels": 4,
             "value_fc_size": 16, "score_fc_size": 8},
        )
        adapter = get_value_adapter("katago")
        learner = model.init(jax.random.key(0),
                             jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)
        opps = stack_opponent_variables([
            model.init(jax.random.key(i + 1),
                       jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)
            for i in range(k)
        ])
        rollout = jax.jit(make_league_rollout(env_core, model, adapter, t, k))
        env_states, obs, mask = env_core.init()
        carry, traj, nv, stats = rollout(
            learner, opps, env_states, obs, mask,
            parity_colors(n), jax.random.key(5),
        )
        assert np.isfinite(np.asarray(nv)).all()
        assert np.asarray(traj.valid).shape == (traj_rows(t, k), n)
        assert int(np.asarray(stats.parity_mismatch)) == 0

    def test_update_trains_on_league_traj(self):
        n, k, t = 4, 2, 16
        env_core, model, adapter, learner, opps, rollout = build_league(n, k, t)
        env_states, obs, mask = env_core.init()
        color = parity_colors(n)
        carry, traj, next_value, stats = rollout(
            learner, opps, env_states, obs, mask, color, jax.random.key(3)
        )
        cfg = KataGoPPOParams(batch_size=traj_rows(t, k) * n // 2, epochs_per_batch=1)
        opt = make_optimizer(cfg)
        state = TrainState(
            params=learner["params"], batch_stats=learner.get("batch_stats", {}),
            opt_state=opt.init(learner["params"]), step=jnp.int32(0),
        )
        update = jax.jit(make_ppo_update(model, adapter, cfg, opt))
        new_state, metrics = update(state, traj, next_value, jax.random.key(4), 0.01)
        for v in metrics.values():
            assert np.isfinite(float(v))
        # params actually moved
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)
            )
        )
        assert moved


@pytest.mark.integration
class TestRewardAttribution:
    """Port of the reference's reward-attribution acceptance semantics
    (test_reward_attribution.py, test_split_merge_transitions.py): the
    trajectory's learner-perspective terminal rewards must agree with the
    independent seat-based win attribution in LeagueStats — a sign error in
    to-learner-perspective negation (opponent delivers mate -> learner
    reward -1) would flip one side of this equality."""

    def test_traj_rewards_match_stats_attribution(self):
        # near-random play needs hundreds of plies to reach checkmates;
        # max_ply high enough that games terminate rather than truncate
        n, k, t = 8, 2, 512
        env_core, model, adapter, learner, opps, rollout = build_league(
            n, k, t, max_ply=2048)
        env_states, obs, mask = env_core.init()
        color = parity_colors(n)
        carry, traj, next_value, stats = rollout(
            learner, opps, env_states, obs, mask, color, jax.random.key(11)
        )
        valid = np.asarray(traj.valid)
        rewards = np.asarray(traj.rewards)
        terminated = np.asarray(traj.terminated)
        st = jax.tree.map(np.asarray, stats)

        term_rows = valid & terminated
        learner_wins = int((rewards[term_rows] > 0).sum())
        learner_losses = int((rewards[term_rows] < 0).sum())
        learner_draws = int((rewards[term_rows] == 0).sum())
        assert int(st.base.terminated) > 0, "no terminations in 512 plies"
        # every terminated episode finalizes exactly one learner-terminal row
        assert learner_wins + learner_losses + learner_draws == int(st.base.terminated)
        assert learner_wins == int(st.opp_wins.sum())
        assert learner_losses == int(st.opp_losses.sum())
        assert learner_draws == int(st.opp_draws.sum())
        assert int(st.parity_mismatch) == 0


class TestCompactSupport:
    def test_support_matrix(self):
        assert compact_supported(12, 2, True)
        assert compact_supported(128, 4, True)
        assert not compact_supported(12, 3, True)  # odd K
        assert not compact_supported(11, 2, True)  # odd T
        assert not compact_supported(12, 2, False)  # fixed colors

    def test_parity_colors_balance(self):
        c = np.asarray(parity_colors(8))
        assert c.tolist() == [0, 0, 0, 0, 1, 1, 1, 1]


@pytest.mark.integration
class TestCompactParityLock:
    def test_long_rollout_invariant_and_density(self):
        """Many episode boundaries (small max_ply forces truncation resets):
        the parity lock must survive every reset, every env must finalize
        exactly one learner transition per double-ply, and truncated slots
        must carry a finite -V(terminal) bootstrap override."""
        n, k, t = 8, 2, 256
        env_core, model, adapter, learner, opps, rollout = build_league(
            n, k, t, max_ply=40)
        env_states, obs, mask = env_core.init()
        carry, traj, next_value, stats = rollout(
            learner, opps, env_states, obs, mask, parity_colors(n),
            jax.random.key(21),
        )
        st = jax.tree.map(np.asarray, stats)
        assert int(st.parity_mismatch) == 0
        assert int(st.base.truncated) > 0, "max_ply=40 never truncated?"

        valid = np.asarray(traj.valid)
        assert (valid.sum(axis=0) == t // 2).all()

        # truncation slots: done without terminated -> finite override
        dones = np.asarray(traj.dones)
        terminated = np.asarray(traj.terminated)
        override = np.asarray(traj.next_value_override)
        trunc_slots = valid & dones & ~terminated
        assert trunc_slots.any()
        assert np.isfinite(override[trunc_slots]).all()
        # non-truncated slots carry no override
        assert np.isnan(override[valid & ~(dones & ~terminated)]).all()

        # the lock also holds for the NEXT epoch: with T even the carry's
        # (stm == color) pattern must again match parity 0 (first half moves)
        env_states2, obs2, mask2, color2, _ = carry
        stm = np.asarray(env_states2.stm).astype(np.int32)
        col = np.asarray(color2)
        learner_next_ply = stm == col
        assert learner_next_ply[: n // 2].all()
        assert not learner_next_ply[n // 2:].any()

    def test_dynamic_fallback_odd_k(self):
        """Odd cohort sizes fall back to the full-batch dynamic path."""
        n, k, t = 6, 3, 8
        env_core, model, adapter, learner, opps, rollout = build_league(n, k, t)
        env_states, obs, mask = env_core.init()
        color = jnp.asarray([0, 1] * 3, jnp.int32)
        carry, traj, nv, stats = rollout(
            learner, opps, env_states, obs, mask, color, jax.random.key(9)
        )
        assert np.asarray(traj.valid).shape == (t + 1, n)
        assert np.isfinite(np.asarray(nv)).all()

    def test_dynamic_fallback_fixed_colors(self):
        """color_randomization=False keeps reference fixed-color semantics
        on the dynamic path."""
        n, k, t = 4, 2, 8
        env_core, model, adapter, learner, opps, rollout = build_league(
            n, k, t, color_randomization=False)
        env_states, obs, mask = env_core.init()
        color = jnp.zeros(n, jnp.int32)
        carry, traj, nv, stats = rollout(
            learner, opps, env_states, obs, mask, color, jax.random.key(9)
        )
        assert np.asarray(traj.valid).shape == (t + 1, n)
        # fixed colors never change
        assert (np.asarray(carry[3]) == 0).all()
