"""ConcurrentMatchPool: P pairings in one batch, per-slot attribution."""

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.concurrent import ConcurrentMatchPool
from keisei_tpu.models.registry import build_model


@pytest.mark.integration
class TestConcurrentPool:
    def test_round_matches_sequential_shape(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        vs = [
            model.init(jax.random.key(i), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False)
            for i in range(3)
        ]
        pool = ConcurrentMatchPool(model, parallel_matches=2, envs_per_match=4,
                                   max_ply=64, chunk_steps=32)
        results, stats = pool.run_round([(vs[0], vs[1]), (vs[1], vs[2])], seed=4)
        assert len(results) == 2
        assert stats.pairings == 2
        for r in results:
            assert r.games == 4
            assert r.wins_a + r.wins_b + r.draws == 4
            assert r.total_plies > 0

    def test_padding_discards_extra_slot(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        v0 = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                        train=False)
        v1 = model.init(jax.random.key(1), jnp.zeros((1, 50, 9, 9), jnp.float32),
                        train=False)
        pool = ConcurrentMatchPool(model, parallel_matches=3, envs_per_match=2,
                                   max_ply=48, chunk_steps=24)
        results, stats = pool.run_round([(v0, v1)], seed=9)
        assert len(results) == 1 and stats.pairings == 1
        assert results[0].games == 2

    def test_capacity_enforced(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        v = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False)
        pool = ConcurrentMatchPool(model, parallel_matches=1, envs_per_match=2,
                                   max_ply=16)
        with pytest.raises(ValueError, match="capacity"):
            pool.run_round([(v, v), (v, v)])

    def test_empty_round_fast_path(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        pool = ConcurrentMatchPool(model, parallel_matches=2, envs_per_match=2,
                                   max_ply=16)
        results, stats = pool.run_round([])
        assert results == []
        assert (stats.pairings, stats.games, stats.steps) == (0, 0, 0)

    def test_same_seed_is_deterministic(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        v0 = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                        train=False)
        v1 = model.init(jax.random.key(1), jnp.zeros((1, 50, 9, 9), jnp.float32),
                        train=False)
        pool = ConcurrentMatchPool(model, parallel_matches=1, envs_per_match=4,
                                   max_ply=48, chunk_steps=24)
        a, _ = pool.run_round([(v0, v1)], seed=5)
        b, _ = pool.run_round([(v0, v1)], seed=5)
        assert a == b
        # (seed-sensitivity is NOT asserted: with max_ply=48 every random-
        # policy game truncates, so slot summaries legitimately coincide)

    def test_vmapped_stack_preserves_slot_weight_isolation(self):
        """Slot p's envs must be driven by slot p's weights. At near-zero
        temperature the policy is argmax (rng-independent), so a P=2 pooled
        round must reproduce the two P=1 rounds exactly — a transposed or
        scrambled weight stack in the vmapped forward would break this."""
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        vs = [
            model.init(jax.random.key(i), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False)
            for i in range(4)
        ]
        kw = dict(envs_per_match=4, max_ply=48, chunk_steps=24,
                  temperature=1e-4)
        pooled, _ = ConcurrentMatchPool(model, parallel_matches=2, **kw).run_round(
            [(vs[0], vs[1]), (vs[2], vs[3])], seed=7)
        solo0, _ = ConcurrentMatchPool(model, parallel_matches=1, **kw).run_round(
            [(vs[0], vs[1])], seed=7)
        solo1, _ = ConcurrentMatchPool(model, parallel_matches=1, **kw).run_round(
            [(vs[2], vs[3])], seed=7)
        assert pooled[0] == solo0[0]
        assert pooled[1] == solo1[0]

    def test_self_play_symmetric_mirror(self):
        """The SAME weights on both sides with mirrored colors: slot results
        must net out to wins_a + wins_b == decided games (sanity on the
        last-mover win-attribution sign, reference match_utils.py:261-272)."""
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        v = model.init(jax.random.key(3), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False)
        pool = ConcurrentMatchPool(model, parallel_matches=1, envs_per_match=8,
                                   max_ply=64, chunk_steps=32)
        results, stats = pool.run_round([(v, v)], seed=11)
        r = results[0]
        assert r.games == 8
        assert r.wins_a + r.wins_b + r.draws == 8
        assert stats.total_plies == r.total_plies


@pytest.mark.integration
class TestRoundStats:
    def test_stats_aggregate_real_pairings_only(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        va = model.init(jax.random.key(0),
                        jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        vb = model.init(jax.random.key(1),
                        jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        pool = ConcurrentMatchPool(model, parallel_matches=2,
                                   envs_per_match=2, max_ply=48,
                                   chunk_steps=24)
        results, stats = pool.run_round([(va, vb)], seed=5)
        assert stats.pairings == 1 and len(results) == 1
        assert stats.games == results[0].games
        assert stats.total_plies == results[0].total_plies
        assert stats.steps > 0 and stats.steps % 24 == 0

    def test_empty_round_stats_zeroed(self):
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        pool = ConcurrentMatchPool(model, parallel_matches=2,
                                   envs_per_match=2, max_ply=48,
                                   chunk_steps=24)
        results, stats = pool.run_round([], seed=0)
        assert results == [] and (stats.pairings, stats.games,
                                  stats.total_plies, stats.steps) == (0, 0, 0, 0)


@pytest.mark.integration
class TestPoolCollect:
    """collect=True/"light": per-pairing MatchRollout slices of the shared
    trajectory — training pairings ride the pool instead of the sequential
    runner (tournament.py _play_pooled)."""

    def _pool_and_pairs(self, P=2, E=4, max_ply=64):
        import jax.numpy as jnp

        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        vs = [
            model.init(jax.random.key(i),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            for i in range(P + 1)
        ]
        pool = ConcurrentMatchPool(model, parallel_matches=P,
                                   envs_per_match=E, max_ply=max_ply,
                                   chunk_steps=32)
        return pool, [(vs[i], vs[i + 1]) for i in range(P)]

    def test_full_collect_returns_per_slot_rollouts(self):
        pool, pairs = self._pool_and_pairs()
        results, stats, rollouts = pool.run_round(pairs, seed=3, collect=True)
        assert len(rollouts) == len(results) == 2
        E, A = pool.E, pool.core.action_space
        for ro in rollouts:
            T = ro.actions.shape[0]
            assert ro.obs.shape[:2] == (T, E)
            assert ro.legal_masks.shape == (T, E, A)
            assert ro.rewards.shape == (T, E)
            assert ro.a_color.shape == (E,)
        # slot seats alternate within each block (a_color = env_index % 2
        # over the FULL pool, sliced per slot)
        import numpy as np

        for p, ro in enumerate(rollouts):
            expect = (np.arange(p * E, (p + 1) * E) % 2)
            assert (np.asarray(ro.a_color) == expect).all()

    def test_collect_results_consistent_with_rollouts(self):
        # recompute each slot's MatchResult from its rollout record — pins
        # slot attribution (a cross-slot slicing bug would misassign games)
        import numpy as np

        pool, pairs = self._pool_and_pairs()
        results, stats, rollouts = pool.run_round(pairs, seed=5, collect=True)
        for res, ro in zip(results, rollouts):
            rewards = np.asarray(ro.rewards)
            dones = np.asarray(ro.dones)
            movers = np.asarray(ro.mover_color)
            a_color = np.asarray(ro.a_color)
            wins_a = wins_b = draws = 0
            for e in range(dones.shape[1]):
                ts = np.nonzero(dones[:, e])[0]
                if ts.size == 0:
                    continue
                t = ts[0]  # the pool scores each env's FIRST finished game
                r, m = rewards[t, e], movers[t, e]
                if r == 0:
                    draws += 1
                elif (r > 0) == (m == a_color[e]):
                    wins_a += 1
                else:
                    wins_b += 1
            assert (wins_a, wins_b, draws) == (res.wins_a, res.wins_b,
                                               res.draws)

    def test_light_collect_drops_big_arrays(self):
        pool, pairs = self._pool_and_pairs()
        results, stats, rollouts = pool.run_round(pairs, seed=7,
                                                  collect="light")
        for ro in rollouts:
            assert ro.obs is None and ro.legal_masks is None
            assert ro.actions.shape[1] == pool.E

    def test_feature_extraction_from_pooled_rollout(self):
        from keisei_tpu.league.features import extract_game_features

        pool, pairs = self._pool_and_pairs(max_ply=96)
        _, _, rollouts = pool.run_round(pairs, seed=9, collect="light")
        rows = extract_game_features(rollouts[0], 1, 2, epoch=5)
        assert rows  # each finished first game yields two side rows

    def test_no_collect_keeps_two_tuple(self):
        pool, pairs = self._pool_and_pairs()
        out = pool.run_round(pairs, seed=1)
        assert len(out) == 2
