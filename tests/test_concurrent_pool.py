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
