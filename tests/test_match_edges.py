"""play_match edges: partial counting at the ply ceiling, light-collect
field contract, chunk-compile reuse via make_match_runner.

Reference semantics: match_utils.py:76 (batch ceiling guard),
:261-272 (vectorized last-mover win attribution), :296-335 (reuse).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.match import make_match_runner, play_match
from keisei_tpu.models.registry import build_model


@pytest.fixture(scope="module")
def two_models():
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    va = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                    train=False)
    vb = model.init(jax.random.key(1), jnp.zeros((1, 50, 9, 9), jnp.float32),
                    train=False)
    return model, va, vb


@pytest.mark.integration
class TestPlayMatchEdges:
    def test_all_games_counted_at_truncation_ceiling(self, two_models):
        # max_ply low enough that every random-policy game truncates:
        # each env reaches done via truncation and is counted as a draw
        model, va, vb = two_models
        res = play_match(model, va, model, vb, num_games=4, max_ply=24,
                         chunk_steps=12, seed=3)
        assert res.games == 4
        assert res.draws == 4 and res.wins_a == 0 and res.wins_b == 0
        assert res.total_plies == 4 * 24

    def test_light_collect_drops_heavy_fields(self, two_models):
        model, va, vb = two_models
        res, rollout = play_match(model, va, model, vb, num_games=2,
                                  max_ply=16, chunk_steps=8, seed=1,
                                  collect="light")
        assert rollout.obs is None and rollout.legal_masks is None
        T = np.asarray(rollout.actions).shape[0]
        assert T >= 16  # at least the ceiling's worth of steps recorded
        for field in (rollout.rewards, rollout.dones, rollout.mover_color,
                      rollout.captured, rollout.term_reason):
            assert np.asarray(field).shape[0] == T
        assert np.asarray(rollout.a_color).tolist() == [0, 1]

    def test_full_collect_keeps_obs_and_masks(self, two_models):
        model, va, vb = two_models
        _, rollout = play_match(model, va, model, vb, num_games=2,
                                max_ply=16, chunk_steps=8, seed=1,
                                collect=True)
        T = np.asarray(rollout.actions).shape[0]
        assert np.asarray(rollout.obs).shape[:2] == (T, 2)
        assert np.asarray(rollout.legal_masks).shape[:2] == (T, 2)
        # every recorded action was legal under its recorded mask
        a = np.asarray(rollout.actions).reshape(-1)
        m = np.asarray(rollout.legal_masks).reshape(T * 2, -1)
        assert m[np.arange(T * 2), a].all()

    def test_mover_color_starts_black_and_alternates(self, two_models):
        model, va, vb = two_models
        _, rollout = play_match(model, va, model, vb, num_games=2,
                                max_ply=16, chunk_steps=8, seed=2,
                                collect="light")
        movers = np.asarray(rollout.mover_color)
        assert (movers[0] == 0).all()  # black opens every game
        dones = np.asarray(rollout.dones)
        # strict alternation until a game ends (auto-reset restarts at black)
        for n in range(movers.shape[1]):
            end = np.flatnonzero(dones[:, n])
            upto = int(end[0]) + 1 if len(end) else movers.shape[0]
            np.testing.assert_array_equal(
                movers[:upto, n], np.arange(upto) % 2)

    def test_match_runner_reuses_compilation(self, two_models):
        model, va, vb = two_models
        runner = make_match_runner(model, model, num_games=2, max_ply=16,
                                   chunk_steps=8)
        r1 = runner(va, vb, seed=0)
        r2 = runner(va, vb, seed=0)
        assert r1 == r2  # deterministic per seed
        r3 = runner(vb, va, seed=0)
        assert isinstance(r3.games, int) and r3.games == 2


class TestModelCache:
    """ModelCache: one module per (architecture, params); shared across
    entries so jit caches stay warm (match.py ModelCache docstring)."""

    class _Entry:
        def __init__(self, arch, params):
            self.architecture = arch
            self.model_params = params

    def test_same_arch_params_share_module(self):
        from keisei_tpu.league.match import ModelCache
        cache = ModelCache()
        m1, k1 = cache.model_for(self._Entry("mlp", {"hidden_sizes": [16]}))
        m2, k2 = cache.model_for(self._Entry("mlp", {"hidden_sizes": [16]}))
        assert m1 is m2 and k1 == k2

    def test_param_change_gets_fresh_module(self):
        from keisei_tpu.league.match import ModelCache
        cache = ModelCache()
        m1, k1 = cache.model_for(self._Entry("mlp", {"hidden_sizes": [16]}))
        m2, k2 = cache.model_for(self._Entry("mlp", {"hidden_sizes": [32]}))
        assert m1 is not m2 and k1 != k2


class TestMatchResultScore:
    def test_score_counts_draws_half(self):
        from keisei_tpu.league.match import MatchResult
        r = MatchResult(wins_a=3, wins_b=1, draws=2, games=6, total_plies=0)
        assert r.score_a == pytest.approx((3 + 1.0) / 6)

    def test_zero_games_guard(self):
        from keisei_tpu.league.match import MatchResult
        r = MatchResult(0, 0, 0, 0, 0)
        assert r.score_a == 0.0


@pytest.mark.integration
class TestSeedSensitivity:
    def test_same_seed_reproduces_result(self, two_models):
        model, va, vb = two_models
        kw = dict(num_games=4, max_ply=48, chunk_steps=24, seed=11)
        r1 = play_match(model, va, model, vb, **kw)
        r2 = play_match(model, va, model, vb, **kw)
        assert (r1.wins_a, r1.wins_b, r1.draws, r1.total_plies) == \
               (r2.wins_a, r2.wins_b, r2.draws, r2.total_plies)

    def test_result_totals_are_consistent(self, two_models):
        model, va, vb = two_models
        r = play_match(model, va, model, vb,
                       num_games=4, max_ply=48, chunk_steps=24, seed=3)
        assert r.wins_a + r.wins_b + r.draws == r.games <= 4
        assert r.total_plies >= r.games  # every finished game has >=1 ply
