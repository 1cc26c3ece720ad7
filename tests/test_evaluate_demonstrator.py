"""Evaluation CLI math + the demonstrator daemon (previously untested).

Reference parity targets: keisei/training/evaluate.py:22-76 (Elo delta,
Wilson CI, draws-as-half scoring) and keisei/training/demonstrator.py
(role-aware matchup pick, demo-slot snapshot rows).
"""

import json
import math

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu import db
from keisei_tpu.league.evaluate import (
    EvalResult,
    elo_delta,
    wilson_interval,
)
from keisei_tpu.league.match import MatchResult
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model
from keisei_tpu.showcase.demonstrator import Demonstrator


class TestEloDelta:
    def test_even_score_is_zero(self):
        assert elo_delta(0.5) == pytest.approx(0.0)

    def test_known_anchor_points(self):
        # 64% score ~ +100 Elo; 76% ~ +200 (standard logistic table)
        assert elo_delta(0.64) == pytest.approx(100.0, abs=2.0)
        assert elo_delta(0.7597) == pytest.approx(200.0, abs=2.0)

    def test_antisymmetric(self):
        assert elo_delta(0.3) == pytest.approx(-elo_delta(0.7))

    def test_clamped_at_extremes(self):
        assert math.isfinite(elo_delta(0.0))
        assert math.isfinite(elo_delta(1.0))
        assert elo_delta(1.0) == pytest.approx(-elo_delta(0.0))
        assert elo_delta(1.0) > 1000


class TestWilsonInterval:
    def test_zero_games_is_vacuous(self):
        assert wilson_interval(0.5, 0) == (0.0, 1.0)

    def test_contains_point_estimate(self):
        for p in (0.1, 0.5, 0.9):
            lo, hi = wilson_interval(p, 50)
            assert lo < p < hi

    def test_narrows_with_n(self):
        lo1, hi1 = wilson_interval(0.6, 10)
        lo2, hi2 = wilson_interval(0.6, 1000)
        assert (hi2 - lo2) < (hi1 - lo1)

    def test_bounded_to_unit_interval(self):
        lo, hi = wilson_interval(0.99, 5)
        assert 0.0 <= lo <= hi <= 1.0
        lo, hi = wilson_interval(0.01, 5)
        assert 0.0 <= lo <= hi <= 1.0

    def test_known_value(self):
        # p=0.5, n=100, z=1.96 -> approx (0.404, 0.596)
        lo, hi = wilson_interval(0.5, 100)
        assert lo == pytest.approx(0.404, abs=0.002)
        assert hi == pytest.approx(0.596, abs=0.002)


class TestEvalResult:
    def test_from_match_draws_count_half(self):
        m = MatchResult(games=10, wins_a=5, wins_b=3, draws=2, total_plies=400)
        r = EvalResult.from_match(m)
        assert r.win_rate_a == pytest.approx(0.6)
        assert r.elo_delta == pytest.approx(elo_delta(0.6))
        assert r.wilson_low < 0.6 < r.wilson_high
        assert (r.games, r.wins_a, r.wins_b, r.draws) == (10, 5, 3, 2)


@pytest.fixture
def demo_store(tmp_path):
    db_path = str(tmp_path / "obs.db")
    store = OpponentStore(db_path, str(tmp_path / "league"))
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    for seed in (0, 1, 2):
        v = model.init(jax.random.key(seed),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        store.add_entry(v, architecture="mlp",
                        model_params={"hidden_sizes": [16]},
                        created_epoch=0, role=Role.DYNAMIC)
    return db_path, store


class TestDemonstrator:
    def test_pick_prefers_frontier_vs_dynamic(self, demo_store):
        db_path, store = demo_store
        entries = store.list_entries()
        store.update_role(entries[0].id, Role.FRONTIER_STATIC)
        demo = Demonstrator(db_path, store)
        for _ in range(5):
            a, b = demo._pick_matchup()
            assert a.role == Role.FRONTIER_STATIC
            assert b.role == Role.DYNAMIC

    def test_pick_falls_back_to_any_two_distinct(self, demo_store):
        db_path, store = demo_store
        demo = Demonstrator(db_path, store)
        a, b = demo._pick_matchup()
        assert a.id != b.id

    def test_pick_none_with_fewer_than_two(self, tmp_path):
        db_path = str(tmp_path / "obs.db")
        store = OpponentStore(db_path, str(tmp_path / "league"))
        demo = Demonstrator(db_path, store)
        assert demo._pick_matchup() is None

    @pytest.mark.integration
    def test_play_one_writes_demo_snapshots(self, demo_store):
        db_path, store = demo_store
        demo = Demonstrator(db_path, store, demo_slot=2,
                            moves_per_minute=60_000, max_ply=6)
        entries = store.list_entries()
        demo._play_one(entries[0], entries[1])
        rows = db.read_game_snapshots(db_path)
        demo_rows = [r for r in rows if r.get("game_type") == "demo"]
        assert demo_rows, "demonstrator wrote no demo snapshots"
        r = demo_rows[-1]
        assert r["game_id"] == 1002  # 1000 + demo_slot
        assert r["demo_slot"] == 2
        board = json.loads(r["board_json"])
        assert len(board) == 81
        hist = json.loads(r["move_history_json"])
        assert 1 <= len(hist) <= 6
        assert r["ply"] >= 1

    def test_stop_without_start_is_safe(self, demo_store):
        db_path, store = demo_store
        demo = Demonstrator(db_path, store)
        demo.stop()  # no thread yet: must not raise

    @pytest.mark.integration
    @pytest.mark.slow  # wall-clock-sensitive: thread compile can be slow in CI
    def test_start_stop_lifecycle(self, demo_store):
        db_path, store = demo_store
        demo = Demonstrator(db_path, store, moves_per_minute=60_000, max_ply=4)
        demo.start()
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            rows = db.read_game_snapshots(db_path)
            if any(r.get("game_type") == "demo" for r in rows):
                break
            time.sleep(0.2)
        demo.stop()
        # stop() joins with a 10 s timeout; under CI CPU contention a move's
        # first model compile can outlast it — the daemon thread must still
        # honour the stop event once the move completes.
        demo._thread.join(timeout=120)
        assert not demo._thread.is_alive()
        rows = db.read_game_snapshots(db_path)
        assert any(r.get("game_type") == "demo" for r in rows)


class TestMatchResultScore:
    def test_score_a_definition(self):
        m = MatchResult(games=4, wins_a=1, wins_b=1, draws=2, total_plies=100)
        assert m.score_a == pytest.approx(0.5)
        r = EvalResult.from_match(m)
        assert r.elo_delta == pytest.approx(0.0)

    def test_score_a_guards_zero_games(self):
        m = MatchResult(games=0, wins_a=0, wins_b=0, draws=0, total_plies=0)
        assert m.score_a == 0.0


@pytest.mark.integration
class TestEvaluateEndToEnd:
    """run_evaluation + the CLI: checkpoint pair -> JSON verdict
    (reference keisei-evaluate, evaluate.py:59-76)."""

    def _save_ckpt(self, tmp_path, name, seed):
        from keisei_tpu.training.checkpoint import save_checkpoint
        from keisei_tpu.training.ppo import (KataGoPPOParams, TrainState,
                                             make_optimizer)

        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        variables = model.init(jax.random.key(seed),
                               jnp.zeros((1, 50, 9, 9), jnp.float32),
                               train=False)
        opt = make_optimizer(KataGoPPOParams())
        state = TrainState(params=variables["params"], batch_stats={},
                           opt_state=opt.init(variables["params"]),
                           step=jnp.int32(0))
        path = str(tmp_path / name)
        save_checkpoint(path, state, epoch=seed, architecture="mlp",
                        rng_key=jax.random.key(0),
                        extra_meta={"model_params": {"hidden_sizes": [8]}})
        return path

    def test_cli_plays_and_prints_json(self, tmp_path, capsys):
        from keisei_tpu.league.evaluate import main

        pa = self._save_ckpt(tmp_path, "a", 1)
        pb = self._save_ckpt(tmp_path, "b", 2)
        main(["--a", pa, "--b", pb, "--games", "4", "--max-ply", "24",
              "--seed", "3"])
        out = json.loads(capsys.readouterr().out)
        assert out["games"] == 4
        assert out["wins_a"] + out["wins_b"] + out["draws"] == 4
        assert 0.0 <= out["win_rate_a"] <= 1.0
        lo, hi = out["wilson_low"], out["wilson_high"]
        assert 0.0 <= lo <= out["win_rate_a"] <= hi <= 1.0

    def test_arch_is_rebuilt_from_checkpoint_meta(self, tmp_path):
        """_load_model_and_vars must build the CHECKPOINT's architecture,
        not assume the caller's — a mismatched policy head would crash the
        match downstream."""
        from keisei_tpu.league.evaluate import _load_model_and_vars

        pa = self._save_ckpt(tmp_path, "a", 1)
        model, variables, meta = _load_model_and_vars(pa)
        assert meta["architecture"] == "mlp"
        out = model.apply(variables, jnp.zeros((2, 50, 9, 9), jnp.float32),
                          train=False)
        assert out.policy_logits.shape == (2, 11259)
