"""In-process tournament rounds, historical library, gauntlet."""

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu import db
from keisei_tpu.league.config import (
    DynamicConfig,
    GauntletConfig,
    HistoricalLibraryConfig,
    LeagueConfig,
)
from keisei_tpu.league.dynamic_trainer import DynamicTrainer
from keisei_tpu.league.historical import HistoricalGauntlet, HistoricalLibrary
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.league.tournament import LeagueTournament, TournamentDispatcher
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))


def make_model():
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    return model


def add_entry(store, role, seed=0, epoch=0):
    model = make_model()
    variables = model.init(
        jax.random.key(seed), jnp.zeros((1, 50, 9, 9), jnp.float32), train=False
    )
    return store.add_entry(
        variables, architecture="mlp", model_params={"hidden_sizes": [16]},
        created_epoch=epoch, role=role,
    )


@pytest.mark.integration
class TestTournamentRound:
    def test_round_records_results_and_stats(self, store):
        for i, role in enumerate([Role.DYNAMIC, Role.DYNAMIC, Role.RECENT_FIXED]):
            add_entry(store, role, seed=i)
        from keisei_tpu.league.config import ConcurrencyConfig

        cfg = LeagueConfig(
            tournament_enabled=True, tournament_num_envs=4,
            dynamic=DynamicConfig(update_every_matches=99),
            # training pairings ride the pool now — size its slots to the
            # same 4 games/pairing the sequential path used
            concurrency=ConcurrencyConfig(parallel_matches=2, envs_per_match=4),
        )
        t = LeagueTournament(store, cfg, max_pairings_per_round=2, min_pool=3,
                             min_epoch=0)
        t.dynamic_trainer = DynamicTrainer(
            store, make_model(), cfg.dynamic, contract="scalar"
        )
        assert t.is_due(epoch=5)
        stats = t.run_round(epoch=5)
        assert stats["pairings_completed"] == 2
        assert stats["total_games"] == 8  # 2 pairings x 4 pool lanes

        data = db.read_league_data(store.db_path)
        assert len(data["results"]) == 2
        r = data["results"][0]
        assert r["num_games"] == 4
        assert r["elo_after_a"] is not None
        ts = db.read_tournament_stats(store.db_path)
        assert ts["pairings_completed"] == 2
        # training match (D-vs-D) fed the dynamic trainer buffer
        assert any(t.dynamic_trainer._buffers.values())

    def test_dispatcher_enqueues(self, store):
        for i in range(3):
            add_entry(store, Role.DYNAMIC, seed=i)
        cfg = LeagueConfig(tournament_enabled=True)
        d = TournamentDispatcher(store, cfg)
        n = d.enqueue_round(epoch=7)
        assert n == 3  # all pairs of 3 entries
        from keisei_tpu.db import queue as dbq

        assert dbq.get_active_queue_depth(store.db_path) == 3

    def test_dispatcher_feeds_its_scorer(self, store):
        """Sidecar results are recorded out-of-process, so enqueued
        pairings count as played for the scorer's under-sample and repeat
        terms — otherwise the scorer stays virgin forever and the same
        top-priority pairings are re-enqueued every round (the reference's
        dead-scorer behavior, tournament_dispatcher.py:60-141)."""
        for i in range(3):
            add_entry(store, Role.DYNAMIC, seed=i)
        cfg = LeagueConfig(tournament_enabled=True,
                           dispatcher_max_queue_depth=100)
        d = TournamentDispatcher(store, cfg)
        n = d.enqueue_round(epoch=7)
        assert n == 3
        assert sum(d.scorer._pair_games.values()) == 3
        # the round history holds the dispatched set (repeat penalty live)
        assert len(d.scorer._round_history) >= 1
        assert len(d.scorer._round_history[-1]) == 3
        # scoring a just-dispatched pair is now strictly cheaper than a
        # never-dispatched one, all else equal
        entries = store.list_entries()
        a, b = entries[0], entries[1]
        before = d.scorer.score(a, b)
        d.scorer.record_result(a.id, b.id)
        assert d.scorer.score(a, b) < before


class TestHistoricalLibrary:
    def test_log_spaced_targets(self):
        t = HistoricalLibrary.compute_targets(1000, 5)
        assert t[0] == 1 and t[-1] == 1000
        assert t == sorted(t)
        # roughly geometric
        assert t[2] == pytest.approx(32, rel=0.2)

    def test_refresh_fills_slots(self, store):
        for epoch in (1, 10, 100, 400, 800):
            add_entry(store, Role.UNASSIGNED, seed=epoch, epoch=epoch)
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(slots=3))
        lib.refresh(current_epoch=800)
        slots = lib.get_slots()
        assert len(slots) == 3
        assert all(s["entry_id"] is not None for s in slots)
        # slot 0 targets epoch 1 -> nearest is the epoch-1 entry
        assert slots[0]["actual_epoch"] == 1
        assert slots[-1]["actual_epoch"] == 800

    def test_repoint_logged(self, store):
        e1 = add_entry(store, Role.UNASSIGNED, seed=1, epoch=1)
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(slots=1))
        lib.refresh(current_epoch=20)
        add_entry(store, Role.UNASSIGNED, seed=2, epoch=50)
        lib.refresh(current_epoch=50)
        data = db.read_league_data(store.db_path)
        assert any("historical_slot_repointed" in (t["reason"] or "")
                   for t in data["transitions"])


@pytest.mark.integration
class TestGauntlet:
    def test_gauntlet_one_sided_elo(self, store):
        learner = add_entry(store, Role.RECENT_FIXED, seed=0, epoch=100)
        hist = add_entry(store, Role.UNASSIGNED, seed=1, epoch=1)
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(slots=1))
        lib.refresh(current_epoch=100)
        g = HistoricalGauntlet(store, GauntletConfig(games_per_matchup=4),
                               num_envs=4, max_ply=48)
        assert g.is_due(100)
        played = g.run_gauntlet(100, learner)
        assert played >= 1
        rows = db.connect(store.db_path).execute(
            "SELECT * FROM gauntlet_results"
        ).fetchall()
        assert len(rows) == played
        # anchor's historical elo untouched
        assert store.get_entry(hist.id).elo_historical == 1000.0


@pytest.mark.integration
class TestPooledRound:
    def test_calibration_pairings_run_pooled(self, store):
        # 3 frontier entries -> all pairings are calibration (no training)
        for i in range(3):
            add_entry(store, Role.FRONTIER_STATIC, seed=i)
        from keisei_tpu.league.config import ConcurrencyConfig

        cfg = LeagueConfig(
            tournament_enabled=True, tournament_num_envs=4,
            concurrency=ConcurrencyConfig(parallel_matches=3, envs_per_match=2),
        )
        t = LeagueTournament(store, cfg, max_pairings_per_round=3, min_epoch=0)
        pairings = t.scheduler.generate_round(store.list_entries())
        pooled, sequential = t._partition_for_pool(pairings)
        assert len(pooled) == 3 and sequential == []
        stats = t.run_round(epoch=5)
        assert stats["pairings_completed"] == 3
        assert stats["total_games"] == 6  # 3 pairings x 2 envs
        data = db.read_league_data(store.db_path)
        assert len(data["results"]) == 3

    def test_training_pairings_stay_sequential(self, store):
        d1, d2 = add_entry(store, Role.DYNAMIC, 0), add_entry(store, Role.DYNAMIC, 1)
        from keisei_tpu.league.config import ConcurrencyConfig

        cfg = LeagueConfig(
            tournament_enabled=True,
            concurrency=ConcurrencyConfig(parallel_matches=4),
        )
        t = LeagueTournament(store, cfg)
        pooled, sequential = t._partition_for_pool([(d1, d2)])
        assert pooled == [] and len(sequential) == 1


class TestEloCeilingAlert:
    """Reference keisei/training/tournament.py:163-190: learner exceeding
    the strongest Frontier anchor by >=200 Elo for 2+ consecutive rounds
    warns that the pool may be too weak."""

    def _setup(self, store, learner_elo):
        frontier = add_entry(store, Role.FRONTIER_STATIC, seed=0)
        learner = add_entry(store, Role.RECENT_FIXED, seed=1)
        import sqlite3

        with sqlite3.connect(store.db_path) as conn:
            conn.execute(
                "UPDATE league_entries SET elo_rating = ? WHERE id = ?",
                (learner_elo, learner.id),
            )
        cfg = LeagueConfig(tournament_enabled=True)
        t = LeagueTournament(
            store, cfg, learner_id_fn=lambda: learner.id)
        return t, frontier, learner

    def test_streak_fires_after_two_rounds(self, store, caplog):
        t, _, _ = self._setup(store, learner_elo=1300.0)
        entries = store.list_entries()
        out1 = t._check_elo_ceiling(entries)
        assert out1["elo_ceiling_margin"] == 300.0
        assert out1["elo_ceiling_streak"] == 1
        with caplog.at_level("WARNING"):
            out2 = t._check_elo_ceiling(entries)
        assert out2["elo_ceiling_streak"] == 2
        assert any("Elo ceiling alert" in r.message for r in caplog.records)

    def test_streak_resets_below_margin(self, store, caplog):
        t, frontier, learner = self._setup(store, learner_elo=1300.0)
        entries = store.list_entries()
        assert t._check_elo_ceiling(entries)["elo_ceiling_streak"] == 1
        import sqlite3

        with sqlite3.connect(store.db_path) as conn:
            conn.execute(
                "UPDATE league_entries SET elo_rating = ? WHERE id = ?",
                (1100.0, learner.id),
            )
        with caplog.at_level("WARNING"):
            out = t._check_elo_ceiling(store.list_entries())
        assert out["elo_ceiling_streak"] == 0
        assert not any("Elo ceiling alert" in r.message for r in caplog.records)

    def test_no_frontier_no_learner_skip(self, store):
        # no learner id (sidecar workers): margin stays None
        t = LeagueTournament(store, LeagueConfig(tournament_enabled=True))
        assert t._check_elo_ceiling([])["elo_ceiling_margin"] is None
        # learner set but pool has no Frontier entry
        learner = add_entry(store, Role.DYNAMIC, seed=3)
        t2 = LeagueTournament(
            store, LeagueConfig(tournament_enabled=True),
            learner_id_fn=lambda: learner.id)
        out = t2._check_elo_ceiling(store.list_entries())
        assert out["elo_ceiling_margin"] is None
        assert out["elo_ceiling_streak"] == 0
