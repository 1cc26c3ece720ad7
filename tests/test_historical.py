"""Historical milestone library + gauntlet: slot selection and one-sided Elo.

Pins the reference's two-pass snap-to-nearest slot refresh (50% proximity
threshold then backfill, historical_library.py:46-191), repoint transition
logging, due-gates, and the gauntlet's frozen-anchor Elo update
(historical_gauntlet.py:21-220; role_elo.py:31-146 one-sided semantics).
"""

import jax
import jax.numpy as jnp
import pytest

from keisei_tpu import db
from keisei_tpu.db import core as dbcore
from keisei_tpu.league.config import GauntletConfig, HistoricalLibraryConfig
from keisei_tpu.league.historical import HistoricalGauntlet, HistoricalLibrary
from keisei_tpu.league.match import MatchResult
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))


_VARS = None


def tiny_vars():
    global _VARS
    if _VARS is None:
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        _VARS = model.init(jax.random.key(0),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
    return _VARS


def add(store, epoch, status="active"):
    e = store.add_entry(tiny_vars(), architecture="mlp", model_params={},
                        created_epoch=epoch, role=Role.RECENT_FIXED)
    if status != "active":
        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET status = ? WHERE id = ?",
                       (status, e.id))
    return store.get_entry(e.id)


class TestTargets:
    def test_log_spacing_endpoints(self):
        t = HistoricalLibrary.compute_targets(100, 5)
        assert t[0] == 1 and t[-1] == 100
        assert t == sorted(t)
        # log-spaced: ratios roughly constant (100^(1/4) ~ 3.16)
        assert t == [1, 3, 10, 32, 100]

    def test_single_slot(self):
        assert HistoricalLibrary.compute_targets(7, 1) == [7]
        assert HistoricalLibrary.compute_targets(0, 1) == [1]

    def test_tiny_epoch(self):
        t = HistoricalLibrary.compute_targets(1, 5)
        assert t[0] == 1 and t[-1] == 2  # clamped to e>=2 for log spacing


class TestRefresh:
    def cfg(self, **kw):
        base = dict(enabled=True, slots=5, refresh_interval_epochs=10,
                    min_epoch_for_selection=5)
        base.update(kw)
        return HistoricalLibraryConfig(**base)

    def test_due_gates(self, store):
        lib = HistoricalLibrary(store, self.cfg())
        assert not lib.is_due_for_refresh(4)     # below min epoch
        assert not lib.is_due_for_refresh(15)    # not on interval
        assert lib.is_due_for_refresh(20)
        assert not HistoricalLibrary(
            store, self.cfg(enabled=False)).is_due_for_refresh(20)

    def test_exact_candidates_fill_log_spaced(self, store):
        lib = HistoricalLibrary(store, self.cfg())
        for ep in [1, 3, 10, 32, 100]:
            add(store, ep, status="retired")
        lib.refresh(100)
        slots = lib.get_slots()
        assert len(slots) == 5
        assert [s["actual_epoch"] for s in slots] == [1, 3, 10, 32, 100]
        assert all(s["selection_mode"] == "log_spaced" for s in slots)

    def test_far_candidates_become_fallback(self, store):
        """Candidates outside 50% of neighbor spacing only land in pass 2."""
        lib = HistoricalLibrary(store, self.cfg())
        for ep in [50, 55, 60]:  # all clustered near the top targets
            add(store, ep)
        lib.refresh(100)
        slots = lib.get_slots()
        filled = [s for s in slots if s["entry_id"] is not None]
        assert len(filled) == 3
        # cluster cannot be "log_spaced" for the early targets
        assert any(s["selection_mode"] == "fallback" for s in filled)

    def test_each_entry_used_once(self, store):
        lib = HistoricalLibrary(store, self.cfg())
        add(store, 1)
        add(store, 100)
        lib.refresh(100)
        ids = [s["entry_id"] for s in lib.get_slots() if s["entry_id"]]
        assert len(ids) == len(set(ids)) == 2

    def test_repoint_logs_transition(self, store):
        lib = HistoricalLibrary(store, self.cfg(slots=2))
        a = add(store, 1)
        lib.refresh(10)
        n0 = len(db.read_league_data(store.db_path)["transitions"])
        assert n0 >= 1  # initial fills logged
        # same assignment again -> no new transitions
        lib.refresh(10)
        assert len(db.read_league_data(store.db_path)["transitions"]) == n0
        # a closer candidate repoints slot 1 -> one new transition
        b = add(store, 10)
        lib.refresh(10)
        trans = db.read_league_data(store.db_path)["transitions"]
        assert len(trans) > n0
        assert any("historical_slot_repointed" in (t["reason"] or "")
                   and f"new={b.id}" in t["reason"] for t in trans)
        del a

    def test_empty_pool_writes_empty_slots(self, store):
        lib = HistoricalLibrary(store, self.cfg())
        lib.refresh(50)
        slots = lib.get_slots()
        assert len(slots) == 5
        assert all(s["entry_id"] is None for s in slots)

    def test_retired_entries_preferred(self, store):
        """Stability preference: retired (frozen) entries are snapped before
        active ones at equal distance."""
        lib = HistoricalLibrary(store, self.cfg(slots=1))
        active = add(store, 10, status="active")
        retired = add(store, 10, status="retired")
        lib.refresh(10)
        slot = lib.get_slots()[0]
        assert slot["entry_id"] == retired.id
        del active


class StubRunner:
    """Deterministic stand-in for make_match_runner's compiled closure."""

    def __init__(self, result):
        self.result = result
        self.calls = 0

    def __call__(self, va, vb, seed=0):
        self.calls += 1
        return self.result


class TestGauntlet:
    def gauntlet(self, store, result, k=12.0):
        g = HistoricalGauntlet(store, GauntletConfig(
            enabled=True, interval_epochs=5, games_per_matchup=4),
            historical_k=k)
        stub = StubRunner(result)
        g._runner = lambda a, b: stub
        return g, stub

    def test_due_gate(self, store):
        g = HistoricalGauntlet(store, GauntletConfig(enabled=True,
                                                     interval_epochs=5))
        assert g.is_due(5) and g.is_due(10)
        assert not g.is_due(7)
        g2 = HistoricalGauntlet(store, GauntletConfig(enabled=False,
                                                      interval_epochs=5))
        assert not g2.is_due(5)

    def test_one_sided_elo_update(self, store):
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(
            enabled=True, slots=1, refresh_interval_epochs=1,
            min_epoch_for_selection=0))
        anchor = add(store, 1, status="retired")
        learner = add(store, 20)
        lib.refresh(20)
        g, stub = self.gauntlet(
            store, MatchResult(wins_a=4, wins_b=0, draws=0, games=4,
                               total_plies=400))
        played = g.run_gauntlet(epoch=20, learner_entry=learner)
        assert played == 1 and stub.calls == 1
        after_l = store.get_entry(learner.id)
        after_a = store.get_entry(anchor.id)
        assert after_l.elo_historical > 1000.0     # learner moved up
        assert after_a.elo_historical == 1000.0    # anchor frozen
        rows = dbcore.fetch_all(store.db_path,
                                "SELECT * FROM gauntlet_results")
        assert len(rows) == 1
        assert rows[0]["wins"] == 4 and rows[0]["elo_after"] > rows[0]["elo_before"]

    def test_zero_game_result_skipped(self, store):
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(
            enabled=True, slots=1, refresh_interval_epochs=1,
            min_epoch_for_selection=0))
        add(store, 1)
        learner = add(store, 20)
        lib.refresh(20)
        g, _ = self.gauntlet(store, MatchResult(0, 0, 0, 0, 0))
        assert g.run_gauntlet(epoch=20, learner_entry=learner) == 0
        assert not dbcore.fetch_all(store.db_path,
                                    "SELECT * FROM gauntlet_results")

    def test_empty_slots_noop(self, store):
        learner = add(store, 20)
        g, stub = self.gauntlet(store, MatchResult(1, 0, 0, 1, 10))
        assert g.run_gauntlet(epoch=20, learner_entry=learner) == 0
        assert stub.calls == 0

    def test_runner_failure_isolated(self, store):
        """One slot's failure must not abort the remaining slots."""
        lib = HistoricalLibrary(store, HistoricalLibraryConfig(
            enabled=True, slots=2, refresh_interval_epochs=1,
            min_epoch_for_selection=0))
        add(store, 1)
        add(store, 10)
        learner = add(store, 20)
        lib.refresh(20)

        calls = {"n": 0}

        class Flaky:
            def __call__(self, va, vb, seed=0):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("boom")
                return MatchResult(2, 1, 1, 4, 100)

        g = HistoricalGauntlet(store, GauntletConfig(
            enabled=True, interval_epochs=5, games_per_matchup=4))
        g._runner = lambda a, b: Flaky()
        assert g.run_gauntlet(epoch=20, learner_entry=learner) == 1
        assert calls["n"] == 2
