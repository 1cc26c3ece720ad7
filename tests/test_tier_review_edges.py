"""RecentFixedManager.review_oldest decision branches, DynamicManager
trainable/weakest helpers, and scheduler tier win-rate gating — the tier
semantics VERDICT r1 called out (reference tier_managers.py:277-511,
match_scheduler.py:108-152).
"""

import jax
import jax.numpy as jnp
import pytest

import keisei_tpu.db.core as dbcore
from keisei_tpu.db import league_tables
from keisei_tpu.league.config import (
    DynamicConfig,
    MatchSchedulerConfig,
    RecentFixedConfig,
)
from keisei_tpu.league.scheduler import MatchScheduler
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.league.tiers import DELAY, PROMOTE, RETIRE, DynamicManager, RecentFixedManager
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))


def tiny_vars():
    model, _ = build_model("mlp", {"hidden_sizes": [8]})
    return model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                      train=False)


def add(store, role, epoch=0, elo=1000.0, games=0, **cols):
    e = store.add_entry(tiny_vars(), architecture="mlp", model_params={},
                        created_epoch=epoch, role=role)
    cols = {"elo_rating": elo, "games_played": games, **cols}
    sets = ", ".join(f"{k} = ?" for k in cols)
    dbcore.execute(store.db_path,
                   f"UPDATE league_entries SET {sets} WHERE id = ?",
                   (*cols.values(), e.id))
    return store.get_entry(e.id)


def record_n_opponents(store, entry, opponents):
    for opp in opponents:
        store.record_result(entry.id, opp.id, epoch=1, wins_a=1, wins_b=0,
                            draws=0)


RFC = RecentFixedConfig(slots=2, min_games_for_review=4,
                        min_unique_opponents=2, promotion_margin_elo=25.0,
                        max_elo_spread=200.0, soft_overflow=1)


class TestReviewOldest:
    def test_empty_tier_raises(self, store):
        mgr = RecentFixedManager(store, RFC)
        with pytest.raises(ValueError, match="empty"):
            mgr.review_oldest()

    def test_promote_when_calibrated(self, store):
        mgr = RecentFixedManager(store, RFC)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=10)
        opps = [add(store, Role.DYNAMIC, epoch=1) for _ in range(2)]
        record_n_opponents(store, oldest, opps)
        verdict, entry = mgr.review_oldest()
        assert verdict == PROMOTE
        assert entry.id == oldest.id

    def test_delay_when_undercalibrated_within_overflow(self, store):
        mgr = RecentFixedManager(store, RFC)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=1)  # games_ok False
        add(store, Role.RECENT_FIXED, epoch=2, games=0)
        # count=2 == slots, overflow_used=0 <= soft_overflow -> DELAY
        verdict, entry = mgr.review_oldest()
        assert verdict == DELAY
        assert entry.id == oldest.id

    def test_retire_when_overflow_exhausted(self, store):
        mgr = RecentFixedManager(store, RFC)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=1)
        for i in range(3):
            add(store, Role.RECENT_FIXED, epoch=2 + i, games=0)
        # count=4, slots=2, overflow_used=2 > soft_overflow=1 -> RETIRE
        verdict, entry = mgr.review_oldest()
        assert verdict == RETIRE
        assert entry.id == oldest.id

    def test_retire_when_below_dynamic_floor(self, store):
        """Calibrated but weak: elo below floor - margin is not promotable,
        and calibrated entries can't DELAY -> RETIRE."""
        mgr = RecentFixedManager(store, RFC)
        mgr.set_weakest_elo_fn(lambda: 1200.0)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=10, elo=1100.0)
        opps = [add(store, Role.DYNAMIC, epoch=1) for _ in range(2)]
        record_n_opponents(store, oldest, opps)
        verdict, _ = mgr.review_oldest()
        assert verdict == RETIRE

    def test_margin_saves_borderline_entry(self, store):
        mgr = RecentFixedManager(store, RFC)
        mgr.set_weakest_elo_fn(lambda: 1010.0)  # floor - margin = 985
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=10, elo=1000.0)
        opps = [add(store, Role.DYNAMIC, epoch=1) for _ in range(2)]
        record_n_opponents(store, oldest, opps)
        verdict, _ = mgr.review_oldest()
        assert verdict == PROMOTE

    def test_unstable_elo_delays(self, store):
        """High spread = still moving; hold within overflow budget."""
        cfg = RecentFixedConfig(slots=2, min_games_for_review=4,
                                min_unique_opponents=2, max_elo_spread=50.0)
        mgr = RecentFixedManager(store, cfg)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=10)
        opps = [add(store, Role.DYNAMIC, epoch=1) for _ in range(2)]
        record_n_opponents(store, oldest, opps)
        for epoch, elo in enumerate([1000.0, 1100.0]):  # spread 100 > 50
            league_tables.write_elo_history(store.db_path, oldest.id, epoch, elo)
        verdict, _ = mgr.review_oldest()
        assert verdict == DELAY

    def test_small_pool_relaxes_unique_opponents(self, store):
        """min_unique_opponents is capped at pool-1 so tiny pools can
        still calibrate (reference tier_managers.py small-pool clamp)."""
        mgr = RecentFixedManager(store, RFC)
        oldest = add(store, Role.RECENT_FIXED, epoch=1, games=10)
        opp = add(store, Role.DYNAMIC, epoch=1)
        record_n_opponents(store, oldest, [opp])  # only 1 unique < cfg's 2
        verdict, _ = mgr.review_oldest(total_active_count=2)
        assert verdict == PROMOTE


DC = DynamicConfig(slots=2, protection_matches=0, min_games_before_eviction=2)


class TestDynamicHelpers:
    def test_get_trainable_filters_disabled_and_flagged(self, store):
        mgr = DynamicManager(store, DC)
        a = add(store, Role.DYNAMIC)
        b = add(store, Role.DYNAMIC)
        store.set_training_enabled(b.id, False)
        ids = {e.id for e in mgr.get_trainable()}
        assert ids == {a.id}
        assert mgr.get_trainable(disabled_entries={a.id}) == []

    def test_get_trainable_empty_when_tier_training_off(self, store):
        mgr = DynamicManager(store, DynamicConfig(slots=2, training_enabled=False))
        add(store, Role.DYNAMIC)
        assert mgr.get_trainable() == []

    def test_weakest_elo_ignores_protected_and_fresh(self, store):
        mgr = DynamicManager(store, DC)
        add(store, Role.DYNAMIC, elo=900.0, games=10,
            protection_remaining=5)                      # protected
        add(store, Role.DYNAMIC, elo=950.0, games=0)     # too few games
        c = add(store, Role.DYNAMIC, elo=1050.0, games=10)
        assert mgr.weakest_elo() == pytest.approx(c.elo_rating)

    def test_weakest_none_when_no_eligible(self, store):
        mgr = DynamicManager(store, DC)
        add(store, Role.DYNAMIC, games=0)
        assert mgr.weakest_elo() is None
        assert mgr.weakest_dynamic_elo() is None

    def test_is_full(self, store):
        mgr = DynamicManager(store, DC)
        assert not mgr.is_full()
        add(store, Role.DYNAMIC)
        add(store, Role.DYNAMIC)
        assert mgr.is_full()


class TestTierWinRate:
    def test_needs_ten_outcomes(self, store):
        sched = MatchScheduler(MatchSchedulerConfig())
        for _ in range(9):
            sched.record_learner_result(Role.DYNAMIC, True)
        assert sched.tier_win_rate(Role.DYNAMIC) is None
        sched.record_learner_result(Role.DYNAMIC, False)
        assert sched.tier_win_rate(Role.DYNAMIC) == pytest.approx(0.9)

    def test_unknown_tier_is_none(self, store):
        sched = MatchScheduler(MatchSchedulerConfig())
        assert sched.tier_win_rate("nonsense") is None
