"""Tier managers, frontier promoter, match scheduler, priority scorer."""

import random

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.league.config import (
    DynamicConfig,
    FrontierStaticConfig,
    LeagueConfig,
    MatchSchedulerConfig,
    PriorityScorerConfig,
    RecentFixedConfig,
    league_config_from_dict,
)
from keisei_tpu.league.scheduler import (
    DYNAMIC_VS_DYNAMIC,
    MatchScheduler,
    PriorityScorer,
    classify_match,
    is_training_match,
)
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.league.tiers import (
    FrontierManager,
    FrontierPromoter,
    TieredPool,
)
from keisei_tpu.models.registry import build_model


@pytest.fixture
def store(tmp_path):
    return OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "league"))


def tiny_vars():
    model, _ = build_model("mlp", {"hidden_sizes": [8]})
    return model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                      train=False)


def add(store, role, epoch=0, elo=1000.0, games=0, elo_frontier=1000.0):
    e = store.add_entry(tiny_vars(), architecture="mlp", model_params={},
                        created_epoch=epoch, role=role)
    import keisei_tpu.db.core as dbcore
    dbcore.execute(
        store.db_path,
        "UPDATE league_entries SET elo_rating = ?, games_played = ?, "
        "elo_frontier = ? WHERE id = ?",
        (elo, games, elo_frontier, e.id),
    )
    return store.get_entry(e.id)


class TestConfig:
    def test_from_dict_with_subsections(self):
        cfg = league_config_from_dict({
            "enabled": True, "opponents_per_epoch": 2,
            "frontier": {"slots": 3}, "dynamic": {"slots": 4},
        })
        assert cfg.frontier.slots == 3 and cfg.dynamic.slots == 4
        assert cfg.recent.slots == 5  # default

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown keys"):
            league_config_from_dict({"bogus": 1})
        with pytest.raises(ValueError, match="league.frontier"):
            league_config_from_dict({"frontier": {"nope": 1}})

    def test_ratio_validation(self):
        with pytest.raises(ValueError, match="sum to 1.0"):
            MatchSchedulerConfig(learner_dynamic_ratio=0.9)


class TestFrontierPromoter:
    def cfg(self, **kw):
        return FrontierStaticConfig(
            min_games_for_promotion=10, streak_epochs=5, topk=2,
            promotion_margin_elo=50.0, max_lineage_overlap=1, **kw,
        )

    def test_empty_frontier_seeds_once_calibrated(self, store):
        p = FrontierPromoter(self.cfg())
        d = add(store, Role.DYNAMIC, games=20)
        assert p.evaluate([d], [], epoch=100) is not None
        under = add(store, Role.DYNAMIC, games=3)
        assert p.evaluate([under], [], epoch=100) is None

    def test_streak_required(self, store):
        p = FrontierPromoter(self.cfg())
        f = add(store, Role.FRONTIER_STATIC, elo_frontier=1000.0)
        d = add(store, Role.DYNAMIC, games=50, elo_frontier=1200.0)
        assert p.evaluate([d], [f], epoch=10) is None  # streak just started
        assert p.evaluate([d], [f], epoch=14) is None  # 4 < 5 epochs
        got = p.evaluate([d], [f], epoch=15)
        assert got is not None and got.id == d.id

    def test_margin_and_lineage_block(self, store):
        p = FrontierPromoter(self.cfg())
        f = add(store, Role.FRONTIER_STATIC, elo_frontier=1200.0)
        d = add(store, Role.DYNAMIC, games=50, elo_frontier=1210.0)
        p.evaluate([d], [f], epoch=0)
        assert p.evaluate([d], [f], epoch=99) is None  # margin 10 < 50
        # lineage overlap: frontier clone of d blocks a same-lineage candidate
        clone = store.clone_entry(d.id, role=Role.FRONTIER_STATIC, created_epoch=0)
        import keisei_tpu.db.core as dbcore
        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_frontier = 1000 WHERE id = ?",
                       (clone.id,))
        clone = store.get_entry(clone.id)
        d2 = store.get_entry(d.id)
        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_frontier = 1300 WHERE id = ?",
                       (d2.id,))
        d2 = store.get_entry(d2.id)
        p2 = FrontierPromoter(self.cfg())
        p2.evaluate([d2], [clone], epoch=0)
        assert p2.evaluate([d2], [clone], epoch=50) is None  # same lineage


class TestFrontierManager:
    def test_select_initial_spreads_elo(self, store):
        entries = [add(store, Role.UNASSIGNED, elo=1000 + i * 50) for i in range(9)]
        mgr = FrontierManager(store, FrontierStaticConfig())
        sel = mgr.select_initial(entries, 3)
        elos = sorted(e.elo_rating for e in sel)
        assert elos[0] == 1000 and elos[-1] == 1400  # endpoints included

    def test_review_promotes_and_retires(self, store):
        cfg = FrontierStaticConfig(
            slots=1, min_tenure_epochs=0, min_games_for_promotion=1,
            streak_epochs=0, review_interval_epochs=1, promotion_margin_elo=0.0,
            max_lineage_overlap=99,
        )
        mgr = FrontierManager(store, cfg)
        old_f = add(store, Role.FRONTIER_STATIC, epoch=0, elo_frontier=900.0)
        d = add(store, Role.DYNAMIC, games=10, elo_frontier=1300.0)
        new_entry = mgr.review(epoch=10)
        assert new_entry is not None
        assert store.get_entry(old_f.id).status == "retired"
        assert new_entry.role == Role.FRONTIER_STATIC
        assert new_entry.parent_entry_id == d.id


class TestTieredPool:
    def make_pool(self, store, recent_slots=2, soft_overflow=0):
        cfg = LeagueConfig(
            recent=RecentFixedConfig(
                slots=recent_slots, soft_overflow=soft_overflow,
                min_games_for_review=0, min_unique_opponents=0,
            ),
            dynamic=DynamicConfig(slots=3, min_games_before_eviction=0,
                                  protection_matches=0),
        )
        return TieredPool(store, cfg)

    def test_snapshot_overflow_promotes_to_dynamic(self, store):
        pool = self.make_pool(store)
        v = tiny_vars()
        for epoch in (1, 2, 3):
            pool.snapshot_learner(v, "mlp", {}, epoch)
        # 3 admitted, slots=2 -> oldest reviewed; fully calibrated (0 mins)
        # -> PROMOTE to dynamic (clone) and retire from recent
        assert pool.recent.count() == 2
        assert pool.dynamic.count() == 1
        dyn = store.list_by_role(Role.DYNAMIC)[0]
        assert dyn.parent_entry_id is not None

    def test_dynamic_eviction_when_full(self, store):
        pool = self.make_pool(store)
        weak = add(store, Role.DYNAMIC, elo=800, games=10)
        import keisei_tpu.db.core as dbcore
        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_dynamic = 700 WHERE id = ?",
                       (weak.id,))
        add(store, Role.DYNAMIC, elo=1100, games=10)
        add(store, Role.DYNAMIC, elo=1200, games=10)
        src = add(store, Role.RECENT_FIXED, elo=1000)
        admitted = pool.dynamic.admit(src, epoch=5)
        assert admitted is not None
        assert store.get_entry(weak.id).status == "retired"
        assert pool.dynamic.count() == 3

    def test_bootstrap_from_flat_pool(self, store):
        pool = self.make_pool(store)
        for i in range(8):
            add(store, Role.UNASSIGNED, epoch=i, elo=1000 + i * 30)
        pool.bootstrap_from_flat_pool(epoch=8)
        roles = {r: len(store.list_by_role(r)) for r in
                 (Role.RECENT_FIXED, Role.FRONTIER_STATIC, Role.DYNAMIC,
                  Role.UNASSIGNED)}
        assert roles[Role.UNASSIGNED] == 0
        assert roles[Role.RECENT_FIXED] == 2
        assert roles[Role.FRONTIER_STATIC] == 2
        assert roles[Role.DYNAMIC] == 4


class TestScheduler:
    def entries(self, store):
        return {
            Role.DYNAMIC: [add(store, Role.DYNAMIC) for _ in range(3)],
            Role.FRONTIER_STATIC: [add(store, Role.FRONTIER_STATIC)],
            Role.RECENT_FIXED: [add(store, Role.RECENT_FIXED)],
        }

    def test_classify(self, store):
        d1, d2 = add(store, Role.DYNAMIC), add(store, Role.DYNAMIC)
        f = add(store, Role.FRONTIER_STATIC)
        assert classify_match(d1, d2) == DYNAMIC_VS_DYNAMIC
        assert is_training_match(d1, d2)
        assert not is_training_match(d1, f)

    def test_challenge_threshold_halves_mastered_tier(self, store):
        by_role = self.entries(store)
        sched = MatchScheduler(MatchSchedulerConfig(), rng=random.Random(0))
        base = sched.effective_ratios(by_role)
        assert base[Role.DYNAMIC] == pytest.approx(0.5)
        for _ in range(20):
            sched.record_learner_result(Role.DYNAMIC, True)
        adj = sched.effective_ratios(by_role)
        assert adj[Role.DYNAMIC] < base[Role.DYNAMIC]
        assert sum(adj.values()) == pytest.approx(1.0)

    def test_sample_k_distinct(self, store):
        by_role = self.entries(store)
        sched = MatchScheduler(MatchSchedulerConfig(), rng=random.Random(1))
        got = sched.sample_k_for_learner(by_role, 4)
        assert len(got) == 4
        assert len({e.id for e in got}) == 4

    def test_generate_round_full_priority_order(self, store):
        by_role = self.entries(store)
        flat = [e for v in by_role.values() for e in v]
        scorer = PriorityScorer(PriorityScorerConfig())
        sched = MatchScheduler(MatchSchedulerConfig(tournament_mode="full"),
                               scorer, rng=random.Random(2))
        pairs = sched.generate_round(flat)
        assert len(pairs) == len(flat) * (len(flat) - 1) // 2
        scores = [scorer.score(a, b) for a, b in pairs]
        assert scores == sorted(scores, reverse=True)

    def test_weighted_round_coverage(self, store):
        by_role = self.entries(store)
        flat = [e for v in by_role.values() for e in v]
        scorer = PriorityScorer(PriorityScorerConfig())
        sched = MatchScheduler(
            MatchSchedulerConfig(tournament_mode="weighted", min_coverage_ratio=1.0),
            scorer, rng=random.Random(3),
        )
        pairs = sched.generate_round(flat)
        covered = {e.id for p in pairs for e in p}
        assert covered == {e.id for e in flat}

    def test_priority_repeat_penalty(self, store):
        a, b = add(store, Role.DYNAMIC), add(store, Role.DYNAMIC)
        scorer = PriorityScorer(PriorityScorerConfig())
        s0 = scorer.score(a, b)
        scorer.record_round_result(a.id, b.id)
        scorer.advance_round()
        assert scorer.score(a, b) < s0
        # under-sample bonus decays with games played
        scorer2 = PriorityScorer(PriorityScorerConfig())
        s1 = scorer2.score(a, b)
        scorer2.record_result(a.id, b.id)
        assert scorer2.score(a, b) < s1


class TestLifecycleEdges:
    """Cooldowns, protection, hard caps — tier_managers.py:36-511 edges."""

    def test_frontier_tenure_cooldown_blocks_retirement(self, store):
        """All frontier seats under min_tenure -> review skips entirely
        (no retirement AND no promotion past a full tier)."""
        cfg = FrontierStaticConfig(
            slots=2, min_games_for_promotion=1, streak_epochs=0, topk=2,
            promotion_margin_elo=0.0, min_tenure_epochs=100,
        )
        mgr = FrontierManager(store, cfg)
        f1 = add(store, Role.FRONTIER_STATIC, epoch=50, elo_frontier=1000)
        f2 = add(store, Role.FRONTIER_STATIC, epoch=60, elo_frontier=1010)
        d = add(store, Role.DYNAMIC, games=50, elo_frontier=1500)
        mgr.promoter.evaluate([d], [f1, f2], epoch=70)  # start streak
        assert mgr.review(epoch=80) is None
        roles = {e.id: e.role for e in store.list_entries()}
        assert roles[f1.id] == Role.FRONTIER_STATIC
        assert roles[f2.id] == Role.FRONTIER_STATIC

    def test_frontier_review_retires_one_seat_after_tenure(self, store):
        cfg = FrontierStaticConfig(
            slots=2, min_games_for_promotion=1, streak_epochs=0, topk=2,
            promotion_margin_elo=0.0, min_tenure_epochs=5,
            max_lineage_overlap=99,
        )
        mgr = FrontierManager(store, cfg)
        add(store, Role.FRONTIER_STATIC, epoch=0, elo_frontier=900)
        add(store, Role.FRONTIER_STATIC, epoch=0, elo_frontier=1100)
        d = add(store, Role.DYNAMIC, games=50, elo_frontier=1500)
        mgr.promoter.evaluate([d], mgr.get_active(), epoch=50)
        promoted = mgr.review(epoch=50)
        assert promoted is not None
        frontier = store.list_by_role(Role.FRONTIER_STATIC)
        assert len(frontier) == 2  # one in, one out

    def test_streak_resets_when_dropping_out_of_topk(self, store):
        cfg = FrontierStaticConfig(
            min_games_for_promotion=1, streak_epochs=10, topk=1,
            promotion_margin_elo=0.0,
        )
        p = FrontierPromoter(cfg)
        f = add(store, Role.FRONTIER_STATIC, elo_frontier=1000)
        d1 = add(store, Role.DYNAMIC, games=50, elo_frontier=1200)
        d2 = add(store, Role.DYNAMIC, games=50, elo_frontier=1100)
        assert p.evaluate([d1, d2], [f], epoch=0) is None  # d1 streak starts
        # d2 overtakes: d1 drops out of top-1, its streak clock resets
        import keisei_tpu.db.core as dbcore

        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_frontier = 1300 WHERE id = ?",
                       (d2.id,))
        d2 = store.get_entry(d2.id)
        assert p.evaluate([d1, d2], [f], epoch=5) is None  # d2 streak starts
        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET elo_frontier = 1400 WHERE id = ?",
                       (d1.id,))
        d1 = store.get_entry(d1.id)
        # d1 re-enters top-1 at epoch 8: old streak (from 0) must NOT count
        assert p.evaluate([d1, d2], [f], epoch=8) is None
        assert p.evaluate([d1, d2], [f], epoch=17) is None  # 9 < 10
        got = p.evaluate([d1, d2], [f], epoch=18)
        assert got is not None and got.id == d1.id

    def test_dynamic_protection_blocks_eviction(self, store):
        from keisei_tpu.league.tiers import DynamicManager

        cfg = DynamicConfig(slots=1, protection_matches=5,
                            min_games_before_eviction=0)
        mgr = DynamicManager(store, cfg)
        src = add(store, Role.RECENT_FIXED, elo=1000)
        first = mgr.admit(src, epoch=0)  # fills the tier, protected
        assert first is not None and first.protection_remaining == 5
        # second admit: the only occupant is protected -> nothing evictable
        src2 = add(store, Role.RECENT_FIXED, elo=900)
        assert mgr.admit(src2, epoch=1) is None
        assert len(store.list_by_role(Role.DYNAMIC)) == 1

    def test_dynamic_min_games_blocks_eviction(self, store):
        from keisei_tpu.league.tiers import DynamicManager

        cfg = DynamicConfig(slots=1, protection_matches=0,
                            min_games_before_eviction=10)
        mgr = DynamicManager(store, cfg)
        src = add(store, Role.RECENT_FIXED)
        occupant = mgr.admit(src, epoch=0)
        assert occupant is not None
        assert mgr.evict_weakest() is None  # 0 games < 10
        import keisei_tpu.db.core as dbcore

        dbcore.execute(store.db_path,
                       "UPDATE league_entries SET games_played = 20 WHERE id = ?",
                       (occupant.id,))
        evicted = mgr.evict_weakest()
        assert evicted is not None and evicted.id == occupant.id

    def test_recent_hard_cap_forces_retirement(self, store):
        """DELAY verdicts stop at the hard cap: slots + soft_overflow."""
        lc = LeagueConfig(
            recent=RecentFixedConfig(
                slots=1, soft_overflow=1, min_games_for_review=100,
                min_unique_opponents=99,
            ),
            dynamic=DynamicConfig(slots=10),
            max_active_entries=50,
        )
        pool = TieredPool(store, lc)
        for i in range(4):
            pool.snapshot_learner(tiny_vars(), "mlp", {}, epoch=i)
        # hard cap = slots + soft_overflow = 2 active recent entries
        assert len(store.list_by_role(Role.RECENT_FIXED)) <= 2

    def test_pool_hard_cap_retires_oldest_recent(self, store):
        lc = LeagueConfig(
            recent=RecentFixedConfig(slots=5, min_games_for_review=100,
                                     min_unique_opponents=99,
                                     soft_overflow=5),
            max_active_entries=3,
        )
        pool = TieredPool(store, lc)
        ids = [pool.snapshot_learner(tiny_vars(), "mlp", {}, epoch=i).id
               for i in range(5)]
        assert store.pool_size() <= 3
        active = {e.id for e in store.list_entries()}
        # the newest snapshots survive, the oldest were retired
        assert ids[-1] in active and ids[0] not in active

    def test_bootstrap_noop_without_unassigned(self, store):
        lc = LeagueConfig()
        pool = TieredPool(store, lc)
        add(store, Role.DYNAMIC)
        before = {(e.id, e.role) for e in store.list_entries()}
        pool.bootstrap_from_flat_pool(epoch=0)
        after = {(e.id, e.role) for e in store.list_entries()}
        assert before == after


class TestForcedFrontierReview:
    """Round-5 adaptive refresh: the Elo-ceiling alert forces a frontier
    review off-calendar (docs/plateau-postmortem.md pool finding)."""

    def test_force_bypasses_calendar(self, tmp_path, monkeypatch):
        import jax
        import jax.numpy as jnp

        from keisei_tpu.league.config import LeagueConfig
        from keisei_tpu.league.store import OpponentStore, Role
        from keisei_tpu.league.tiers import TieredPool
        from keisei_tpu.models.registry import build_model

        store = OpponentStore(str(tmp_path / "l.db"), str(tmp_path / "lg"))
        model, _ = build_model("mlp", {"hidden_sizes": [8]})
        v = model.init(jax.random.key(0),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        store.add_entry(v, architecture="mlp", model_params={},
                        created_epoch=0, role=Role.DYNAMIC)
        pool = TieredPool(store, LeagueConfig())
        calls = []
        monkeypatch.setattr(pool.frontier, "review",
                            lambda epoch: calls.append(epoch))
        # off-calendar epoch: the periodic gate skips...
        assert not pool.frontier.is_due_for_review(3)
        pool.maybe_review_frontier(3)
        assert calls == []
        # ...force runs it anyway
        pool.maybe_review_frontier(3, force=True)
        assert calls == [3]
