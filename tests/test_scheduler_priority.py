"""Priority-scorer term-by-term pins + scheduler sampling/round edges.

Complements tests/test_league_tiers.py (which drives these through the real
store): here entries are plain in-memory OpponentEntry values so each scoring
term and sampling branch is isolated and cheap. Semantics pinned to the
reference priority_scorer.py:49-121 and match_scheduler.py:108-427.
"""

import random

import pytest

from keisei_tpu.league.config import MatchSchedulerConfig, PriorityScorerConfig
from keisei_tpu.league.scheduler import (
    DYNAMIC_VS_DYNAMIC,
    DYNAMIC_VS_RECENT,
    FRONTIER_VS_FRONTIER,
    OTHER,
    MatchScheduler,
    PriorityScorer,
    build_match_class_weights,
    classify_match,
    is_training_match,
)
from keisei_tpu.league.store import OpponentEntry, Role

_NEXT_ID = iter(range(1, 10_000))


def entry(role=Role.DYNAMIC, elo=1000.0, lineage=None, parent=None,
          games_vs_frontier=0, id=None):
    return OpponentEntry(
        id=id if id is not None else next(_NEXT_ID),
        display_name="t", architecture="mlp", model_params={},
        checkpoint_path="/tmp/x", elo_rating=elo, created_epoch=0,
        games_played=0, created_at="t0", role=role, lineage_group=lineage,
        parent_entry_id=parent, games_vs_frontier=games_vs_frontier,
    )


def isolated(**overrides):
    """Config with every weight zeroed except the ones under test."""
    zeros = dict(under_sample_weight=0.0, uncertainty_weight=0.0,
                 recent_fixed_bonus=0.0, diversity_weight=0.0,
                 match_class_weight=0.0, frontier_exposure_weight=0.0,
                 repeat_penalty=0.0, lineage_penalty=0.0)
    zeros.update(overrides)
    return PriorityScorerConfig(**zeros)


class TestClassify:
    def test_unassigned_is_other(self):
        a, b = entry(Role.UNASSIGNED), entry(Role.DYNAMIC)
        assert classify_match(a, b) == OTHER
        assert not is_training_match(a, b)

    def test_training_classes(self):
        d1, d2 = entry(Role.DYNAMIC), entry(Role.DYNAMIC)
        r = entry(Role.RECENT_FIXED)
        f = entry(Role.FRONTIER_STATIC)
        assert is_training_match(d1, d2)
        assert is_training_match(d1, r)
        assert not is_training_match(d1, f)
        assert not is_training_match(r, f)

    def test_frontier_vs_frontier_weight_zero(self):
        w = build_match_class_weights(MatchSchedulerConfig())
        assert w[FRONTIER_VS_FRONTIER] == 0.0
        assert w[OTHER] == 0.0
        assert w[DYNAMIC_VS_DYNAMIC] > 0


class TestScorerTerms:
    def test_under_sample_decay(self):
        s = PriorityScorer(isolated(under_sample_weight=1.0))
        a, b = entry(), entry()
        assert s.score(a, b) == pytest.approx(1.0)  # unplayed: 1/(0+1)
        s.record_result(a.id, b.id)
        assert s.score(a, b) == pytest.approx(0.5)
        s.record_result(b.id, a.id)  # order-insensitive key
        assert s.score(a, b) == pytest.approx(1 / 3)

    def test_uncertainty_band(self):
        s = PriorityScorer(isolated(uncertainty_weight=1.0))
        assert s.score(entry(elo=1000), entry(elo=1099)) == pytest.approx(1.0)
        assert s.score(entry(elo=1000), entry(elo=1100)) == pytest.approx(0.0)

    def test_recent_fixed_bonus(self):
        s = PriorityScorer(isolated(recent_fixed_bonus=1.0))
        assert s.score(entry(Role.RECENT_FIXED), entry()) == pytest.approx(1.0)
        assert s.score(entry(), entry()) == pytest.approx(0.0)

    def test_lineage_diversity(self):
        s = PriorityScorer(isolated(diversity_weight=1.0))
        assert s.score(entry(lineage="a"), entry(lineage="b")) == pytest.approx(1.0)
        assert s.score(entry(lineage="a"), entry(lineage="a")) == pytest.approx(0.0)
        # untracked lineage scores the optimistic default
        assert s.score(entry(lineage=None), entry(lineage="a")) == pytest.approx(1.0)

    def test_match_class_term_uses_weights(self):
        s = PriorityScorer(isolated(match_class_weight=1.0),
                           match_class_weights={DYNAMIC_VS_DYNAMIC: 2.5,
                                                DYNAMIC_VS_RECENT: 0.5})
        assert s.score(entry(), entry()) == pytest.approx(2.5)
        assert s.score(entry(), entry(Role.RECENT_FIXED)) == pytest.approx(0.5)
        # unknown class -> 0
        assert s.score(entry(Role.FRONTIER_STATIC),
                       entry(Role.FRONTIER_STATIC)) == pytest.approx(0.0)

    def test_frontier_exposure_gate(self):
        cfg = isolated(frontier_exposure_weight=1.0)
        s = PriorityScorer(cfg)
        f = entry(Role.FRONTIER_STATIC)
        fresh = entry(Role.DYNAMIC, games_vs_frontier=0)
        veteran = entry(Role.DYNAMIC,
                        games_vs_frontier=cfg.frontier_exposure_threshold)
        assert s.score(fresh, f) == pytest.approx(1.0)
        assert s.score(f, fresh) == pytest.approx(1.0)  # side-symmetric
        assert s.score(veteran, f) == pytest.approx(0.0)
        # dynamic-vs-dynamic never gets the bonus
        assert s.score(fresh, entry(Role.DYNAMIC)) == pytest.approx(0.0)

    def test_repeat_penalty_windowed(self):
        cfg = isolated(repeat_penalty=-1.0)
        s = PriorityScorer(cfg)
        a, b = entry(), entry()
        for _ in range(cfg.repeat_window_rounds + 3):
            s.record_round_result(a.id, b.id)
            s.advance_round()
        # deque maxlen caps the accumulated penalty at the window size
        assert s.score(a, b) == pytest.approx(-cfg.repeat_window_rounds)
        # rounds without the pairing age the penalty out
        for _ in range(cfg.repeat_window_rounds):
            s.advance_round()
        assert s.score(a, b) == pytest.approx(0.0)

    def test_lineage_closeness_parent_beats_group(self):
        s = PriorityScorer(isolated(lineage_penalty=-1.0))
        parent = entry(lineage="g")
        child = entry(lineage="g", parent=parent.id)
        sibling = entry(lineage="g")
        stranger = entry(lineage="h")
        assert s.score(parent, child) == pytest.approx(-1.0)
        assert s.score(child, sibling) == pytest.approx(-0.5)
        assert s.score(parent, stranger) == pytest.approx(0.0)

    def test_sort_descending(self):
        s = PriorityScorer(isolated(uncertainty_weight=1.0,
                                    under_sample_weight=1.0))
        close = (entry(elo=1000), entry(elo=1001))
        far = (entry(elo=1000), entry(elo=1500))
        played = (entry(elo=1000), entry(elo=1002))
        s.record_result(*[e.id for e in played])
        out = s.sort_by_priority([far, played, close])
        assert out[0] == close and out[-1] == far


class TestSchedulerSampling:
    def entries(self, nd=3, nf=2, nr=2):
        return {
            Role.DYNAMIC: [entry(Role.DYNAMIC) for _ in range(nd)],
            Role.FRONTIER_STATIC: [entry(Role.FRONTIER_STATIC) for _ in range(nf)],
            Role.RECENT_FIXED: [entry(Role.RECENT_FIXED) for _ in range(nr)],
        }

    def test_ratios_renormalize_over_nonempty(self):
        sch = MatchScheduler(MatchSchedulerConfig())
        e = self.entries(nd=2, nf=0, nr=2)
        e[Role.FRONTIER_STATIC] = []
        r = sch.effective_ratios(e)
        assert r[Role.FRONTIER_STATIC] == 0.0
        assert sum(r.values()) == pytest.approx(1.0)
        # 50/20 renormalized
        assert r[Role.DYNAMIC] == pytest.approx(0.5 / 0.7)

    def test_mastered_tier_needs_ten_outcomes(self):
        cfg = MatchSchedulerConfig()
        sch = MatchScheduler(cfg)
        e = self.entries()
        for _ in range(9):
            sch.record_learner_result(Role.DYNAMIC, won=True)
        base = sch.effective_ratios(e)[Role.DYNAMIC]
        sch.record_learner_result(Role.DYNAMIC, won=True)  # 10th
        halved = sch.effective_ratios(e)[Role.DYNAMIC]
        assert halved < base
        # below threshold -> no down-weighting
        sch2 = MatchScheduler(cfg)
        for i in range(20):
            sch2.record_learner_result(Role.DYNAMIC, won=(i % 2 == 0))
        assert sch2.effective_ratios(e)[Role.DYNAMIC] == pytest.approx(base)

    def test_all_empty_ratios_zero_and_sample_raises(self):
        sch = MatchScheduler(MatchSchedulerConfig())
        empty = {Role.DYNAMIC: [], Role.FRONTIER_STATIC: [], Role.RECENT_FIXED: []}
        assert all(v == 0.0 for v in sch.effective_ratios(empty).values())
        with pytest.raises(ValueError):
            sch.sample_for_learner(empty)
        with pytest.raises(ValueError):
            sch.sample_k_for_learner(empty, 2)

    def test_sample_k_geq_total_returns_all(self):
        sch = MatchScheduler(MatchSchedulerConfig())
        e = self.entries(nd=2, nf=1, nr=1)
        out = sch.sample_k_for_learner(e, 99)
        assert {x.id for x in out} == {x.id for v in e.values() for x in v}

    def test_sample_k_zero(self):
        sch = MatchScheduler(MatchSchedulerConfig())
        assert sch.sample_k_for_learner(self.entries(), 0) == []

    def test_sample_k_flat_fallback_for_unknown_roles(self):
        """Entries under roles outside the 50/30/20 mix are still reachable
        via the flat fallback instead of looping forever."""
        sch = MatchScheduler(MatchSchedulerConfig(), rng=random.Random(0))
        hist = [entry(Role.UNASSIGNED) for _ in range(3)]
        out = sch.sample_k_for_learner({"unassigned": hist}, 2)
        assert len(out) == 2
        assert len({x.id for x in out}) == 2

    def test_sample_k_distinct_across_exhausted_tier(self):
        """When one tier runs dry mid-draw the remaining picks come from the
        other tiers without duplicates."""
        sch = MatchScheduler(MatchSchedulerConfig(), rng=random.Random(1))
        e = self.entries(nd=1, nf=1, nr=1)
        for _ in range(20):
            out = sch.sample_k_for_learner(e, 3)
            assert len({x.id for x in out}) == 3


class TestRoundGeneration:
    def pool(self):
        return ([entry(Role.DYNAMIC, elo=1000 + i) for i in range(3)]
                + [entry(Role.RECENT_FIXED, elo=1000)]
                + [entry(Role.FRONTIER_STATIC, elo=1200)])

    def test_random_mode_returns_all_pairs(self):
        sch = MatchScheduler(MatchSchedulerConfig(tournament_mode="random"),
                             rng=random.Random(0))
        es = self.pool()
        pairs = sch.generate_round(es)
        n = len(es)
        assert len(pairs) == n * (n - 1) // 2

    def test_full_mode_priority_ordered(self):
        scorer = PriorityScorer(PriorityScorerConfig())
        sch = MatchScheduler(MatchSchedulerConfig(tournament_mode="full"),
                             priority_scorer=scorer)
        pairs = sch.generate_round(self.pool())
        scores = [scorer.score(*p) for p in pairs]
        assert scores == sorted(scores, reverse=True)

    def test_weighted_mode_excludes_zero_weight_classes(self):
        sch = MatchScheduler(
            MatchSchedulerConfig(tournament_mode="weighted",
                                 weighted_round_size=4),
            rng=random.Random(0))
        frontiers = [entry(Role.FRONTIER_STATIC) for _ in range(2)]
        dyn = [entry(Role.DYNAMIC) for _ in range(3)]
        pairs = sch.generate_round(dyn + frontiers)
        assert all(classify_match(*p) != FRONTIER_VS_FRONTIER for p in pairs)

    def test_weighted_only_zero_weight_pairs_falls_back(self):
        """A pool with only frontier entries has no weighted class; the
        scheduler still produces a (shuffled, size-capped) round."""
        sch = MatchScheduler(
            MatchSchedulerConfig(tournament_mode="weighted",
                                 weighted_round_size=2),
            rng=random.Random(0))
        pairs = sch.generate_round([entry(Role.FRONTIER_STATIC)
                                    for _ in range(4)])
        assert len(pairs) == 2

    def test_min_coverage_adds_uncovered_entry(self):
        scorer = PriorityScorer(PriorityScorerConfig())
        cfg = MatchSchedulerConfig(tournament_mode="weighted",
                                   weighted_round_size=2,
                                   min_coverage_ratio=1.0)
        sch = MatchScheduler(cfg, priority_scorer=scorer, rng=random.Random(0))
        es = ([entry(Role.DYNAMIC) for _ in range(4)]
              + [entry(Role.RECENT_FIXED)])
        pairs = sch.generate_round(es)
        covered = {x.id for p in pairs for x in p}
        assert covered == {x.id for x in es}

    def test_min_coverage_zero_is_noop(self):
        sch = MatchScheduler(
            MatchSchedulerConfig(tournament_mode="weighted",
                                 weighted_round_size=1,
                                 min_coverage_ratio=0.0),
            rng=random.Random(0))
        es = [entry(Role.DYNAMIC) for _ in range(5)]
        assert len(sch.generate_round(es)) == 1
