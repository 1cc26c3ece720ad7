"""Style-profiler pure functions: aggregation, percentile ranks, rule
firing with contradiction exclusions, commentary.

Reference: keisei/training/style_profiler.py:64-114 — labels fire on
percentile thresholds; contradictory pairs keep the earlier-ranked rule.
"""

import pytest

from keisei_tpu.league.style import (
    MIN_GAMES_FOR_PROFILE,
    aggregate_metrics,
    assign_labels,
    commentary_for,
    percentile_rank,
)


def feature_row(**kw):
    base = dict(total_plies=60, num_captures=8, num_drops=3,
                num_early_drops=1, num_promotions=2, first_capture_ply=20,
                rook_moved_ply=None, king_moves_in_30=0,
                opening_seq_3="[1,2,3]")
    base.update(kw)
    return base


class TestAggregateMetrics:
    def test_below_min_games_returns_none(self):
        rows = [feature_row()] * (MIN_GAMES_FOR_PROFILE - 1)
        assert aggregate_metrics(rows) is None

    def test_basic_means(self):
        rows = [feature_row(total_plies=40, num_captures=4),
                feature_row(total_plies=80, num_captures=8)] * 4
        m = aggregate_metrics(rows)
        assert m["avg_game_length"] == 60.0
        assert m["num_captures_mean"] == 6.0
        assert m["games"] == 8.0

    def test_no_capture_games_use_game_length(self):
        rows = [feature_row(first_capture_ply=None, total_plies=50)] * 8
        m = aggregate_metrics(rows)
        assert m["first_capture_ply_mean"] == 50.0

    def test_rook_early_rate_thresholds_at_ply_20(self):
        rows = ([feature_row(rook_moved_ply=5)] * 4
                + [feature_row(rook_moved_ply=25)] * 2
                + [feature_row(rook_moved_ply=None)] * 2)
        m = aggregate_metrics(rows)
        assert m["rook_moved_early_rate"] == pytest.approx(0.5)

    def test_opening_diversity(self):
        rows = [feature_row(opening_seq_3=f"[{i},0,0]") for i in range(8)]
        assert aggregate_metrics(rows)["opening_diversity_index"] == 1.0
        rows = [feature_row(opening_seq_3="[1,2,3]")] * 8
        assert aggregate_metrics(rows)["opening_diversity_index"] == pytest.approx(1 / 8)


class TestPercentileRank:
    def test_empty(self):
        assert percentile_rank({}) == {}

    def test_rank_is_fraction_leq_times_100(self):
        m = {1: {"x": 1.0}, 2: {"x": 2.0}, 3: {"x": 3.0}, 4: {"x": 4.0}}
        out = percentile_rank(m)
        assert out[1]["x"] == 25.0
        assert out[4]["x"] == 100.0

    def test_ties_share_rank(self):
        m = {1: {"x": 5.0}, 2: {"x": 5.0}}
        out = percentile_rank(m)
        assert out[1]["x"] == out[2]["x"] == 100.0


class TestAssignLabels:
    def base_pct(self, **kw):
        # percentile vector that fires nothing by default
        p = {"first_capture_ply_mean": 50, "avg_game_length": 50,
             "num_captures_mean": 50, "drops_per_game": 50,
             "num_early_drops_mean": 50, "promotions_per_game": 50,
             "game_length_variance": 50, "opening_diversity_index": 50,
             "rook_moved_early_rate": 50, "king_moves_early_rate": 50}
        p.update(kw)
        return p

    def test_nothing_fires_at_midfield(self):
        assert assign_labels(self.base_pct()) == []

    def test_sharp_tactical_opener(self):
        pct = self.base_pct(first_capture_ply_mean=10, avg_game_length=30)
        assert "Sharp tactical opener" in assign_labels(pct)

    def test_missing_metric_blocks_rule(self):
        pct = self.base_pct(first_capture_ply_mean=10, avg_game_length=30)
        del pct["avg_game_length"]
        assert "Sharp tactical opener" not in assign_labels(pct)

    def test_contradiction_keeps_earlier_ranked_rule(self):
        # fire both "Sharp tactical opener" (needs low fc + short games)
        # and "Patient attacker" (long games + many captures) is impossible
        # on one metric vector; use Aggressive promoter vs Defensive builder
        pct = self.base_pct(promotions_per_game=90,
                            first_capture_ply_mean=40,
                            king_moves_early_rate=80)
        labels = assign_labels(pct)
        assert "Aggressive promoter" in labels
        # Defensive builder needs first_capture_ply_mean >= 55 so it cannot
        # co-fire here; the contradiction pair is exercised below instead
        assert "Defensive builder" not in labels

    def test_chaotic_brawler_vs_long_game_grinder_exclusion(self):
        # construct a vector where both fire, then assert only the
        # earlier-ranked (Chaotic brawler) survives
        pct = self.base_pct(avg_game_length=35, num_captures_mean=70,
                            drops_per_game=60)
        labels = assign_labels(pct)
        assert "Chaotic brawler" in labels
        assert "Long-game grinder" not in labels

    def test_multiple_compatible_labels(self):
        pct = self.base_pct(opening_diversity_index=80,
                            rook_moved_early_rate=75)
        labels = assign_labels(pct)
        assert "Flexible opener" in labels
        assert "Early rook swinger" in labels


class TestCommentary:
    def test_leads_with_first_label(self):
        lines = commentary_for(["Sharp tactical opener"], {})
        assert lines[0] == "Plays like a sharp tactical opener."

    def test_metric_driven_lines(self):
        lines = commentary_for([], {"drops_per_game": 80,
                                    "avg_game_length": 85,
                                    "first_capture_ply_mean": 20})
        assert "Rarely keeps a piece in hand for long." in lines
        assert "Comfortable grinding long endgames." in lines
        assert "Opens exchanges early and often." in lines

    def test_empty_everything(self):
        assert commentary_for([], {}) == []
