"""The 41 dashboard lib.js unit tests, executable without a JS runtime.

VERDICT r2 #4: lib.test.mjs (node:test) cannot run on this box. Every one
of its assertions is ported here against the Python twin (tests/_uilib.py),
and the canary at the bottom pins lib.js's normalized source by hash so the
twin cannot silently drift from the JS it mirrors — the same cross-language
pattern the reference uses to pin its Rust observation encoder from Python
(test_sl_observation_canary.py). Structural METRIC_HELP/ABOUT_LEVELS
assertions run against the REAL lib.js source, not the twin.

Test names and fixtures match lib.test.mjs one-for-one (cited by line).
"""

import hashlib
import json
import math
import re
from pathlib import Path

import pytest

from tests import _uilib as KT

LIB_JS = (Path(__file__).resolve().parent.parent
          / "keisei_tpu" / "server" / "static" / "lib.js")


class TestSquares:
    def test_usi_to_cell(self):  # lib.test.mjs:13
        assert KT.usi_to_cell("9a") == 0
        assert KT.usi_to_cell("1a") == 8
        assert KT.usi_to_cell("9i") == 72
        assert KT.usi_to_cell("1i") == 80
        assert KT.usi_to_cell("5e") == 4 * 9 + 4
        assert KT.usi_to_cell("0a") == -1
        assert KT.usi_to_cell("5j") == -1
        assert KT.usi_to_cell("") == -1
        assert KT.usi_to_cell(None) == -1

    def test_usi_dest_cell(self):  # lib.test.mjs:25
        assert KT.usi_dest_cell("7g7f") == KT.usi_to_cell("7f")
        assert KT.usi_dest_cell("P*5e") == KT.usi_to_cell("5e")
        assert KT.usi_dest_cell("7g") == -1
        assert KT.usi_dest_cell(None) == -1

    def test_piece_char(self):  # lib.test.mjs:32
        assert KT.piece_char({"type": "pawn"}, "kanji") == "歩"
        assert KT.piece_char({"type": "pawn", "promoted": True}, "kanji") == "と"
        assert KT.piece_char({"type": "gold", "promoted": True}, "kanji") == "金"
        assert KT.piece_char({"type": "rook"}, "letters") == "R"
        assert KT.piece_char({"type": "rook", "promoted": True}, "letters") == "+R"


class TestMoveSemantics:
    def test_mover_of(self):  # lib.test.mjs:40
        assert KT.mover_of({"current_player": "black"}) == "white"
        assert KT.mover_of({"current_player": "white"}) == "black"

    def test_black_prob(self):  # lib.test.mjs:45
        assert KT.black_prob({"current_player": "white", "value_estimate": 0.5}) == 0.75
        assert KT.black_prob({"current_player": "black", "value_estimate": 0.5}) == 0.25
        assert KT.black_prob({"current_player": "black", "value_estimate": None}) is None
        assert KT.black_prob({"current_player": "black"}) is None

    def test_stm_black_prob(self):  # lib.test.mjs:54
        assert KT.stm_black_prob({"current_player": "black", "value_estimate": 0.5}) == 0.75
        assert KT.stm_black_prob({"current_player": "white", "value_estimate": 0.5}) == 0.25
        assert KT.stm_black_prob({"current_player": "black", "value_estimate": None}) is None
        assert KT.stm_black_prob({"current_player": "black"}) is None

    def test_move_dots(self):  # lib.test.mjs:247
        moves = [
            {"current_player": "white", "value_estimate": 0.0},
            {"current_player": "black", "value_estimate": -0.6},
            {"current_player": "white", "value_estimate": 0.84},
            {"current_player": "black", "value_estimate": -0.2},
            {"current_player": "white", "value_estimate": None},
            {"current_player": "black", "value_estimate": 0.0},
        ]
        assert KT.move_dots(moves) == [
            "normal", "blunder", "strong", "brilliant", None, "normal"]
        assert KT.move_dots([]) == []
        assert KT.move_dots(None) == []

    def test_move_dots_thresholds(self):  # lib.test.mjs:263
        def mk(cp, v):
            return {"current_player": cp, "value_estimate": v}

        # p=0.60 exactly sits one ulp above the -0.10 threshold (2*0.6-1
        # rounds to 0.19999999999999996) — a latent bug in the never-run
        # node suite, found by executing this port; both use 0.61 now
        dots = KT.move_dots([mk("white", 0.0), mk("black", -(2 * 0.61 - 1))])
        assert dots == ["normal", "mistake"]

    def test_showcase_stats(self):  # lib.test.mjs:273
        def mk(cp, n, chk=0):
            return {"current_player": cp, "usi_notation": n, "in_check": chk}

        s = KT.showcase_stats([
            mk("white", "Px7f"), mk("black", "B*4e"),
            mk("white", "Bx3c+", 1), mk("black", "S-4c="),
            mk("white", "+P-5b"),
        ])
        assert s["plies"] == 5
        assert s["black"] == {"captures": 2, "drops": 0, "promotions": 1, "checks": 1}
        assert s["white"] == {"captures": 0, "drops": 1, "promotions": 0, "checks": 0}
        assert KT.showcase_stats([])["plies"] == 0
        assert KT.showcase_stats(None)["plies"] == 0

    def test_fresh_moves(self):  # lib.test.mjs:157
        held = [{"ply": 1}, {"ply": 2}]
        assert KT.fresh_moves(held, [{"ply": 2}, {"ply": 3}]) == [{"ply": 3}]
        assert KT.fresh_moves([], [{"ply": 1}]) == [{"ply": 1}]
        assert KT.fresh_moves(held, None) == []

    def test_heat_cells(self):  # lib.test.mjs:165
        heat = KT.heat_cells(json.dumps({"7g7f": 0.2, "P*5e": 0.4}))
        assert heat[KT.usi_to_cell("5e")] == 1
        assert heat[KT.usi_to_cell("7f")] == 0.5
        assert KT.heat_cells("not json") is None
        assert KT.heat_cells("{}") is None
        assert KT.heat_cells('{"x":"y"}') is None

    def test_heat_cells_shared_destination(self):  # lib.test.mjs:174
        heat = KT.heat_cells(json.dumps({"7g7f": 0.1, "P*7f": 0.4}))
        assert heat[KT.usi_to_cell("7f")] == 1


class TestLeagueShaping:
    def test_sort_entries(self):  # lib.test.mjs:63
        entries = [
            {"id": 1, "display_name": "b", "role": "frontier",
             "elo_rating": 1500, "games_played": 10},
            {"id": 2, "display_name": "a", "role": "dynamic",
             "elo_rating": 1600, "games_played": 5},
            {"id": 3, "display_name": "c", "role": "frontier",
             "elo_rating": 1500, "games_played": 20},
        ]
        ids = lambda rows: [e["id"] for e in rows]  # noqa: E731
        assert ids(KT.sort_entries(entries, "elo", -1)) == [2, 1, 3]
        assert ids(KT.sort_entries(entries, "name", 1)) == [2, 1, 3]
        assert ids(KT.sort_entries(entries, "games", -1)) == [3, 1, 2]
        assert ids(KT.sort_entries(entries, "elo", 1)) == [1, 3, 2]
        style_of = {1: "sharp", 2: "calm", 3: "balanced"}
        assert ids(KT.sort_entries(entries, "style", 1, style_of)) == [3, 2, 1]
        assert ids(KT.sort_entries(entries, "nope", 1)) == [2, 1, 3]
        assert ids(entries) == [1, 2, 3]  # input not mutated

    def test_sort_entries_aux_keys(self):  # lib.test.mjs:508
        entries = [{"id": 1, "elo_rating": 1000}, {"id": 2, "elo_rating": 1100}]
        aux = {
            "records": {1: {"w": 5, "l": 0, "d": 0, "g": 5},
                        2: {"w": 1, "l": 4, "d": 0, "g": 5}},
            "deltas": {1: -10, 2: 30},
        }
        ids = lambda rows: [e["id"] for e in rows]  # noqa: E731
        assert ids(KT.sort_entries(entries, "wr", -1, None, aux)) == [1, 2]
        assert ids(KT.sort_entries(entries, "delta", -1, None, aux)) == [2, 1]
        assert ids(KT.sort_entries(entries, "record", 1, None, aux)) == [2, 1]
        bare = KT.sort_entries([{"id": 9}, *entries], "wr", -1, None, aux)
        assert bare[-1]["id"] == 9

    def test_recent_matches(self):  # lib.test.mjs:83
        entries = [{"id": 1, "display_name": "Alpha"},
                   {"id": 2, "display_name": "Beta"}]
        results = [
            {"id": 10, "epoch": 5, "entry_a_id": 1, "entry_b_id": 2,
             "wins_a": 3, "wins_b": 1, "draws": 0, "match_type": "ladder"},
            {"id": 11, "epoch": 6, "entry_a_id": 2, "entry_b_id": 1,
             "wins_a": 2, "wins_b": 2, "draws": 1, "match_type": "ladder"},
            {"id": 12, "epoch": 7, "entry_a_id": 1, "entry_b_id": 9,
             "wins_a": 0, "wins_b": 4, "draws": 0, "match_type": "gauntlet"},
        ]
        rows = KT.recent_matches(results, entries, 2)
        assert [r["rid"] for r in rows] == [12, 11]
        assert rows[0]["bName"] == "#9"
        assert rows[0]["winner"] == "b"
        assert rows[1]["winner"] == "draw"
        assert rows[1]["clashes"] == 2
        assert rows[0]["clashes"] == 1
        assert rows[1]["aName"] == "Beta"

    def test_recent_matches_winner_perspective(self):  # lib.test.mjs:108
        """Winner-first fields: pre-match Elo, per-side deltas, win%, and
        the upset flag when the winner started 100+ Elo below."""
        entries = [
            {"id": 1, "display_name": "Alpha", "role": "frontier_static",
             "status": "active"},
            {"id": 2, "display_name": "Beta", "role": "dynamic",
             "status": "active"},
        ]
        results = [{
            "id": 10, "epoch": 5, "entry_a_id": 1, "entry_b_id": 2,
            "wins_a": 1, "wins_b": 3, "draws": 1, "match_type": "ladder",
            "elo_before_a": 1712.6, "elo_after_a": 1701.2,
            "elo_before_b": 1561.4, "elo_after_b": 1572.8,
        }]
        (r,) = KT.recent_matches(results, entries, 5)
        # B won from 151 Elo below A: an upset, shown winner-first
        assert r["winnerName"] == "Beta" and r["loserName"] == "Alpha"
        assert r["winnerRole"] == "dynamic" and r["loserRole"] == "frontier_static"
        assert (r["winnerElo"], r["loserElo"]) == (1561, 1713)
        assert (r["eloWinner"], r["eloLoser"]) == (11, -11)
        assert (r["w"], r["l"], r["total"]) == (3, 1, 5)
        assert r["winPct"] == 60
        assert r["upset"] is True and r["draw"] is False

    def test_recent_matches_draw_keeps_a_first_and_no_upset(self):
        entries = [{"id": 1, "display_name": "Alpha"},
                   {"id": 2, "display_name": "Beta"}]
        results = [{"id": 3, "epoch": 1, "entry_a_id": 2, "entry_b_id": 1,
                    "wins_a": 2, "wins_b": 2, "draws": 0,
                    "elo_before_a": 1400.0, "elo_after_a": 1400.0,
                    "elo_before_b": 1900.0, "elo_after_b": 1900.0}]
        (r,) = KT.recent_matches(results, entries, 5)
        assert r["winnerName"] == "Beta"  # A-side leads on a draw
        assert r["draw"] is True and r["upset"] is False
        assert (r["eloWinner"], r["eloLoser"]) == (0, 0)

    def test_recent_matches_missing_elo_fields(self):
        """Rows written before schema v8 carry no elo_before/after — the
        feed must degrade to null Elo, zero deltas, and no upset."""
        (r,) = KT.recent_matches(
            [{"id": 1, "epoch": 0, "entry_a_id": 7, "entry_b_id": 8,
              "wins_a": 2, "wins_b": 0, "draws": 0}], [], 5)
        assert r["winnerElo"] is None and r["loserElo"] is None
        assert (r["eloWinner"], r["eloLoser"]) == (0, 0)
        assert r["upset"] is False
        assert r["winnerName"] == "#7"

    def test_role_info(self):  # lib.test.mjs:156
        assert KT.role_info("frontier_static", "active")["icon"] == "🛡"
        assert KT.role_info("recent_fixed", None)["label"] == "Recent"
        assert KT.role_info("dynamic", "active")["cssClass"] == "role-dynamic"
        assert KT.role_info("historical", None)["icon"] == "📜"
        # retired overrides role; unknown falls through
        assert KT.role_info("frontier_static", "retired")["label"] == "Retired"
        assert KT.role_info("mystery", None)["label"] == "Unknown"
        assert KT.role_info(None, None)["label"] == "Unknown"

    def test_scorecard(self):  # lib.test.mjs:108
        entries = [{"id": 3, "display_name": "Kuro", "elo_rating": 1612.4,
                    "role": "frontier_static", "architecture": "se_resnet"}]
        game = {"entry_id_black": "3", "entry_id_white": "8",
                "name_white": "Shiro", "elo_white": 1500.5,
                "status": "in_progress", "total_ply": 70}
        sc = KT.scorecard(game, entries, None)
        assert sc["black"]["name"] == "Kuro"
        assert sc["black"]["elo"] == 1612.4
        assert sc["black"]["role"] == "frontier_static"
        assert sc["white"]["name"] == "Shiro"
        assert sc["white"]["elo"] == 1500.5
        assert sc["white"]["role"] is None
        assert sc["progress"] == 0.5
        assert KT.scorecard(game, entries, 35)["progress"] == 0.25
        assert KT.scorecard(game, entries, 1000)["progress"] == 1
        assert KT.scorecard(None, entries, None) is None

    def test_h2h_for(self):  # lib.test.mjs:179
        rows = [
            {"entry_a_id": 1, "entry_b_id": 2, "wins_a": 3, "wins_b": 1,
             "draws": 2, "games": 6},
            {"entry_a_id": 3, "entry_b_id": 1, "wins_a": 4, "wins_b": 0,
             "draws": 0, "games": 4},
            {"entry_a_id": 2, "entry_b_id": 3, "wins_a": 9, "wins_b": 9,
             "draws": 9, "games": 27},
        ]
        mine = KT.h2h_for(rows, 1)
        assert mine == [
            {"opp": 2, "w": 3, "l": 1, "d": 2, "g": 6},
            {"opp": 3, "w": 0, "l": 4, "d": 0, "g": 4},
        ]
        assert KT.win_rate(mine[0]) == (3 + 1) / 6
        assert KT.win_rate(mine[1]) == 0
        assert KT.win_rate({"w": 0, "l": 0, "d": 0, "g": 0}) is None

    def test_entry_records(self):  # lib.test.mjs:473
        rec = KT.entry_records([
            {"entry_a_id": 1, "entry_b_id": 2, "wins_a": 3, "wins_b": 1, "draws": 1},
            {"entry_a_id": 2, "entry_b_id": 3, "wins_a": 0, "wins_b": 2, "draws": 0},
        ])
        assert rec[1] == {"w": 3, "l": 1, "d": 1, "g": 5}
        assert rec[2] == {"w": 1, "l": 5, "d": 1, "g": 7}
        assert rec[3] == {"w": 2, "l": 0, "d": 0, "g": 2}
        assert KT.entry_records([]) == {}

    def test_elo_deltas(self):  # lib.test.mjs:484
        d = KT.elo_deltas([
            {"entry_id": 1, "epoch": 5, "elo_rating": 1040},
            {"entry_id": 1, "epoch": 1, "elo_rating": 1000},
            {"entry_id": 1, "epoch": 3, "elo_rating": 1020},
            {"entry_id": 2, "epoch": 1, "elo_rating": 990},
        ])
        assert d[1] == 20
        assert d[2] == 0

    def test_group_entries_by_tier(self):  # lib.test.mjs:495
        groups = KT.group_entries_by_tier([
            {"id": 1, "role": "dynamic"},
            {"id": 2, "role": "frontier_static"},
            {"id": 3, "role": "unassigned"},
            {"id": 4, "role": "recent_fixed"},
            {"id": 5, "role": "frontier_static"},
        ])
        assert [[g["tier"], [i["id"] for i in g["items"]]] for g in groups] == [
            ["frontier", [2, 5]], ["recent", [4]], ["dynamic", [1]],
            ["other", [3]],
        ]

    def test_collapse_events(self):  # lib.test.mjs:289
        def t(entry_id, from_role, to_role):
            return {"entry_id": entry_id, "from_role": from_role,
                    "to_role": to_role}

        rows = [t(1, "dynamic", "frontier_static")] * 3 + [
            t(2, "dynamic", "frontier_static"),
            t(1, "dynamic", "frontier_static"),
        ]
        out = KT.collapse_events(rows)
        assert len(out) == 3
        assert out[0]["count"] == 3
        assert out[1]["entry_id"] == 2
        assert out[2]["count"] == 1

    def test_collapse_events_kinds_and_cap(self):  # lib.test.mjs:305
        rows = [
            {"entry_id": 1, "from_role": "dynamic", "to_role": "recent_fixed"},
            {"entry_id": 1, "from_status": "active", "to_status": "retired"},
        ]
        assert len(KT.collapse_events(rows)) == 2
        many = [{"entry_id": i} for i in range(60)]
        assert len(KT.collapse_events(many, 25)) == 25


class TestStatusAndConfig:
    def test_indicator(self):  # lib.test.mjs:361
        assert KT.indicator(True, "running", "update") == {
            "cls": "update", "text": "▲ PPO UPDATE"}
        assert KT.indicator(True, "running", "rollout") == {
            "cls": "rollout", "text": "▶ ROLLOUT"}
        assert KT.indicator(True, "running", "init")["cls"] == "alive"
        assert KT.indicator(False, "completed", "")["cls"] == "stopped"
        assert KT.indicator(False, "paused", "")["cls"] == "stopped"
        assert KT.indicator(False, "stopped", "")["cls"] == "stopped"
        assert KT.indicator(False, "running", "rollout")["cls"] == "stale"
        assert KT.indicator(False, None, None)["cls"] == "stale"

    def test_heartbeat_fresh(self):  # lib.test.mjs:375
        from datetime import datetime, timezone

        now = datetime(2026, 8, 18, 12, 0, 0,
                       tzinfo=timezone.utc).timestamp() * 1000
        assert KT.heartbeat_fresh("2026-08-18T11:59:45Z", now) is True
        assert KT.heartbeat_fresh("2026-08-18T11:59:00Z", now) is False
        assert KT.heartbeat_fresh("2026-08-18T11:59:45", now) is True
        assert KT.heartbeat_fresh("2026-08-18T11:59:00+00:00", now) is False
        assert KT.heartbeat_fresh(None, now) is False
        assert KT.heartbeat_fresh("not a date", now) is False
        assert KT.heartbeat_fresh(1755518385, now) is False
        assert KT.heartbeat_fresh("2026-08-18T11:59:00Z", now, 120) is True

    def test_config_summary(self):  # lib.test.mjs:389
        cfg = json.dumps({
            "training": {"algorithm": "katago_ppo", "num_games": 256,
                         "steps_per_epoch": 128, "max_ply": 512},
            "algorithm_params": {"batch_size": 1024},
            "league": {"enabled": True},
        })
        tip = KT.config_summary(cfg, "se_resnet")
        assert "Architecture: se_resnet" in tip
        assert "Algorithm: katago_ppo" in tip
        assert "Envs: 256" in tip
        assert "Batch: 1024" in tip
        assert "League: on" in tip
        assert KT.config_summary(None, "mlp") == "mlp"
        assert KT.config_summary("not json", "mlp") == "mlp"
        assert KT.config_summary({}, "mlp") == "mlp"

    def test_game_status(self):  # lib.test.mjs:408
        assert KT.game_status({"is_over": 0, "ply": 42}) == "ply 42"
        assert KT.game_status(
            {"is_over": 1, "result": "black_win_checkmate"}
        ) == "black win checkmate"
        assert KT.game_status({"is_over": 1, "result": None}) == ""

    def test_game_advantage(self):  # lib.test.mjs:415
        assert KT.game_advantage(
            {"value_estimate": 0.5, "current_player": "black"}
        ) == {"confident": True, "favours": "black"}
        assert KT.game_advantage(
            {"value_estimate": 0.5, "current_player": "white"}
        ) == {"confident": True, "favours": "white"}
        assert KT.game_advantage(
            {"value_estimate": 0.3, "current_player": "black"}
        )["confident"] is False
        assert KT.game_advantage(
            {"value_estimate": 0.31, "current_player": "black"}
        )["confident"] is True
        assert KT.game_advantage({"current_player": "black"}) == {
            "confident": False, "favours": None}

    def test_pv_ratio(self):  # lib.test.mjs:346
        rows = [
            {"epoch": 1, "policy_loss": -0.2, "value_loss": 0.8},
            {"epoch": 2, "policy_loss": 0.3, "value_loss": 0},
            {"epoch": 3, "policy_loss": None, "value_loss": 0.5},
            {"epoch": 4, "policy_loss": float("nan"), "value_loss": 0.5},
            {"policy_loss": 0.5, "value_loss": -0.5},
        ]
        assert KT.pv_ratio(rows) == [
            [1, 0.25], [2, None], [3, None], [4, None], [0, 1]]
        assert KT.pv_ratio([]) == []
        assert KT.pv_ratio(None) == []


class TestMovePatterns:
    def test_move_pattern(self):  # lib.test.mjs:131
        for k in ("pawn", "lance", "knight", "silver"):
            assert KT.move_pattern(k, True) == KT.move_pattern("gold", False)
        assert KT.move_pattern("lance", False)[0][1] == "slide"
        assert KT.move_pattern("pawn", False)[0][1] == "step"
        assert KT.move_pattern("knight", False)[0] == ["jump", None, "jump"]
        king = KT.move_pattern("king", False)
        flat = [v for row in king for v in row]
        assert flat.count("step") == 8
        assert king[1][1] is None
        horse = KT.move_pattern("bishop", True)
        assert horse[0][0] == "slide"
        assert horse[0][1] == "step"
        dragon = KT.move_pattern("rook", True)
        assert dragon[0][1] == "slide"
        assert dragon[0][0] == "step"
        assert KT.move_pattern("gold", True) is None
        assert KT.move_pattern("dog", False) is None


class TestChartMath:
    def test_nice_ticks(self):  # lib.test.mjs:195
        assert KT.nice_ticks(0, 10, 4) == [0, 2, 4, 6, 8, 10]
        t = KT.nice_ticks(0, 1, 4)
        assert 0 in t and 1 in t
        assert all(0 <= x <= 1 for x in t)
        neg = KT.nice_ticks(-3, 3, 4)
        assert 0 in neg
        assert KT.nice_ticks(5, 5) == KT.nice_ticks(4, 6)
        assert KT.nice_ticks(float("nan"), 1) == []

    def test_ema(self):  # lib.test.mjs:206
        raw = [[0, 0], [1, 10], [2, float("nan")], [3, 10]]
        sm = KT.ema(raw, 0.5)
        assert sm[0][1] == 0
        assert sm[1][1] == 5
        assert math.isnan(sm[2][1])
        assert sm[3][1] == 7.5
        assert KT.ema(raw, 1) is raw  # alpha 1 = identity (same object)

    def test_downsample(self):  # lib.test.mjs:216
        pts = [[i, math.sin(i / 50)] for i in range(10000)]
        pts[5000] = [5000, 99]
        ds = KT.downsample(pts, 500)
        assert len(ds) <= 500
        assert any(y == 99 for _, y in ds)
        assert all(ds[i][0] >= ds[i - 1][0] for i in range(1, len(ds)))
        short = pts[:10]
        assert KT.downsample(short, 500) is short

    def test_nearest_index(self):  # lib.test.mjs:229
        pts = [[0, 0], [10, 0], [20, 0], [35, 0]]
        assert KT.nearest_index(pts, -5) == 0
        assert KT.nearest_index(pts, 14) == 1
        assert KT.nearest_index(pts, 16) == 2
        assert KT.nearest_index(pts, 100) == 3
        assert KT.nearest_index([], 5) == -1

    def test_fmt(self):  # lib.test.mjs:238
        assert KT.fmt(0) == "0"
        assert KT.fmt(1234567) == "1.2M"
        assert KT.fmt(2500) == "2.5k"
        assert KT.fmt(12.34) == "12.3"
        assert KT.fmt(0.5) == "0.500"
        assert KT.fmt(0.0001) == "1.0e-4"

    def test_time_format(self):  # lib.test.mjs:316
        assert KT.time_format(0) == "0s"
        assert KT.time_format(45) == "45s"
        assert KT.time_format(3 * 60 + 12) == "3m 12s"
        assert KT.time_format(3 * 3600 + 12 * 60) == "3h 12m"
        assert KT.time_format(2 * 86400 + 4 * 3600 + 30) == "2d 4h"
        assert KT.time_format(-5) == "—"
        assert KT.time_format(float("nan")) == "—"
        assert KT.time_format(float("inf")) == "—"

    def test_safe_parse(self):  # lib.test.mjs:327
        assert KT.safe_parse('{"a":1}') == {"a": 1}
        assert KT.safe_parse("not json", []) == []
        assert KT.safe_parse("", {}) == {}
        assert KT.safe_parse(None, "x") == "x"
        assert KT.safe_parse("null", 5) == 5
        assert KT.safe_parse("[1,2]") == [1, 2]


class TestAboutView:
    def test_clamp_about_level(self):  # lib.test.mjs:436
        assert KT.clamp_about_level(3) == 3
        assert KT.clamp_about_level(0) == 1
        assert KT.clamp_about_level(-2) == 1
        assert KT.clamp_about_level(99) == len(KT.ABOUT_LEVELS)
        assert KT.clamp_about_level(float("nan")) == 1
        assert KT.clamp_about_level(2.6) == 3

    def test_visible_about_toc(self):  # lib.test.mjs:445
        items = [{"id": "a", "minLevel": 1}, {"id": "b", "minLevel": 3},
                 {"id": "c", "minLevel": 5}]
        ids = lambda rows: [i["id"] for i in rows]  # noqa: E731
        assert ids(KT.visible_about_toc(items, 1)) == ["a"]
        assert ids(KT.visible_about_toc(items, 3)) == ["a", "b"]
        assert ids(KT.visible_about_toc(items, 5)) == ["a", "b", "c"]

    def test_group_toc(self):  # lib.test.mjs:454
        items = [
            {"id": "hero", "section": None},
            {"id": "x1", "section": "L2"}, {"id": "x2", "section": "L2"},
            {"id": "y1", "section": "L3"},
            {"id": "z1", "section": None}, {"id": "z2", "section": None},
        ]
        groups = KT.group_toc(items)
        assert [[g["section"], len(g["items"])] for g in groups] == [
            [None, 1], ["L2", 2], ["L3", 1], [None, 1], [None, 1]]

    def test_about_levels_ladder(self):  # lib.test.mjs:466 — vs REAL lib.js
        src = LIB_JS.read_text(encoding="utf-8")
        rows = re.findall(
            r'\{ id: (\d+), label: "([^"]*)", blurb: "([^"]*)" \}', src)
        assert len(rows) == len(KT.ABOUT_LEVELS)
        for i, (lid, label, blurb) in enumerate(rows):
            assert int(lid) == i + 1
            assert len(label) > 0 and len(blurb) > 0
            # and the twin's copy matches the JS source exactly
            assert KT.ABOUT_LEVELS[i] == {
                "id": int(lid), "label": label, "blurb": blurb}


class TestMetricHelp:
    def test_metric_help_keys(self):  # lib.test.mjs:337 — vs REAL lib.js
        src = LIB_JS.read_text(encoding="utf-8")
        block = src.split("const METRIC_HELP = {", 1)[1].split("};", 1)[0]
        entries = re.findall(r'"(c-[a-z]+)":((?:[^,]|,(?!\n\s*"c-))*)', block)
        assert len(entries) >= 10
        for key, body in entries:
            assert re.fullmatch(r"c-[a-z]+", key)
            text = "".join(re.findall(r'"([^"]*)"', body))
            assert len(text) > 20, key


class TestSourcePin:
    """The cross-language canary: the Python twin above was verified against
    THIS exact lib.js. Any change to lib.js must re-verify the twin (run the
    node suite where available, eyeball the diff) and update the hash."""

    EXPECTED_SHA256 = (
        "3c299c585774966b9b239311700252d4747963962b5bbcd7ab7d1953e0f2fbad")

    def test_lib_js_pinned(self):
        normalized = re.sub(rb"\s+", b" ", LIB_JS.read_bytes()).strip()
        digest = hashlib.sha256(normalized).hexdigest()
        assert digest == self.EXPECTED_SHA256, (
            f"lib.js changed (sha256 {digest}). The Python twin in "
            "tests/_uilib.py mirrors lib.js semantics — re-verify the twin "
            "against the new lib.js (node --test where available), port any "
            "behavior change, then update EXPECTED_SHA256."
        )

    def test_lib_js_exports_match_twin(self):
        """Every exported lib.js symbol has a twin (snake_case) or is a
        shared constant — catches new helpers added without canary tests."""
        src = LIB_JS.read_text(encoding="utf-8")
        # helpers may themselves end in `return {...}; });` — the module
        # export is the LAST such object in the factory
        exports = re.findall(r"return \{([^}]*)\};?\s*\}\);", src, re.S)
        names = [n.strip() for n in exports[-1].split(",") if n.strip()]

        def snake(n):
            return re.sub(r"(?<!^)(?=[A-Z])", "_", n).lower()

        missing = [n for n in names
                   if not hasattr(KT, n) and not hasattr(KT, snake(n))]
        assert not missing, f"lib.js exports without a Python twin: {missing}"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
