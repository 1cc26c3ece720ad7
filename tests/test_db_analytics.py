"""Analytics + league table-family helpers: gauntlet, historical slots,
style profiles, game features, transitions, head-to-head edges.

Pins the read/write contracts the dashboard and league tier depend on
(reference: keisei/db/{game_features,gauntlet,historical,head_to_head}.py,
exercised there by tests/test_db_league_schema.py + test_db_style_schema.py).
"""

import pytest

from keisei_tpu import db
from keisei_tpu.db import analytics, league_tables


@pytest.fixture
def db_path(tmp_path):
    p = str(tmp_path / "a.db")
    db.init_db(p)
    return p


def _add_entry(db_path, name="e"):
    conn = db.connect(db_path)
    cur = conn.execute(
        "INSERT INTO league_entries (display_name, architecture, model_params, "
        "checkpoint_path, created_epoch) VALUES (?, 'mlp', '{}', '/x', 0)",
        (name,),
    )
    conn.commit()
    rowid = cur.lastrowid
    conn.close()
    return rowid


@pytest.fixture
def two_entries(db_path):
    return _add_entry(db_path, "a"), _add_entry(db_path, "b")


class TestGameFeatures:
    def test_missing_optional_cols_defaulted(self, db_path, two_entries):
        a, b = two_entries
        analytics.write_game_features(db_path, [{
            "checkpoint_id": a, "opponent_id": b, "epoch": 7, "side": "black",
            "result": "win", "total_plies": 90,
        }])
        rows = analytics.read_game_features_for_checkpoint(db_path, a)
        assert len(rows) == 1
        # counter columns default to 0, not NULL (percentile math divides)
        assert rows[0]["num_captures"] == 0
        assert rows[0]["termination_reason"] == 0
        # nullable ply markers stay NULL when the event never happened
        assert rows[0]["first_capture_ply"] is None

    def test_filtered_by_checkpoint(self, db_path, two_entries):
        a, b = two_entries
        for cid in (a, a, b):
            analytics.write_game_features(db_path, [{
                "checkpoint_id": cid, "opponent_id": b, "epoch": 1,
                "side": "white", "result": "loss", "total_plies": 40,
            }])
        assert len(analytics.read_game_features_for_checkpoint(db_path, a)) == 2
        assert len(analytics.read_game_features_for_checkpoint(db_path, b)) == 1
        assert len(analytics.read_all_game_features(db_path)) == 3

    def test_batch_is_one_transaction(self, db_path, two_entries, monkeypatch):
        """A failing row aborts the whole batch (no partial feature sets)."""
        a, b = two_entries
        rows = [
            {"checkpoint_id": a, "opponent_id": b, "epoch": 1, "side": "black",
             "result": "win", "total_plies": 10},
            {"checkpoint_id": a, "opponent_id": b, "epoch": 1, "side": "white",
             "result": None, "total_plies": None, "nonexistent_col": 1},
        ]
        # second row is fine schema-wise; force failure via a bad column list
        from keisei_tpu.db import core

        orig = core.insert
        calls = {"n": 0}

        def failing_insert(conn, table, row):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("boom")
            return orig(conn, table, row)

        monkeypatch.setattr(core, "insert", failing_insert)
        with pytest.raises(RuntimeError):
            analytics.write_game_features(db_path, rows)
        monkeypatch.undo()
        assert analytics.read_game_features_for_checkpoint(db_path, a) == []


class TestHistoricalAndGauntlet:
    def test_slot_replace_semantics(self, db_path, two_entries):
        a, b = two_entries
        analytics.write_historical_slot(db_path, {
            "slot_index": 0, "target_epoch": 10, "entry_id": a,
            "actual_epoch": 9, "selected_at": "t0", "selection_mode": "nearest",
        })
        # repointing the same slot replaces, not duplicates
        analytics.write_historical_slot(db_path, {
            "slot_index": 0, "target_epoch": 10, "entry_id": b,
            "actual_epoch": 11, "selected_at": "t1", "selection_mode": "nearest",
        })
        slots = analytics.read_historical_slots(db_path)
        assert len(slots) == 1
        assert slots[0]["entry_id"] == b

    def test_slots_ordered_by_index(self, db_path):
        for idx in (3, 0, 2):
            analytics.write_historical_slot(db_path, {
                "slot_index": idx, "target_epoch": idx * 10, "entry_id": None,
                "actual_epoch": None, "selected_at": "t", "selection_mode": "m",
            })
        assert [s["slot_index"] for s in analytics.read_historical_slots(db_path)] \
            == [0, 2, 3]

    def test_gauntlet_rows_appended_and_windowed(self, db_path, two_entries):
        a, b = two_entries
        for epoch in range(1, 4):
            analytics.write_gauntlet_result(db_path, {
                "epoch": epoch, "entry_id": a, "historical_slot": 0,
                "historical_entry_id": b, "wins": 3, "losses": 1, "draws": 0,
                "elo_before": 1000.0, "elo_after": 1012.5,
            })
        payload = league_tables.read_league_data(db_path)
        gauntlet = payload["gauntlet_results"]
        assert len(gauntlet) == 3
        # newest epoch first (dashboard shows latest gauntlet per slot)
        assert gauntlet[0]["epoch"] == 3
        assert gauntlet[0]["elo_after"] == 1012.5


class TestStyleProfiles:
    def test_upsert_by_checkpoint(self, db_path, two_entries):
        a, _ = two_entries
        base = {
            "checkpoint_id": a, "recomputed_at": "t0",
            "profile_status": "ok", "games_sampled": 40,
            "primary_style": "Sharp tactical opener",
        }
        analytics.write_style_profile(db_path, base)
        analytics.write_style_profile(db_path, {
            **base, "recomputed_at": "t1", "primary_style": "Drop-heavy scrapper",
        })
        profiles = analytics.read_style_profiles(db_path)
        assert len(profiles) == 1
        assert profiles[0]["primary_style"] == "Drop-heavy scrapper"
        # defaulted JSON columns are valid JSON text, never NULL
        assert profiles[0]["secondary_traits"] == "[]"
        assert profiles[0]["commentary_json"] == "[]"

    def test_insufficient_default_status(self, db_path, two_entries):
        analytics.write_style_profile(db_path, {
            "checkpoint_id": two_entries[0], "recomputed_at": "t",
        })
        assert analytics.read_style_profiles(db_path)[0]["profile_status"] \
            == "insufficient"


class TestTournamentStats:
    def test_missing_fields_default_zero(self, db_path):
        analytics.write_tournament_stats(db_path, {"total_games": 12})
        stats = analytics.read_tournament_stats(db_path)
        assert stats["total_games"] == 12
        assert stats["pairings_requested"] == 0
        assert stats["games_per_min"] == 0

    def test_none_before_first_round(self, db_path):
        assert analytics.read_tournament_stats(db_path) is None


class TestTransitionsAndH2H:
    def test_transition_log_shape(self, db_path, two_entries):
        a, _ = two_entries
        league_tables.write_transition(
            db_path, entry_id=a, from_role="dynamic", to_role="frontier_static",
            reason="promotion: streak 3",
        )
        rows = league_tables.read_league_data(db_path)["transitions"]
        assert rows[0]["entry_id"] == a
        assert rows[0]["to_role"] == "frontier_static"
        assert rows[0]["from_status"] is None

    def test_h2h_self_pair_ignored(self, db_path, two_entries):
        conn = db.connect(db_path)
        league_tables.bump_head_to_head(conn, two_entries[0], two_entries[0],
                                        1, 0, 0, epoch=1)
        conn.commit()
        conn.close()
        assert league_tables.read_head_to_head(db_path) == []

    def test_h2h_canonical_swap_accumulates(self, db_path, two_entries):
        a, b = two_entries  # a < b (insertion order)
        conn = db.connect(db_path)
        # (b beats a) twice, once reported each direction
        league_tables.bump_head_to_head(conn, b, a, 1, 0, 0, epoch=3)
        league_tables.bump_head_to_head(conn, a, b, 0, 1, 0, epoch=4)
        conn.commit()
        conn.close()
        rows = league_tables.read_head_to_head(db_path)
        assert len(rows) == 1
        r = rows[0]
        assert (r["entry_a_id"], r["entry_b_id"]) == (a, b)
        assert (r["wins_a"], r["wins_b"], r["draws"]) == (0, 2, 0)
        assert r["games"] == 2
        assert r["last_epoch"] == 4

    def test_elo_history_epoch_window(self, db_path, two_entries):
        for epoch in range(6):
            league_tables.write_elo_history(db_path, entry_id=two_entries[0],
                                            epoch=epoch,
                                            elo_rating=1000.0 + epoch)
        all_rows = league_tables.read_elo_history(db_path)
        assert len(all_rows) == 6
        windowed = league_tables.read_elo_history(db_path, max_epochs=2)
        # window is epoch >= MAX(epoch) - max_epochs (inclusive bound)
        assert {r["epoch"] for r in windowed} == {3, 4, 5}
