"""Observability DB: schema init, telemetry round-trips, queue atomicity."""

import json
import threading

import pytest

from keisei_tpu import db
from keisei_tpu.db import queue as q
from keisei_tpu.db import showcase as sc


@pytest.fixture
def db_path(tmp_path):
    p = str(tmp_path / "test.db")
    db.init_db(p)
    return p


class TestSchema:
    def test_init_idempotent(self, db_path):
        db.init_db(db_path)
        db.init_db(db_path)
        conn = db.connect(db_path)
        v = conn.execute("SELECT version FROM schema_version").fetchone()[0]
        assert v == db.SCHEMA_VERSION == 8
        conn.close()

    def test_all_reference_tables_exist(self, db_path):
        conn = db.connect(db_path)
        tables = {
            r[0] for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table'"
            )
        }
        conn.close()
        # the reference dashboard's read surface (keisei/db/*.py DDL)
        expected = {
            "metrics", "game_snapshots", "training_state", "league_entries",
            "league_results", "elo_history", "league_transitions",
            "league_meta", "head_to_head", "historical_library",
            "gauntlet_results", "tournament_stats", "game_features",
            "style_profiles", "showcase_queue", "showcase_games",
            "showcase_moves", "showcase_heartbeat", "tournament_pairing_queue",
            "tournament_worker_heartbeat",
        }
        assert expected <= tables

    def test_newer_schema_rejected(self, db_path):
        conn = db.connect(db_path)
        conn.execute("UPDATE schema_version SET version = 99")
        conn.commit()
        conn.close()
        with pytest.raises(RuntimeError, match="newer"):
            db.init_db(db_path)

    def test_wal_checkpoint(self, db_path):
        db.write_metrics(db_path, {"epoch": 1, "step": 10, "policy_loss": 0.5})
        busy, _, _ = db.wal_checkpoint(db_path)
        assert busy == 0


class TestTelemetry:
    def test_metrics_roundtrip(self, db_path):
        db.write_metrics(db_path, {
            "epoch": 1, "step": 100, "policy_loss": 0.5, "value_loss": 1.2,
            "entropy": 3.4, "win_rate": 0.51, "draw_rate": 0.1,
            "gradient_norm": 0.9, "episodes_completed": 42,
        })
        rows = db.read_metrics_since(db_path, 0)
        assert len(rows) == 1
        assert rows[0]["policy_loss"] == 0.5
        assert rows[0]["episodes_completed"] == 42
        # cursor semantics
        assert db.read_metrics_since(db_path, rows[0]["id"]) == []

    def test_sum_episodes_bounded_at_cursor(self, db_path):
        """The server seeds its lifetime counter with up_to_id = the init
        cursor; rows past the cursor belong to the poll loop, so an
        unbounded sum would double-count them (review r2)."""
        for i, eps in enumerate((10, 20, 30), start=1):
            db.write_metrics(db_path, {"epoch": i, "step": i,
                                       "episodes_completed": eps})
        rows = db.read_metrics_since(db_path, 0)
        assert db.sum_episodes_completed(db_path) == 60
        assert db.sum_episodes_completed(db_path, rows[1]["id"]) == 30
        assert db.sum_episodes_completed(db_path, 0) == 0

    def test_training_state_and_heartbeat(self, db_path):
        db.write_training_state(db_path, {
            "config_json": "{}", "display_name": "t", "model_arch": "se_resnet",
            "algorithm_name": "katago_ppo", "started_at": "2026-01-01T00:00:00Z",
        })
        st = db.read_training_state(db_path)
        assert st["status"] == "running" and st["phase"] == "init"
        db.update_training_progress(db_path, 5, 500, phase="rollout")
        db.set_total_epochs(db_path, 1000)
        st = db.read_training_state(db_path)
        assert st["current_epoch"] == 5 and st["phase"] == "rollout"
        assert st["total_epochs"] == 1000
        db.set_status(db_path, "stopped")
        assert db.read_training_state(db_path)["status"] == "stopped"

    def test_epoch_summary_single_txn(self, db_path):
        db.write_training_state(db_path, {
            "config_json": "{}", "display_name": "t", "model_arch": "mlp",
            "algorithm_name": "katago_ppo", "started_at": "x",
        })
        db.write_epoch_summary(
            db_path, {"epoch": 3, "step": 30, "policy_loss": 0.1}, 3, 30,
            checkpoint_path="/ckpt/3",
        )
        st = db.read_training_state(db_path)
        assert st["current_epoch"] == 3
        assert st["checkpoint_path"] == "/ckpt/3"
        assert db.read_metrics_since(db_path, 0)[0]["epoch"] == 3

    def test_snapshots_composite_cursor(self, db_path):
        snap = {
            "game_id": 1, "board_json": "[]", "hands_json": "[]",
            "current_player": "black", "ply": 10, "is_over": 0,
            "result": "", "sfen": "sfen1", "in_check": 0,
            "move_history_json": "[]",
        }
        db.write_game_snapshots(db_path, [snap, {**snap, "game_id": 2}])
        rows, ts, gid = db.read_game_snapshots_since(db_path, "", 0)
        assert len(rows) == 2 and gid == 2
        # same-timestamp rows are not dropped by the cursor
        rows2, _, _ = db.read_game_snapshots_since(db_path, ts, gid)
        assert rows2 == []
        db.write_game_snapshots(db_path, [{**snap, "game_id": 3}])
        rows3, _, _ = db.read_game_snapshots_since(db_path, ts, gid)
        assert [r["game_id"] for r in rows3] == [3]


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


class TestLeagueTables:
    def test_league_data_payload_shape(self, db_path):
        a, b = _add_entry(db_path, "a"), _add_entry(db_path, "b")
        data = db.read_league_data(db_path)
        assert {e["display_name"] for e in data["entries"]} == {"a", "b"}
        assert isinstance(data["entries"][0]["model_params"], dict)
        assert data["results"] == [] and data["transitions"] == []

    def test_elo_history(self, db_path):
        a = _add_entry(db_path)
        db.write_elo_history(db_path, a, 1, 1000.0)
        db.write_elo_history(db_path, a, 2, 1016.0)
        hist = db.read_elo_history(db_path)
        assert [h["elo_rating"] for h in hist] == [1000.0, 1016.0]
        assert db.read_elo_history(db_path, max_epochs=0) == hist

    def test_head_to_head_canonical_upsert(self, db_path):
        a, b = _add_entry(db_path), _add_entry(db_path)
        conn = db.connect(db_path)
        db.bump_head_to_head(conn, b, a, wins_a=3, wins_b=1, draws=1, epoch=5)
        db.bump_head_to_head(conn, a, b, wins_a=2, wins_b=0, draws=0, epoch=7)
        conn.commit()
        conn.close()
        rows = db.read_head_to_head(db_path)
        assert len(rows) == 1
        r = rows[0]
        # first call was (b vs a) so wins swap into canonical order
        assert (r["entry_a_id"], r["entry_b_id"]) == (a, b)
        assert r["wins_a"] == 1 + 2 and r["wins_b"] == 3 + 0
        assert r["games"] == 7 and r["last_epoch"] == 7


class TestQueue:
    def test_claim_batch_excludes_claimed(self, db_path):
        a, b = _add_entry(db_path), _add_entry(db_path)
        q.enqueue_pairings(db_path, 1, [(a, b, 8, 2.0), (b, a, 8, 1.0)], epoch=3)
        got = q.claim_next_pairings_batch(db_path, "w1", 1)
        assert len(got) == 1 and got[0]["priority"] == 2.0  # priority order
        got2 = q.claim_next_pairings_batch(db_path, "w2", 5)
        assert len(got2) == 1 and got2[0]["worker_id"] == "w2"
        assert q.claim_next_pairings_batch(db_path, "w3", 5) == []

    def test_concurrent_claims_no_double(self, db_path):
        a, b = _add_entry(db_path), _add_entry(db_path)
        q.enqueue_pairings(db_path, 1, [(a, b, 4, 0.0)] * 20, epoch=0)
        claimed: list[int] = []
        lock = threading.Lock()

        def worker(wid):
            while True:
                got = q.claim_next_pairings_batch(db_path, wid, 3)
                if not got:
                    return
                with lock:
                    claimed.extend(r["id"] for r in got)

        threads = [threading.Thread(target=worker, args=(f"w{i}",)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(claimed) == sorted(set(claimed))
        assert len(claimed) == 20

    def test_stale_expiry_and_reset(self, db_path):
        a, b = _add_entry(db_path), _add_entry(db_path)
        q.enqueue_pairings(db_path, 1, [(a, b, 4, 0.0)], epoch=1)
        q.enqueue_pairings(db_path, 2, [(a, b, 4, 0.0)], epoch=9)
        got = q.claim_next_pairings_batch(db_path, "w", 10, stale_before_epoch=5)
        assert len(got) == 1 and got[0]["enqueued_epoch"] == 9
        assert q.get_round_status(db_path, 1) == {"expired": 1}
        assert q.reset_stale_playing(db_path) == 1
        assert q.get_active_queue_depth(db_path) == 1

    def test_dynamic_update_lock(self, db_path):
        a = _add_entry(db_path)
        assert q.claim_dynamic_update(db_path, a, "w1")
        assert not q.claim_dynamic_update(db_path, a, "w2")
        q.release_dynamic_update(db_path, a, "w2")  # wrong owner: no-op
        assert not q.claim_dynamic_update(db_path, a, "w2")
        q.release_dynamic_update(db_path, a, "w1")
        assert q.claim_dynamic_update(db_path, a, "w2")


class TestShowcase:
    def test_queue_lifecycle(self, db_path):
        qid = sc.queue_match(db_path, "1", "2", "normal")
        match = sc.claim_next_match(db_path)
        assert match["id"] == qid
        # only one running at a time
        sc.queue_match(db_path, "3", "4", "fast")
        assert sc.claim_next_match(db_path) is None
        gid = sc.create_showcase_game(
            db_path, queue_id=qid, entry_id_black="1", entry_id_white="2"
        )
        sc.write_showcase_move(
            db_path, game_id=gid, ply=1, action_index=42, usi_notation="7g7f",
            board_json="[]", hands_json="[]", current_player="white",
        )
        moves = sc.read_showcase_moves_since(db_path, gid, 0)
        assert len(moves) == 1 and moves[0]["usi_notation"] == "7g7f"
        sc.mark_game_completed(db_path, gid, "black_win", 1)
        sc.complete_queue_entry(db_path, qid)
        assert sc.read_active_showcase_game(db_path) is None
        assert sc.claim_next_match(db_path)["entry_id_1"] == "3"

    def test_orphan_cleanup(self, db_path):
        qid = sc.queue_match(db_path, "1", "2", "normal")
        sc.claim_next_match(db_path)
        gid = sc.create_showcase_game(
            db_path, queue_id=qid, entry_id_black="1", entry_id_white="2"
        )
        # no heartbeat at all -> cleanup fires
        n = sc.cleanup_orphaned_games(db_path)
        assert n == 1
        assert sc.read_showcase_game(db_path, gid)["status"] == "abandoned"
        # fresh heartbeat suppresses cleanup
        sc.write_heartbeat(db_path, pid=123)
        assert sc.cleanup_orphaned_games(db_path) == 0


class TestAnalytics:
    def test_game_features_roundtrip(self, db_path):
        a, b = _add_entry(db_path), _add_entry(db_path)
        db.write_game_features(db_path, [{
            "checkpoint_id": a, "opponent_id": b, "epoch": 1, "side": "black",
            "result": "win", "total_plies": 120, "num_captures": 9,
            "opening_seq_3": json.dumps([1, 2, 3]),
        }])
        rows = db.read_game_features_for_checkpoint(db_path, a)
        assert rows[0]["num_captures"] == 9
        assert rows[0]["num_drops"] == 0  # default applied
        assert db.read_all_game_features(db_path)

    def test_tournament_stats_singleton(self, db_path):
        db.write_tournament_stats(db_path, {"total_games": 10, "games_per_min": 2.5})
        db.write_tournament_stats(db_path, {"total_games": 20})
        st = db.read_tournament_stats(db_path)
        assert st["total_games"] == 20

    def test_style_profiles(self, db_path):
        a = _add_entry(db_path)
        db.write_style_profile(db_path, {
            "checkpoint_id": a, "recomputed_at": "now",
            "profile_status": "ok", "primary_style": "Sharp tactical opener",
        })
        profs = db.read_style_profiles(db_path)
        assert profs[0]["primary_style"] == "Sharp tactical opener"
