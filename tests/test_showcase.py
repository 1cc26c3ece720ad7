"""Showcase sidecar: heatmap, model cache, full exhibition game."""

import json
import time

import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.db import showcase as sc
from keisei_tpu.league.store import OpponentStore, Role
from keisei_tpu.models.registry import build_model
from keisei_tpu.showcase.runner import ShowcaseRunner, build_heatmap


class TestHeatmap:
    def test_filters_by_from_square(self):
        legal = [(1, "7g7f"), (2, "7g7e"), (3, "2g2f"), (4, "P*5e")]
        probs = {1: 0.5, 2: 0.2, 3: 0.25, 4: 0.05}
        hm = build_heatmap("7g7f", legal, probs)
        assert hm == {"7g7f": 0.5, "7g7e": 0.2}
        hm2 = build_heatmap("P*5e", legal, probs)
        assert hm2 == {"P*5e": 0.05}

    def test_drops_zero_and_nonfinite(self):
        legal = [(1, "7g7f"), (2, "7g7e")]
        hm = build_heatmap("7g7f", legal, {1: 0.0, 2: float("nan")})
        assert hm == {}


@pytest.mark.integration
class TestShowcaseRunner:
    def test_full_exhibition_game(self, tmp_path):
        db_path = str(tmp_path / "obs.db")
        store = OpponentStore(db_path, str(tmp_path / "league"))
        model, _ = build_model("mlp", {"hidden_sizes": [16]})
        for seed in (0, 1):
            v = model.init(jax.random.key(seed),
                           jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
            store.add_entry(v, architecture="mlp", model_params={"hidden_sizes": [16]},
                            created_epoch=0, role=Role.DYNAMIC)

        qid = sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(tmp_path / "league"),
                                max_ply=12, auto_showcase=False, store=store)
        import keisei_tpu.showcase.runner as runner_mod

        runner_mod.SPEED_DELAYS = {"slow": 0, "normal": 0, "fast": 0}
        match = sc.claim_next_match(db_path)
        runner.play_match(match)
        sc.complete_queue_entry(db_path, qid)

        game = sc.read_showcase_game(db_path, 1)
        assert game["status"] in ("black_win", "white_win", "draw")
        assert game["total_ply"] >= 1
        moves = sc.read_all_showcase_moves(db_path, 1)
        assert len(moves) == game["total_ply"]
        m0 = moves[0]
        assert m0["usi_notation"]  # Hodges string
        assert m0["move_usi"]
        board = json.loads(m0["board_json"])
        assert len(board) == 81
        hm = json.loads(m0["move_heatmap_json"])
        assert m0["move_usi"] in hm
        assert m0["value_estimate"] is not None
        assert sc.get_queue_status(db_path, qid) == "done"


@pytest.fixture
def pool2(tmp_path):
    """DB + store with two mlp entries, zeroed move delays."""
    import keisei_tpu.showcase.runner as runner_mod

    db_path = str(tmp_path / "obs.db")
    store = OpponentStore(db_path, str(tmp_path / "league"))
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    for seed in (0, 1):
        v = model.init(jax.random.key(seed),
                       jnp.zeros((1, 50, 9, 9), jnp.float32), train=False)
        store.add_entry(v, architecture="mlp",
                        model_params={"hidden_sizes": [16]},
                        created_epoch=0, role=Role.DYNAMIC)
    runner_mod.SPEED_DELAYS = {"slow": 0, "normal": 0, "fast": 0}
    return db_path, store


@pytest.mark.integration
class TestShowcaseControl:
    """Cancellation, speed changes, bad entries, orphan sweeps — the
    WS-command surface the soak exercised but the suite barely touched."""

    def test_cancel_before_first_poll_abandons_game(self, pool2):
        db_path, store = pool2
        qid = sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(store.league_dir),
                                max_ply=64, auto_showcase=False, store=store)
        match = sc.claim_next_match(db_path)
        sc.cancel_match(db_path, qid)  # user cancels while claimed
        runner.play_match(match)
        game = sc.read_showcase_game(db_path, 1)
        assert game["status"] == "abandoned"
        assert game["abandon_reason"] == "cancelled by user"
        # the cancellation sticks: complete_queue_entry must NOT overwrite
        sc.complete_queue_entry(db_path, qid)
        assert sc.get_queue_status(db_path, qid) == "cancelled"

    def test_speed_change_mid_game_is_picked_up(self, pool2, monkeypatch):
        import keisei_tpu.showcase.runner as runner_mod

        db_path, store = pool2
        qid = sc.queue_match(db_path, "1", "2", "fast")
        monkeypatch.setattr(
            runner_mod, "SPEED_DELAYS", {"slow": 111, "normal": 0, "fast": 0})
        sleeps = []
        monkeypatch.setattr(runner_mod.time, "sleep",
                            lambda s: sleeps.append(s))
        runner = ShowcaseRunner(db_path, str(store.league_dir),
                                max_ply=12, auto_showcase=False, store=store)
        match = sc.claim_next_match(db_path)
        sc.update_queue_speed(db_path, qid, "slow")
        runner.play_match(match)
        assert 111 in sleeps, "speed change never reached the move loop"

    def test_unknown_entries_cancel_queue_entry(self, pool2):
        db_path, store = pool2
        qid = sc.queue_match(db_path, "777", "888", "fast")
        runner = ShowcaseRunner(db_path, str(store.league_dir),
                                auto_showcase=False, store=store)
        match = sc.claim_next_match(db_path)
        runner.play_match(match)
        assert sc.get_queue_status(db_path, qid) == "cancelled"
        assert sc.read_showcase_game(db_path, 1) is None  # no game created

    def test_play_db_failure_requeues_entry(self, pool2, monkeypatch):
        """If play_match dies on a DB error, the queue entry is REQUEUED
        and replayed — not silently marked done with no game (ADVICE r1)."""
        import sqlite3
        import threading
        import time as _t

        db_path, store = pool2
        sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(store.league_dir), max_ply=8,
                                auto_showcase=False, store=store)
        calls = {"n": 0}
        real_play = runner.play_match

        def flaky_play(row):
            calls["n"] += 1
            if calls["n"] == 1:
                raise sqlite3.OperationalError("database is locked")
            real_play(row)

        monkeypatch.setattr(runner, "play_match", flaky_play)
        t = threading.Thread(target=runner.run, daemon=True)
        t.start()
        deadline = _t.monotonic() + 180  # xdist load + 5s backoff + first-compile
        status = None
        while _t.monotonic() < deadline:
            status = sc.get_queue_status(db_path, 1)
            if status == "done":
                break
            _t.sleep(0.2)
        runner.request_stop()
        t.join(timeout=15)
        assert status == "done"
        assert calls["n"] == 2, "entry was not replayed after the requeue"
        game = sc.read_showcase_game(db_path, 1)
        assert game is not None and game["status"] != "in_progress"

    def test_orphan_cleanup_sweeps_stale_games(self, pool2):
        from keisei_tpu.db import core as dbcore

        db_path, _ = pool2
        qid = sc.queue_match(db_path, "1", "2", "normal")
        sc.claim_next_match(db_path)
        sc.create_showcase_game(db_path, queue_id=qid,
                                entry_id_black="1", entry_id_white="2")
        # stale runner heartbeat -> the game is orphaned
        dbcore.write_row(db_path, "showcase_heartbeat", {
            "id": 1, "runner_pid": 99, "last_heartbeat": "2020-01-01T00:00:00Z",
        }, replace=True)
        swept = sc.cleanup_orphaned_games(db_path)
        assert swept == 1
        assert sc.read_showcase_game(db_path, 1)["status"] == "abandoned"
        assert sc.get_queue_status(db_path, qid) == "cancelled"

    def test_orphan_cleanup_noop_when_runner_alive(self, pool2):
        db_path, _ = pool2
        qid = sc.queue_match(db_path, "1", "2", "normal")
        sc.claim_next_match(db_path)
        sc.create_showcase_game(db_path, queue_id=qid,
                                entry_id_black="1", entry_id_white="2")
        sc.write_heartbeat(db_path, 123)  # fresh
        assert sc.cleanup_orphaned_games(db_path) == 0
        assert sc.read_showcase_game(db_path, 1)["status"] == "in_progress"

    def test_auto_showcase_queues_match(self, pool2):
        db_path, store = pool2
        runner = ShowcaseRunner(db_path, str(store.league_dir),
                                auto_showcase=True, store=store)
        # long idle: subtract the interval rather than assuming 0.0 is old —
        # time.monotonic() counts from BOOT, so on a machine up for less
        # than AUTO_SHOWCASE_INTERVAL_S the 0.0 sentinel is NOT idle enough
        # (this flaked on a 25-minute-old CI VM)
        import keisei_tpu.showcase.runner as runner_mod
        runner._last_activity = (
            time.monotonic() - runner_mod.AUTO_SHOWCASE_INTERVAL_S - 1.0)
        runner._maybe_auto_showcase()
        q = sc.read_queue(db_path)
        assert len(q) == 1 and q[0]["status"] == "pending"

    def test_requeue_preserves_cancellation(self, pool2):
        db_path, _ = pool2
        qid = sc.queue_match(db_path, "1", "2", "fast")
        sc.claim_next_match(db_path)
        sc.cancel_match(db_path, qid)
        sc.requeue_entry(db_path, qid)  # must not resurrect
        assert sc.get_queue_status(db_path, qid) == "cancelled"


class TestQueueWedgeRecovery:
    def test_claimed_entry_completes_after_transient_db_error(self, tmp_path, monkeypatch):
        """A failed complete_queue_entry must not wedge the queue: the
        runner retries completing the claimed id before claiming again
        (regression: status='running' rows blocked claim_next_match
        forever while the runner idled 'healthy')."""
        import keisei_tpu.db.showcase as sc
        from keisei_tpu.db import init_db
        from keisei_tpu.db.showcase import queue_match
        from keisei_tpu.showcase.runner import ShowcaseRunner

        db = str(tmp_path / "s.db")
        init_db(db)
        queue_match(db, "1", "2", "fast")

        runner = ShowcaseRunner(db, str(tmp_path / "league"), auto_showcase=False)
        played = []
        monkeypatch.setattr(runner, "play_match", lambda row: played.append(row["id"]))

        calls = {"n": 0}
        real_complete = sc.complete_queue_entry

        def flaky_complete(path, qid):
            calls["n"] += 1
            if calls["n"] == 1:
                import sqlite3
                raise sqlite3.OperationalError("database is locked")
            real_complete(path, qid)

        monkeypatch.setattr(sc, "complete_queue_entry", flaky_complete)
        # run() loops forever; drive a bounded number of iterations by
        # stopping once the queue drains
        import threading
        import time as _t

        t = threading.Thread(target=runner.run, daemon=True)
        t.start()
        deadline = _t.monotonic() + 120  # xdist load + 5s backoff
        status = None
        while _t.monotonic() < deadline:
            status = sc.get_queue_status(db, 1)
            if status == "done":
                break
            _t.sleep(0.5)
        runner.request_stop()
        t.join(timeout=10)
        assert played, "match was never claimed/played"
        assert status == "done", f"queue stuck in {status!r}"
        assert calls["n"] >= 2  # first attempt failed, retry completed it


@pytest.mark.integration
class TestRunnerLoop:
    def test_run_loop_claims_plays_and_stops(self, pool2, tmp_path):
        """The sidecar's real run() loop: startup sweep -> heartbeat ->
        claim -> play -> complete, then a clean stop from another thread
        (the SIGTERM handler calls the same request_stop)."""
        import threading
        import time as _time

        db_path, store = pool2
        qid = sc.queue_match(db_path, "1", "2", "fast")
        runner = ShowcaseRunner(db_path, str(store.league_dir),
                                max_ply=8, auto_showcase=False, store=store)
        t = threading.Thread(target=runner.run, daemon=True)
        t.start()
        deadline = _time.monotonic() + 60
        while _time.monotonic() < deadline:
            if sc.get_queue_status(db_path, qid) == "done":
                break
            _time.sleep(0.2)
        runner.request_stop()
        t.join(timeout=30)
        assert not t.is_alive()
        assert sc.get_queue_status(db_path, qid) == "done"
        game = sc.read_showcase_game(db_path, 1)
        assert game["status"] in ("black_win", "white_win", "draw")
        hb = sc.read_heartbeat(db_path)
        assert hb is not None
