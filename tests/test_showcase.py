"""Showcase sidecar: heatmap, model cache, full exhibition game."""

import json

import numpy as np
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
        monkeypatch.setattr(_t, "sleep", lambda s: None) if False else None
        t.start()
        deadline = _t.monotonic() + 30
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
