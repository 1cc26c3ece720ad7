"""Game feature extraction + style profiling."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu import db
from keisei_tpu.league.features import extract_game_features
from keisei_tpu.league.match import play_match
from keisei_tpu.league.style import (
    StyleProfiler,
    aggregate_metrics,
    assign_labels,
    percentile_rank,
)
from keisei_tpu.models.registry import build_model


def tiny_model():
    model, _ = build_model("mlp", {"hidden_sizes": [16]})
    v = model.init(jax.random.key(0), jnp.zeros((1, 50, 9, 9), jnp.float32),
                   train=False)
    return model, v


@pytest.mark.integration
class TestFeatureExtraction:
    def test_rows_from_real_match(self):
        model, v = tiny_model()
        res, rollout = play_match(model, v, model, v, num_games=4,
                                  max_ply=48, chunk_steps=48, seed=3,
                                  collect=True)
        rows = extract_game_features(rollout, entry_a_id=1, entry_b_id=2,
                                     epoch=7)
        # two rows (one per side) per finished game
        assert len(rows) == 2 * res.games
        r = rows[0]
        assert r["checkpoint_id"] in (1, 2) and r["epoch"] == 7
        assert r["result"] in ("win", "loss", "draw")
        assert r["total_plies"] >= 1
        assert len(json.loads(r["opening_seq_3"])) <= 3
        assert r["num_drops"] >= 0 and r["num_captures"] >= 0
        # sides are consistent per env: a-row and b-row results are inverse
        by_pair = {}
        for row in rows:
            by_pair.setdefault(row["total_plies"], []).append(row["result"])
        for results in by_pair.values():
            if "win" in results:
                assert "loss" in results


class TestStyle:
    def _rows(self, n, length, caps, drops, fc):
        return [{
            "total_plies": length, "num_captures": caps, "num_drops": drops,
            "num_early_drops": drops, "num_promotions": 0,
            "first_capture_ply": fc, "rook_moved_ply": None,
            "king_moves_in_30": 0, "opening_seq_3": f"[{i % 3}]",
        } for i in range(n)]

    def test_aggregate_and_rank(self):
        m1 = aggregate_metrics(self._rows(10, 120, 20, 12, 10))
        m2 = aggregate_metrics(self._rows(10, 40, 4, 0, 35))
        assert m1["drops_per_game"] == 12
        pct = percentile_rank({1: m1, 2: m2})
        assert pct[1]["drops_per_game"] == 100.0
        assert pct[2]["drops_per_game"] < 100.0
        assert aggregate_metrics(self._rows(3, 40, 1, 0, 5)) is None  # too few

    def test_labels_and_contradictions(self):
        pct = {"first_capture_ply_mean": 10, "avg_game_length": 20,
               "num_captures_mean": 90, "drops_per_game": 90,
               "num_early_drops_mean": 90, "opening_diversity_index": 10,
               "promotions_per_game": 10, "game_length_variance": 50,
               "rook_moved_early_rate": 10, "king_moves_early_rate": 10}
        labels = assign_labels(pct)
        assert "Sharp tactical opener" in labels
        assert "Slow builder" not in labels  # contradiction + thresholds

    def test_recompute_writes_profiles(self, tmp_path):
        db_path = str(tmp_path / "l.db")
        db.init_db(db_path)
        conn = db.connect(db_path)
        for _ in range(2):
            conn.execute(
                "INSERT INTO league_entries (display_name, architecture, "
                "model_params, checkpoint_path, created_epoch) "
                "VALUES ('e', 'mlp', '{}', '/x', 0)")
        conn.commit()
        conn.close()
        rows = []
        for eid in (1, 2):
            for i in range(10):
                rows.append({
                    "checkpoint_id": eid, "opponent_id": 3 - eid, "epoch": 1,
                    "side": "black", "result": "win",
                    "total_plies": 100 if eid == 1 else 30,
                    "num_captures": 10, "num_drops": 5 * eid,
                    "first_capture_ply": 12, "opening_seq_3": f"[{i}]",
                })
        db.write_game_features(db_path, rows)
        n = StyleProfiler(db_path).recompute_all()
        assert n == 2
        profs = db.read_style_profiles(db_path)
        assert len(profs) == 2
        assert all(p["profile_status"] == "ok" for p in profs)
        assert json.loads(profs[0]["percentile_json"])
