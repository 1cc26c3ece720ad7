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


def synthetic_rollout(actions, dones, rewards, captured=None, movers=None,
                      a_color=None):
    """Hand-built MatchRollout for deterministic feature pins."""
    from keisei_tpu.league.match import MatchRollout

    actions = np.asarray(actions, np.int32)
    T, N = actions.shape
    if movers is None:  # strict alternation from black
        movers = np.tile((np.arange(T) % 2)[:, None], (1, N)).astype(np.int32)
    return MatchRollout(
        obs=None,
        actions=actions,
        legal_masks=None,
        rewards=np.asarray(rewards, np.float32),
        dones=np.asarray(dones, bool),
        captured=(np.asarray(captured, np.uint8) if captured is not None
                  else np.full((T, N), 255, np.uint8)),
        term_reason=np.zeros((T, N), np.uint8),
        mover_color=np.asarray(movers, np.int32),
        a_color=(np.asarray(a_color, np.int32) if a_color is not None
                 else np.zeros(N, np.int32)),
    )


class TestFeatureClassification:
    """Deterministic pins of the spatial-action classifiers
    (game_feature_tracker.py:28-60 semantics on the 81x139 encoding)."""

    SQ = 40  # arbitrary source square
    SLIDE = SQ * 139 + 3          # plain slide, no promo
    SLIDE_PROMO = SQ * 139 + 67   # slide with promotion (slot 64-127)
    KNIGHT_PLAIN = SQ * 139 + 128
    KNIGHT_PROMO = SQ * 139 + 129
    DROP = SQ * 139 + 134         # drop slot (132-138)
    ROOK_START_MOVE = (7 * 9 + 7) * 139 + 3
    KING_START_MOVE = (8 * 9 + 4) * 139 + 3

    def _extract(self, seq, **kw):
        T = len(seq)
        actions = np.asarray(seq, np.int32)[:, None]
        dones = np.zeros((T, 1), bool)
        dones[-1, 0] = True
        rewards = np.zeros((T, 1), np.float32)
        rewards[-1, 0] = kw.pop("final_reward", 1.0)
        r = synthetic_rollout(actions, dones, rewards, **kw)
        from keisei_tpu.league.features import extract_game_features

        return extract_game_features(r, entry_a_id=1, entry_b_id=2, epoch=0)

    def test_drop_and_promo_classification(self):
        # black (entry a, color 0) moves at even plies
        rows = self._extract([
            self.DROP,          # black drop (ply 0, early)
            self.SLIDE,         # white plain
            self.SLIDE_PROMO,   # black promo
            self.KNIGHT_PROMO,  # white knight promo
            self.KNIGHT_PLAIN,  # black plain knight jump
            self.SLIDE,         # white plain -> done
        ])
        a = next(r for r in rows if r["checkpoint_id"] == 1)
        b = next(r for r in rows if r["checkpoint_id"] == 2)
        assert a["num_drops"] == 1 and a["num_early_drops"] == 1
        assert a["first_drop_ply"] == 0
        assert a["num_promotions"] == 1  # the slide promo; plain knight isn't
        assert b["num_drops"] == 0
        assert b["num_promotions"] == 1  # knight promo slot 129

    def test_capture_attribution(self):
        seq = [self.SLIDE] * 4
        captured = np.full((4, 1), 255, np.uint8)
        captured[2, 0] = 0  # black captures a pawn at ply 2
        rows = self._extract(seq, captured=captured)
        a = next(r for r in rows if r["side"] == "black")
        w = next(r for r in rows if r["side"] == "white")
        assert a["num_captures"] == 1 and a["first_capture_ply"] == 2
        assert w["num_captures"] == 0 and w["first_capture_ply"] is None

    def test_rook_king_early_movement(self):
        rows = self._extract([
            self.ROOK_START_MOVE,  # black rook from start square
            self.KING_START_MOVE,  # white king move
            self.SLIDE,
            self.SLIDE,
        ])
        a = next(r for r in rows if r["side"] == "black")
        w = next(r for r in rows if r["side"] == "white")
        assert a["rook_moved_ply"] == 0 and a["rook_moves_in_20"] == 1
        assert w["king_moves_in_30"] == 1 and w["king_displacement_20"] == 1
        assert a["king_moves_in_30"] == 0

    def test_result_attribution_and_color_swap(self):
        # entry a plays WHITE (a_color=1); black delivers the final +1
        rows = self._extract([self.SLIDE] * 4, a_color=[1])
        # final mover at ply 3 is white (movers alternate from black) and
        # rewards[last] = +1 -> white wins -> entry a wins
        a = next(r for r in rows if r["checkpoint_id"] == 1)
        b = next(r for r in rows if r["checkpoint_id"] == 2)
        assert a["side"] == "white" and a["result"] == "win"
        assert b["side"] == "black" and b["result"] == "loss"

    def test_draw_result(self):
        rows = self._extract([self.SLIDE] * 4, final_reward=0.0)
        assert {r["result"] for r in rows} == {"draw"}

    def test_unfinished_game_skipped(self):
        actions = np.full((4, 1), self.SLIDE, np.int32)
        r = synthetic_rollout(actions, np.zeros((4, 1), bool),
                              np.zeros((4, 1), np.float32))
        assert extract_game_features(r, 1, 2, 0) == []

    def test_opening_sequence_truncation(self):
        seq = [self.SLIDE + i for i in range(10)]
        rows = self._extract(seq)
        a = next(r for r in rows if r["side"] == "black")
        assert json.loads(a["opening_seq_3"]) == [seq[0], seq[2], seq[4]]
        assert len(json.loads(a["opening_seq_6"])) == 5  # only 5 black plies


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
