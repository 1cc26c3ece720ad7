"""Spectator data: USI/Hodges notation, spectator dicts, VecEnv surface."""

import json

import numpy as np
import pytest

from keisei_tpu.engine import tables as T
from keisei_tpu.engine import types as TY
from keisei_tpu.engine.sfen import STARTPOS_SFEN, parse_sfen
from keisei_tpu.env.spectator_data import (
    build_spectator_dict,
    decode_action_np,
    move_notation,
    move_usi,
    square_usi,
)
from keisei_tpu.env.vec_env import VecEnv


def action_of(from_sq: int, to_sq: int, promote: bool = False) -> int:
    """Build a black-perspective spatial slide action id."""
    fr, fc = divmod(from_sq, 9)
    tr, tc = divmod(to_sq, 9)
    dr, dc = tr - fr, tc - fc
    dist = max(abs(dr), abs(dc))
    dir_idx = T.DIRECTIONS.tolist().index([dr // dist, dc // dist])
    slot = dir_idx * 8 + (dist - 1) + (64 if promote else 0)
    return from_sq * 139 + slot


class TestUSI:
    def test_square_usi_corners(self):
        assert square_usi(0) == "9a"  # row 0 col 0 = file 9, rank a
        assert square_usi(8) == "1a"
        assert square_usi(72) == "9i"
        assert square_usi(80) == "1i"

    def test_pawn_push_7g7f(self):
        # black pawn on 7g = file 7 rank g -> row 6, col 2; to 7f (row 5)
        a = action_of(6 * 9 + 2, 5 * 9 + 2)
        assert move_usi(a, stm=0) == "7g7f"

    def test_white_perspective_flip(self):
        # white pawn push 3c3d: abs from row 2 col 6, to row 3 col 6.
        # In white's perspective space that is 80-24=56 -> north 1 slot.
        frm_abs, to_abs = 2 * 9 + 6, 3 * 9 + 6
        p_from = 80 - frm_abs
        a = p_from * 139 + 0  # N dir, dist 1
        is_drop, f, t, pr, _ = decode_action_np(a, stm=1)
        assert (f, t) == (frm_abs, to_abs)
        assert move_usi(a, stm=1) == "3c3d"

    def test_drop_usi(self):
        # drop pawn at 5e (row 4, col 4) as black: slot 132 + PAWN
        a = (4 * 9 + 4) * 139 + 132
        assert move_usi(a, stm=0) == "P*5e"

    def test_promotion_suffix(self):
        a = action_of(2 * 9 + 2, 1 * 9 + 2, promote=True)
        assert move_usi(a, stm=0).endswith("+")


class TestHodges:
    def test_simple_pawn_move(self):
        board, _, _ = parse_sfen(STARTPOS_SFEN)
        a = action_of(6 * 9 + 2, 5 * 9 + 2)
        assert move_notation(a, board, 0) == "P-7f"

    def test_capture_marker(self):
        board, _, _ = parse_sfen(STARTPOS_SFEN)
        # put a white pawn directly in front of black pawn at 7f
        board[5 * 9 + 2] = TY.PAWN + 16
        a = action_of(6 * 9 + 2, 5 * 9 + 2)
        assert move_notation(a, board, 0) == "Px7f"

    def test_optional_promotion_declined_marker(self):
        # black silver at 4d (row 3 col 5) moving to 4c (row 2, zone) no promo
        board = np.full(81, -1, dtype=np.int8)
        board[3 * 9 + 5] = TY.SILVER
        board[8 * 9 + 4] = TY.KING
        board[0 * 9 + 0] = TY.KING + 16
        a = action_of(3 * 9 + 5, 2 * 9 + 5)
        assert move_notation(a, board, 0) == "S-4c="

    def test_disambiguation_by_file(self):
        # two black golds (6i and 4i) can both reach 5h
        board = np.full(81, -1, dtype=np.int8)
        g1, g2, dest = 8 * 9 + 3, 8 * 9 + 5, 7 * 9 + 4
        board[g1] = TY.GOLD
        board[g2] = TY.GOLD
        board[8 * 9 + 4] = TY.KING
        board[0 * 9 + 0] = TY.KING + 16
        mask = np.zeros((81, 139), dtype=bool)
        mask[g1, action_of(g1, dest) % 139] = True
        mask[g2, action_of(g2, dest) % 139] = True
        a = action_of(g1, dest)
        note = move_notation(a, board, 0, legal_mask=mask)
        assert note == "G6-5h"  # file disambiguation

    def test_drop_notation(self):
        board = np.full(81, -1, dtype=np.int8)
        a = (4 * 9 + 4) * 139 + 132
        assert move_notation(a, board, 0) == "P*5e"


class TestSpectatorDict:
    def test_startpos_fields(self):
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        d = build_spectator_dict(board, hands, stm, 0, TY.NOT_TERMINATED, -1, False)
        assert d["current_player"] == "black"
        assert d["sfen"] == STARTPOS_SFEN
        assert d["is_over"] is False and d["result"] == "in_progress"
        assert len(d["board"]) == 81
        king = d["board"][8 * 9 + 4]
        assert king == {
            "type": "king", "color": "black", "promoted": False, "row": 8, "col": 4
        }
        assert d["hands"]["black"]["pawn"] == 0
        assert json.dumps(d)  # JSON-serializable

    def test_result_names(self):
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        for code, name in [(1, "checkmate"), (2, "repetition"),
                           (3, "perpetual_check"), (4, "impasse"), (5, "max_moves")]:
            d = build_spectator_dict(board, hands, stm, 9, code, 0, False)
            assert d["result"] == name and d["is_over"] is True


@pytest.mark.integration
class TestVecEnvSpectator:
    def test_move_history_and_dict(self):
        env = VecEnv(num_envs=2, max_ply=64, observation_mode="katago",
                     action_mode="spatial")
        r = env.reset()
        rng = np.random.default_rng(0)
        for _ in range(3):
            masks = r.legal_masks if hasattr(r, "legal_masks") else r.legal_masks
            actions = np.array([
                rng.choice(np.nonzero(masks[i])[0]) for i in range(2)
            ])
            r = env.step(actions)
        data = env.get_spectator_data()
        assert len(data) == 2
        assert data[0]["ply"] == 3
        assert len(data[0]["move_history"]) == 3
        # moves are valid USI strings
        for mv in data[0]["move_history"]:
            assert len(mv) in (4, 5) or "*" in mv
        assert data[0]["sfen"] == env.get_sfen(0)
