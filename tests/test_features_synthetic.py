"""Game-feature extraction pinned on hand-crafted rollouts.

Pins the exact semantics of extract_game_features (reference
game_feature_tracker.py:28-60, :176+): global-ply windows for rook/king
movement, early-drop threshold, knight-promotion slot parity (129/131 yes,
128/130 no), side attribution via a_color, unfinished-game skip, and the
no-moves-side skip. Complements test_features_style.py's integration tests.
"""

import json

import numpy as np

from keisei_tpu.engine import zobrist as Z
from keisei_tpu.engine.sfen import STARTPOS_SFEN, parse_sfen
from keisei_tpu.league.features import (
    KING_START,
    NO_CAPTURE,
    ROOK_START,
    extract_game_features,
)
from keisei_tpu.league.match import MatchRollout


def _rollout(T, N, **arrs):
    base = dict(
        obs=None,
        legal_masks=None,
        actions=np.zeros((T, N), np.int32),
        rewards=np.zeros((T, N), np.float32),
        dones=np.zeros((T, N), bool),
        captured=np.full((T, N), NO_CAPTURE, np.uint8),
        term_reason=np.zeros((T, N), np.uint8),
        mover_color=np.zeros((T, N), np.int32),
        a_color=np.zeros(N, np.int32),
    )
    base.update(arrs)
    return MatchRollout(**base)


def make_three_env_rollout():
    T, N = 10, 3
    actions = np.zeros((T, N), np.int32)
    movers = np.zeros((T, N), np.int32)
    dones = np.zeros((T, N), bool)
    rewards = np.zeros((T, N), np.float32)
    captured = np.full((T, N), NO_CAPTURE, np.uint8)
    reasons = np.zeros((T, N), np.uint8)
    a_color = np.array([0, 0, 1], np.int32)

    # env 0: 6-ply game, strict alternation starting black
    movers[:, 0] = [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    actions[0, 0] = ROOK_START * 139 + 0       # rook slide (slot 0)
    actions[1, 0] = KING_START * 139 + 0       # king move
    actions[2, 0] = (4 * 9 + 4) * 139 + 132    # pawn drop (early: ply 2 < 40)
    actions[3, 0] = (3 * 9 + 4) * 139 + 129    # knight jump WITH promotion
    actions[4, 0] = (2 * 9 + 2) * 139 + 64     # slide promotion
    actions[5, 0] = (3 * 9 + 4) * 139 + 128    # knight jump, NO promotion
    captured[4, 0] = 2                          # capture on ply 4 (color 0)
    dones[5, 0] = True
    rewards[5, 0] = 1.0                         # last mover (color 1) wins
    reasons[5, 0] = 1                           # checkmate

    # env 1: never finishes -> no rows
    movers[:, 1] = np.arange(T) % 2

    # env 2: 1-ply draw; a_color=1 so entry A (white) never moved
    movers[0, 2] = 0
    actions[0, 2] = (6 * 9 + 2) * 139 + 0
    dones[0, 2] = True
    rewards[0, 2] = 0.0
    reasons[0, 2] = 5                           # max_moves

    return _rollout(
        T, N, actions=actions, mover_color=movers, dones=dones,
        rewards=rewards, captured=captured, term_reason=reasons,
        a_color=a_color,
    )


class TestExtractGameFeatures:
    def setup_method(self):
        self.rows = extract_game_features(make_three_env_rollout(), 11, 22, epoch=7)

    def _row(self, checkpoint_id, side):
        got = [r for r in self.rows
               if r["checkpoint_id"] == checkpoint_id and r["side"] == side]
        assert len(got) == 1
        return got[0]

    def test_row_count_and_skips(self):
        # env 0 -> 2 rows; env 1 unfinished -> 0; env 2 -> 1 (A had no moves)
        assert len(self.rows) == 3

    def test_result_attribution(self):
        a = self._row(11, "black")
        b = self._row(22, "white")
        assert a["result"] == "loss" and b["result"] == "win"
        assert a["opponent_id"] == 22 and b["opponent_id"] == 11
        assert a["epoch"] == 7
        assert a["termination_reason"] == 1

    def test_draw_and_no_move_side_skip(self):
        d = self._row(22, "black")  # env 2: entry B played black
        assert d["result"] == "draw"
        assert d["total_plies"] == 1
        assert d["termination_reason"] == 5
        # entry A (white, env 2) never moved: no row with side=white for env 2
        whites = [r for r in self.rows if r["side"] == "white"]
        assert len(whites) == 1  # only env 0's B row

    def test_black_side_features_env0(self):
        a = self._row(11, "black")
        assert a["rook_moved_ply"] == 0
        assert a["first_drop_ply"] == 2
        assert a["num_drops"] == 1
        assert a["num_early_drops"] == 1
        assert a["first_capture_ply"] == 4
        assert a["num_captures"] == 1
        assert a["num_promotions"] == 1      # slot 64 only
        assert a["king_moves_in_30"] == 0
        assert a["rook_moves_in_20"] == 1
        assert a["total_plies"] == 6

    def test_white_side_features_env0(self):
        b = self._row(22, "white")
        assert b["king_displacement_20"] == 1
        assert b["king_moves_in_30"] == 1
        # knight slot 129 promotes, slot 128 does not
        assert b["num_promotions"] == 1
        assert b["num_drops"] == 0
        assert b["first_capture_ply"] is None
        assert b["rook_moved_ply"] is None

    def test_opening_sequences(self):
        a = self._row(11, "black")
        r = make_three_env_rollout()
        acts = np.asarray(r.actions)
        expect = [int(acts[0, 0]), int(acts[2, 0]), int(acts[4, 0])]
        assert json.loads(a["opening_seq_3"]) == expect
        assert json.loads(a["opening_seq_6"]) == expect  # only 3 moves played
        assert a["first_action"] == expect[0]

    def test_drop_is_never_a_rook_or_king_move(self):
        # a drop ONTO the rook start square must not count as a rook move
        T, N = 2, 1
        actions = np.zeros((T, N), np.int32)
        actions[0, 0] = ROOK_START * 139 + 132  # drop at rook-start square
        movers = np.zeros((T, N), np.int32)
        movers[1, 0] = 1
        dones = np.zeros((T, N), bool)
        dones[1, 0] = True
        r = _rollout(T, N, actions=actions, mover_color=movers, dones=dones)
        rows = extract_game_features(r, 1, 2, epoch=0)
        black = [x for x in rows if x["side"] == "black"][0]
        assert black["rook_moved_ply"] is None
        assert black["num_drops"] == 1


class TestZobristTables:
    def test_table_shapes_and_dtypes(self):
        assert Z.Z_PIECE.shape == (32, 81, 2) and Z.Z_PIECE.dtype == np.uint32
        assert Z.Z_HAND.shape == (2, 7, 19, 2)
        assert Z.Z_STM.shape == (2,)

    def test_hand_count_zero_contributes_nothing(self):
        assert (Z.Z_HAND[:, :, 0, :] == 0).all()

    def test_hand_counts_are_count_indexed_not_incremental(self):
        # hash(count=2) must differ from hash(count=1) by a full key swap:
        # the tables are count-indexed (zobrist.rs hand[2][7][19])
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        hands[0, 0] = 1
        h1 = Z.compute_hash(board, hands, stm)
        hands[0, 0] = 2
        h2 = Z.compute_hash(board, hands, stm)
        assert (h1 != h2).any()
        # count-indexed: the count-1 key is removed and the count-2 key added
        assert (h2 == (h1 ^ Z.Z_HAND[0, 0, 1] ^ Z.Z_HAND[0, 0, 2])).all()
        # NOT incremental (h2 != h1 ^ count-2-key alone)
        assert not (h2 == (h1 ^ Z.Z_HAND[0, 0, 2])).all()

    def test_stm_flips_hash(self):
        board, hands, _ = parse_sfen(STARTPOS_SFEN)
        h_b = Z.compute_hash(board, hands, 0)
        h_w = Z.compute_hash(board, hands, 1)
        assert (h_w == (h_b ^ Z.Z_STM)).all()

    def test_deterministic_across_calls(self):
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        assert (Z.compute_hash(board, hands, stm)
                == Z.compute_hash(board, hands, stm)).all()

    def test_no_collisions_over_random_positions(self):
        rng = np.random.default_rng(0)
        board, hands, _ = parse_sfen(STARTPOS_SFEN)
        occupied = np.flatnonzero(board >= 0)
        seen = {}
        for _ in range(300):
            b = board.copy()
            # clear a random subset of OCCUPIED squares (distinct positions)
            sqs = tuple(sorted(rng.choice(occupied, 5, replace=False)))
            for sq in sqs:
                b[sq] = -1
            h = Z.compute_hash(b, hands, 0)
            key = (int(h[0]), int(h[1]))
            if key in seen:
                assert seen[key] == sqs, "hash collision between positions"
            seen[key] = sqs
