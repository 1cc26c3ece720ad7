"""Extended Hodges/USI notation coverage: disambiguation variants, promoted
pieces, forced/declined promotion suffixes, white-perspective decoding.

Mirrors the reference's notation test depth (spectator_data.rs:239+ inline
tests: file/rank/full-square disambiguation, capture+promote markers,
promoted-piece prefixes).
"""

import numpy as np

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


def action_of(from_sq: int, to_sq: int, promote: bool = False) -> int:
    """Black-perspective spatial slide action id (perspective-space coords)."""
    fr, fc = divmod(from_sq, 9)
    tr, tc = divmod(to_sq, 9)
    dr, dc = tr - fr, tc - fc
    dist = max(abs(dr), abs(dc))
    dir_idx = T.DIRECTIONS.tolist().index([dr // dist, dc // dist])
    slot = dir_idx * 8 + (dist - 1) + (64 if promote else 0)
    return from_sq * 139 + slot


def bare_kings_board() -> np.ndarray:
    board = np.full(81, -1, dtype=np.int8)
    board[8 * 9 + 4] = TY.KING
    board[0 * 9 + 0] = TY.KING + 16
    return board


class TestSquareUSI:
    def test_all_81_squares_roundtrip(self):
        seen = set()
        for sq in range(81):
            s = square_usi(sq)
            assert len(s) == 2
            file_d, rank_c = int(s[0]), s[1]
            assert 1 <= file_d <= 9 and "a" <= rank_c <= "i"
            # invert: row = rank index, col = 9 - file
            assert (ord(rank_c) - ord("a")) * 9 + (9 - file_d) == sq
            seen.add(s)
        assert len(seen) == 81


class TestDecodeActionNp:
    def test_knight_slots_black(self):
        sq = 3 * 9 + 4  # 5d
        for k in range(4):
            a = sq * 139 + 128 + k
            is_drop, frm, to, promote, _ = decode_action_np(a, stm=0)
            assert not is_drop and frm == sq
            assert to == int(T.KNIGHT_TO[0][sq, k // 2])
            assert promote == bool(k % 2)

    def test_knight_slots_white_flip(self):
        sq_p = 3 * 9 + 4
        a = sq_p * 139 + 128  # first knight dest, no promote
        is_drop, frm, to, promote, _ = decode_action_np(a, stm=1)
        assert not is_drop and not promote
        assert frm == 80 - sq_p
        assert to == 80 - int(T.KNIGHT_TO[0][sq_p, 0])

    def test_drop_white_flip(self):
        sq_p = 2 * 9 + 3
        for piece in range(7):
            a = sq_p * 139 + 132 + piece
            is_drop, frm, to, promote, hp = decode_action_np(a, stm=1)
            assert is_drop and frm == -1 and not promote
            assert to == 80 - sq_p and hp == piece

    def test_slide_promote_flag(self):
        a = action_of(2 * 9 + 2, 1 * 9 + 2, promote=True)
        _, _, _, promote, _ = decode_action_np(a, stm=0)
        assert promote


class TestDisambiguation:
    def test_by_rank_same_file(self):
        # two black golds on the same file (5i and 5g) both reaching 5h
        board = bare_kings_board()
        frm, other, dest = 8 * 9 + 4, 6 * 9 + 4, 7 * 9 + 4
        board[frm] = TY.GOLD
        board[other] = TY.GOLD
        board[8 * 9 + 4] = TY.GOLD  # frm overwrites the king square; move king
        board[8 * 9 + 8] = TY.KING
        mask = np.zeros((81, 139), dtype=bool)
        mask[frm, action_of(frm, dest) % 139] = True
        mask[other, action_of(other, dest) % 139] = True
        note = move_notation(action_of(frm, dest), board, 0, legal_mask=mask)
        assert note == "Gi-5h"  # same file -> rank letter disambiguates

    def test_full_square_when_file_and_rank_collide(self):
        # golds at 5i (frm), 6i (same rank), 5g (same file), all reaching 5h
        board = bare_kings_board()
        board[8 * 9 + 8] = TY.KING
        board[8 * 9 + 4] = -1
        frm, o1, o2, dest = 8 * 9 + 4, 8 * 9 + 3, 6 * 9 + 4, 7 * 9 + 4
        board[frm] = TY.GOLD
        board[o1] = TY.GOLD
        board[o2] = TY.GOLD
        mask = np.zeros((81, 139), dtype=bool)
        for f in (frm, o1, o2):
            mask[f, action_of(f, dest) % 139] = True
        note = move_notation(action_of(frm, dest), board, 0, legal_mask=mask)
        assert note == "G5i-5h"

    def test_white_perspective_by_file(self):
        # two WHITE golds (6a, 4a) both reaching 5b; mask is in white
        # perspective space, board in absolute space.
        board = bare_kings_board()
        g1, g2, dest = 0 * 9 + 3, 0 * 9 + 5, 1 * 9 + 4
        board[0 * 9 + 0] = -1
        board[0 * 9 + 8] = TY.KING + 16
        board[g1] = TY.GOLD + 16
        board[g2] = TY.GOLD + 16
        mask = np.zeros((81, 139), dtype=bool)
        a1 = action_of(80 - g1, 80 - dest)
        a2 = action_of(80 - g2, 80 - dest)
        mask[80 - g1, a1 % 139] = True
        mask[80 - g2, a2 % 139] = True
        note = move_notation(a1, board, 1, legal_mask=mask)
        assert note == "G6-5b"

    def test_no_disambiguation_without_mask(self):
        board = bare_kings_board()
        frm, dest = 8 * 9 + 3, 7 * 9 + 4
        board[frm] = TY.GOLD
        board[8 * 9 + 5] = TY.GOLD
        note = move_notation(action_of(frm, dest), board, 0)
        assert note == "G-5h"

    def test_different_piece_type_does_not_disambiguate(self):
        # a silver that can also reach the square must not trigger gold disambig
        board = bare_kings_board()
        frm, other, dest = 8 * 9 + 3, 8 * 9 + 5, 7 * 9 + 4
        board[frm] = TY.GOLD
        board[other] = TY.SILVER
        mask = np.zeros((81, 139), dtype=bool)
        mask[frm, action_of(frm, dest) % 139] = True
        mask[other, action_of(other, dest) % 139] = True
        note = move_notation(action_of(frm, dest), board, 0, legal_mask=mask)
        assert note == "G-5h"

    def test_promoted_and_unpromoted_are_distinct_kinds(self):
        # +S and S reaching the same square: no disambiguation (kind differs)
        board = bare_kings_board()
        frm, other, dest = 8 * 9 + 3, 8 * 9 + 5, 7 * 9 + 4
        board[frm] = TY.SILVER
        board[other] = TY.SILVER + 8  # promoted silver
        mask = np.zeros((81, 139), dtype=bool)
        mask[frm, action_of(frm, dest) % 139] = True
        mask[other, action_of(other, dest) % 139] = True
        note = move_notation(action_of(frm, dest), board, 0, legal_mask=mask)
        assert note == "S-5h"


class TestPromotionMarkers:
    def test_forced_promotion_pawn_last_rank(self):
        board = bare_kings_board()
        frm, dest = 1 * 9 + 0, 0 * 9 + 0
        board[0 * 9 + 0] = -1
        board[0 * 9 + 8] = TY.KING + 16
        board[frm] = TY.PAWN
        note = move_notation(action_of(frm, dest), board, 0)
        assert note == "P-9a+"  # forced promotion renders '+'

    def test_forced_promotion_knight_rank_b(self):
        board = bare_kings_board()
        frm = 3 * 9 + 4  # 5d
        board[frm] = TY.KNIGHT
        dest = int(T.KNIGHT_TO[0][frm, 0])
        a = frm * 139 + 128  # knight slot, promote bit 0
        note = move_notation(a, board, 0)
        assert note.startswith("N-") and note.endswith("+")
        assert square_usi(dest) in note

    def test_capture_and_promote(self):
        board = bare_kings_board()
        frm, dest = 3 * 9 + 2, 2 * 9 + 2
        board[frm] = TY.BISHOP
        # put a white pawn on the destination (in the zone)
        board[dest] = TY.PAWN + 16
        # adjust: bishop moves diagonally; use 4d -> 3c instead
        board[frm] = -1
        board[dest] = -1
        frm, dest = 3 * 9 + 5, 2 * 9 + 6  # 4d -> 3c (NE diag)
        board[frm] = TY.BISHOP
        board[dest] = TY.PAWN + 16
        note = move_notation(action_of(frm, dest, promote=True), board, 0)
        assert note == "Bx3c+"

    def test_gold_never_shows_declined_marker(self):
        board = bare_kings_board()
        frm, dest = 3 * 9 + 4, 2 * 9 + 4  # into the zone
        board[frm] = TY.GOLD
        note = move_notation(action_of(frm, dest), board, 0)
        assert note == "G-5c"  # gold can't promote: no '='

    def test_promoted_piece_prefix_and_no_markers(self):
        board = bare_kings_board()
        frm, dest = 2 * 9 + 4, 1 * 9 + 4  # tokin moving inside the zone
        board[frm] = TY.PAWN + 8
        note = move_notation(action_of(frm, dest), board, 0)
        assert note == "+P-5b"  # promoted prefix; no '+'/'=' suffix

    def test_white_declined_marker_in_white_zone(self):
        # white silver 4f -> 4g (row 6, white's zone): optional promotion
        board = bare_kings_board()
        frm, dest = 5 * 9 + 5, 6 * 9 + 5
        board[frm] = TY.SILVER + 16
        a = action_of(80 - frm, 80 - dest)  # white perspective space
        note = move_notation(a, board, 1)
        assert note == "S-4g="

    def test_empty_from_square_fallback(self):
        board = bare_kings_board()
        a = action_of(4 * 9 + 4, 3 * 9 + 4)
        note = move_notation(a, board, 0)
        assert note.startswith("?")


class TestMoveUSIExtended:
    def test_knight_promote_suffix(self):
        frm = 2 * 9 + 4
        a = frm * 139 + 129  # knight dest 0, promote
        usi = move_usi(a, stm=0)
        assert usi.endswith("+") and len(usi) == 5

    def test_all_seven_drop_pieces(self):
        sq = 4 * 9 + 4
        chars = {move_usi(sq * 139 + 132 + p, stm=0)[0] for p in range(7)}
        assert chars == {"P", "L", "N", "S", "G", "B", "R"}


class TestSpectatorDictExtended:
    def test_promoted_piece_rendering(self):
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        board[4 * 9 + 4] = TY.ROOK + 8 + 16  # white dragon at 5e
        d = build_spectator_dict(board, hands, stm, 10, TY.NOT_TERMINATED, -1, True)
        cell = d["board"][4 * 9 + 4]
        assert cell == {
            "type": "rook", "color": "white", "promoted": True, "row": 4, "col": 4
        }
        assert d["in_check"] is True

    def test_hand_counts_both_colors(self):
        board, hands, stm = parse_sfen(
            "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b 3P2p 1"
        )
        d = build_spectator_dict(board, hands, stm, 0, TY.NOT_TERMINATED, -1, False)
        assert d["hands"]["black"]["pawn"] == 3
        assert d["hands"]["white"]["pawn"] == 2
        assert d["hands"]["black"]["rook"] == 0

    def test_move_history_passthrough(self):
        board, hands, stm = parse_sfen(STARTPOS_SFEN)
        hist = ["7g7f", "3c3d"]
        d = build_spectator_dict(
            board, hands, stm, 2, TY.NOT_TERMINATED, -1, False, move_history=hist
        )
        assert d["move_history"] == hist
        hist.append("8h2b+")
        assert len(d["move_history"]) == 2  # defensive copy
