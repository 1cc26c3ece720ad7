"""Golden fixtures transcribed from the reference engine's own test vectors.

Round-3 VERDICT #4: oracle<->JAX equivalence is strong but both sides share
one author's reading of the rules. This suite pins BOTH engines against the
reference's OWN inline Rust test cases — concrete positions and expected
moves/results transcribed verbatim from:

    shogi-core/src/rules.rs:466-1947    (rule batteries)
    shogi-core/src/game.rs:528-2246     (game/termination batteries)
    shogi-core/src/movegen.rs:212-1245  (movegen batteries)
    shogi-core/src/sfen.rs:327-736      (SFEN vectors)

Coordinate convention is shared: Square::from_row_col(r, c) == r*9+c, row 0
is White's back rank (types.rs:173-198), identical to this engine's layout
(engine/types.py docstring), so (row, col) coordinates transcribe 1:1.

Each test cites the reference test function it transcribes. Mask-level
fixtures are asserted against BOTH the numpy oracle and the JAX engine.
"""

import numpy as np
import pytest

import jax

from keisei_tpu.engine import core as C
from keisei_tpu.engine import equiv
from keisei_tpu.engine import sfen as S
from keisei_tpu.engine import types as TY
from keisei_tpu.engine import zobrist as Z
from keisei_tpu.engine.oracle import OracleGame, in_check, piece_attacks_square
from keisei_tpu.engine.tables import STARTPOS_BOARD

P, L, N, SV, G, B, R, K = (TY.PAWN, TY.LANCE, TY.KNIGHT, TY.SILVER,
                           TY.GOLD, TY.BISHOP, TY.ROOK, TY.KING)
BLACK, WHITE = 0, 1


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


def game(pieces, hands=(), stm=BLACK, max_ply=500) -> OracleGame:
    """pieces: (row, col, kind, color[, promoted]); hands: (color, hp, n)."""
    board = equiv.empty_board()
    for spec in pieces:
        r, c, kind, color = spec[:4]
        if len(spec) > 4 and spec[4]:
            kind += TY.PROMO_OFFSET
        equiv.put(board, r, c, kind, color)
    h = np.zeros((2, 7), np.int8)
    for color, hp, n in hands:
        h[color, hp] = n
    return OracleGame(board=board, hands=h, stm=stm, max_ply=max_ply)


_JIT_MASK = None


def jax_mask(g: OracleGame) -> np.ndarray:
    """Full (11259,) legal mask from the JAX engine for an oracle position."""
    global _JIT_MASK
    if _JIT_MASK is None:
        _JIT_MASK = jax.jit(lambda s: C.initial_outputs(s, 46)[1])
    st = C.init_state(g.max_ply).replace(
        board=np.asarray(g.board, np.int8),
        hands=np.asarray(g.hands, np.int8),
        stm=np.int8(g.stm),
        hash_=Z.compute_hash(g.board, g.hands, g.stm),
    )
    return np.asarray(_JIT_MASK(st))


def both_masks_equal(g: OracleGame) -> np.ndarray:
    omask = g.legal_mask()
    jmask = jax_mask(g)
    np.testing.assert_array_equal(omask, jmask)
    return omask


def board_targets(moves, from_sq=None):
    """Unique destination squares of board moves (optionally from one square)."""
    return {m[2] for m in moves
            if m[0] == "b" and (from_sq is None or m[1] == from_sq)}


def sq(r, c):
    return r * 9 + c


def drop_action(g, to):
    """Spatial action id of a pawn drop at `to` for the current mover."""
    pt = to if g.stm == 0 else 80 - to
    return pt * 139 + 132 + P


KINGS = [(8, 4, K, BLACK), (0, 4, K, WHITE)]


# ===========================================================================
# SFEN vectors (sfen.rs:327-736)
# ===========================================================================


class TestSfenVectors:
    def test_startpos_roundtrip(self):
        # sfen.rs:332 test_startpos_sfen_roundtrip
        board, hands, stm = S.parse_sfen(S.STARTPOS_SFEN)
        assert S.to_sfen(board, hands, stm) == S.STARTPOS_SFEN

    def test_parse_startpos(self):
        # sfen.rs:339 test_parse_startpos_sfen
        board, hands, stm = S.parse_sfen(S.STARTPOS_SFEN)
        np.testing.assert_array_equal(board, STARTPOS_BOARD)
        assert hands.sum() == 0
        assert stm == BLACK

    @pytest.mark.parametrize("sfen", [
        # sfen.rs:352 roundtrip with hands (both colors)
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL w RGSb 1",
        # sfen.rs:361 roundtrip with a promoted piece on the board
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1+B5R1/LNSGKGSNL b - 1",
        # sfen.rs:481 multi-digit hands both colors
        "4k4/9/9/9/9/9/9/9/4K4 b 18P2r 1",
        # sfen.rs:493 all promoted piece types on the board
        "4k4/9/9/9/+P+L+N+S+B+R3/9/9/9/4K4 b - 1",
        # sfen.rs:505 White-only hand — ADAPTED from "2r3b": the reference
        # parser accepts counts beyond the physical piece supply (3 bishops);
        # this parser deliberately rejects them (sfen.py:96-100, protects the
        # 19-slot Zobrist hand table), so the vector uses the legal maximum
        "4k4/9/9/9/9/9/9/9/4K4 b 2r2b 1",
        # sfen.rs:590 empty board
        "9/9/9/9/9/9/9/9/9 b - 1",
        # sfen.rs:630 White promoted pawn
        "4k4/9/9/9/+p8/9/9/9/4K4 b - 1",
        # sfen.rs:645 White to move
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL w - 1",
        # sfen.rs:658 mixed hands both colors
        "4k4/9/9/9/9/9/9/9/4K4 b 2G3Prbp 1",
    ])
    def test_roundtrip_vectors(self, sfen):
        board, hands, stm = S.parse_sfen(sfen)
        assert S.to_sfen(board, hands, stm) == sfen

    def test_parse_white_to_move(self):
        # sfen.rs:370 test_sfen_parse_white_to_move
        _, _, stm = S.parse_sfen(
            "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL w - 1")
        assert stm == WHITE

    def test_multi_digit_hand_count(self):
        # sfen.rs:417 — 18 pawns in hand (the maximum supply)
        _, hands, _ = S.parse_sfen("4k4/9/9/9/9/9/9/9/4K4 b 18P 1")
        assert hands[BLACK, P] == 18

    def test_multiple_hand_pieces(self):
        # sfen.rs:429 test_sfen_multiple_hand_pieces
        _, hands, _ = S.parse_sfen("4k4/9/9/9/9/9/9/9/4K4 b 2R2B4G4S4N4L18P 1")
        assert hands[BLACK, R] == 2
        assert hands[BLACK, B] == 2
        assert hands[BLACK, G] == 4
        assert hands[BLACK, SV] == 4
        assert hands[BLACK, N] == 4
        assert hands[BLACK, L] == 4
        assert hands[BLACK, P] == 18

    def test_white_only_hand_counts(self):
        # sfen.rs:505 test_sfen_roundtrip_white_only_in_hand (count adapted
        # to the physical supply — see test_roundtrip_vectors)
        _, hands, _ = S.parse_sfen("4k4/9/9/9/9/9/9/9/4K4 b 2r2b 1")
        assert hands[WHITE, R] == 2
        assert hands[WHITE, B] == 2
        assert hands[BLACK, R] == 0

    def test_hand_count_beyond_supply_rejected(self):
        # Deliberate deviation from sfen.rs:507 ("2r3b" parses there): counts
        # beyond the piece supply are corrupt input here
        with pytest.raises(S.SfenError):
            S.parse_sfen("4k4/9/9/9/9/9/9/9/4K4 b 2r3b 1")

    def test_mixed_hands_counts(self):
        # sfen.rs:658 test_sfen_roundtrip_mixed_hands_both_colors
        _, hands, _ = S.parse_sfen("4k4/9/9/9/9/9/9/9/4K4 b 2G3Prbp 1")
        assert hands[BLACK, G] == 2
        assert hands[BLACK, P] == 3
        assert hands[WHITE, R] == 1
        assert hands[WHITE, B] == 1
        assert hands[WHITE, P] == 1

    def test_white_promoted_piece_cell(self):
        # sfen.rs:630 test_sfen_roundtrip_white_promoted_piece
        board, _, _ = S.parse_sfen("4k4/9/9/9/+p8/9/9/9/4K4 b - 1")
        assert board[sq(4, 0)] == P + TY.PROMO_OFFSET + 16 * WHITE

    def test_empty_board_cells_and_hands(self):
        # sfen.rs:590 test_sfen_empty_board
        board, hands, _ = S.parse_sfen("9/9/9/9/9/9/9/9/9 b - 1")
        assert (board == TY.EMPTY).all()
        assert hands.sum() == 0

    @pytest.mark.parametrize("bad", [
        "lnsgkgsnl b",                                                    # sfen.rs:387 too short
        "Xnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :393 bad piece char
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1 b - 1",          # :442 8 ranks
        "lnsgkgsn/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :450 8-col rank
        "lnsgkgsnl/0r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :458 zero empty
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSG+KGSNL b - 1",  # :466 promoted king
        "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL x - 1",  # :474 bad side
        "4k4/9/9/9/9/9/9/9/4K4 b K 1",                                    # :613 king in hand
        "55sgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :621 col overflow
        "lnsgkgs/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :675 7-col rank
        "lnsgkgsnll/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :683 10-col rank
        "lnsgkgsn+/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :691 dangling '+'
        "4k4/9/9/9/9/9/9/9/4K4 b 3 1",                                    # :699 trailing count
        "4k4/9/9/9/9/9/9/9/4K4 b X 1",                                    # :707 bad hand char
        "!nsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",  # :715 '!' in board
    ])
    def test_invalid_sfen_rejected(self, bad):
        with pytest.raises(S.SfenError):
            S.parse_sfen(bad)

    def test_parsed_hash_matches_recomputation(self):
        # sfen.rs:377 + :727 — hash of a parsed position == recomputed hash
        for sfen in (S.STARTPOS_SFEN, "4k4/9/9/9/9/9/9/9/4K4 w 2Pp 1"):
            board, hands, stm = S.parse_sfen(sfen)
            g = OracleGame(board=board, hands=hands, stm=stm)
            np.testing.assert_array_equal(
                g.hash_, Z.compute_hash(board, hands, stm))

    def test_different_positions_different_hashes(self):
        # sfen.rs:401 — stm flip alone must change the hash
        b1, h1, s1 = S.parse_sfen(S.STARTPOS_SFEN)
        b2, h2, s2 = S.parse_sfen(
            "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL w - 1")
        assert not np.array_equal(Z.compute_hash(b1, h1, s1),
                                  Z.compute_hash(b2, h2, s2))

    def test_captured_promoted_piece_lands_in_hand_as_base(self):
        # sfen.rs:519 test_sfen_captured_promoted_piece_in_hand_as_base
        g = game(KINGS + [(4, 4, R, WHITE, True), (4, 0, R, BLACK)])
        g.make_move(("b", sq(4, 0), sq(4, 4), False))
        assert g.hands[BLACK, R] == 1
        out = S.to_sfen(g.board, g.hands, g.stm)
        assert out.split()[2] == "R"
        board2, hands2, _ = S.parse_sfen(out)
        assert hands2[BLACK, R] == 1
        np.testing.assert_array_equal(board2, g.board)


# ===========================================================================
# Rules: uchi-fu-zume (rules.rs:550-678, 1334-1499)
# ===========================================================================


class TestUchiFuZumeVectors:
    # NOTE: the reference's three positive fixtures are positions where the
    # protector (lance/rook) ALREADY attacks the defending king square before
    # the drop — i.e. the non-mover starts in check, a state unreachable in a
    # real game. The reference only ever calls is_uchi_fu_zume directly on
    # them (rules.rs:614/:1412/:1464), so these transcriptions assert the
    # direct rule call; mask-level drop-mate parity on LEGAL positions is
    # asserted by test_mask_level_exclusion_legal_position below and the
    # in-suite equiv drop-mate fixtures (engine/equiv.py:475-525).

    def test_positive_cornered_king(self):
        # rules.rs:574 test_uchi_fu_zume_positive — rook walls row 0, gold
        # covers (1,1), lance protects the dropped pawn at (1,0)
        g = game([(0, 0, K, WHITE), (8, 8, K, BLACK), (0, 8, R, BLACK),
                  (2, 1, G, BLACK), (8, 0, L, BLACK)],
                 hands=[(BLACK, P, 1)])
        assert g.is_uchi_fu_zume(sq(1, 0))

    def test_mask_level_exclusion_legal_position(self):
        # Same mating geometry rebuilt as a LEGAL position (no pre-existing
        # check): both engines must exclude exactly the mating drop
        board, hands, stm, action, _ = equiv.uchifuzume_fixture(
            3, "gold", flipped=False)
        g = OracleGame(board=np.asarray(board, np.int8),
                       hands=np.asarray(hands, np.int8), stm=stm)
        assert not in_check(g.board, 1 - g.stm)
        mask = both_masks_equal(g)
        assert not mask[action]

    def test_negative_king_escapes(self):
        # rules.rs:622 test_uchi_fu_zume_negative_king_escapes
        g = game([(0, 4, K, WHITE), (8, 4, K, BLACK)], hands=[(BLACK, P, 1)])
        assert not g.is_uchi_fu_zume(sq(1, 4))

    def test_negative_no_check(self):
        # rules.rs:654 test_uchi_fu_zume_negative_no_check
        g = game([(0, 0, K, WHITE), (8, 8, K, BLACK)], hands=[(BLACK, P, 1)])
        assert not g.is_uchi_fu_zume(sq(4, 4))
        mask = both_masks_equal(g)
        assert mask[drop_action(g, sq(4, 4))]

    def test_pinned_defender_cannot_rescue(self):
        # rules.rs:1356 test_uchi_fu_zume_pinned_defender — the white gold
        # at (0,1) attacks the drop square but is pinned by the rook on row 0
        g = game([(0, 0, K, WHITE), (0, 1, G, WHITE), (0, 8, R, BLACK),
                  (2, 1, G, BLACK), (8, 0, L, BLACK), (8, 8, K, BLACK)],
                 hands=[(BLACK, P, 1)])
        assert g.is_uchi_fu_zume(sq(1, 0))

    def test_white_as_dropper(self):
        # rules.rs:1420 test_uchi_fu_zume_white_as_dropper (mirrored roles)
        g = game([(8, 8, K, BLACK), (0, 0, K, WHITE), (8, 0, R, WHITE),
                  (6, 7, G, WHITE), (0, 8, L, WHITE)],
                 hands=[(WHITE, P, 1)], stm=WHITE)
        assert g.is_uchi_fu_zume(sq(7, 8))

    def test_mask_level_exclusion_white_dropper_legal_position(self):
        # White-as-dropper mating geometry as a LEGAL position (flipped
        # equiv fixture), asserted at mask level in both engines
        board, hands, stm, action, _ = equiv.uchifuzume_fixture(
            3, "gold", flipped=True)
        g = OracleGame(board=np.asarray(board, np.int8),
                       hands=np.asarray(hands, np.int8), stm=stm)
        assert g.stm == WHITE
        assert not in_check(g.board, 1 - g.stm)
        mask = both_masks_equal(g)
        assert not mask[action]

    def test_king_captures_pawn(self):
        # rules.rs:1472 test_uchi_fu_zume_king_captures_pawn
        g = game([(0, 4, K, WHITE), (8, 4, K, BLACK)], hands=[(BLACK, P, 1)])
        assert not g.is_uchi_fu_zume(sq(1, 4))
        mask = both_masks_equal(g)
        assert mask[drop_action(g, sq(1, 4))]


# ===========================================================================
# Rules: sennichite / perpetual check (rules.rs:484-492, 684-807, 826-904,
#                                      1505-1581)
# ===========================================================================


def _shuttle(g, cycles, moves):
    for _ in range(cycles):
        for mv in moves:
            g.make_move(mv)


_KING_SHUTTLE = [
    ("b", sq(8, 4), sq(7, 4), False),   # Black king down
    ("b", sq(0, 4), sq(1, 4), False),   # White king down
    ("b", sq(7, 4), sq(8, 4), False),   # Black king up
    ("b", sq(1, 4), sq(0, 4), False),   # White king up -> start repeated
]


class TestSennichiteVectors:
    def test_new_game_no_sennichite(self):
        # rules.rs:485 test_sennichite_not_triggered_below_4
        g = OracleGame()
        g.check_termination()
        assert g.reason == TY.NOT_TERMINATED

    def test_fourfold_king_shuttle_is_repetition(self):
        # rules.rs:692 test_sennichite_fourfold_repetition — quiet shuttle,
        # 3 full cycles -> start position appears 4 times -> draw
        g = game([(8, 4, K, BLACK), (0, 4, K, WHITE)])
        _shuttle(g, 3, _KING_SHUTTLE)
        g.check_termination()
        assert g.reason == TY.REPETITION
        assert g.winner == TY.WINNER_NONE

    def test_threefold_not_triggered(self):
        # rules.rs:756 test_sennichite_not_triggered_at_threefold
        g = game([(8, 4, K, BLACK), (0, 4, K, WHITE)])
        _shuttle(g, 2, _KING_SHUTTLE)
        g.check_termination()
        assert g.reason == TY.NOT_TERMINATED

    def test_perpetual_check_black_checker_white_wins(self):
        # rules.rs:827 test_perpetual_check_detection — Black rook chases the
        # White king; the victim (White) wins
        g = game([(0, 0, K, WHITE), (8, 8, K, BLACK), (0, 8, R, BLACK)],
                 stm=WHITE)
        assert g.in_check_now()
        _shuttle(g, 3, [
            ("b", sq(0, 0), sq(1, 0), False),   # White king escapes
            ("b", sq(0, 8), sq(1, 8), False),   # Black rook re-checks
            ("b", sq(1, 0), sq(0, 0), False),
            ("b", sq(1, 8), sq(0, 8), False),
        ])
        g.check_termination()
        assert g.reason == TY.PERPETUAL_CHECK
        assert g.winner == WHITE

    def test_perpetual_check_white_checker_black_wins(self):
        # rules.rs:1508 test_perpetual_check_white_checks_black (mirrored)
        g = game([(8, 8, K, BLACK), (0, 0, K, WHITE), (8, 0, R, WHITE)],
                 stm=BLACK)
        assert g.in_check_now()
        _shuttle(g, 3, [
            ("b", sq(8, 8), sq(7, 8), False),
            ("b", sq(8, 0), sq(7, 0), False),
            ("b", sq(7, 8), sq(8, 8), False),
            ("b", sq(7, 0), sq(8, 0), False),
        ])
        g.check_termination()
        assert g.reason == TY.PERPETUAL_CHECK
        assert g.winner == BLACK


# ===========================================================================
# Rules: piece values / material balance (rules.rs:911-1051)
# ===========================================================================


class TestPieceValueVectors:
    def test_piece_value_all_combinations(self):
        # rules.rs:912 test_piece_value_all_combinations
        expect = {P: (1, 7), L: (3, 6), N: (4, 6), SV: (5, 6),
                  G: (6, None), B: (8, 10), R: (10, 12), K: (0, None)}
        for kind, (base, promoted) in expect.items():
            assert int(TY.PIECE_VALUE[kind]) == base
            if promoted is not None:
                assert int(TY.PIECE_VALUE[kind + TY.PROMO_OFFSET]) == promoted

    def test_promotion_increases_value(self):
        # rules.rs:940 test_piece_value_promotion_increases_value
        for kind in (P, L, N, SV, B, R):
            assert TY.PIECE_VALUE[kind + TY.PROMO_OFFSET] > TY.PIECE_VALUE[kind]

    def test_material_balance_startpos_zero(self):
        # rules.rs:957 test_material_balance_startpos_is_zero
        g = OracleGame()
        assert g.material_balance(BLACK) == 0
        assert g.material_balance(WHITE) == 0

    def test_material_balance_perspective_negation(self):
        # rules.rs:968 — asymmetric position negates across perspectives
        g = game(KINGS + [(4, 0, R, BLACK)])
        assert g.material_balance(BLACK) == -g.material_balance(WHITE)

    def test_material_balance_extra_rook(self):
        # rules.rs:988 test_material_balance_black_has_extra_rook
        g = game(KINGS + [(4, 0, R, BLACK)])
        assert g.material_balance(BLACK) == int(TY.PIECE_VALUE[R])

    def test_material_balance_hand_pieces_counted(self):
        # rules.rs:1005 test_material_balance_hand_pieces_counted
        g = game(KINGS, hands=[(BLACK, G, 1)])
        assert g.material_balance(BLACK) == int(TY.PIECE_VALUE[G])

    def test_material_balance_promoted_uses_promoted_value(self):
        # rules.rs:1022 — a Dragon is worth 12, not 10
        g = game(KINGS + [(4, 0, R, BLACK, True)])
        assert g.material_balance(BLACK) == int(
            TY.PIECE_VALUE[R + TY.PROMO_OFFSET])

    def test_material_balance_king_excluded(self):
        # rules.rs:1040 test_material_balance_king_excluded
        g = game(KINGS)
        assert g.material_balance(BLACK) == 0


# ===========================================================================
# Rules: impasse scoring + trigger (rules.rs:474-502, 1057-1332, 1587-1785,
#                                   1921-1946)
# ===========================================================================


def _impasse_position(black_pawns, black_hand_rooks, white_pawns,
                      white_hand_rooks) -> OracleGame:
    """Transcribes rules.rs:1193 make_impasse_position: kings entered, pawns
    filled row-major across the camps (skipping the king squares), hand rooks
    tune the scores."""
    pieces = [(0, 4, K, BLACK), (8, 4, K, WHITE)]
    placed = 0
    for r in range(0, 3):
        for c in range(9):
            if (r, c) == (0, 4) or placed >= black_pawns:
                continue
            pieces.append((r, c, P, BLACK))
            placed += 1
    placed = 0
    for r in range(6, 9):
        for c in range(9):
            if (r, c) == (8, 4) or placed >= white_pawns:
                continue
            pieces.append((r, c, P, WHITE))
            placed += 1
    return game(pieces, hands=[(BLACK, R, black_hand_rooks),
                               (WHITE, R, white_hand_rooks)])


class TestImpasseVectors:
    def test_score_startpos_27(self):
        # rules.rs:474 test_impasse_score_starting
        assert OracleGame().impasse_scores() == (27, 27)

    def test_startpos_no_impasse(self):
        # rules.rs:495 test_impasse_requires_both_kings_entered
        g = OracleGame()
        assert g._check_impasse() is None

    def test_score_with_hand_pieces(self):
        # rules.rs:1059 — startpos + 2 hand pawns = 29
        g = OracleGame()
        g.hands[BLACK, P] = 2
        assert g.impasse_scores()[0] == 29

    def test_score_promoted_rook_worth_5(self):
        # rules.rs:1070 test_impasse_score_promoted_piece_value
        g = game([(4, 4, R, BLACK, True), (8, 4, K, BLACK)])
        assert g.impasse_scores()[0] == 5

    def test_score_promoted_pawn_worth_1(self):
        # rules.rs:1588 test_impasse_score_promoted_pawn_worth_1
        g = game([(4, 4, P, BLACK, True), (8, 4, K, BLACK)])
        assert g.impasse_scores()[0] == 1

    def test_score_promoted_bishop_worth_5(self):
        # rules.rs:1604 test_impasse_score_promoted_bishop_worth_5
        g = game([(4, 4, B, BLACK, True), (8, 4, K, BLACK)])
        assert g.impasse_scores()[0] == 5

    def test_score_mixed(self):
        # rules.rs:1620 — R(5) + Horse(5) + Tokin(1) + G(1) + hand S(1) = 13
        g = game([(8, 4, K, BLACK), (4, 0, R, BLACK), (4, 1, B, BLACK, True),
                  (4, 2, P, BLACK, True), (4, 3, G, BLACK)],
                 hands=[(BLACK, SV, 1)])
        assert g.impasse_scores()[0] == 13

    def test_triggers_draw_when_both_reach_24(self):
        # rules.rs:1088 test_impasse_triggers_correctly — Black 25, White 27
        pieces = [(0, 4, K, BLACK), (8, 4, K, WHITE),
                  (0, 0, B, BLACK), (1, 0, R, BLACK)]
        for c in (1, 2, 3, 5, 6, 7, 8):
            pieces.append((0, c, P, BLACK))
        for r, c in [(8, 0), (8, 1), (8, 2), (8, 3), (8, 5), (8, 6), (8, 7),
                     (8, 8), (7, 0)]:
            pieces.append((r, c, P, WHITE))
        g = game(pieces, hands=[
            (BLACK, G, 2), (BLACK, SV, 2), (BLACK, N, 2), (BLACK, L, 2),
            (WHITE, R, 1), (WHITE, B, 1), (WHITE, G, 2), (WHITE, SV, 2),
            (WHITE, N, 2), (WHITE, L, 2)])
        assert g.impasse_scores() == (25, 27)
        assert g._check_impasse() == (TY.IMPASSE, TY.WINNER_NONE)

    def test_black_wins(self):
        # rules.rs:1254 test_check_impasse_black_wins — 9+15=24 vs 9
        g = _impasse_position(9, 3, 9, 0)
        assert g.impasse_scores() == (24, 9)
        assert g._check_impasse() == (TY.IMPASSE, BLACK)

    def test_white_wins(self):
        # rules.rs:1288 test_check_impasse_white_wins
        g = _impasse_position(9, 0, 9, 3)
        assert g.impasse_scores() == (9, 24)
        assert g._check_impasse() == (TY.IMPASSE, WHITE)

    def test_neither_reaches_threshold(self):
        # rules.rs:1320 test_check_impasse_neither_reaches_score_threshold
        g = _impasse_position(9, 0, 9, 0)
        assert g._check_impasse() is None

    def test_one_sided_winner_black(self):
        # rules.rs:1655 test_impasse_one_sided_winner — golds + R + B = 18
        # on board, 7 hand pawns -> 25; White 10 pawns -> 10
        pieces = [(0, 4, K, BLACK), (8, 4, K, WHITE),
                  (1, 0, R, BLACK), (1, 1, B, BLACK)]
        for c in range(9):
            if c != 4:
                pieces.append((0, c, G, BLACK))
        for c in range(9):
            if c != 4:
                pieces.append((8, c, P, WHITE))
        pieces += [(7, 0, P, WHITE), (7, 1, P, WHITE)]
        g = game(pieces, hands=[(BLACK, P, 7)])
        assert g._check_impasse() == (TY.IMPASSE, BLACK)

    def test_one_sided_winner_white(self):
        # rules.rs:1723 test_impasse_one_sided_white_wins (mirror)
        pieces = [(0, 4, K, BLACK), (8, 4, K, WHITE),
                  (7, 0, R, WHITE), (7, 1, B, WHITE)]
        for c in range(9):
            if c != 4:
                pieces.append((0, c, P, BLACK))
        pieces += [(1, 0, P, BLACK), (1, 1, P, BLACK)]
        for c in range(9):
            if c != 4:
                pieces.append((8, c, G, WHITE))
        g = game(pieces, hands=[(WHITE, P, 7)])
        assert g._check_impasse() == (TY.IMPASSE, WHITE)

    def test_only_one_king_entered_returns_none(self):
        # rules.rs:1921 test_check_impasse_only_one_king_entered_returns_none
        pieces = [(0, 4, K, BLACK), (0, 0, K, WHITE), (2, 0, P, BLACK)]
        for c in (0, 1, 2, 3, 5, 6, 7, 8):
            pieces.append((1, c, P, BLACK))
        g = game(pieces, hands=[(BLACK, R, 3)])
        assert g._check_impasse() is None


# ===========================================================================
# Rules: piece_attacks_square (rules.rs:504-535, 1791-1912)
# ===========================================================================


def _attacks(pieces, from_rc, target_rc):
    g = game(pieces)
    return piece_attacks_square(g.board, sq(*from_rc), sq(*target_rc))


class TestAttackVectors:
    def test_black_pawn(self):
        # rules.rs:505 — black pawn at (5,4) attacks (4,4), not (6,4)
        pieces = [(5, 4, P, BLACK)]
        assert _attacks(pieces, (5, 4), (4, 4))
        assert not _attacks(pieces, (5, 4), (6, 4))

    def test_rook_blocked(self):
        # rules.rs:520 — blocker at (4,3) stops the ray before (4,5)
        pieces = [(4, 0, R, BLACK), (4, 3, P, WHITE)]
        assert not _attacks(pieces, (4, 0), (4, 5))
        assert _attacks(pieces, (4, 0), (4, 2))
        assert _attacks(pieces, (4, 0), (4, 3))  # the blocker itself

    def test_black_knight(self):
        # rules.rs:1792 test_piece_attacks_square_knight
        pieces = [(4, 4, N, BLACK)]
        assert _attacks(pieces, (4, 4), (2, 3))
        assert _attacks(pieces, (4, 4), (2, 5))
        assert not _attacks(pieces, (4, 4), (3, 4))

    def test_white_knight(self):
        # rules.rs:1807 — White knight jumps DOWN
        pieces = [(4, 4, N, WHITE)]
        assert _attacks(pieces, (4, 4), (6, 3))
        assert _attacks(pieces, (4, 4), (6, 5))

    def test_lance_blocked(self):
        # rules.rs:1819 test_piece_attacks_square_lance
        free = [(6, 4, L, BLACK)]
        assert _attacks(free, (6, 4), (3, 4))
        blocked = [(6, 4, L, BLACK), (4, 4, P, WHITE)]
        assert not _attacks(blocked, (6, 4), (3, 4))
        assert _attacks(blocked, (6, 4), (4, 4))

    def test_silver(self):
        # rules.rs:1839 test_piece_attacks_square_silver
        pieces = [(4, 4, SV, BLACK)]
        for t in [(3, 4), (3, 3), (3, 5), (5, 3), (5, 5)]:
            assert _attacks(pieces, (4, 4), t)
        for t in [(4, 3), (5, 4)]:
            assert not _attacks(pieces, (4, 4), t)

    def test_gold(self):
        # rules.rs:1856 test_piece_attacks_square_gold
        pieces = [(4, 4, G, BLACK)]
        for t in [(3, 4), (3, 3), (4, 3), (5, 4)]:
            assert _attacks(pieces, (4, 4), t)
        for t in [(5, 3), (5, 5)]:
            assert not _attacks(pieces, (4, 4), t)

    def test_bishop_diagonal_only(self):
        # rules.rs:1872 test_piece_attacks_square_bishop_diagonal
        pieces = [(4, 4, B, BLACK)]
        assert _attacks(pieces, (4, 4), (2, 2))
        assert _attacks(pieces, (4, 4), (6, 6))
        assert not _attacks(pieces, (4, 4), (4, 6))

    def test_dragon(self):
        # rules.rs:1884 — rook slides + single-step diagonals, no 2-sq diag
        pieces = [(4, 4, R, BLACK, True)]
        assert _attacks(pieces, (4, 4), (4, 8))
        assert _attacks(pieces, (4, 4), (0, 4))
        assert _attacks(pieces, (4, 4), (3, 3))
        assert _attacks(pieces, (4, 4), (5, 5))
        assert not _attacks(pieces, (4, 4), (2, 2))

    def test_horse(self):
        # rules.rs:1900 — bishop slides + single-step orthogonals
        pieces = [(4, 4, B, BLACK, True)]
        assert _attacks(pieces, (4, 4), (2, 2))
        assert _attacks(pieces, (4, 4), (3, 4))
        assert _attacks(pieces, (4, 4), (4, 5))
        assert not _attacks(pieces, (4, 4), (2, 4))


# ===========================================================================
# Game batteries (game.rs:528-2246)
# ===========================================================================


class TestGameVectors:
    def test_opening_legal_count_30(self):
        # game.rs:623 test_legal_moves_opening_count (+ :1166
        # test_write_legal_mask_into_startpos: exactly 30 true bits)
        g = OracleGame()
        assert len(g.legal_moves()) == 30
        mask = both_masks_equal(g)
        assert int(mask.sum()) == 30

    def test_hash_matches_recomputation_after_each_opening_move(self):
        # game.rs:577 test_hash_matches_recomputation_after_move (no unmake
        # by design — the dense-mask engine replays from a fresh game)
        base = OracleGame()
        for mv in base.legal_moves():
            g = OracleGame()
            g.make_move(mv)
            np.testing.assert_array_equal(
                g.hash_, Z.compute_hash(g.board, g.hands, g.stm),
                err_msg=f"incremental hash diverged after {mv}")

    def test_in_check_detection(self):
        # game.rs:639 test_in_check_detection
        g = game([(8, 4, K, BLACK), (0, 4, K, WHITE), (4, 4, R, WHITE)])
        assert g.in_check_now()

    def test_capture_adds_to_hand(self):
        # game.rs:667 test_capture_adds_to_hand
        g = game(KINGS + [(5, 4, P, BLACK), (4, 4, P, WHITE)])
        assert g.hands[BLACK, P] == 0
        g.make_move(("b", sq(5, 4), sq(4, 4), False))
        assert g.hands[BLACK, P] == 1

    def test_nifu_prevented(self):
        # game.rs:713 test_nifu_prevented — no pawn drop on col 4, but pawn
        # drops allowed elsewhere
        g = game(KINGS + [(6, 4, P, BLACK)], hands=[(BLACK, P, 1)])
        mask = both_masks_equal(g)
        drops = [m for m in g.legal_moves() if m[0] == "d" and m[2] == P]
        assert all(m[1] % 9 != 4 for m in drops), "nifu drop leaked"
        assert any(m[1] % 9 != 4 for m in drops), "non-nifu drops missing"
        assert not mask[drop_action(g, sq(3, 4))]

    def test_nifu_promoted_pawn_does_not_block(self):
        # game.rs:1251 test_nifu_promoted_pawn_does_not_block_drop
        g = game(KINGS + [(5, 4, P, BLACK, True)], hands=[(BLACK, P, 1)])
        drops = [m for m in g.legal_moves() if m[0] == "d" and m[2] == P]
        assert any(m[1] % 9 == 4 for m in drops), \
            "Tokin on col 4 must not trigger nifu"
        mask = both_masks_equal(g)
        assert mask[drop_action(g, sq(3, 4))]

    def test_nifu_white_pawn_drop_blocked(self):
        # game.rs:1288 test_nifu_white_pawn_drop_blocked
        g = game(KINGS + [(3, 3, P, WHITE)], hands=[(WHITE, P, 1)], stm=WHITE)
        drops = [m for m in g.legal_moves() if m[0] == "d" and m[2] == P]
        assert all(m[1] % 9 != 3 for m in drops)
        both_masks_equal(g)

    def test_ply_tracking(self):
        # game.rs:777 test_ply_tracking (make-only half; no unmake by design)
        g = OracleGame()
        assert g.ply == 0
        g.make_move(g.legal_moves()[0])
        assert g.ply == 1

    def test_max_ply_zero_terminates(self):
        # game.rs:795 test_check_termination_max_ply
        g = OracleGame(max_ply=0)
        g.check_termination()
        assert g.reason == TY.MAX_MOVES

    def test_checkmate_cornered_king(self):
        # game.rs:806 test_check_termination_checkmate
        g = game([(0, 0, K, BLACK), (8, 8, K, WHITE), (0, 8, R, WHITE),
                  (1, 1, G, WHITE), (8, 1, R, WHITE)])
        g.check_termination()
        assert (g.reason, g.winner) == (TY.CHECKMATE, WHITE)
        assert g.in_check_now()  # true mate, not stalemate
        mask = both_masks_equal(g)
        assert int(mask.sum()) == 0

    def test_capture_promoted_reverts_to_base(self):
        # game.rs:902 test_capture_promoted_piece_reverts_to_base
        g = game(KINGS + [(4, 4, B, WHITE, True), (4, 0, R, BLACK)])
        g.make_move(("b", sq(4, 0), sq(4, 4), False))
        assert g.hands[BLACK, B] == 1

    def test_stalemate_black_is_loss(self):
        # game.rs:1061 test_stalemate_is_loss — cornered, not in check,
        # every square blocked/defended -> Checkmate{winner: White}
        g = game([(0, 0, K, BLACK), (2, 1, K, WHITE), (0, 1, P, WHITE),
                  (1, 0, P, WHITE), (1, 1, P, WHITE), (0, 5, R, WHITE)])
        assert not g.in_check_now()
        assert g.legal_moves() == []
        g.check_termination()
        assert (g.reason, g.winner) == (TY.CHECKMATE, WHITE)
        mask = both_masks_equal(g)
        assert int(mask.sum()) == 0

    def test_stalemate_white_loses(self):
        # game.rs:2051 test_stalemate_white_loses (mirror)
        g = game([(8, 8, K, WHITE), (6, 7, K, BLACK), (8, 7, P, BLACK),
                  (7, 8, P, BLACK), (7, 7, P, BLACK), (8, 3, R, BLACK)],
                 stm=WHITE)
        assert not g.in_check_now()
        assert g.legal_moves() == []
        g.check_termination()
        assert (g.reason, g.winner) == (TY.CHECKMATE, BLACK)
        both_masks_equal(g)

    def test_check_termination_idempotent(self):
        # game.rs:1808/:1821/:2112 — repeated calls return the same verdict
        for build in (
            lambda: OracleGame(max_ply=0),
            lambda: game([(0, 0, K, BLACK), (8, 8, K, WHITE),
                          (0, 8, R, WHITE), (1, 1, G, WHITE),
                          (8, 1, R, WHITE)]),
            lambda: game([(0, 0, K, BLACK), (2, 1, K, WHITE),
                          (0, 1, P, WHITE), (1, 0, P, WHITE),
                          (1, 1, P, WHITE), (0, 5, R, WHITE)]),
        ):
            g = build()
            g.check_termination()
            first = (g.reason, g.winner)
            assert first[0] != TY.NOT_TERMINATED
            g.check_termination()
            assert (g.reason, g.winner) == first

    def test_king_safety_pinned_piece_cannot_move(self):
        # game.rs:1441 test_king_safety_filter_pinned_piece
        g = game([(4, 4, K, BLACK), (0, 0, K, WHITE), (4, 8, R, WHITE),
                  (4, 6, P, BLACK)])
        mask = both_masks_equal(g)
        assert not [m for m in g.legal_moves()
                    if m[0] == "b" and m[1] == sq(4, 6)]
        assert int(mask.sum()) == len(g.legal_moves())

    def test_king_safety_must_escape_check(self):
        # game.rs:1492 test_king_safety_filter_must_escape_check — every
        # legal reply leaves the king safe, and replies exist
        g = game([(4, 4, K, BLACK), (0, 0, K, WHITE), (4, 8, R, WHITE),
                  (6, 6, B, BLACK)])
        assert g.in_check_now()
        moves = g.legal_moves()
        assert moves
        for mv in moves:
            assert not in_check(g._board_after(mv), BLACK), \
                f"{mv} leaves the king in check"
        both_masks_equal(g)

    def test_drop_rook_gives_check(self):
        # game.rs:1915 test_unmake_drop_with_check (make half)
        g = game(KINGS, hands=[(BLACK, R, 1)])
        g.make_move(("d", sq(1, 4), R))
        assert g.in_check_now()  # White (now to move) is in check
        assert g.hands[BLACK, R] == 0

    def test_drop_gold_gives_check(self):
        # game.rs:1965 test_unmake_gold_drop_with_check (make half)
        g = game(KINGS, hands=[(BLACK, G, 2)])
        g.make_move(("d", sq(1, 4), G))
        assert g.in_check_now()
        assert g.hands[BLACK, G] == 1

    def test_pawn_drop_updates_pawn_columns(self):
        # game.rs:1760 test_pawn_columns_after_pawn_drop_unmake (make half —
        # nifu state is recomputed, not cached, in this engine)
        g = game(KINGS, hands=[(BLACK, P, 1)])
        assert not g.pawn_on_col(BLACK, 2)
        g.make_move(("d", sq(5, 2), P))
        assert g.pawn_on_col(BLACK, 2)

    def test_compute_pawn_columns_correctness(self):
        # game.rs:1861 — promoted pawns do NOT count for nifu
        g = game([(6, 3, P, BLACK), (4, 5, P, BLACK, True), (2, 7, P, WHITE)])
        assert g.pawn_on_col(BLACK, 3)
        assert not g.pawn_on_col(BLACK, 5)
        assert g.pawn_on_col(WHITE, 7)
        assert not g.pawn_on_col(WHITE, 0)

    def test_perft_1_and_2(self):
        # game.rs:1225/:1231 — perft(1)=30, perft(2)=900 (depths 3-5 are
        # pinned against the JAX engine in tests/test_perft.py)
        g = OracleGame()
        moves = g.legal_moves()
        assert len(moves) == 30
        total = 0
        for mv in moves:
            g2 = OracleGame()
            g2.make_move(mv)
            total += len(g2.legal_moves())
        assert total == 900

    def test_multi_ply_hash_consistency(self):
        # game.rs:1126 test_multi_ply_hash_and_attack_consistency — 30 plies
        # of deterministic play, incremental hash == recomputed every ply
        g = OracleGame()
        for ply in range(30):
            moves = g.legal_moves()
            if not moves:
                break
            g.make_move(moves[ply % len(moves)])
            np.testing.assert_array_equal(
                g.hash_, Z.compute_hash(g.board, g.hands, g.stm),
                err_msg=f"hash diverged at ply {ply + 1}")

    def test_fuzz_consistency_short(self):
        # game.rs:2160 test_fuzz_consistency_100_games, scaled to 3 seeds x
        # 60 plies (the full-scale analogue is the committed 351k-ply
        # oracle-equivalence campaign, profiles/oracle-campaign.json)
        for seed in range(3):
            rng = np.random.default_rng(seed)
            g = OracleGame(max_ply=60)
            for _ in range(60):
                g.check_termination()
                if g.is_terminal():
                    break
                moves = g.legal_moves()
                g.make_move(moves[int(rng.integers(len(moves)))])
                np.testing.assert_array_equal(
                    g.hash_, Z.compute_hash(g.board, g.hands, g.stm))


# ===========================================================================
# Movegen batteries (movegen.rs:212-1245) — pseudo-legal layer, oracle only
# (the JAX engine's dense mask is the fused legal product; its parity with
# the oracle's legal layer is asserted in the classes above)
# ===========================================================================


def lone(r, c, kind, color, promoted=False):
    g = game([(r, c, kind, color, promoted)], stm=color)
    return g.pseudo_legal_board_moves()


class TestMovegenVectors:
    def test_startpos_black_board_moves(self):
        # movegen.rs:242 test_startpos_board_moves_count
        g = OracleGame()
        moves = g.pseudo_legal_board_moves()
        pawn_pushes = [m for m in moves
                       if not m[3] and m[1] // 9 == 6 and m[2] // 9 == 5]
        assert len(pawn_pushes) >= 9
        assert len(moves) <= 50

    def test_startpos_white_pawn_pushes(self):
        # movegen.rs:501 test_startpos_white_board_moves
        g = OracleGame(stm=WHITE)
        moves = g.pseudo_legal_board_moves()
        pushes = [m for m in moves
                  if not m[3] and m[1] // 9 == 2 and m[2] // 9 == 3]
        assert len(pushes) == 9

    def test_black_knight_targets_and_promo_variants(self):
        # movegen.rs:275 test_knight_forward_direction — both targets in the
        # zone -> 4 moves
        moves = lone(4, 4, N, BLACK)
        assert {m[2] for m in moves} == {sq(2, 3), sq(2, 5)}
        assert len(moves) == 4

    def test_white_knight_targets(self):
        # movegen.rs:480 test_white_knight_forward_direction
        moves = lone(4, 4, N, WHITE)
        assert {m[2] for m in moves} == {sq(6, 3), sq(6, 5)}
        assert len(moves) == 4

    def test_forced_promotion_pawn_last_rank(self):
        # movegen.rs:322 test_forced_promotion
        moves = lone(1, 4, P, BLACK)
        assert moves == [("b", sq(1, 4), sq(0, 4), True)]

    def test_optional_promotion_pawn_entering_zone(self):
        # movegen.rs:346 test_optional_promotion
        moves = lone(3, 4, P, BLACK)
        assert len(moves) == 2
        assert {m[3] for m in moves} == {False, True}

    def test_white_pawn_forward(self):
        # movegen.rs:428 test_white_pawn_moves_forward
        assert lone(2, 4, P, WHITE) == [("b", sq(2, 4), sq(3, 4), False)]

    def test_white_pawn_optional_promotion(self):
        # movegen.rs:448 test_white_pawn_optional_promotion
        moves = lone(5, 4, P, WHITE)
        assert len(moves) == 2
        assert {m[3] for m in moves} == {False, True}

    def test_white_pawn_forced_promotion(self):
        # movegen.rs:466 test_white_pawn_forced_promotion
        assert lone(7, 4, P, WHITE) == [("b", sq(7, 4), sq(8, 4), True)]

    def test_lone_rook_19_moves(self):
        # movegen.rs:521 test_lone_rook_move_count
        assert len(lone(4, 4, R, BLACK)) == 19

    def test_lone_bishop_22_moves(self):
        # movegen.rs:544 test_lone_bishop_move_count
        assert len(lone(4, 4, B, BLACK)) == 22

    def test_lone_lance_6_moves(self):
        # movegen.rs:570 test_lone_lance_move_count
        assert len(lone(4, 4, L, BLACK)) == 6

    def test_rook_blocked_by_own_piece(self):
        # movegen.rs:593 test_rook_blocked_by_own_piece
        g = game([(4, 4, R, BLACK), (4, 6, P, BLACK)])
        targets = board_targets(g.pseudo_legal_board_moves(), sq(4, 4))
        assert sq(4, 5) in targets
        for c in (6, 7, 8):
            assert sq(4, c) not in targets

    def test_bishop_blocked_by_own_piece(self):
        # movegen.rs:649 test_bishop_blocked_by_own_piece
        g = game([(4, 4, B, BLACK), (2, 2, G, BLACK)])
        targets = board_targets(g.pseudo_legal_board_moves(), sq(4, 4))
        assert sq(3, 3) in targets
        assert sq(2, 2) not in targets

    def test_silver_corner_0_0(self):
        # movegen.rs:697 — only (1,1); no wrap to col 8
        assert board_targets(lone(0, 0, SV, BLACK)) == {sq(1, 1)}

    def test_silver_corner_0_8(self):
        # movegen.rs:727 — only (1,7); DOWN_RIGHT must not wrap to col 0
        assert board_targets(lone(0, 8, SV, BLACK)) == {sq(1, 7)}

    def test_gold_corner_0_0(self):
        # movegen.rs:748 — (0,1) and (1,0) only
        assert board_targets(lone(0, 0, G, BLACK)) == {sq(0, 1), sq(1, 0)}

    def test_horse_corner_0_0(self):
        # movegen.rs:769 — 2 orthogonal steps + 8 diagonal slides = 10
        targets = board_targets(lone(0, 0, B, BLACK, promoted=True))
        expect = {sq(0, 1), sq(1, 0)} | {sq(i, i) for i in range(1, 9)}
        assert targets == expect

    def test_dragon_corner_8_8(self):
        # movegen.rs:798 — 1 diagonal step + 8 up + 8 left = 17
        targets = board_targets(lone(8, 8, R, BLACK, promoted=True))
        expect = ({sq(7, 7)} | {sq(r, 8) for r in range(8)}
                  | {sq(8, c) for c in range(8)})
        assert targets == expect

    def test_no_drops_with_empty_hand(self):
        # movegen.rs:829 test_no_drops_with_empty_hand
        assert OracleGame().pseudo_legal_drops() == []

    def test_drops_only_on_empty_squares(self):
        # movegen.rs:403 test_drops_only_on_empty_squares
        g = OracleGame()
        g.hands[BLACK, R] = 1
        for m in g.pseudo_legal_drops():
            assert g.board[m[1]] == TY.EMPTY

    @pytest.mark.parametrize("kind,color", [
        (P, BLACK), (L, BLACK), (N, BLACK), (SV, BLACK),
        (P, WHITE), (L, WHITE), (N, WHITE), (SV, WHITE),
    ])
    def test_promoted_minor_moves_like_gold(self, kind, color):
        # movegen.rs:842-982 — +P/+L/+N/+S == Gold, both colors
        promoted = board_targets(lone(4, 4, kind, color, promoted=True))
        gold = board_targets(lone(4, 4, G, color))
        assert promoted == gold

    def test_drops_with_all_hand_piece_types_exact_counts(self):
        # movegen.rs:990 test_drops_with_all_hand_piece_types — dead-drop
        # exclusions: P/L lose 8 row-0 squares, N loses 17 (rows 0-1)
        g = game(KINGS, hands=[(BLACK, hp, 1) for hp in range(7)])
        drops = g.pseudo_legal_drops()
        empty = 79
        expect = {P: empty - 8, L: empty - 8, N: empty - 17,
                  SV: empty, G: empty, B: empty, R: empty}
        for hp, want in expect.items():
            got = sum(1 for m in drops if m[2] == hp)
            assert got == want, f"hand piece {hp}: {got} != {want}"
        assert len(drops) == sum(expect.values())

    def test_white_drops_exclude_dead_squares(self):
        # movegen.rs:1164 test_white_drops_exclude_dead_squares
        g = game([(0, 4, K, WHITE), (8, 4, K, BLACK)],
                 hands=[(WHITE, P, 1), (WHITE, N, 1), (WHITE, L, 1)],
                 stm=WHITE)
        for m in g.pseudo_legal_drops():
            row = m[1] // 9
            if m[2] in (P, L):
                assert row != 8, f"dead {m}"
            if m[2] == N:
                assert row < 7, f"dead {m}"

    def test_dead_drop_boundaries(self):
        # movegen.rs:371/:1118/:1133/:1146 is_dead_drop truth table,
        # asserted through the generated drop rows
        def drop_rows(hp, color):
            g = game(KINGS, hands=[(color, hp, 1)], stm=color)
            return {m[1] // 9 for m in g.pseudo_legal_drops()}

        assert drop_rows(P, BLACK) == set(range(1, 9))
        assert drop_rows(L, BLACK) == set(range(1, 9))
        assert drop_rows(N, BLACK) == set(range(2, 9))
        assert drop_rows(P, WHITE) == set(range(0, 8))
        assert drop_rows(L, WHITE) == set(range(0, 8))
        assert drop_rows(N, WHITE) == set(range(0, 7))
        for hp in (SV, G, B, R):
            assert drop_rows(hp, BLACK) == set(range(9))
            assert drop_rows(hp, WHITE) == set(range(9))

    def test_must_promote_knight_boundaries(self):
        # movegen.rs:1090 — knight moving to row 1 must promote (black)
        moves = lone(3, 4, N, BLACK)  # targets row 1
        assert moves and all(m[3] for m in moves)
        moves = lone(5, 4, N, WHITE)  # targets row 7
        assert moves and all(m[3] for m in moves)
        moves = lone(4, 4, N, BLACK)  # targets row 2: optional
        assert {m[3] for m in moves} == {False, True}

    def test_silver_entering_zone_has_both_variants(self):
        # movegen.rs:1216 test_board_moves_promotion_in_zone
        g = game(KINGS + [(3, 0, SV, BLACK)])
        to_zone = [m for m in g.pseudo_legal_board_moves()
                   if m[1] == sq(3, 0) and m[2] // 9 == 2]
        assert {m[3] for m in to_zone} == {False, True}

    def test_gold_never_promotes(self):
        # movegen.rs:1103 test_must_promote_non_promotable (gold/king arm)
        for r in (0, 4, 8):
            for kind in (G, K):
                if r == 8 and kind == K:
                    continue
                moves = lone(r, 4, kind, BLACK)
                assert all(not m[3] for m in moves)
