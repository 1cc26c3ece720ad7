"""SFEN parser robustness: roundtrip under random positions + malformed
input never crashes with anything but SfenError (reference sfen.rs:327+
has exhaustive inline cases; this adds randomized coverage on top of the
pinned cases in test_spectator.py).
"""

import numpy as np
import pytest

from keisei_tpu.engine.sfen import SfenError, parse_sfen, to_sfen
from keisei_tpu.engine.types import EMPTY

# kinds 0-7 = P,L,N,S,G,B,R,K (types.py:30); promotable are
# P,L,N,S,B,R (+8; no +G/+K)
KING = 7
KINDS = [k for k in range(8) if k != KING] + [k + 8 for k in (0, 1, 2, 3, 5, 6)]
HAND_LIMIT = [18, 4, 4, 4, 4, 2, 2]  # hand piece index 0..6 = P,L,N,S,G,B,R


def random_position(rng):
    """Random (not necessarily legal) position that is SFEN-expressible:
    exactly one king per side, hand counts within piece supply."""
    board = np.full(81, EMPTY, dtype=np.int8)
    squares = rng.permutation(81)
    board[squares[0]] = KING  # black king
    board[squares[1]] = KING + 16  # white king
    n_extra = int(rng.integers(0, 20))
    for sq in squares[2:2 + n_extra]:
        kind = int(rng.choice(KINDS))
        color = int(rng.integers(0, 2))
        board[sq] = kind + 16 * color
    hands = np.zeros((2, 7), dtype=np.int8)
    for color in range(2):
        for piece in range(7):
            hands[color, piece] = int(
                rng.integers(0, HAND_LIMIT[piece] // 2 + 1))
    stm = int(rng.integers(0, 2))
    return board, hands, stm


class TestRoundtrip:
    def test_random_positions_roundtrip(self):
        rng = np.random.default_rng(42)
        for _ in range(200):
            board, hands, stm = random_position(rng)
            s = to_sfen(board, hands, stm)
            b2, h2, s2 = parse_sfen(s)
            np.testing.assert_array_equal(board, b2)
            np.testing.assert_array_equal(hands, h2)
            assert stm == s2

    def test_startpos_roundtrip(self):
        s = "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1"
        b, h, stm = parse_sfen(s)
        assert to_sfen(b, h, stm).startswith(s.rsplit(" ", 1)[0])

    def test_multidigit_hand_counts(self):
        b, h, stm = parse_sfen("9/9/9/9/4k4/9/9/9/4K4 b 18P4L 1")
        assert h[0, 0] == 18  # pawns
        assert h[0, 1] == 4  # lances


class TestMalformed:
    """Malformed input raises SfenError — never IndexError/ValueError
    leaking from numpy internals, never a silent wrong parse."""

    CASES = [
        "",  # empty
        "lnsgkgsnl",  # missing fields
        "9/9/9/9/9/9/9/9 b - 1",  # 8 ranks
        "9/9/9/9/9/9/9/9/9/9 b - 1",  # 10 ranks
        "x8/9/9/9/9/9/9/9/9 b - 1",  # bad piece char
        "p9/9/9/9/9/9/9/9/9 b - 1",  # rank overflow
        "8/9/9/9/9/9/9/9/9 b - 1",  # short rank
        "+9/9/9/9/9/9/9/9/9 b - 1",  # + before digit
        "9/9/9/9/9/9/9/9/+ b - 1",  # dangling +
        "+g8/9/9/9/9/9/9/9/9 b - 1",  # promoted gold
        "+k8/9/9/9/9/9/9/9/9 b - 1",  # promoted king
        "9/9/9/9/9/9/9/9/9 x - 1",  # bad stm
        "9/9/9/9/9/9/9/9/9 b K 1",  # king in hand
        "9/9/9/9/9/9/9/9/9 b 19P 1",  # over piece supply
        "9/9/9/9/9/9/9/9/9 b 3 1",  # trailing count
        "9/9/9/9/9/9/9/9/9 b z 1",  # bad hand char
    ]

    @pytest.mark.parametrize("bad", CASES)
    def test_raises_sfen_error(self, bad):
        with pytest.raises(SfenError):
            parse_sfen(bad)

    def test_random_garbage_never_crashes_unexpectedly(self):
        rng = np.random.default_rng(7)
        alphabet = list("lnsgkrbp+LNSGKRBP0123456789/ -wb*")
        for _ in range(500):
            n = int(rng.integers(1, 60))
            s = "".join(rng.choice(alphabet) for _ in range(n))
            try:
                parse_sfen(s)
            except SfenError:
                pass  # the only acceptable failure mode

    def test_fullwidth_and_unicode_rejected(self):
        for s in ["ｌnsgkgsnl/9/9/9/9/9/9/9/9 b - 1",
                  "9/9/9/9/9/9/9/9/9 b   1"]:
            with pytest.raises(SfenError):
                parse_sfen(s)
