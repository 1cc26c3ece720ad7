"""Pin-aware legality fixtures: absolute pins, double check, check evasion.

The device engine filters king-safety WITHOUT make/unmake (attack/pin masks,
engine/core.py legal_mask_pspace); these positions pin that logic explicitly
rather than statistically (the random-playout equivalence tests). Every
fixture is also cross-checked move-for-move against the scalar oracle
(reference semantics: game.rs:339-383 legality via make/check/unmake).
"""

import numpy as np

from keisei_tpu.engine import tables as T
from keisei_tpu.engine.sfen import parse_sfen
from tests.test_jax_engine import jax_mask_for, oracle_mask_for


def slide_slot(from_sq: int, to_sq: int, promote: bool = False) -> int:
    fr, fc = divmod(from_sq, 9)
    tr, tc = divmod(to_sq, 9)
    dr, dc = tr - fr, tc - fc
    dist = max(abs(dr), abs(dc))
    dir_idx = T.DIRECTIONS.tolist().index([dr // dist, dc // dist])
    return dir_idx * 8 + (dist - 1) + (64 if promote else 0)


def masks_for(sfen: str):
    board, hands, stm = parse_sfen(sfen)
    omask = oracle_mask_for(board, hands, stm)
    jmask, in_check = jax_mask_for(board, hands, stm)
    assert np.array_equal(omask, jmask), f"oracle/device mismatch for {sfen}"
    return jmask.reshape(81, 139), in_check


class TestFilePin:
    SFEN = "k3r4/9/9/9/4S4/9/9/9/4K4 b - 1"

    def test_pinned_silver_moves_only_along_the_ray(self):
        mask, in_check = masks_for(self.SFEN)
        assert not in_check
        silver = 4 * 9 + 4
        legal_slots = np.flatnonzero(mask[silver])
        # only N dist-1 (stays between rook and king) survives the pin
        assert legal_slots.tolist() == [slide_slot(silver, 3 * 9 + 4)]

    def test_pinned_knight_has_no_moves(self):
        mask, _ = masks_for("k3r4/9/9/9/4N4/9/9/9/4K4 b - 1")
        knight = 4 * 9 + 4
        assert mask[knight].sum() == 0  # a knight can never stay on a ray

    def test_xray_two_blockers_means_no_pin(self):
        mask, _ = masks_for("k3r4/9/9/9/4S4/9/4P4/9/4K4 b - 1")
        silver = 4 * 9 + 4
        # silver moves freely: N, NE, NW, SE, SW (no promotions out of zone)
        assert mask[silver].sum() == 5


class TestDiagonalPin:
    SFEN = "k8/9/9/9/8b/9/6G2/9/4K4 b - 1"

    def test_pinned_gold_can_step_toward_the_bishop_only(self):
        mask, in_check = masks_for(self.SFEN)
        assert not in_check
        gold = 6 * 9 + 6
        legal = np.flatnonzero(mask[gold])
        # NE dist-1 stays on the bishop->king ray; everything else exposes
        assert legal.tolist() == [slide_slot(gold, 5 * 9 + 7)]


class TestDoubleCheck:
    SFEN = "k3r4/9/9/9/8b/9/9/9/4K4 b G 1"

    def test_only_king_moves_despite_gold_in_hand(self):
        mask, in_check = masks_for(self.SFEN)
        assert in_check
        king = 8 * 9 + 4
        src_of = np.flatnonzero(mask.reshape(-1)) // 139
        assert len(src_of) > 0
        assert set(src_of.tolist()) == {king}
        # no drop slots anywhere: blocking cannot parry a double check
        assert mask[:, 132:].sum() == 0


class TestSingleCheckEvasion:
    SFEN = "k3r4/9/9/9/9/9/9/9/4K4 b P 1"

    def test_block_by_pawn_drop_on_every_interposing_square(self):
        mask, in_check = masks_for(self.SFEN)
        assert in_check
        drop_squares = np.flatnonzero(mask[:, 132])  # pawn drop slot
        # any square on the rook->king file (rows 1-7, col 4) blocks
        assert sorted(drop_squares.tolist()) == [r * 9 + 4 for r in range(1, 8)]
        # no other hand piece: other drop slots empty
        assert mask[:, 133:].sum() == 0

    def test_king_steps_off_the_checked_file(self):
        mask, _ = masks_for(self.SFEN)
        king = 8 * 9 + 4
        legal = set(np.flatnonzero(mask[king]).tolist())
        expect = {
            slide_slot(king, 7 * 9 + 3),  # 6h
            slide_slot(king, 7 * 9 + 5),  # 4h
            slide_slot(king, 8 * 9 + 3),  # 6i
            slide_slot(king, 8 * 9 + 5),  # 4i
        }
        assert legal == expect  # staying on col 4 remains check

    def test_total_legal_action_count(self):
        mask, _ = masks_for(self.SFEN)
        assert mask.sum() == 7 + 4  # 7 blocking drops + 4 king steps


class TestCaptureTheChecker:
    def test_adjacent_checker_capturable_by_king_and_defender(self):
        # white rook gives check from 5h (adjacent); black gold at 4h can
        # capture it, king can capture or sidestep
        mask, in_check = masks_for("k8/9/9/9/9/9/9/4rG3/4K4 b - 1")
        assert in_check
        king, gold, rook = 8 * 9 + 4, 7 * 9 + 5, 7 * 9 + 4
        gold_legal = np.flatnonzero(mask[gold])
        assert gold_legal.tolist() == [slide_slot(gold, rook)]
        king_legal = set(np.flatnonzero(mask[king]).tolist())
        assert slide_slot(king, rook) in king_legal

    def test_protected_checker_not_capturable_by_king(self):
        # the checking rook is defended by a lance behind it: the king may
        # not capture (lance recaptures), but the gold still can
        mask, in_check = masks_for("k8/9/9/4l4/9/9/9/4rG3/4K4 b - 1")
        assert in_check
        king, gold, rook = 8 * 9 + 4, 7 * 9 + 5, 7 * 9 + 4
        assert slide_slot(king, rook) not in np.flatnonzero(mask[king]).tolist()
        assert slide_slot(gold, rook) in np.flatnonzero(mask[gold]).tolist()
