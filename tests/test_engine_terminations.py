"""Drive the JAX engine (env_step itself) into every termination reason.

VERDICT r1 item 6: sennichite, perpetual check (winner = victim), impasse,
and uchi-fu-zume were unit-tested on the oracle only. These tests script
the exact rule-triggering sequences through the DEVICE path — specs:
rules.rs:228-397, game.rs:460-499.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.engine import core as C
from keisei_tpu.engine import types as TY
from keisei_tpu.engine.sfen import parse_sfen
from keisei_tpu.engine.zobrist import compute_hash
from keisei_tpu.sl.encode import usi_to_action

MAX_PLY = 64


def make_stepper(num_channels=46):
    reset_state = C.init_state(MAX_PLY)
    reset_obs, reset_mask, _ = C.initial_outputs(reset_state, num_channels)
    fn = jax.jit(
        lambda s, a: C.env_step(
            s, a, reset_state, np.asarray(reset_obs), np.asarray(reset_mask),
            num_channels,
        )
    )
    return reset_state, np.asarray(reset_mask), fn


def state_from_sfen(sfen: str):
    board, hands, stm = parse_sfen(sfen)
    st = C.init_state(MAX_PLY)
    h = compute_hash(board, hands, stm)
    return jax.tree.map(jnp.asarray, st).replace(
        board=jnp.asarray(board), hands=jnp.asarray(hands),
        stm=jnp.int8(stm), hash_=jnp.asarray(h),
    )


def play_usi(step_fn, state, moves):
    """Apply USI moves through env_step; returns (state, last StepOutput)."""
    out = None
    for i, usi in enumerate(moves):
        stm = int(state.stm)
        action = usi_to_action(usi, stm)
        # the move must be legal per the device mask
        pboard = C.perspective_board(state.board, state.stm)
        mask, _, _ = C.legal_mask_pspace(
            pboard, state.hands[state.stm.astype(jnp.int32)]
        )
        assert bool(np.asarray(mask).reshape(-1)[action]), f"illegal {usi} at {i}"
        state, out = step_fn(state, jnp.int32(action))
    return state, out


class TestSennichite:
    def test_fourfold_repetition_is_draw(self):
        reset_state, _, step_fn = make_stepper()
        state = jax.tree.map(jnp.asarray, reset_state)
        cycle = ["5i5h", "5a5b", "5h5i", "5b5a"]  # kings shuffle
        state, out = play_usi(step_fn, state, cycle * 2 + cycle[:3])
        assert int(out.term_reason) == TY.NOT_TERMINATED
        # 12th move recreates startpos the 4th time
        state, out = play_usi(step_fn, state, [cycle[3]])
        assert int(out.term_reason) == TY.REPETITION
        assert bool(out.terminated)
        assert float(out.reward) == 0.0  # draw


class TestPerpetualCheck:
    def test_checker_loses_victim_wins(self):
        # lone kings + black rook delivering an endless side-to-side check.
        # The rook starts OFF the cycle (3e) so the checking position is
        # the first to reach 4 occurrences (plies 1, 5, 9, 13).
        sfen = "4k4/9/9/9/6R2/9/9/9/4K4 b - 1"
        reset_state, _, step_fn = make_stepper()
        state = state_from_sfen(sfen)
        cycle = ["5a4a", "5e4e", "4a5a", "4e5e"]
        state, out = play_usi(step_fn, state, ["3e5e"] + cycle * 2 + cycle[:3])
        assert int(out.term_reason) == TY.NOT_TERMINATED
        state, out = play_usi(step_fn, state, [cycle[3]])
        assert int(out.term_reason) == TY.PERPETUAL_CHECK
        assert bool(out.terminated)
        # winner = the VICTIM (white, side to move) -> last mover (black,
        # the checker) receives -1 (rules.rs:228-274)
        assert float(out.reward) == -1.0

    def test_non_check_repetition_stays_plain_sennichite(self):
        sfen = "4k4/9/9/9/5R3/9/9/9/4K4 b - 1"
        reset_state, _, step_fn = make_stepper()
        state = state_from_sfen(sfen)
        # rook shuffles AWAY from the king file: no checks anywhere; the
        # start position reaches its 4th occurrence at ply 12
        cycle = ["4e3e", "5a4a", "3e4e", "4a5a"]
        state, out = play_usi(step_fn, state, cycle * 3)
        assert int(out.term_reason) == TY.REPETITION
        assert float(out.reward) == 0.0


class TestImpasse:
    def test_csa24_triggers_after_move(self):
        # both kings deep in enemy camp, 10 pieces each in zone,
        # R+B (5+5) + 7 pawns on board + 7 hand pawns = 24 points each side
        sfen = (
            "K8/RB1PPPP2/3PPP3/9/9/9/3ppp3/rb1pppp2/k8 b 7P7p 1"
        )
        reset_state, _, step_fn = make_stepper()
        state = state_from_sfen(sfen)
        # any quiet black move keeps the conditions; move a zone pawn forward?
        # black pawns move NORTH; pick the king stepping sideways inside camp
        state, out = play_usi(step_fn, state, ["9a8a"])
        assert int(out.term_reason) == TY.IMPASSE
        assert bool(out.terminated)
        assert float(out.reward) == 0.0  # both sides >= 24 points: draw

    def test_one_sided_points_wins(self):
        # black has the points; white is under 24 (no hand pawns, fewer pieces)
        sfen = (
            "K8/RB1PPPP2/3PPP3/9/9/9/4ppp2/1b1pppp2/k8 b 7P 1"
        )
        reset_state, _, step_fn = make_stepper()
        state = state_from_sfen(sfen)
        state, out = play_usi(step_fn, state, ["9a8a"])
        # white lacks 10 pieces in zone -> impasse NOT active
        assert int(out.term_reason) == TY.NOT_TERMINATED


@pytest.mark.integration
class TestLongPlayoutEquivalence:
    """200-ply random playouts, JAX env_step vs the scalar oracle —
    masks, rewards, termination reasons must match move-for-move
    (VERDICT r1: raise from 64 plies x 4 seeds)."""

    LONG_PLY = 200

    @pytest.mark.parametrize("seed", range(4))
    def test_long_playout(self, seed):
        from keisei_tpu.engine.oracle import OracleGame

        reset_state = C.init_state(self.LONG_PLY)
        reset_obs, reset_mask, _ = C.initial_outputs(reset_state, 46)
        step_fn = jax.jit(
            lambda s, a: C.env_step(
                s, a, reset_state, np.asarray(reset_obs),
                np.asarray(reset_mask), 46,
            )
        )
        rng = np.random.default_rng(1000 + seed)
        g = OracleGame(max_ply=self.LONG_PLY)
        state = jax.tree.map(jnp.asarray, reset_state)
        mask = np.asarray(reset_mask)
        for t in range(self.LONG_PLY):
            omask = g.legal_mask()
            assert np.array_equal(omask, mask), f"seed {seed} mask mismatch ply {t}"
            action = int(rng.choice(np.flatnonzero(mask)))
            last_mover = g.stm
            g.make_move(g.decode_action(action))
            g.check_termination()
            state, out = step_fn(state, jnp.int32(action))
            done = bool(out.terminated) or bool(out.truncated)
            assert g.is_terminal() == done, f"seed {seed} terminal ply {t}"
            if done:
                assert g.reason == int(out.term_reason), f"seed {seed} reason"
                o_reward = (0.0 if g.winner < 0
                            else (1.0 if g.winner == last_mover else -1.0))
                assert float(out.reward) == o_reward, f"seed {seed} reward"
                break
            assert np.array_equal(np.asarray(state.hash_), g.hash_)
            mask = np.asarray(out.legal_mask)


class TestUchiFuZume:
    MATE_SFEN = "8k/7G1/6S2/9/9/9/9/9/4K4 b P 1"

    def drop_action(self, row, col):
        return (row * 9 + col) * 139 + 132 + TY.PAWN

    def test_mating_pawn_drop_excluded(self):
        state = state_from_sfen(self.MATE_SFEN)
        pboard = C.perspective_board(state.board, state.stm)
        mask = np.asarray(
            C.legal_mask_pspace(pboard, state.hands[0])[0]
        ).reshape(-1)
        # dropping P at 1b (row1 col8) would checkmate: forbidden
        assert not mask[self.drop_action(1, 8)]
        # a harmless pawn drop far away is allowed
        assert mask[self.drop_action(4, 4)]

    def test_escapable_drop_allowed(self):
        # without the silver, the king can escape by capturing the gold
        sfen = "8k/7G1/9/9/9/9/9/9/4K4 b P 1"
        state = state_from_sfen(sfen)
        pboard = C.perspective_board(state.board, state.stm)
        mask = np.asarray(
            C.legal_mask_pspace(pboard, state.hands[0])[0]
        ).reshape(-1)
        assert mask[self.drop_action(1, 8)]

    def test_checkmate_by_board_move_still_legal(self):
        # the same mate delivered by MOVING a pawn is legal (ufz is
        # drop-specific, movegen.rs:52-64)
        sfen = "8k/7G1/6S2/9/9/9/9/9/4K4 b - 1"
        board, hands, stm = parse_sfen(sfen)
        board[2 * 9 + 8] = TY.PAWN  # black pawn at 1c
        st = C.init_state(MAX_PLY)
        state = jax.tree.map(jnp.asarray, st).replace(
            board=jnp.asarray(board), hands=jnp.asarray(hands), stm=jnp.int8(0),
            hash_=jnp.asarray(compute_hash(board, hands, 0)),
        )
        reset_state, _, step_fn = make_stepper()
        action = usi_to_action("1c1b", 0)
        state, out = step_fn(state, jnp.int32(action))
        assert int(out.term_reason) == TY.CHECKMATE
        assert float(out.reward) == 1.0  # the mover (black) wins


class TestMaterialBalance:
    """Direct device-path fixtures for material_balance, pinned to the
    reference's expectations (rules.rs:957-1056 test suite): startpos zero,
    perspective antisymmetry, hand pieces counted, promoted values used,
    king excluded."""

    def _balance(self, sfen, perspective):
        board, hands, _ = parse_sfen(sfen)
        return int(C.material_balance(
            jnp.asarray(board), jnp.asarray(hands), jnp.int32(perspective)))

    def test_startpos_zero_both_sides(self):
        sfen = "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1"
        assert self._balance(sfen, 0) == 0
        assert self._balance(sfen, 1) == 0

    def test_black_extra_rook_and_negation(self):
        # kings only + black rook: balance = rook value (10); negates for white
        sfen = "4k4/9/9/9/R8/9/9/9/4K4 b - 1"
        assert self._balance(sfen, 0) == int(TY.PIECE_VALUE[TY.ROOK]) == 10
        assert self._balance(sfen, 1) == -10

    def test_hand_pieces_counted(self):
        # gold in black's hand only
        sfen = "4k4/9/9/9/9/9/9/9/4K4 b G 1"
        assert self._balance(sfen, 0) == int(TY.PIECE_VALUE[TY.GOLD]) == 6

    def test_promoted_piece_uses_promoted_value(self):
        # dragon (promoted rook) = 12, not 10
        sfen = "4k4/9/9/9/+R8/9/9/9/4K4 b - 1"
        assert self._balance(sfen, 0) == int(TY.PIECE_VALUE[TY.ROOK + 8]) == 12

    def test_king_excluded(self):
        sfen = "4k4/9/9/9/9/9/9/9/4K4 b - 1"
        assert self._balance(sfen, 0) == 0
        assert self._balance(sfen, 1) == 0


class TestImpasseScoring:
    """Threshold-pinning fixtures for the CSA-24 scorer (rules.rs:286-397
    + its test suite): promoted R/B still count 5, hand pieces count, and
    the >=24 line decides the winner. Each position puts Black at EXACTLY
    24 points, so any scoring error flips the outcome."""

    def _impasse(self, sfen, hands_extra=None):
        board, hands, _ = parse_sfen(sfen)
        if hands_extra:
            for (color, idx, n) in hands_extra:
                hands[color][idx] = n
        return C.impasse_check(jnp.asarray(board), jnp.asarray(hands))

    def test_exact_24_with_promoted_pieces_wins(self):
        # black: K +R +B and 14 pawns in White's camp = 5+5+14 = 24 points,
        # 17 zone pieces; white: k +r and 18 pawns = 23 points, 19 pieces
        sfen = ("K+R+B6/PPPPPPPPP/PPPPP4/9/9/9/"
                "ppppppppp/ppppppppp/k7r b - 1")
        active, winner = self._impasse(sfen)
        assert bool(active)
        assert int(winner) == 0  # black declares at exactly 24; white at 23
        # drop one black pawn (23 points): no side reaches 24 -> inactive
        sfen23 = ("K+R+B6/PPPPPPPPP/PPPP5/9/9/9/"
                  "ppppppppp/ppppppppp/k7r b - 1")
        active, _ = self._impasse(sfen23)
        assert not bool(active)

    def test_hand_pieces_reach_the_threshold(self):
        # 12 board pawns + promoted pair = 22; two pawns IN HAND complete 24
        sfen = ("K+R+B6/PPPPPPPPP/PPP6/9/9/9/"
                "ppppppppp/ppppppppp/k7r b 2P 1")
        active, winner = self._impasse(sfen)
        assert bool(active)
        assert int(winner) == 0
        # with only one hand pawn (23) the declaration fails
        sfen1 = ("K+R+B6/PPPPPPPPP/PPP6/9/9/9/"
                 "ppppppppp/ppppppppp/k7r b P 1")
        active, _ = self._impasse(sfen1)
        assert not bool(active)

    def test_both_kings_must_enter(self):
        # same 24-point black setup but the white king stays at home mid-board
        sfen = ("K+R+B6/PPPPPPPPP/PPPPP4/9/k8/9/"
                "ppppppppp/ppppppppp/8r b - 1")
        active, _ = self._impasse(sfen)
        assert not bool(active)


class TestMovegenFixtures:
    """Device-path pins of the reference's movegen unit fixtures
    (movegen.rs:322-427): forced/optional promotion emission, dead-drop
    filtering, drops only on empty squares."""

    def _mask(self, sfen):
        board, hands, stm = parse_sfen(sfen)
        pboard = C.perspective_board(jnp.asarray(board), jnp.int8(stm))
        m, _, _ = C.legal_mask_pspace(pboard, jnp.asarray(hands)[stm])
        return np.asarray(m)  # (81, 139)

    def test_forced_promotion_single_move(self):
        # black pawn on row 1 (rank b): its only move promotes
        m = self._mask("4k4/4P4/9/9/9/9/9/9/4K4 b - 1")
        pawn_sq = 1 * 9 + 4
        slots = np.nonzero(m[pawn_sq])[0]
        assert list(slots) == [64], slots  # N dist-1, promote variant only

    def test_optional_promotion_two_moves(self):
        # black pawn on row 3 moving INTO the zone: both options emitted
        m = self._mask("4k4/9/9/4P4/9/9/9/9/4K4 b - 1")
        pawn_sq = 3 * 9 + 4
        slots = set(np.nonzero(m[pawn_sq])[0])
        assert slots == {0, 64}, slots  # N dist-1, with and without promote

    def test_dead_drop_rows(self):
        # black with P, L, N, G in hand on an empty-ish board
        m = self._mask("4k4/9/9/9/9/9/9/9/4K4 b PLNG 1")
        drop = lambda sq, piece: m[sq, 132 + piece]  # noqa: E731
        c = 2  # arbitrary empty file (no nifu interference)
        assert not drop(0 * 9 + c, TY.PAWN) and drop(1 * 9 + c, TY.PAWN)
        assert not drop(0 * 9 + c, TY.LANCE) and drop(1 * 9 + c, TY.LANCE)
        assert (not drop(0 * 9 + c, TY.KNIGHT)
                and not drop(1 * 9 + c, TY.KNIGHT)
                and drop(2 * 9 + c, TY.KNIGHT))
        assert drop(0 * 9 + c, TY.GOLD)  # gold is never a dead drop

    def test_drops_only_on_empty_squares(self):
        # startpos + rook in hand: legal drop squares == empty squares
        m = self._mask(
            "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b R 1")
        board, _, _ = parse_sfen(
            "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b R 1")
        empty = board < 0
        drops = m[:, 132 + TY.ROOK]
        assert (drops == empty).all()
