"""JAX engine vs oracle: move-for-move equivalence + unit behavior.

This is the core correctness gate for the device-side rules engine: the
vectorized (81, 139) legality tensor, incremental hashes, termination
reasons, observations, and rewards must match the scalar oracle exactly.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.engine import core as C
from keisei_tpu.engine import types as TY
from keisei_tpu.engine.oracle import OracleGame
from keisei_tpu.engine.sfen import parse_sfen

MAX_PLY = 64


@pytest.fixture(scope="module")
def stepper():
    reset_state = C.init_state(MAX_PLY)
    reset_obs, reset_mask, _ = C.initial_outputs(reset_state, 46)
    fn = jax.jit(
        lambda s, a: C.env_step(s, a, reset_state, reset_obs, reset_mask, 46)
    )
    return reset_state, np.asarray(reset_mask), fn


def oracle_mask_for(board, hands, stm):
    g = OracleGame(board=board.copy(), hands=hands.copy(), stm=stm, max_ply=MAX_PLY)
    return g.legal_mask()


def jax_mask_for(board, hands, stm):
    pboard = C.perspective_board(jnp.asarray(board, jnp.int8), jnp.int8(stm))
    mask, in_check, _ = C.legal_mask_pspace(pboard, jnp.asarray(hands[stm], jnp.int8))
    return np.asarray(mask).reshape(-1), bool(in_check)


class TestMaskEquivalence:
    def test_startpos_mask(self, stepper):
        _, reset_mask, _ = stepper
        g = OracleGame(max_ply=MAX_PLY)
        assert np.array_equal(g.legal_mask(), reset_mask)
        assert reset_mask.sum() == 30

    @pytest.mark.parametrize("seed", range(4))
    def test_random_playout_equivalence(self, stepper, seed):
        reset_state, reset_mask, step_fn = stepper
        rng = np.random.default_rng(seed)
        g = OracleGame(max_ply=MAX_PLY)
        state = reset_state
        mask = reset_mask
        for t in range(MAX_PLY):
            omask = g.legal_mask()
            assert np.array_equal(omask, mask), f"mask mismatch ply {t}"
            a = int(rng.choice(np.nonzero(omask)[0]))
            g.make_move(g.decode_action(a))
            g.check_termination()
            state, out = step_fn(state, jnp.int32(a))
            done = bool(out.terminated) or bool(out.truncated)
            assert g.is_terminal() == done
            if done:
                assert g.reason == int(out.term_reason)
                break
            assert np.array_equal(np.asarray(state.hash_), g.hash_)
            mask = np.asarray(out.legal_mask)

    def test_tactical_positions(self):
        """Hand-picked positions with checks, pins, and drops in hand."""
        fixtures = [
            # mid-game-ish with hands
            "lnsgk1snl/1r4g2/p1pppp1pp/6p2/9/2P6/PP1PPPPPP/2G4R1/LNS1KGSNL b Bb 1",
            # check from a rook on the file
            "4k4/9/9/9/9/9/9/9/4R3K w - 1",
            # promoted pieces on board
            "ln1g5/1ks+R5/1p4+B2/p1p6/9/9/PPPPPPPPP/9/LNSGKGSNL w Sgp 1",
        ]
        for sfen in fixtures:
            board, hands, stm = parse_sfen(sfen)
            omask = oracle_mask_for(board, hands, stm)
            jmask, _ = jax_mask_for(board, hands, stm)
            assert np.array_equal(omask, jmask), f"mismatch for {sfen}"


class TestStepSemantics:
    def test_reward_on_checkmate(self, stepper):
        """Drive a fools-mate-like sequence and verify the winner reward."""
        reset_state, reset_mask, step_fn = stepper
        g = OracleGame(max_ply=MAX_PLY)
        state = reset_state
        rng = np.random.default_rng(7)
        # play random until a game terminates with checkmate or run out
        for _ in range(3000):
            omask = g.legal_mask()
            a = int(rng.choice(np.nonzero(omask)[0]))
            last_mover = g.stm
            g.make_move(g.decode_action(a))
            g.check_termination()
            state, out = step_fn(state, jnp.int32(a))
            if bool(out.terminated):
                assert g.is_terminal()
                if g.reason == TY.CHECKMATE:
                    expected = 1.0 if g.winner == last_mover else -1.0
                    assert float(out.reward) == expected
                return
            if g.is_terminal():  # truncation path
                return

    def test_auto_reset_restores_startpos(self, stepper):
        reset_state, reset_mask, step_fn = stepper
        # Fabricate a state at max_ply - 1 so any move truncates.
        state = reset_state.replace(ply=jnp.int32(MAX_PLY - 1))
        legal = np.nonzero(reset_mask)[0]
        state2, out = step_fn(state, jnp.int32(int(legal[0])))
        assert bool(out.truncated)
        assert int(out.term_reason) == TY.MAX_MOVES
        assert int(state2.ply) == 0
        assert np.array_equal(np.asarray(state2.board), np.asarray(reset_state.board))
        assert np.array_equal(np.asarray(out.legal_mask), reset_mask)

    def test_capture_metadata(self, stepper):
        reset_state, reset_mask, step_fn = stepper
        g = OracleGame(max_ply=MAX_PLY)
        state = reset_state
        rng = np.random.default_rng(3)
        saw_capture = False
        for _ in range(MAX_PLY - 1):
            omask = g.legal_mask()
            a = int(rng.choice(np.nonzero(omask)[0]))
            mv = g.decode_action(a)
            expect = 255
            if mv[0] == "b" and g.board[mv[2]] >= 0:
                ck = int(g.board[mv[2]]) % 16
                expect = ck - 8 if ck >= 8 else ck
                saw_capture = True
            g.make_move(mv)
            g.check_termination()
            state, out = step_fn(state, jnp.int32(a))
            assert int(out.captured) == expect
            if g.is_terminal():
                break
        assert saw_capture

    def test_material_metadata_matches_oracle(self, stepper):
        reset_state, reset_mask, step_fn = stepper
        g = OracleGame(max_ply=MAX_PLY)
        state = reset_state
        rng = np.random.default_rng(11)
        for _ in range(30):
            omask = g.legal_mask()
            a = int(rng.choice(np.nonzero(omask)[0]))
            last_mover = g.stm
            g.make_move(g.decode_action(a))
            g.check_termination()
            state, out = step_fn(state, jnp.int32(a))
            assert int(out.material) == g.material_balance(last_mover)
            if g.is_terminal():
                break


class TestObservation:
    def test_startpos_obs_46(self):
        state = C.init_state(MAX_PLY)
        obs, mask, in_check = C.initial_outputs(state, 46)
        obs = np.asarray(obs)
        assert obs.shape == (46, 81)
        # own pawns on perspective row 6
        pawn_plane = obs[0].reshape(9, 9)
        assert pawn_plane[6].sum() == 9
        # opponent pawns on row 2 of the opponent-pawn channel (14)
        assert obs[14].reshape(9, 9)[2].sum() == 9
        # kings
        assert obs[7].reshape(9, 9)[8, 4] == 1
        assert obs[21].reshape(9, 9)[0, 4] == 1
        # player indicator: Black to move -> 1.0
        assert np.all(obs[42] == 1.0)
        # hands empty
        assert np.all(obs[28:42] == 0.0)
        assert np.all(obs[43] == 0.0)

    def test_white_perspective_flips(self):
        state = jax.tree.map(jnp.asarray, C.init_state(MAX_PLY))
        # after one black move, White observes a flipped board
        reset_obs, reset_mask, _ = C.initial_outputs(state, 46)
        a = int(np.nonzero(np.asarray(reset_mask))[0][0])
        s1 = C.apply_action(state, jnp.int32(a))
        obs, _, _ = C.initial_outputs(s1, 46)
        obs = np.asarray(obs)
        # White's own king appears at perspective (8, 4)
        assert obs[7].reshape(9, 9)[8, 4] == 1
        # player indicator: White -> 0.0
        assert np.all(obs[42] == 0.0)

    def test_katago_50_channels(self):
        state = C.init_state(MAX_PLY)
        obs, _, _ = C.initial_outputs(state, 50)
        obs = np.asarray(obs)
        assert obs.shape == (50, 81)
        assert np.all(obs[44:] == 0.0)  # no reps, no check, reserved
