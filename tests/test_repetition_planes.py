"""KataGo extra observation channels driven end-to-end: repetition planes
(ch44-47) fire progressively through a real rook-shuffle repetition, and the
check plane (ch48) fires in a real check.

Reference spec: katago_observation.rs:55-84 — planes mark 1x/2x/3x/4+ PRIOR
repeats of the current position; ch48 is the side-to-move-in-check flag.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.engine import core as C
from keisei_tpu.engine import tables as T
from keisei_tpu.engine import types as TY
from keisei_tpu.engine.sfen import parse_sfen

MAX_PLY = 64


def slide_action(from_p: int, to_p: int) -> int:
    fr, fc = divmod(from_p, 9)
    tr, tc = divmod(to_p, 9)
    dr, dc = tr - fr, tc - fc
    dist = max(abs(dr), abs(dc))
    dir_idx = T.DIRECTIONS.tolist().index([dr // dist, dc // dist])
    return from_p * 139 + dir_idx * 8 + (dist - 1)


@pytest.fixture(scope="module")
def stepper():
    reset_state = C.init_state(MAX_PLY)
    reset_obs, reset_mask, _ = C.initial_outputs(reset_state, 50)
    fn = jax.jit(
        lambda s, a: C.env_step(s, a, reset_state, reset_obs, reset_mask, 50)
    )
    return reset_state, fn


class TestRepetitionPlanes:
    def test_rook_shuffle_progression_to_sennichite(self, stepper):
        state, step = stepper
        # black rook 8h->7h and back; white mirrors (same perspective-space
        # action id thanks to the 180-degree flip)
        rook_p = 7 * 9 + 7
        out_a = slide_action(rook_p, 7 * 9 + 6)
        back_a = slide_action(7 * 9 + 6, rook_p)
        seen_planes = []
        done = False
        for cycle in range(3):
            for a in (out_a, out_a, back_a, back_a):
                state, out = step(state, jnp.int32(a))
                done = bool(out.terminated)
                if done:
                    break
            if done:
                break
            obs = np.asarray(out.obs)
            # after each full cycle the position is startpos again with
            # black to move; prior-repeat planes are uniform over the board
            planes = [float(obs[44 + i].mean()) for i in range(4)]
            assert set(planes) <= {0.0, 1.0}
            seen_planes.append(planes.index(1.0) if 1.0 in planes else None)
        # cycle 1 -> 1 prior repeat (ch44), cycle 2 -> 2 priors (ch45);
        # the 4th occurrence terminates the game as sennichite
        assert seen_planes == [0, 1]
        assert done
        assert int(out.term_reason) == TY.REPETITION
        assert float(out.reward) == 0.0  # plain repetition is a draw

    def test_startpos_has_no_repetition_planes(self, stepper):
        state, step = stepper
        _, out = step(state, jnp.int32(slide_action(6 * 9 + 2, 5 * 9 + 2)))
        obs = np.asarray(out.obs)
        assert np.all(obs[44:48] == 0.0)


class TestCheckPlane:
    def test_check_fires_ch48(self):
        # black king on 5i in check from the white rook on 5a
        board, hands, stm = parse_sfen("k3r4/9/9/9/9/9/9/9/4K4 b - 1")
        pboard = C.perspective_board(jnp.asarray(board, jnp.int8), jnp.int8(stm))
        _, in_check, _ = C.legal_mask_pspace(pboard, jnp.asarray(hands[stm], jnp.int8))
        obs = C.observe(pboard, jnp.asarray(hands, jnp.int8), jnp.int8(stm),
                        jnp.int32(0), MAX_PLY, jnp.int32(1), in_check, 50)
        obs = np.asarray(obs)
        assert np.all(obs[48] == 1.0)
        assert np.all(obs[49] == 0.0)  # reserved stays zero

    def test_no_check_ch48_zero(self):
        board, hands, stm = parse_sfen("k8/9/9/9/9/9/9/9/4K4 b - 1")
        pboard = C.perspective_board(jnp.asarray(board, jnp.int8), jnp.int8(stm))
        _, in_check, _ = C.legal_mask_pspace(pboard, jnp.asarray(hands[stm], jnp.int8))
        obs = C.observe(pboard, jnp.asarray(hands, jnp.int8), jnp.int8(stm),
                        jnp.int32(0), MAX_PLY, jnp.int32(1), in_check, 50)
        assert np.all(np.asarray(obs)[48] == 0.0)
