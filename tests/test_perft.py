"""Perft: exhaustive legal-move tree counts through the JAX engine.

Published startpos perft values (standard shogi perft, both promotion
options counted, no repetition/termination rules):
  depth 1..5 = 30 / 900 / 25,470 / 719,731 / 19,861,490

The tree expands BATCHED: every level's positions advance through one
vmapped apply, every level's counts come from one vmapped (chunked)
legality mask — the same kernels the training path uses, so these counts
pin the production movegen exhaustively to depth 4 (depth 5 is `slow`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keisei_tpu.engine import core as C

PERFT = {1: 30, 2: 900, 3: 25_470, 4: 719_731, 5: 19_861_490}
CHUNK = 4096


@pytest.fixture(scope="module")
def kernels():
    @jax.jit
    def masks_of(boards, hands, stms):
        def one(board, hands_, stm):
            pb = C.perspective_board(board, stm)
            m, _, _ = C.legal_mask_pspace(pb, hands_[stm.astype(jnp.int32)])
            return m.reshape(-1)

        return jax.vmap(one)(boards, hands, stms)

    @jax.jit
    def apply_batch(boards, hands, stms, actions):
        def one(board, hands_, stm, a):
            st = C.init_state(4)
            st = jax.tree.map(jnp.asarray, st).replace(
                board=board, hands=hands_, stm=stm
            )
            s1 = C.apply_action(st, a)
            return s1.board, s1.hands, s1.stm

        return jax.vmap(one)(boards, hands, stms, actions)

    return masks_of, apply_batch


def _chunked_masks(masks_of, boards, hands, stms):
    outs = []
    for i in range(0, len(boards), CHUNK):
        outs.append(np.asarray(masks_of(
            jnp.asarray(boards[i : i + CHUNK]),
            jnp.asarray(hands[i : i + CHUNK]),
            jnp.asarray(stms[i : i + CHUNK]),
        )))
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def perft(kernels, depth: int) -> int:
    masks_of, apply_batch = kernels
    st = C.init_state(4)
    boards = np.asarray(st.board)[None]
    hands = np.asarray(st.hands)[None]
    stms = np.array([0], np.int8)

    for _ in range(depth - 1):
        masks = _chunked_masks(masks_of, boards, hands, stms)
        parents, actions = np.nonzero(masks)
        new_b, new_h, new_s = [], [], []
        for i in range(0, len(parents), CHUNK):
            p = parents[i : i + CHUNK]
            a = actions[i : i + CHUNK]
            b, h, s = apply_batch(
                jnp.asarray(boards[p]), jnp.asarray(hands[p]),
                jnp.asarray(stms[p]), jnp.asarray(a, jnp.int32),
            )
            new_b.append(np.asarray(b))
            new_h.append(np.asarray(h))
            new_s.append(np.asarray(s))
        boards = np.concatenate(new_b)
        hands = np.concatenate(new_h)
        stms = np.concatenate(new_s)

    masks = _chunked_masks(masks_of, boards, hands, stms)
    return int(masks.sum())


class TestPerft:
    @pytest.mark.parametrize("depth", [1, 2, 3])
    def test_shallow(self, kernels, depth):
        assert perft(kernels, depth) == PERFT[depth]

    @pytest.mark.integration
    def test_depth4(self, kernels):
        assert perft(kernels, 4) == PERFT[4]

    @pytest.mark.slow
    def test_depth5(self, kernels):
        assert perft(kernels, 5) == PERFT[5]
