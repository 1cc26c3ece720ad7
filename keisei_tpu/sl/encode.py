"""The REAL position encoder: batched game replay on the TPU engine.

The reference shipped SL encoding as an all-zeros placeholder because it
required Rust replay per position (keisei/sl/prepare.py:110-116). Here the
JAX engine makes the real thing cheap AND batched: G games replay in
lockstep — one vmapped `apply_action` + observation + legality program per
ply, over all games at once — producing exactly the (obs, policy, legality)
tensors the shards need at tens of thousands of positions/second.

USI -> spatial action conversion is pure geometry (the spatial action space
is perspective-relative): knight jumps are not expressible as dir x dist so
the slot family is unambiguous without board state.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import core as C
from ..engine import types as TY
from .parsers import GameOutcome, GameRecord

logger = logging.getLogger(__name__)

_DIR_INDEX = {tuple(d): i for i, d in enumerate(TY.DIRECTIONS.tolist())}
_PIECE_OF_CHAR = {"P": 0, "L": 1, "N": 2, "S": 3, "G": 4, "B": 5, "R": 6}


def usi_square(token: str) -> int:
    """'7g' -> absolute square index (row-major, row 0 = rank a)."""
    file, rank = int(token[0]), ord(token[1]) - ord("a")
    return rank * 9 + (9 - file)


def usi_to_action(usi: str, stm: int) -> int:
    """USI move -> spatial action id for the side to move.

    Raises ValueError for malformed/ungeometric moves.
    """
    if "*" in usi:
        piece = _PIECE_OF_CHAR[usi[0].upper()]
        to_abs = usi_square(usi[2:4])
        sq = 80 - to_abs if stm == 1 else to_abs
        return sq * 139 + 132 + piece
    frm_abs, to_abs = usi_square(usi[0:2]), usi_square(usi[2:4])
    promote = usi.endswith("+")
    if stm == 1:
        frm, to = 80 - frm_abs, 80 - to_abs
    else:
        frm, to = frm_abs, to_abs
    dr, dc = to // 9 - frm // 9, to % 9 - frm % 9
    if (dr, dc) == (-2, -1):
        return frm * 139 + 128 + (1 if promote else 0)
    if (dr, dc) == (-2, 1):
        return frm * 139 + 130 + (1 if promote else 0)
    dist = max(abs(dr), abs(dc))
    if dist == 0:
        raise ValueError(f"null move {usi!r}")
    step = (dr // dist, dc // dist)
    if step not in _DIR_INDEX or (dr, dc) != (step[0] * dist, step[1] * dist):
        raise ValueError(f"ungeometric move {usi!r}")
    slot = _DIR_INDEX[step] * 8 + (dist - 1) + (64 if promote else 0)
    return frm * 139 + slot


def _value_cat(outcome: GameOutcome, black_to_move: bool) -> int:
    if outcome == GameOutcome.WIN_BLACK:
        return 0 if black_to_move else 2
    if outcome == GameOutcome.WIN_WHITE:
        return 2 if black_to_move else 0
    return 1


@partial(jax.jit, static_argnames=("num_channels", "max_ply"))
def _replay_program(actions, lengths, boards, hands, stms, hashes,
                    num_channels: int, max_ply: int):
    """(G, L) actions -> per-ply observations, legality of played move,
    material balance. Games shorter than L idle on a frozen state.
    boards/hands/stms/hashes seed each game's start position (custom-SFEN
    games replay from their real position, not startpos)."""
    G, L = actions.shape
    state0 = C.init_state(max_ply)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (G,) + np.shape(x)), state0
    )
    states = states.replace(board=boards, hands=hands, stm=stms, hash_=hashes)

    def observe_one(st):
        pboard = C.perspective_board(st.board, st.stm)
        own_hand = st.hands[st.stm.astype(jnp.int32)]
        mask, in_check, _ = C.legal_mask_pspace(pboard, own_hand)
        rep, _ = C.repetition_info(st)
        obs = C.observe(pboard, st.hands, st.stm, st.ply, max_ply, rep,
                        in_check, num_channels)
        mat = C.material_balance(st.board, st.hands, st.stm)
        return obs, mask.reshape(-1), mat

    def step(states, xs):
        a, t = xs
        obs, mask, mat = jax.vmap(observe_one)(states)
        legal = jnp.take_along_axis(mask, a[:, None].astype(jnp.int32), axis=1)[:, 0]
        active = t < lengths
        applied = jax.vmap(C.apply_action)(states, a.astype(jnp.int32))
        states = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(active, (G,) + (1,) * (old.ndim - 1)), new, old
            ) if old.ndim > 0 else jnp.where(active, new, old),
            applied, states,
        )
        return states, (obs, legal & active, mat)

    ts = jnp.arange(L)
    _, (obs, legal, mat) = jax.lax.scan(step, states, (actions.T, ts))
    # (L, G, ...) outputs
    return obs, legal, mat


class GameEncoder:
    """Batched encoder: records -> (obs, policy, value, score) arrays."""

    def __init__(self, num_channels: int = 50, max_ply: int = 512,
                 batch_games: int = 64):
        self.num_channels = num_channels
        self.max_ply = max_ply
        self.batch_games = batch_games

    def encode_games(self, records: list[GameRecord]):
        """Returns (observations (P, C*81) f32, policy (P,) i64,
        value (P,) i64, score (P,) f32, stats dict). Positions whose played
        move fails the engine's legality mask are dropped (data hygiene)."""
        all_obs, all_pol, all_val, all_score = [], [], [], []
        dropped_moves = dropped_games = 0

        from ..engine.sfen import parse_sfen
        from ..engine.zobrist import compute_hash

        st0 = C.init_state(self.max_ply)
        b0, h0 = np.asarray(st0.board), np.asarray(st0.hands)
        hash0 = np.asarray(st0.hash_)

        for start in range(0, len(records), self.batch_games):
            chunk = records[start : start + self.batch_games]
            acts, lens, outcomes, starts = [], [], [], []
            for rec in chunk:
                if getattr(rec, "start_sfen", ""):
                    try:
                        sb, sh, sstm = parse_sfen(rec.start_sfen)
                    except Exception:
                        dropped_games += 1
                        continue
                    start_state = (sb, sh, sstm,
                                   np.asarray(compute_hash(sb, sh, sstm)))
                else:
                    start_state = (b0, h0, 0, hash0)
                stm0 = start_state[2]
                try:
                    ids = [
                        usi_to_action(m.move_usi, (stm0 + i) % 2)
                        for i, m in enumerate(rec.moves[: self.max_ply - 1])
                    ]
                except (ValueError, KeyError, IndexError):
                    dropped_games += 1
                    continue
                acts.append(ids)
                lens.append(len(ids))
                outcomes.append(rec.outcome)
                starts.append(start_state)
            if not acts:
                continue
            # bucket L to multiples of 64 so jit retraces stay bounded
            L = -(-max(lens) // 64) * 64
            G = len(acts)
            a = np.zeros((G, L), dtype=np.int32)
            for g, ids in enumerate(acts):
                a[g, : len(ids)] = ids
            obs, legal, mat = _replay_program(
                jnp.asarray(a), jnp.asarray(np.array(lens, np.int32)),
                jnp.asarray(np.stack([x[0] for x in starts])),
                jnp.asarray(np.stack([x[1] for x in starts])),
                jnp.asarray(np.array([x[2] for x in starts], np.int8)),
                jnp.asarray(np.stack([x[3] for x in starts])),
                self.num_channels, self.max_ply,
            )
            obs = np.asarray(obs)  # (L, G, C, 81)
            legal = np.asarray(legal)
            mat = np.asarray(mat)

            for g in range(G):
                n_ok = 0
                for t in range(lens[g]):
                    if not legal[t, g]:
                        dropped_moves += lens[g] - t
                        break  # replay diverged; drop the tail
                    all_obs.append(obs[t, g].reshape(-1))
                    all_pol.append(a[g, t])
                    all_val.append(
                        _value_cat(outcomes[g], (starts[g][2] + t) % 2 == 0))
                    # REAL score target: material balance from the mover's
                    # perspective (the reference's FIXME, prepare.py:168-173)
                    all_score.append(mat[t, g] / 76.0)
                    n_ok += 1
                if n_ok == 0:
                    dropped_games += 1

        stats = {
            "positions": len(all_pol),
            "dropped_moves": dropped_moves,
            "dropped_games": dropped_games,
        }
        if not all_pol:
            return (np.zeros((0, self.num_channels * 81), np.float32),
                    np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float32), stats)
        return (
            np.stack(all_obs).astype(np.float32),
            np.array(all_pol, np.int64),
            np.array(all_val, np.int64),
            np.array(all_score, np.float32),
            stats,
        )
