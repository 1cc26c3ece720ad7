"""SpectatorEnv: single-game environment for display, analysis, showcase.

Capability parity with the reference SpectatorEnv (shogi-gym/src/
spectator.rs:47-264): rich dict state, `from_sfen` seeding, NO auto-reset
(the game stays ended until `reset()`), `legal_actions()` /
`legal_moves_with_usi()`, 46-channel observations, and Hodges move history
with full disambiguation. Not a hot path — one jitted step program shared
by all instances.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import core as C
from ..engine import types as TY
from ..engine.sfen import parse_sfen, parse_sfen_move_number, to_sfen
from ..engine.zobrist import compute_hash
from .spectator_data import build_spectator_dict, move_notation, move_usi
from .vec_env import FLAT_TO_SPATIAL, SPATIAL_TO_FLAT


@lru_cache(maxsize=8)
def _programs(max_ply: int):
    """Jitted (step, inspect) programs for a given max_ply."""

    @jax.jit
    def step(state, action):
        last_mover = state.stm
        s1 = C.apply_action(state, action)
        pboard = C.perspective_board(s1.board, s1.stm)
        own_hand = s1.hands[s1.stm.astype(jnp.int32)]
        mask, in_check, _ = C.legal_mask_pspace(pboard, own_hand)
        mask_flat = mask.reshape(-1)
        reason, winner, rep_count = C.position_status(s1, mask_flat, max_ply)
        s1 = s1.replace(in_check=in_check, reason=reason, winner=winner)
        reward = jnp.where(
            winner >= 0, jnp.where(winner == last_mover, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        # observation from the mask this program already computed — a
        # separate inspect() call would run the legality kernel twice
        obs = C.observe(pboard, s1.hands, s1.stm, s1.ply, max_ply,
                        rep_count, in_check, 46)
        return s1, mask_flat, reward, obs

    @jax.jit
    def inspect(state):
        pboard = C.perspective_board(state.board, state.stm)
        own_hand = state.hands[state.stm.astype(jnp.int32)]
        mask, in_check, _ = C.legal_mask_pspace(pboard, own_hand)
        rep_count, _ = C.repetition_info(state)
        obs = C.observe(pboard, state.hands, state.stm, state.ply, max_ply,
                        rep_count, in_check, 46)
        # termination status of the CURRENT position: needed when a game
        # is seeded from an SFEN that is already decided (checkmate /
        # stalemate / impasse) — is_over() must not report in_progress
        reason, winner, _ = C.position_status(state, mask.reshape(-1), max_ply)
        return mask.reshape(-1), in_check, obs, reason, winner

    return step, inspect


class SpectatorEnv:
    def __init__(self, max_ply: int = 500, action_mode: str = "default"):
        if action_mode not in ("default", "spatial"):
            raise ValueError(f"unknown action_mode {action_mode!r}")
        self.max_ply = max_ply
        self.action_mode = action_mode
        self._step, self._inspect = _programs(max_ply)
        self.move_history: list[tuple[int, str]] = []
        self._state = C.init_state(max_ply)
        self._state = jax.tree.map(jnp.asarray, self._state)
        self._refresh()

    @classmethod
    def from_sfen(cls, sfen: str, max_ply: int | None = None,
                  action_mode: str = "default") -> "SpectatorEnv":
        env = cls(max_ply or 500, action_mode)
        board, hands, stm = parse_sfen(sfen)  # raises on invalid SFEN
        # honor the optional move-number field: ply feeds the observation's
        # progress plane and the max_ply truncation — leaving it at 0 would
        # grant a move-120 position 120 extra plies and lie to the model
        # (the reference ignores the field, sfen.rs:186; deliberate fix)
        move_no = parse_sfen_move_number(sfen)
        ply = (move_no - 1) if move_no else 0
        state = C.init_state(env.max_ply)
        h = compute_hash(board, hands, stm)
        env._state = jax.tree.map(jnp.asarray, state).replace(
            board=jnp.asarray(board), hands=jnp.asarray(hands),
            stm=jnp.int8(stm), hash_=jnp.asarray(h),
            ply=jnp.int32(ply),
        )
        env.move_history = []
        env._refresh()
        return env

    # -- internals -----------------------------------------------------------

    def _refresh(self):
        mask, in_check, obs, reason, winner = self._inspect(self._state)
        self._mask = np.asarray(mask)
        self._obs = np.asarray(obs)
        self._state = self._state.replace(
            in_check=jnp.asarray(in_check), reason=jnp.asarray(reason),
            winner=jnp.asarray(winner),
        )

    def _spatial(self, action: int) -> int:
        if self.action_mode == "spatial":
            return int(action)
        sp = int(FLAT_TO_SPATIAL[int(action)])
        if sp < 0:
            raise ValueError(f"flat action {action} has no board geometry")
        return sp

    # -- public surface -------------------------------------------------------

    @property
    def action_space_size(self) -> int:
        return TY.ACTION_SPACE if self.action_mode == "spatial" else TY.FLAT_ACTION_SPACE

    def reset(self) -> dict:
        self._state = jax.tree.map(jnp.asarray, C.init_state(self.max_ply))
        self.move_history = []
        self._refresh()
        return self.to_dict()

    def step(self, action: int) -> dict:
        """Apply one action; returns the state dict plus reward/terminated.
        Raises on illegal actions and on moves after game end."""
        if self.is_over():
            raise ValueError("game is over — call reset()")
        spatial = self._spatial(action)
        if not (0 <= spatial < TY.ACTION_SPACE) or not self._mask[spatial]:
            raise ValueError(f"action {action} is illegal in this position")

        board = np.asarray(self._state.board)
        stm = int(self._state.stm)
        notation = move_notation(spatial, board, stm, legal_mask=self._mask)
        self.move_history.append((int(action), notation))

        self._state, mask, reward, obs = self._step(
            self._state, jnp.int32(spatial))
        self._mask = np.asarray(mask)
        self._obs = np.asarray(obs)
        d = self.to_dict()
        d["reward"] = float(reward)
        d["terminated"] = self.is_over()
        return d

    def to_dict(self) -> dict:
        return build_spectator_dict(
            np.asarray(self._state.board), np.asarray(self._state.hands),
            int(self._state.stm), int(self._state.ply),
            int(self._state.reason), int(self._state.winner),
            bool(self._state.in_check),
            move_history=[n for _, n in self.move_history],
        )

    def to_sfen(self) -> str:
        return to_sfen(
            np.asarray(self._state.board), np.asarray(self._state.hands),
            int(self._state.stm),
        )

    def get_observation(self) -> np.ndarray:
        """(46, 9, 9) float32 observation (observation.rs layout)."""
        return self._obs.reshape(46, 9, 9)

    def legal_actions(self) -> list[int]:
        if self.is_over():
            return []
        idx = np.flatnonzero(self._mask)
        if self.action_mode == "spatial":
            return [int(i) for i in idx]
        flat = SPATIAL_TO_FLAT[idx]
        return [int(f) for f in flat if f < TY.FLAT_ACTION_SPACE]

    def legal_moves_with_usi(self) -> list[tuple[int, str]]:
        if self.is_over():
            return []
        stm = int(self._state.stm)
        out = []
        for sp in np.flatnonzero(self._mask):
            a = int(sp) if self.action_mode == "spatial" else int(SPATIAL_TO_FLAT[sp])
            out.append((a, move_usi(int(sp), stm)))
        return out

    def is_over(self) -> bool:
        return int(self._state.reason) != TY.NOT_TERMINATED

    def current_player(self) -> str:
        return "black" if int(self._state.stm) == 0 else "white"

    @property
    def ply(self) -> int:
        return int(self._state.ply)
