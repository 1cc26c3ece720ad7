"""Reference ("oracle") shogi engine in plain numpy/Python.

This is the framework's regression oracle: a simple, readable, scalar
implementation of the full rules whose behavior is pinned to the reference
engine's semantics (shogi-core: game.rs, rules.rs, movegen.rs) via perft
fixtures and rule unit tests. The vectorized JAX engine is validated
move-for-move against this oracle on random playouts.

It also backs host-side utilities (SpectatorEnv, SFEN tooling, notation)
where per-position Python speed is irrelevant.

Semantics notes (quirks intentionally preserved for parity):
  * Stalemate is scored as a checkmate loss for the side to move
    (game.rs:483-498).
  * check_termination order: max-ply -> sennichite/perpetual -> impasse ->
    no-legal-moves (game.rs:460-499).
  * Uchi-fu-zume simulates the pawn placement WITHOUT decrementing the hand
    or flipping side-to-move; the king-escape test uses the attack map with
    the defending king still on its square (no slider x-ray through the
    king), and capture candidates are tested only for "dropper attacks the
    defender's king after the capture" (rules.rs:19-162).
  * Perpetual check looks only at the check flags of the PAST occurrences of
    the repeated position, not the current one (rules.rs:236-271).
  * Impasse: both kings in the enemy camp, both sides >= 10 pieces in the
    zone INCLUDING the king, score counts board pieces anywhere plus hand
    (rules.rs:286-397).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import tables as T
from . import types as TY
from . import zobrist as Z

# Move tuples: ("b", from_sq, to_sq, promote) | ("d", to_sq, hand_piece)
Move = tuple


def side_of_color(color: int) -> int:
    """Table side index for an absolute color: Black (0) moves north."""
    return color


def attack_counts(board: np.ndarray, color: int) -> np.ndarray:
    """Number of `color` pieces attacking each square (full scan)."""
    att = np.zeros(81, dtype=np.int32)
    side = side_of_color(color)
    for f in range(81):
        cell = int(board[f])
        if cell < 0 or cell // 16 != color:
            continue
        kind = cell % 16
        att += T.STEP_ATT[kind, side, f].astype(np.int32)
        for d in range(8):
            if not T.SLIDE_OK[kind, side, d]:
                continue
            for k in range(8):
                t = T.RAY[d, f, k]
                if t < 0:
                    break
                att[t] += 1
                if board[t] >= 0:
                    break
    return att


def find_king(board: np.ndarray, color: int) -> int:
    cell = TY.KING + 16 * color
    idx = np.nonzero(board == cell)[0]
    return int(idx[0]) if len(idx) else -1


def in_check(board: np.ndarray, color: int) -> bool:
    ks = find_king(board, color)
    if ks < 0:
        return False
    return attack_counts(board, 1 - color)[ks] > 0


def piece_attacks_square(board: np.ndarray, f: int, target: int) -> bool:
    """Does the piece at `f` attack `target` (given current occupancy)?"""
    cell = int(board[f])
    kind, color = cell % 16, cell // 16
    side = side_of_color(color)
    if T.STEP_ATT[kind, side, f, target]:
        return True
    for d in range(8):
        if not T.SLIDE_OK[kind, side, d]:
            continue
        for k in range(8):
            t = T.RAY[d, f, k]
            if t < 0:
                break
            if t == target:
                return True
            if board[t] >= 0:
                break
    return False


@dataclass
class OracleGame:
    board: np.ndarray = field(default_factory=lambda: T.STARTPOS_BOARD.copy())
    hands: np.ndarray = field(default_factory=lambda: np.zeros((2, 7), dtype=np.int8))
    stm: int = 0
    ply: int = 0
    max_ply: int = 500
    hash_: np.ndarray = None  # (2,) uint32
    hash_history: list = field(default_factory=list)
    check_history: list = field(default_factory=list)
    reason: int = TY.NOT_TERMINATED
    winner: int = TY.WINNER_NONE
    # telemetry: drop-mate exclusions in the most recent legal_moves() call
    last_uchifuzume_excluded: int = 0

    def __post_init__(self):
        if self.hash_ is None:
            self.hash_ = Z.compute_hash(self.board, self.hands, self.stm)

    # -- queries ------------------------------------------------------------

    def is_terminal(self) -> bool:
        return self.reason != TY.NOT_TERMINATED

    def in_check_now(self) -> bool:
        return in_check(self.board, self.stm)

    def rep_count(self) -> int:
        """Occurrences of the current position (including now)."""
        return 1 + sum(1 for h in self.hash_history if h[0] == self.hash_[0] and h[1] == self.hash_[1])

    def pawn_on_col(self, color: int, col: int) -> bool:
        cells = self.board[np.arange(9) * 9 + col]
        return bool(np.any(cells == TY.PAWN + 16 * color))

    # -- pseudo-legal generation ---------------------------------------------

    def pseudo_legal_board_moves(self) -> list[Move]:
        color = self.stm
        side = side_of_color(color)
        moves: list[Move] = []
        board = self.board
        for f in range(81):
            cell = int(board[f])
            if cell < 0 or cell // 16 != color:
                continue
            kind = cell % 16
            dests: list[int] = []
            if kind == TY.KNIGHT:
                for slot in range(2):
                    t = int(T.KNIGHT_TO[side, f, slot])
                    if t >= 0 and not (board[t] >= 0 and board[t] // 16 == color):
                        dests.append(t)
            else:
                for d in range(8):
                    # Side-1 pieces step in absolute dir d iff the side-0
                    # piece steps in the rotated dir. No kind both steps and
                    # slides in the same direction, so no dedup needed.
                    step_d = d if side == 0 else (d + 4) % 8
                    if T.MOVE_STEP_OK[kind, step_d]:
                        t = int(T.RAY[d, f, 0])
                        if t >= 0 and not (board[t] >= 0 and board[t] // 16 == color):
                            dests.append(t)
                    if T.SLIDE_OK[kind, side, d]:
                        for k in range(8):
                            t = int(T.RAY[d, f, k])
                            if t < 0:
                                break
                            if board[t] >= 0:
                                if board[t] // 16 != color:
                                    dests.append(t)
                                break
                            dests.append(t)
            for t in dests:
                moves.extend(self._with_promotion(f, t, kind, color))
        return moves

    def _with_promotion(self, f: int, t: int, kind: int, color: int) -> list[Move]:
        """Emit promotion variants per movegen.rs:70-107."""
        if kind >= 8 or not T.CAN_PROMOTE_KIND[kind]:
            return [("b", f, t, False)]
        # rows in perspective space for this color
        pf = f if color == 0 else 80 - f
        pt = t if color == 0 else 80 - t
        if T.MUST_PROMOTE_AT[kind, pt]:
            return [("b", f, t, True)]
        if T.IN_PROMO_ZONE[pf] or T.IN_PROMO_ZONE[pt]:
            return [("b", f, t, False), ("b", f, t, True)]
        return [("b", f, t, False)]

    def pseudo_legal_drops(self) -> list[Move]:
        color = self.stm
        moves: list[Move] = []
        for hp in range(7):
            if self.hands[color, hp] <= 0:
                continue
            for t in range(81):
                if self.board[t] >= 0:
                    continue
                ppt = t if color == 0 else 80 - t
                if hp < 3 and T.DEAD_DROP[hp, ppt]:
                    continue
                moves.append(("d", t, hp))
        return moves

    # -- special rules --------------------------------------------------------

    def is_uchi_fu_zume(self, to: int) -> bool:
        """Pawn-drop-mate test; mirrors rules.rs:19-162 semantics."""
        color = self.stm
        opp = 1 - color
        board = self.board.copy()
        board[to] = TY.PAWN + 16 * color
        opp_king = find_king(board, opp)
        if opp_king < 0:
            return False
        att = attack_counts(board, color)
        if att[opp_king] == 0:
            return False  # no check delivered
        # 1. King escape (attack map computed with the king in place).
        kr, kc = divmod(opp_king, 9)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = kr + dr, kc + dc
                if not (0 <= nr < 9 and 0 <= nc < 9):
                    continue
                adj = nr * 9 + nc
                if board[adj] >= 0 and board[adj] // 16 == opp:
                    continue
                if att[adj] > 0:
                    continue
                return False
        # 2. Capture the pawn with a non-king defender that isn't pinned.
        for f in range(81):
            cell = int(board[f])
            if cell < 0 or cell // 16 != opp or cell % 16 == TY.KING:
                continue
            if not piece_attacks_square(board, f, to):
                continue
            b2 = board.copy()
            b2[to] = cell
            b2[f] = TY.EMPTY
            if attack_counts(b2, color)[opp_king] == 0:
                return False
        return True

    # -- legality ---------------------------------------------------------------

    def legal_moves(self) -> list[Move]:
        color = self.stm
        out: list[Move] = []
        # rule-firing telemetry for the equivalence census (engine/equiv.py):
        # how many otherwise-legal pawn drops THIS call excluded as drop-mate
        self.last_uchifuzume_excluded = 0
        for mv in self.pseudo_legal_board_moves() + self.pseudo_legal_drops():
            if mv[0] == "d" and mv[2] == TY.PAWN:
                to = mv[1]
                if self.pawn_on_col(color, to % 9):
                    continue
                if self.is_uchi_fu_zume(to):
                    self.last_uchifuzume_excluded += 1
                    continue
            board = self._board_after(mv)
            if not in_check(board, color):
                out.append(mv)
        return out

    def _board_after(self, mv: Move) -> np.ndarray:
        board = self.board.copy()
        if mv[0] == "b":
            _, f, t, promote = mv
            cell = int(board[f])
            board[f] = TY.EMPTY
            board[t] = cell + 8 if promote else cell
        else:
            _, t, hp = mv
            board[t] = hp + 16 * self.stm
        return board

    # -- make move ---------------------------------------------------------------

    def make_move(self, mv: Move) -> None:
        color = self.stm
        self.hash_history.append(self.hash_.copy())
        self.check_history.append(self.in_check_now())
        h = self.hash_.copy()
        if mv[0] == "b":
            _, f, t, promote = mv
            cell = int(self.board[f])
            h ^= Z.Z_PIECE[cell, f]
            self.board[f] = TY.EMPTY
            cap = int(self.board[t])
            if cap >= 0:
                h ^= Z.Z_PIECE[cap, t]
                base = cap % 16
                base = base - 8 if base >= 8 else base
                old = int(self.hands[color, base])
                h ^= Z.Z_HAND[color, base, old]
                h ^= Z.Z_HAND[color, base, old + 1]
                self.hands[color, base] = old + 1
            placed = cell + 8 if promote else cell
            self.board[t] = placed
            h ^= Z.Z_PIECE[placed, t]
        else:
            _, t, hp = mv
            old = int(self.hands[color, hp])
            h ^= Z.Z_HAND[color, hp, old]
            h ^= Z.Z_HAND[color, hp, old - 1]
            self.hands[color, hp] = old - 1
            placed = hp + 16 * color
            self.board[t] = placed
            h ^= Z.Z_PIECE[placed, t]
        h ^= Z.Z_STM
        self.hash_ = h
        self.stm = 1 - color
        self.ply += 1

    # -- termination --------------------------------------------------------------

    def check_termination(self) -> None:
        if self.is_terminal():
            return
        if self.ply >= self.max_ply:
            self.reason, self.winner = TY.MAX_MOVES, TY.WINNER_NONE
            return
        res = self._check_sennichite()
        if res is not None:
            self.reason, self.winner = res
            return
        res = self._check_impasse()
        if res is not None:
            self.reason, self.winner = res
            return
        if not self.legal_moves():
            # checkmate OR stalemate: loss for the side to move
            self.reason, self.winner = TY.CHECKMATE, 1 - self.stm

    def _check_sennichite(self):
        matches = [
            p
            for p, hh in enumerate(self.hash_history)
            if hh[0] == self.hash_[0] and hh[1] == self.hash_[1]
        ]
        if 1 + len(matches) < 4:
            return None
        if matches and all(self.check_history[p] for p in matches):
            # Opponent of the current side-to-move was perpetually checking;
            # the victim (current stm) wins.
            return TY.PERPETUAL_CHECK, self.stm
        return TY.REPETITION, TY.WINNER_NONE

    def impasse_scores(self) -> tuple[int, int]:
        """CSA-24 entering-king scores (black, white): every board piece
        anywhere at its IMPASSE value (R/B = 5, king = 0, else 1 — promoted
        at BASE value) plus hand pieces (reference rules.rs:376-423
        compute_impasse_score)."""
        scores = [0, 0]
        for s in range(81):
            cell = int(self.board[s])
            if cell >= 0:
                scores[cell // 16] += int(TY.IMPASSE_VALUE[cell % 16])
        for color in range(2):
            for hp in range(7):
                scores[color] += int(self.hands[color, hp]) * int(TY.HAND_IMPASSE_VALUE[hp])
        return scores[0], scores[1]

    def _check_impasse(self):
        bk, wk = find_king(self.board, 0), find_king(self.board, 1)
        if bk < 0 or wk < 0:
            return None
        if bk // 9 > 2 or wk // 9 < 6:
            return None
        counts = [0, 0]
        for s in range(81):
            cell = int(self.board[s])
            if cell < 0:
                continue
            color = cell // 16
            row = s // 9
            if (color == 0 and row <= 2) or (color == 1 and row >= 6):
                counts[color] += 1
        scores = self.impasse_scores()
        if counts[0] < 10 or counts[1] < 10:
            return None
        if scores[0] >= 24 and scores[1] >= 24:
            return TY.IMPASSE, TY.WINNER_NONE
        if scores[0] >= 24:
            return TY.IMPASSE, 0
        if scores[1] >= 24:
            return TY.IMPASSE, 1
        return None

    def material_balance(self, perspective: int) -> int:
        bal = 0
        for s in range(81):
            cell = int(self.board[s])
            if cell < 0 or cell % 16 == TY.KING:
                continue
            v = int(TY.PIECE_VALUE[cell % 16])
            bal += v if cell // 16 == perspective else -v
        for hp in range(7):
            v = int(TY.HAND_VALUE[hp])
            bal += v * int(self.hands[perspective, hp])
            bal -= v * int(self.hands[1 - perspective, hp])
        return bal

    # -- spatial action encoding ---------------------------------------------------

    def encode_action(self, mv: Move) -> int:
        """Encode a move into the 11,259 spatial action space for the mover."""
        persp = self.stm
        if mv[0] == "d":
            _, t, hp = mv
            pt = t if persp == 0 else 80 - t
            return pt * 139 + 132 + hp
        _, f, t, promote = mv
        pf = f if persp == 0 else 80 - f
        pt = t if persp == 0 else 80 - t
        fr, fc = divmod(pf, 9)
        tr, tc = divmod(pt, 9)
        dr, dc = tr - fr, tc - fc
        if abs(dr) == 2 and abs(dc) == 1:
            slot = 128 + (0 if dc < 0 else 1) * 2 + (1 if promote else 0)
            return pf * 139 + slot
        dist = max(abs(dr), abs(dc))
        ur = 0 if dr == 0 else dr // abs(dr)
        uc = 0 if dc == 0 else dc // abs(dc)
        d = next(i for i, (r, c) in enumerate(T.DIRECTIONS) if r == ur and c == uc)
        slot = (64 if promote else 0) + d * 8 + (dist - 1)
        return pf * 139 + slot

    def decode_action(self, idx: int) -> Move:
        persp = self.stm
        sq, slot = divmod(idx, 139)
        if slot >= 132:
            t = sq if persp == 0 else 80 - sq
            return ("d", t, slot - 132)
        if slot >= 128:
            k = slot - 128
            side_, promote = k // 2, bool(k % 2)
            r, c = divmod(sq, 9)
            tr, tc = r - 2, c + (-1 if side_ == 0 else 1)
            pt = tr * 9 + tc
            f = sq if persp == 0 else 80 - sq
            t = pt if persp == 0 else 80 - pt
            return ("b", f, t, promote)
        promote = slot >= 64
        base = slot - 64 if promote else slot
        d, dist = base // 8, base % 8 + 1
        r, c = divmod(sq, 9)
        dr, dc = T.DIRECTIONS[d]
        pt = (r + dr * dist) * 9 + (c + dc * dist)
        f = sq if persp == 0 else 80 - sq
        t = pt if persp == 0 else 80 - pt
        return ("b", f, int(t), promote)

    def legal_mask(self) -> np.ndarray:
        mask = np.zeros(TY.ACTION_SPACE, dtype=bool)
        for mv in self.legal_moves():
            mask[self.encode_action(mv)] = True
        return mask
