"""Oracle-vs-JAX deep equivalence harness with a rare-rule census.

VERDICT r2 #2: perft and short random playouts never reach positions where
uchi-fu-zume, sennichite/perpetual-check, or CSA-24 impasse fire, so the
round-2 equivalence evidence said nothing about the rare rules. This module
drives BOTH engines move-for-move — full legal-mask equality at every ply,
hash equality, identical termination reason/winner — over (a) long random
playouts from standard/handicap/drop-heavy starts and (b) scripted
scenarios engineered to fire each rare rule, while counting every firing.

The reference's analogue is its per-rule Rust test batteries
(shogi-core/src/rules.rs:19-162, :228-397) plus exhaustive mapper
roundtrips (spatial_action_mapper.rs:356+); here a single driver asserts
the whole observable contract at once and reports HOW OFTEN each rule
actually fired (profiles/oracle-campaign.json is the committed artifact).
"""

from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from . import core as C
from . import types as TY
from . import zobrist as Z
from .oracle import OracleGame

# ---------------------------------------------------------------------------
# Census
# ---------------------------------------------------------------------------


@dataclass
class Census:
    playouts: int = 0
    plies: int = 0
    mask_checks: int = 0
    # terminations
    checkmates: int = 0
    stalemates: int = 0
    repetition_draws: int = 0
    perpetual_check_wins: int = 0
    impasse_wins: int = 0
    impasse_draws: int = 0
    maxply_truncations: int = 0
    # rare-rule firings
    uchifuzume_exclusions: int = 0
    forced_promotions_played: int = 0
    forced_promotion_positions: int = 0
    # flavor
    drops_played: int = 0
    promotions_played: int = 0

    def add(self, other: "Census") -> None:
        for f in fields(self):
            setattr(self, f.name, getattr(self, f.name) + getattr(other, f.name))

    def as_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}


class EquivalenceError(AssertionError):
    pass


# ---------------------------------------------------------------------------
# Fixture construction
# ---------------------------------------------------------------------------


def empty_board() -> np.ndarray:
    return np.full(81, TY.EMPTY, dtype=np.int8)


def put(board: np.ndarray, r: int, c: int, kind: int, color: int) -> None:
    board[r * 9 + c] = kind + 16 * color


def fixture_state(board: np.ndarray, hands: np.ndarray, stm: int,
                  max_ply: int) -> C.GameState:
    """JAX GameState seeded from an arbitrary position (ply 0, empty
    repetition history — matching OracleGame's constructor semantics)."""
    st = C.init_state(max_ply)
    st = st.replace(
        board=np.asarray(board, np.int8),
        hands=np.asarray(hands, np.int8),
        stm=np.int8(stm),
        hash_=Z.compute_hash(board, hands, stm),
    )
    _, _, in_check = C.initial_outputs(st, 46)
    return st.replace(in_check=np.bool_(bool(in_check)))


def make_stepper(max_ply: int):
    """(reset_state, reset_mask, jitted step) for `max_ply` games."""
    reset_state = C.init_state(max_ply)
    reset_obs, reset_mask, _ = C.initial_outputs(reset_state, 46)
    step = jax.jit(
        lambda s, a: C.env_step(s, a, reset_state, reset_obs, reset_mask, 46)
    )
    return reset_state, np.asarray(reset_mask), step


# ---------------------------------------------------------------------------
# Census helpers
# ---------------------------------------------------------------------------

_SLIDE_PROMO = np.arange(64, 128)
_KNIGHT_PROMO = np.asarray([129, 131])


def _count_forced_promotion_positions(mask2d: np.ndarray) -> int:
    """Positions offering at least one move whose promotion is FORCED:
    the promoting slot is legal while its non-promoting twin is not
    (movegen.rs must_promote:35-47 is the behavior under test)."""
    slide = mask2d[:, 64:128] & ~mask2d[:, 0:64]
    knight = mask2d[:, _KNIGHT_PROMO] & ~mask2d[:, _KNIGHT_PROMO - 1]
    return int(slide.any() or knight.any())


def _is_forced_promotion(mask2d: np.ndarray, action: int) -> bool:
    sq, slot = divmod(action, 139)
    if 64 <= slot < 128:
        return not mask2d[sq, slot - 64]
    if slot in (129, 131):
        return not mask2d[sq, slot - 1]
    return False


# ---------------------------------------------------------------------------
# The driver
# ---------------------------------------------------------------------------


def drive_equivalence(
    board: np.ndarray | None,
    hands: np.ndarray | None,
    stm: int,
    max_ply: int,
    policy,
    census: Census,
    stepper=None,
    rng: np.random.Generator | None = None,
    expected_reason: int | None = None,
    expected_winner: int | None = None,
    name: str = "",
) -> int:
    """Play one game through BOTH engines, asserting the full observable
    contract each ply. `policy(game, mask, rng) -> action id`. Returns the
    termination reason. board=None plays from the standard start."""
    rng = rng or np.random.default_rng(0)
    reset_state, reset_mask, step = stepper or make_stepper(max_ply)
    if board is None:
        g = OracleGame(max_ply=max_ply)
        state, mask = reset_state, reset_mask.copy()
    else:
        hands = hands if hands is not None else np.zeros((2, 7), np.int8)
        g = OracleGame(board=np.asarray(board, np.int8).copy(),
                       hands=np.asarray(hands, np.int8).copy(),
                       stm=stm, max_ply=max_ply)
        state = fixture_state(board, hands, stm, max_ply)
        _, jmask, _ = C.initial_outputs(state, 46)
        mask = np.asarray(jmask)

    census.playouts += 1
    reason = TY.NOT_TERMINATED
    for t in range(max_ply + 1):
        omask = g.legal_mask()
        census.uchifuzume_exclusions += g.last_uchifuzume_excluded
        census.mask_checks += 1
        if not np.array_equal(omask, mask):
            diff = np.nonzero(omask != mask)[0][:8]
            raise EquivalenceError(
                f"[{name}] legal-mask mismatch at ply {t}: first diffs "
                f"{diff.tolist()} (oracle={omask[diff].tolist()})"
            )
        m2d = omask.reshape(81, 139)
        census.forced_promotion_positions += _count_forced_promotion_positions(m2d)
        a = int(policy(g, omask, rng))
        if not omask[a]:
            raise EquivalenceError(f"[{name}] policy picked illegal action {a}")
        sq, slot = divmod(a, 139)
        if slot >= 132:
            census.drops_played += 1
        elif (64 <= slot < 128) or slot in (129, 131):
            census.promotions_played += 1
            if _is_forced_promotion(m2d, a):
                census.forced_promotions_played += 1

        g.make_move(g.decode_action(a))
        g.check_termination()
        state, out = step(state, jnp.int32(a))
        done = bool(out.terminated) or bool(out.truncated)
        census.plies += 1
        if g.is_terminal() != done:
            raise EquivalenceError(
                f"[{name}] termination mismatch at ply {t}: oracle "
                f"{g.reason}/{g.winner}, jax done={done}"
            )
        if done:
            jr = int(out.term_reason)
            # StepOutput carries reward from the LAST MOVER's perspective
            # (+1 win / -1 loss / 0 draw or truncation, vec_env.rs:99-122);
            # the oracle's absolute winner is recovered from it
            last_mover = 1 - g.stm
            rew = float(out.reward)
            jw = (last_mover if rew > 0
                  else (1 - last_mover) if rew < 0 else TY.WINNER_NONE)
            if (g.reason, g.winner) != (jr, jw):
                raise EquivalenceError(
                    f"[{name}] reason/winner mismatch at ply {t}: oracle "
                    f"{g.reason}/{g.winner} vs jax {jr}/{jw}"
                )
            reason = jr
            _tally_termination(census, g, jr)
            break
        if not np.array_equal(np.asarray(state.hash_), g.hash_):
            raise EquivalenceError(f"[{name}] hash mismatch at ply {t}")
        mask = np.asarray(out.legal_mask)
    else:
        raise EquivalenceError(f"[{name}] no termination within {max_ply} plies")

    if expected_reason is not None and reason != expected_reason:
        raise EquivalenceError(
            f"[{name}] expected reason {expected_reason}, got {reason}"
        )
    if expected_winner is not None and g.winner != expected_winner:
        raise EquivalenceError(
            f"[{name}] expected winner {expected_winner}, got {g.winner}"
        )
    return reason


def _tally_termination(census: Census, g: OracleGame, reason: int) -> None:
    if reason == TY.CHECKMATE:
        # stm is the mated side; distinguish true mate from stalemate
        if g.in_check_now():
            census.checkmates += 1
        else:
            census.stalemates += 1
    elif reason == TY.REPETITION:
        census.repetition_draws += 1
    elif reason == TY.PERPETUAL_CHECK:
        census.perpetual_check_wins += 1
    elif reason == TY.IMPASSE:
        if g.winner == TY.WINNER_NONE:
            census.impasse_draws += 1
        else:
            census.impasse_wins += 1
    elif reason == TY.MAX_MOVES:
        census.maxply_truncations += 1


def random_policy(g: OracleGame, mask: np.ndarray, rng) -> int:
    return int(rng.choice(np.nonzero(mask)[0]))


# ---------------------------------------------------------------------------
# Biased starting positions (random-policy playouts)
# ---------------------------------------------------------------------------


def handicap_board(removed: tuple[str, ...]) -> np.ndarray:
    """Standard start minus White pieces — the classic handicap ladder
    (lance / bishop / rook / 2p / 4p / 6p / 8p / 10p)."""
    board = np.asarray(C.init_state(1).board, np.int8).copy()
    spots = {
        "lance": [(0, 0), (0, 8)], "knight": [(0, 1), (0, 7)],
        "silver": [(0, 2), (0, 6)], "gold": [(0, 3), (0, 5)],
        "bishop": [(1, 7)], "rook": [(1, 1)],
    }
    for nm in removed:
        for r, c in spots[nm]:
            board[r * 9 + c] = TY.EMPTY
    return board


HANDICAPS: dict[str, tuple[str, ...]] = {
    "lance": ("lance",),
    "bishop": ("bishop",),
    "rook": ("rook",),
    "rook_lance": ("rook", "lance"),
    "two_piece": ("rook", "bishop"),
    "four_piece": ("rook", "bishop", "lance"),
    "six_piece": ("rook", "bishop", "lance", "knight"),
    "eight_piece": ("rook", "bishop", "lance", "knight", "silver"),
    "ten_piece": ("rook", "bishop", "lance", "knight", "silver", "gold"),
}


def drop_heavy_position() -> tuple[np.ndarray, np.ndarray]:
    """Bare kings, nearly every other piece in hand: random play becomes a
    drop storm that hammers nifu, dead-drop, and uchi-fu-zume filtering."""
    board = empty_board()
    put(board, 8, 4, TY.KING, 0)
    put(board, 0, 4, TY.KING, 1)
    hands = np.zeros((2, 7), np.int8)
    for color in range(2):
        hands[color, TY.PAWN] = 9
        hands[color, TY.LANCE] = 2
        hands[color, TY.KNIGHT] = 2
        hands[color, TY.SILVER] = 2
        hands[color, TY.GOLD] = 2
        hands[color, TY.BISHOP] = 1
        hands[color, TY.ROOK] = 1
    return board, hands


# ---------------------------------------------------------------------------
# Scripted rare-rule scenarios
# ---------------------------------------------------------------------------


def _flip_fixture(board: np.ndarray, hands: np.ndarray, stm: int):
    """Color-swap a fixture: rotate 180 degrees and recolor, swap hands."""
    flipped = empty_board()
    for s in range(81):
        cell = int(board[s])
        if cell >= 0:
            flipped[80 - s] = (cell % 16) + 16 * (1 - cell // 16)
    return flipped, hands[::-1].copy(), 1 - stm


def perpetual_scenario(col: int, kind: int, flipped: bool, bk_col: int = 0):
    """A rook/dragon at (2,col) checks the enemy king at (0,col); the only
    legal reply shuttles the king between (0,col) and (0,col+1) — lances
    wall row 0, knights at (3,col)/(3,col+1) cover every row-1 flight
    square without blocking the check files. The checker follows sideways.
    The start position (victim to move, in check) recurs at plies 4, 8,
    12 — every prior occurrence a check — so the 4-fold detection
    attributes the win to the VICTIM (rules.rs:228-274)."""
    assert 2 <= col <= 5 and bk_col not in (col - 1, col, col + 1, col + 2)
    board = empty_board()
    c = col
    put(board, 0, c, TY.KING, 1)            # victim king, in check at start
    put(board, 0, c - 1, TY.LANCE, 1)       # own walls bound the shuttle
    put(board, 0, c + 2, TY.LANCE, 1)
    put(board, 2, c, kind, 0)               # the checker (rook or dragon)
    put(board, 3, c, TY.KNIGHT, 0)          # covers (1,c-1),(1,c+1)
    put(board, 3, c + 1, TY.KNIGHT, 0)      # covers (1,c),(1,c+2)
    put(board, 8, bk_col, TY.KING, 0)
    hands = np.zeros((2, 7), np.int8)
    stm = 1  # victim to move, in check
    if flipped:
        board, hands, stm = _flip_fixture(board, hands, stm)

    attacker = 1 if flipped else 0
    atk_piece = kind + 16 * attacker
    victim_king = TY.KING + 16 * (1 - attacker)

    def policy(g: OracleGame, mask, rng):
        if g.stm != attacker:
            return random_policy(g, mask, rng)  # the victim's move is forced
        # attacker: slide the checker sideways onto the king's column
        f = next(s for s in range(81) if int(g.board[s]) == atk_piece)
        kpos = next(s for s in range(81) if int(g.board[s]) == victim_king)
        t = (f // 9) * 9 + (kpos % 9)
        return g.encode_action(("b", int(f), int(t), False))

    return dict(board=board, hands=hands, stm=stm, policy=policy,
                expected_reason=TY.PERPETUAL_CHECK,
                expected_winner=stm,  # the victim (side to move at start)
                name=f"perpetual(c={col},k={kind},fl={flipped},bk={bk_col})")


def sennichite_scenario(bcol: int, wcol: int, kind: int, flipped: bool):
    """Quiet four-fold repetition: each side shuttles a piece sideways
    (col -> col+1 -> back) with no checks anywhere -> REPETITION draw at
    the fourth occurrence of the start position."""
    assert abs(bcol - wcol) >= 3 and 0 < bcol < 7 and 0 < wcol < 7
    board = empty_board()
    put(board, 8, 8, TY.KING, 0)
    put(board, 0, 0, TY.KING, 1)
    put(board, 5, bcol, kind, 0)
    put(board, 3, wcol, kind, 1)
    hands = np.zeros((2, 7), np.int8)
    stm = 0
    if flipped:
        board, hands, stm = _flip_fixture(board, hands, stm)

    home: dict[int, int] = {}  # color -> starting square of its shuttle

    def policy(g: OracleGame, mask, rng):
        want = kind + 16 * g.stm
        f = next(s for s in range(81) if int(g.board[s]) == want)
        home.setdefault(g.stm, f)
        h = home[g.stm]
        # shuttle toward the board center so a flipped fixture's rook
        # never lands on column 0/8 where the kings sit (file check)
        delta = 1 if h % 9 <= 4 else -1
        t = f + delta if f == h else h
        return g.encode_action(("b", int(f), int(t), False))

    return dict(board=board, hands=hands, stm=stm, policy=policy,
                expected_reason=TY.REPETITION,
                expected_winner=TY.WINNER_NONE,
                name=f"sennichite(b={bcol},w={wcol},k={kind},fl={flipped})")


def impasse_scenario(variant: int, black_pts: int, white_pts: int):
    """Both kings in the enemy camp with >=10 pieces each; hand pawns tune
    the CSA-24 scores to exactly `black_pts`/`white_pts`. One quiet pawn
    move then fires (or, below the threshold, legitimately does not fire)
    the impasse check. Below-threshold variants run to a MAX_MOVES
    truncation instead, proving the rule did NOT fire."""
    board = empty_board()
    shift = variant % 3  # slide the formations across columns
    # black formation in White's camp (rows 0-2): K + R + B + 7 golds = 10
    put(board, 1, shift, TY.KING, 0)
    put(board, 0, shift, TY.ROOK, 0)
    put(board, 0, 1 + shift, TY.BISHOP, 0)
    for ccol in (2 + shift, 3 + shift, 4 + shift, 5 + shift):
        put(board, 0, ccol, TY.GOLD, 0)
    put(board, 1, 1 + shift, TY.GOLD, 0)
    put(board, 1, 2 + shift, TY.GOLD, 0)
    put(board, 2, shift, TY.GOLD, 0)
    # white formation in Black's camp (rows 6-8), mirrored
    put(board, 7, 8 - shift, TY.KING, 1)
    put(board, 8, 8 - shift, TY.ROOK, 1)
    put(board, 8, 7 - shift, TY.BISHOP, 1)
    for ccol in (6 - shift, 5 - shift, 4 - shift, 3 - shift):
        put(board, 8, ccol, TY.GOLD, 1)
    put(board, 7, 7 - shift, TY.GOLD, 1)
    put(board, 7, 6 - shift, TY.GOLD, 1)
    put(board, 6, 8 - shift, TY.GOLD, 1)
    # quiet mover for black, outside both camps and clear of the black
    # camp's columns for every shift (it climbs to row 1 in the 6-ply
    # below-threshold variants)
    put(board, 4, 8, TY.PAWN, 0)
    hands = np.zeros((2, 7), np.int8)
    # derive the hand-pawn counts from the actual board material so the
    # target scores are exact (the CSA score sums ALL pieces plus hands)
    board_score = [0, 0]
    for s in range(81):
        cell = int(board[s])
        if cell >= 0:
            board_score[cell // 16] += int(TY.IMPASSE_VALUE[cell % 16])
    need_b, need_w = black_pts - board_score[0], white_pts - board_score[1]
    assert 0 <= need_b <= 18 and 0 <= need_w <= 18, (need_b, need_w)
    hands[0, TY.PAWN] = need_b
    hands[1, TY.PAWN] = need_w
    expected_reason: int | None
    if black_pts >= 24 and white_pts >= 24:
        expected_reason, expected_winner = TY.IMPASSE, TY.WINNER_NONE
    elif black_pts >= 24:
        expected_reason, expected_winner = TY.IMPASSE, 0
    elif white_pts >= 24:
        expected_reason, expected_winner = TY.IMPASSE, 1
    else:
        expected_reason, expected_winner = TY.MAX_MOVES, TY.WINNER_NONE

    wk_home = 7 * 9 + (8 - shift)
    wk_away = 6 * 9 + (7 - shift)

    def policy(g: OracleGame, mask, rng):
        # fully scripted both sides: black advances its spare pawn, white
        # shuttles its king — deterministic, interaction-free, so the
        # below-threshold variants PROVABLY reach MAX_MOVES untouched
        if g.stm == 0:
            f = next(s for s in range(81) if int(g.board[s]) == TY.PAWN)
            return g.encode_action(("b", int(f), int(f - 9), False))
        f = wk_home if int(g.board[wk_home]) == TY.KING + 16 else wk_away
        t = wk_away if f == wk_home else wk_home
        return g.encode_action(("b", int(f), int(t), False))

    return dict(board=board, hands=hands, stm=0, policy=policy,
                expected_reason=expected_reason,
                expected_winner=expected_winner, max_ply=6,
                name=f"impasse(v={variant},b={black_pts},w={white_pts})")


def uchifuzume_fixture(col: int, protector: str, flipped: bool,
                       broken: str | None = None,
                       edge_kind: int = TY.GOLD):
    """A pawn drop at (1,col) would mate the White king at (0,col): the
    drop square is protected without pre-checking the king, and every
    flight square is covered. `broken` removes one ingredient so the drop
    stays LEGAL (an escape opens) -- the near-miss control that pins the
    rule's boundary (rules.rs:19-162).

    Returns (board, hands, stm, drop_action_id, expect_excluded)."""
    assert 2 <= col <= 6
    c = col
    board = empty_board()
    put(board, 0, c, TY.KING, 1)
    if broken == "protection":
        # near-miss: the (1,c-1)/(1,c+1) flights stay covered from afar,
        # but NOTHING protects the drop square — the king just captures
        # the pawn, so the drop is an ordinary legal check
        put(board, 2, c - 2, TY.GOLD, 0)     # covers (1,c-1)
        put(board, 2, c + 2, TY.GOLD, 0)     # covers (1,c+1)
    else:
        if protector == "knight":
            # knight jumps to (1,c): protects the pawn square without
            # ever attacking (0,c)
            put(board, 3, c - 1, TY.KNIGHT, 0)
            put(board, 2, c - 1, TY.GOLD, 0)   # covers (1,c-1) and (1,c)
            put(board, 2, c + 1, TY.GOLD, 0)   # covers (1,c+1) and (1,c)
        else:
            # promoted silvers move as golds — a piece-kind variant
            put(board, 2, c - 1, TY.SILVER + 8, 0)
            put(board, 2, c + 1, TY.SILVER + 8, 0)
    if broken != "edge_cover":
        # edge pieces cover the (0,c-1)/(0,c+1) flights (and, sideways,
        # double-cover (1,c-1)/(1,c+1)); removing them opens the corner
        # escape and legalizes the drop. edge_kind varies the piece
        # (gold / tokin / promoted silver — all gold-movers).
        put(board, 1, c - 2, edge_kind, 0)
        put(board, 1, c + 2, edge_kind, 0)
    put(board, 8, 8, TY.KING, 0)
    put(board, 6, 0, TY.PAWN, 1)             # white spare piece
    hands = np.zeros((2, 7), np.int8)
    hands[0, TY.PAWN] = 1
    stm = 0
    drop_to = 1 * 9 + c
    if flipped:
        board, hands, stm = _flip_fixture(board, hands, stm)
        drop_to = 80 - drop_to
    # spatial drop id in the MOVER's perspective space
    pt = drop_to if stm == 0 else 80 - drop_to
    action = pt * 139 + 132 + TY.PAWN
    return board, hands, stm, action, broken is None


def check_uchifuzume_fixture(board, hands, stm, action: int,
                             expect_excluded: bool, census: Census,
                             name: str = "") -> None:
    """Mask-level equivalence for one drop-mate fixture: both engines must
    produce identical full masks, and the pawn drop must be excluded (or
    legal, for the near-miss controls) in BOTH."""
    g = OracleGame(board=np.asarray(board, np.int8).copy(),
                   hands=np.asarray(hands, np.int8).copy(),
                   stm=stm, max_ply=64)
    omask = g.legal_mask()
    census.mask_checks += 1
    census.uchifuzume_exclusions += g.last_uchifuzume_excluded
    state = fixture_state(board, hands, stm, 64)
    _, jmask, _ = C.initial_outputs(state, 46)
    jmask = np.asarray(jmask)
    if not np.array_equal(omask, jmask):
        diff = np.nonzero(omask != jmask)[0][:8]
        raise EquivalenceError(
            f"[uchifuzume {name}] mask mismatch: diffs {diff.tolist()}"
        )
    if bool(omask[action]) != (not expect_excluded):
        raise EquivalenceError(
            f"[uchifuzume {name}] drop action {action}: excluded="
            f"{not bool(omask[action])}, expected excluded={expect_excluded}"
        )
    if expect_excluded and g.last_uchifuzume_excluded < 1:
        raise EquivalenceError(
            f"[uchifuzume {name}] oracle did not attribute the exclusion "
            "to the drop-mate rule"
        )
