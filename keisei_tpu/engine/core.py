"""TPU-native shogi rules core: pure-JAX, branchless, single-env functions.

This module is the device-side replacement for the reference's Rust rules
engine (shogi-core). The design deliberately departs from the reference's
list-of-moves + make/unmake architecture (game.rs:339-446), which is hostile
to SIMD: here legality is computed as a dense (81, 139) action-mask tensor in
perspective space using precomputed geometry tables (tables.py), attack
floods over (9, 9) planes, and pin/check masks — no per-move make/unmake.

Everything is written for a SINGLE environment and vmapped by the env layer;
all shapes are static, all control flow is data-independent, so the whole
step pipeline jits into one XLA program.

Rule semantics are pinned to the reference (see oracle.py for the quirk
list); correctness is enforced by move-for-move equivalence tests against
the oracle plus the reference's perft fixtures.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import tables as T
from . import types as TY
from . import zobrist as Z

# ---------------------------------------------------------------------------
# Constants (host numpy; become XLA constants under jit)
# ---------------------------------------------------------------------------
KIND_IOTA = np.arange(TY.NUM_KINDS, dtype=np.int32)
SQ_IOTA = np.arange(81, dtype=np.int32)

# Step-attack incidence flattened for einsum: (16*81, 81) per side.
STEP_ATT0_FLAT = T.STEP_ATT[:, 0].reshape(16 * 81, 81).astype(np.float32)
STEP_ATT1_FLAT = T.STEP_ATT[:, 1].reshape(16 * 81, 81).astype(np.float32)

# FROM_RAY[from, dir, k] = destination square at distance k+1, or -1.
FROM_RAY = np.transpose(T.RAY, (1, 0, 2)).astype(np.int32)  # (81, 8, 8)
FROM_RAY_VALID = FROM_RAY >= 0
FROM_RAY_C = np.maximum(FROM_RAY, 0)

# BETWEEN flattened for the pin occupancy matmul: (81*81, 81).
BETWEEN_FLAT = T.BETWEEN.reshape(81 * 81, 81).astype(np.float32)
# BETWEEN contracted over the MIDDLE axis for king/target one-hot einsums:
# BETWEEN_K_FLAT[f*81+t, k] = BETWEEN[f, k, t]. (f, t) vs one-hot of k.
BETWEEN_K_FLAT = np.transpose(T.BETWEEN, (0, 2, 1)).reshape(81 * 81, 81).astype(np.float32)
# ALIGNED_DIR as values+1 for one-hot matmuls (0 = unaligned, exact in f32).
ALIGNED_P1 = (T.ALIGNED_DIR + 1).astype(np.float32)  # (81, 81)

# Direction deltas for the 8 unrolled flood shifts.
DIR_DELTAS = [tuple(d) for d in T.DIRECTIONS.tolist()]

# Opponent-side slide capability per kind/dir: (16, 8)
SLIDE_OK0 = T.SLIDE_OK[:, 0, :]
SLIDE_OK1 = T.SLIDE_OK[:, 1, :]
OPP_DIR = np.array([(d + 4) % 8 for d in range(8)] + [8], dtype=np.int32)  # [-1] -> 8 guard

# ---------------------------------------------------------------------------
# Destination one-hot + per-destination constant masks.
#
# TPU XLA lowers gathers whose output is (N, 81, 8, 8) to effectively scalar
# loops (~14 ms/step at N=256, the entire env budget). Every per-destination
# lookup is therefore reformulated as ONE one-hot matmul against DEST_OH_T
# (MXU work) plus constant (81, 8, 8) masks precomputed here.
# Columns: 81*64 slide destinations then 81*2 knight destinations.
# ---------------------------------------------------------------------------
_N_SLIDE_COLS = 81 * 64
_N_KNIGHT_COLS = 81 * 2
N_DEST_COLS = _N_SLIDE_COLS + _N_KNIGHT_COLS


def _build_dest_onehot() -> np.ndarray:
    oh = np.zeros((81, N_DEST_COLS), dtype=np.float32)
    dests = FROM_RAY.reshape(81 * 64)  # (s*64 + d*8 + k)
    cols = np.arange(81 * 64)
    ok = dests >= 0
    oh[dests[ok], cols[ok]] = 1.0
    kdests = T.KNIGHT_TO[0].reshape(81 * 2)
    kcols = _N_SLIDE_COLS + np.arange(81 * 2)
    kok = kdests >= 0
    oh[kdests[kok], kcols[kok]] = 1.0
    return oh


DEST_OH_T = _build_dest_onehot()  # (81, 5346) f32

# Constant per-destination masks (False at invalid destinations).
_DEST_C = np.maximum(FROM_RAY, 0)
ROW0_AT_DEST = (T.ROW_OF[_DEST_C] == 0) & FROM_RAY_VALID  # (81, 8, 8)
ZONE_AT_DEST = T.IN_PROMO_ZONE[_DEST_C] & FROM_RAY_VALID
_KDEST_C = np.maximum(T.KNIGHT_TO[0], 0)
K_VALID = T.KNIGHT_TO[0] >= 0  # (81, 2)
K_ROW01 = (T.ROW_OF[_KDEST_C] <= 1) & K_VALID
K_ZONE = T.IN_PROMO_ZONE[_KDEST_C] & K_VALID
MOVE_OK_FLAT = T.MOVE_OK.reshape(16, 64).astype(np.float32)  # (16, 64)

# SLIDE_OK with a guard row for direction index 8 (= "unaligned").
SLIDE_OK1_G = np.concatenate([SLIDE_OK1, np.zeros((16, 1), dtype=bool)], axis=1)
SLIDE_OK0_G = np.concatenate([SLIDE_OK0, np.zeros((16, 1), dtype=bool)], axis=1)

KING_ADJ = T.STEP_ATT[TY.KING, 0]  # (81, 81) king-neighborhood incidence
KING_ADJ_F = KING_ADJ.astype(np.float32)


def _dir_onehot(dir_vals_p1: jax.Array) -> jax.Array:
    """(81,) direction values (+1 encoding, 0 = unaligned) -> (81, 9)
    one-hot over [dir 0..7, guard]; unaligned rows map to the guard col."""
    idx = jnp.clip(dir_vals_p1.astype(jnp.int32) - 1, -1, 7)
    return (idx[:, None] == jnp.arange(9)[None, :]) & (idx[:, None] >= 0) | (
        (idx[:, None] < 0) & (jnp.arange(9)[None, :] == 8)
    )


@struct.dataclass
class GameState:
    """Single-environment game state (absolute space). All arrays static-shaped."""

    board: jax.Array  # (81,) int8: -1 empty, else kind + 16*color
    hands: jax.Array  # (2, 7) int8
    stm: jax.Array  # () int8: 0 Black, 1 White
    ply: jax.Array  # () int32
    hash_: jax.Array  # (2,) uint32
    hash_hist: jax.Array  # (H, 2) uint32: position hash at each past ply
    check_hist: jax.Array  # (H,) bool: was stm in check at that ply
    in_check: jax.Array  # () bool: current stm in check (carried)
    reason: jax.Array  # () int8 termination reason code
    winner: jax.Array  # () int8: -1 none, 0 Black, 1 White


def init_state(max_ply: int) -> GameState:
    """Fresh startpos state. H = max_ply + 1 history slots.

    Leaves are NUMPY arrays on purpose: this template is closed over as a
    constant by jitted step functions, and closure-captured committed
    device arrays make jax 0.9 lowering pathologically slow (minutes per
    `where`); numpy constants lower instantly.
    """
    H = max_ply + 1
    h0 = Z.compute_hash(T.STARTPOS_BOARD, np.zeros((2, 7), np.int8), 0)
    return GameState(
        board=T.STARTPOS_BOARD.copy(),
        hands=np.zeros((2, 7), dtype=np.int8),
        stm=np.int8(0),
        ply=np.int32(0),
        hash_=h0,
        hash_hist=np.zeros((H, 2), dtype=np.uint32),
        check_hist=np.zeros((H,), dtype=bool),
        in_check=np.bool_(False),
        reason=np.int8(TY.NOT_TERMINATED),
        winner=np.int8(TY.WINNER_NONE),
    )


# ---------------------------------------------------------------------------
# Perspective canonicalization
# ---------------------------------------------------------------------------


def perspective_board(board: jax.Array, stm: jax.Array) -> jax.Array:
    """Canonicalize: flip 180 degrees + swap colors when White to move.

    In perspective space the mover is always 'side 0' and moves north, so
    movegen needs no color parameter (the reference instead threads Color
    through every routine — attack.rs:63-117).
    """
    flipped = jnp.flip(board, axis=0)
    swapped = jnp.where(flipped >= 0, flipped ^ 16, flipped)
    return jnp.where(stm == 0, board, swapped)


def _shift2d(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """Shift a (9, 9) plane by (dr, dc), zero-filling (static dirs only)."""
    padded = jnp.pad(x, ((1, 1), (1, 1)))
    # result[r, c] = x[r - dr, c - dc]: a piece at (r0, c0) lands on
    # (r0 + dr, c0 + dc).
    return padded[1 - dr : 10 - dr, 1 - dc : 10 - dc]


def _flood(sliders: jax.Array, empty: jax.Array) -> jax.Array:
    """Squares attacked by sliders along all 8 dirs given `empty` (81,) bools.

    Each direction is an unrolled 8-step shift-propagate on the (9, 9)
    plane; `sliders` is (8, 81) — per-direction slider presence.

    Measured note (docs/profiling-round2.md): a PREFIX/DEST one-hot-matmul
    reformulation of this flood was tried and is ~25% SLOWER at N=256
    (1.32 vs 1.04 ms for the whole mask) — the bool shift chain fuses into
    a handful of VPU ops and was never the bottleneck; the pathological
    gathers lived in the board-slot block, which IS matmulified.
    """
    e2 = empty.reshape(9, 9)
    att = jnp.zeros((9, 9), dtype=bool)
    for d, (dr, dc) in enumerate(DIR_DELTAS):
        reach = _shift2d(sliders[d].reshape(9, 9), dr, dc)
        acc = reach
        for _ in range(7):
            reach = _shift2d(reach & e2, dr, dc)
            acc = acc | reach
        att = att | acc
    return att.reshape(81)


def _step_attacks(kind_oh: jax.Array, table_flat: np.ndarray) -> jax.Array:
    """(16, 81) presence one-hot -> (81,) bool step-attacked squares."""
    flat = kind_oh.reshape(16 * 81).astype(jnp.float32)
    return (flat @ table_flat) > 0.5


def _slider_presence(kind_oh: jax.Array, slide_ok: np.ndarray) -> jax.Array:
    """(16, 81) presence -> (8, 81) per-direction slider presence."""
    return jnp.einsum("ks,kd->ds", kind_oh.astype(jnp.float32), slide_ok.astype(np.float32)) > 0.5


# ---------------------------------------------------------------------------
# Legal move mask (perspective space)
# ---------------------------------------------------------------------------


def legal_mask_pspace(pboard: jax.Array, own_hand: jax.Array):
    """Compute the (81, 139) legality tensor plus check info.

    Returns (mask81x139, in_check, n_checkers). Mirrors the reference's
    legality semantics (game.rs:339-446 + rules.rs) without make/unmake.
    """
    own = (pboard >= 0) & (pboard < 16)
    opp = pboard >= 16
    occ = own | opp
    empty = ~occ
    kind = (pboard & 15).astype(jnp.int32)  # -1 -> 15 (unused kind)

    kind_eq = kind[None, :] == KIND_IOTA[:, None]  # (16, 81)
    own_kind = kind_eq & own[None, :]
    opp_kind = kind_eq & opp[None, :]

    ksq = jnp.argmax(own & (kind == TY.KING))
    oksq = jnp.argmax(opp & (kind == TY.KING))
    ksq_oh = (own & (kind == TY.KING)).astype(jnp.float32)  # (81,)
    oksq_oh = (opp & (kind == TY.KING)).astype(jnp.float32)

    # Per-kind side-1/side-0 slide capability by square — shared by the
    # checkers/pins/drop-mate blocks (a one-hot einsum instead of the
    # (N, 81)-index gathers XLA serializes; see the board-slot rationale).
    kind_eq_f = kind_eq.astype(jnp.float32)  # (16, 81)
    kslide1 = kind_eq_f.T @ jnp.asarray(
        SLIDE_OK1_G.astype(np.float32)
    )  # (81, 9): SLIDE_OK1_G[kind[f], :]
    kslide0 = kind_eq_f.T @ jnp.asarray(SLIDE_OK0_G.astype(np.float32))

    # --- opponent attacks with x-ray through our king (for king moves) ---
    opp_steps = _step_attacks(opp_kind, STEP_ATT1_FLAT)
    opp_sliders = _slider_presence(opp_kind, SLIDE_OK1)
    empty_x = empty | (SQ_IOTA == ksq)
    opp_att_x = opp_steps | _flood(opp_sliders, empty_x)

    # --- checkers on our king (all ksq lookups via the king one-hot) ---
    step_to_k = (
        jnp.asarray(STEP_ATT1_FLAT) @ ksq_oh
    ).reshape(16, 81)  # STEP_ATT[:, 1, :, ksq]
    step_check = (opp_kind & (step_to_k > 0.5)).any(axis=0)  # (81,)
    aligned_to_k = (jnp.asarray(ALIGNED_P1) @ ksq_oh) - 1.0  # (81,) dir f->ksq
    btw_to_k = (
        jnp.asarray(BETWEEN_K_FLAT) @ ksq_oh
    ).reshape(81, 81) > 0.5  # BETWEEN[f, ksq, t]
    btw_to_k_blocked = (btw_to_k.astype(jnp.float32) @ occ.astype(jnp.float32)) > 0.5
    dir_oh_k = _dir_onehot(aligned_to_k + 1.0)  # (81, 9)
    slide_cap = (kslide1 * dir_oh_k).sum(axis=1) > 0.5  # f slides toward ksq
    slide_check = opp & slide_cap & ~btw_to_k_blocked
    checkers = step_check | slide_check
    n_check = checkers.sum()
    in_check = n_check > 0

    # Non-king destination mask under check: capture checker or block ray.
    block = (slide_check[:, None] & btw_to_k).any(axis=0)
    check_dest = checkers | block
    ones81 = jnp.ones(81, dtype=bool)
    nonking_allowed = jnp.where(in_check, jnp.where(n_check == 1, check_dest, jnp.zeros(81, bool)), ones81)

    # --- pins ---
    d_ks = (ksq_oh @ jnp.asarray(ALIGNED_P1)) - 1.0  # (81,) dir ksq->s
    d_ks_i = d_ks.astype(jnp.int32)
    # BTW_OCC[s, t] = any occupied square strictly between s and t
    btw_occ = (BETWEEN_FLAT @ occ.astype(jnp.float32)).reshape(81, 81) > 0.5
    king_to_s_clear = ~(ksq_oh @ btw_occ.astype(jnp.float32) > 0.5)
    # t is a candidate pinner of s iff: t lies on the continuation of the
    # king->s ray (dir s->t == dir king->s), nothing between s and t, and
    # the opponent piece at t slides along t->king (= opposite direction).
    same_dir = jnp.asarray(T.ALIGNED_DIR) == d_ks_i[:, None]  # (81s, 81t)
    pin_dir_oh = _dir_onehot(
        jnp.where(d_ks_i >= 0, (d_ks_i + 4) % 8, -1).astype(jnp.float32) + 1.0
    )  # (81s, 9)
    pinner_match = (kslide1 @ pin_dir_oh.astype(jnp.float32).T).T > 0.5  # (81s, 81t)
    pin_t = same_dir & opp[None, :] & pinner_match & ~btw_occ
    pinned = own & (kind != TY.KING) & (d_ks_i >= 0) & king_to_s_clear & pin_t.any(axis=1)
    # A pinned piece's reachable destinations are legal iff they stay on the
    # king ray through the piece: dir(ksq->t) == dir(ksq->s). (Equivalent to
    # the reference's explicit between(king,pinner)+pinner line for every
    # reachable t: squares beyond the pinner or behind the king are blocked
    # by path_clear anyway, and a knight jump can never remain on the ray.)

    # --- per-destination lookups as ONE one-hot matmul (MXU, no gathers) ---
    # rows: empty / own / opp_att_x / nonking_allowed / (d_ks values + 1)
    vecs = jnp.stack([
        empty.astype(jnp.float32),
        own.astype(jnp.float32),
        opp_att_x.astype(jnp.float32),
        nonking_allowed.astype(jnp.float32),
        (d_ks + 1).astype(jnp.float32),  # 0 = unaligned; exact in f32
    ])  # (5, 81)
    at_dest = vecs @ jnp.asarray(DEST_OH_T)  # (5, 5346); invalid columns -> 0
    slide_at = at_dest[:, :_N_SLIDE_COLS].reshape(5, 81, 8, 8)
    knight_at = at_dest[:, _N_SLIDE_COLS:].reshape(5, 81, 2)
    empty_at = slide_at[0] > 0.5
    own_at = slide_at[1] > 0.5
    att_at = slide_at[2] > 0.5
    allow_at = slide_at[3] > 0.5
    dks_at = slide_at[4]

    # --- slot 0-127: slide/step moves ---
    valid = jnp.asarray(FROM_RAY_VALID)
    blocked_before = jnp.cumsum(~empty_at, axis=-1)  # (81, 8, 8)
    path_clear = jnp.concatenate(
        [jnp.ones((81, 8, 1), bool), blocked_before[..., :-1] == 0], axis=-1
    )
    # MOVE_OK[kind] without a gather: kind one-hot einsum (tiny matmul)
    kind_oh_own = (kind_eq & own[None, :]).astype(jnp.float32)  # (16, 81)
    move_cap = (
        jnp.einsum("ks,km->sm", kind_oh_own, jnp.asarray(MOVE_OK_FLAT)) > 0.5
    ).reshape(81, 8, 8)
    base = move_cap & valid & path_clear & ~own_at  # own[s] folded into move_cap

    is_king_from = own & (kind == TY.KING)
    king_dest_ok = ~att_at
    pin_ok_at = ~pinned[:, None, None] | (dks_at == (d_ks[:, None, None] + 1))
    nk_dest_ok = allow_at & pin_ok_at
    legal_bd = base & jnp.where(is_king_from[:, None, None], king_dest_ok, nk_dest_ok)

    # forced/optional promotion from constant per-destination masks
    is_pl = own & ((kind == TY.PAWN) | (kind == TY.LANCE))
    is_kn = own & (kind == TY.KNIGHT)
    # knights have no slide/step slots (MOVE_OK[KNIGHT] is all-false), so
    # forced promotion here concerns pawns/lances only; knight forced
    # promotion lives in the knight-slot block (K_ROW01 below)
    must = is_pl[:, None, None] & jnp.asarray(ROW0_AT_DEST)
    canp = (kind_eq & jnp.asarray(T.CAN_PROMOTE_KIND)[:, None]).any(axis=0) & own
    zone_from = jnp.asarray(T.IN_PROMO_ZONE)  # (81,)
    promo_opt = canp[:, None, None] & (
        zone_from[:, None, None] | jnp.asarray(ZONE_AT_DEST)
    )

    slots_nopromo = legal_bd & ~must  # (81, 8, 8) -> slots 0-63
    slots_promo = legal_bd & (must | promo_opt)  # slots 64-127
    # Forced promotion emits ONLY the promoted form (movegen.rs:97-99);
    # optional promotion emits both. slots_promo must also require canp.
    slots_promo = slots_promo & canp[:, None, None]

    # --- knight slots 128-131 (same matmul, knight columns) ---
    kvalid = jnp.asarray(K_VALID)  # (81, 2)
    k_own_at = knight_at[1] > 0.5
    k_allow_at = knight_at[3] > 0.5
    k_dks_at = knight_at[4]
    k_pin_ok = ~pinned[:, None] | (k_dks_at == (d_ks[:, None] + 1))
    kbase = is_kn[:, None] & kvalid & ~k_own_at & k_allow_at & k_pin_ok
    kmust = jnp.asarray(K_ROW01)
    kzone = zone_from[:, None] | jnp.asarray(K_ZONE)
    knight_nopromo = kbase & ~kmust  # (81, 2)
    knight_promo = kbase & (kmust | kzone)

    # --- drops: slots 132-138 at destination square ---
    has_piece = own_hand > 0  # (7,)
    drop_ok = empty[:, None] & has_piece[None, :]  # (81, 7)
    drop_ok = drop_ok & ~jnp.asarray(T.DEAD_DROP.T)  # (81, 7)
    # Under check, drops may only interpose (empty squares on the block ray).
    drop_allowed_dest = jnp.where(
        in_check, jnp.where(n_check == 1, block, jnp.zeros(81, bool)), ones81
    )
    drop_ok = drop_ok & drop_allowed_dest[:, None]
    # Nifu: no second unpromoted own pawn on a file.
    pawn_file = own_kind[TY.PAWN].reshape(9, 9).any(axis=0)  # (9,) per column
    nifu = pawn_file[SQ_IOTA % 9]  # (81,)
    pawn_drop_ok = drop_ok[:, TY.PAWN] & ~nifu

    # Uchi-fu-zume: only the square directly in front of the enemy king can
    # deliver pawn-drop check. Test reference semantics (rules.rs:19-162).
    ufz_sq = oksq + 9
    ufz_possible = (oksq // 9) < 8
    # one-hot of c = oksq + 9: shift the king one-hot south one row
    c_oh = jnp.concatenate([jnp.zeros(9, jnp.float32), oksq_oh[:-9]])
    ufz = _uchi_fu_zume(
        own_kind, opp_kind, opp, kind, occ, empty, oksq_oh, c_oh,
        kslide1, kslide0
    )
    pawn_drop_ok = pawn_drop_ok & ~(
        (SQ_IOTA == ufz_sq) & ufz & ufz_possible
    )
    drop_ok = drop_ok.at[:, TY.PAWN].set(pawn_drop_ok)

    # --- assemble (81, 139) ---
    slide_part = jnp.concatenate(
        [slots_nopromo.reshape(81, 64), slots_promo.reshape(81, 64)], axis=1
    )
    knight_part = jnp.stack(
        [knight_nopromo[:, 0], knight_promo[:, 0], knight_nopromo[:, 1], knight_promo[:, 1]],
        axis=1,
    )
    mask = jnp.concatenate([slide_part, knight_part, drop_ok], axis=1)
    return mask, in_check, n_check


def _uchi_fu_zume(own_kind, opp_kind, opp, kind, occ, empty, oksq_oh, c_oh,
                  kslide1, kslide0):
    """Pawn-drop-mate test at square c (= oksq + 9), one-hot addressed.

    Replicates rules.rs:19-162 including its quirks: the defender-king
    escape test uses the attack map with the king still in place, and
    capture candidates are only vetted for "dropper still attacks the king
    after the capture". All dynamic-square lookups are one-hot matmuls
    against ALIGNED_P1 / BETWEEN_K_FLAT / STEP_ATT — TPU gathers keyed by a
    per-env square serialize (docs/profiling-round2.md).
    """
    c_mask = c_oh > 0.5
    occ_p = occ | c_mask
    empty_p = empty & ~c_mask

    # Our full attack map with the pawn placed. The dropped pawn attacks
    # exactly oksq (c is directly south of it), so instead of editing
    # own_kind we OR the king square into our step attacks; the pawn's
    # BLOCKING effect on our own slider rays flows through empty_p.
    own_steps = _step_attacks(own_kind, STEP_ATT0_FLAT)
    own_steps_p = own_steps | (oksq_oh > 0.5)
    own_sliders = _slider_presence(own_kind, SLIDE_OK0)
    own_att_p = own_steps_p | _flood(own_sliders, empty_p)

    # 1. King escape: adjacent square not occupied by a defender piece and
    #    not attacked by us (with the pawn in place).
    adj = (oksq_oh @ jnp.asarray(KING_ADJ_F)) > 0.5  # (81,)
    king_escape = (adj & ~opp & ~own_att_p).any()

    # 2. Capture the pawn with a non-king defender.
    #    Candidate must attack c (occupancy includes the pawn — irrelevant
    #    for reaching c itself since BETWEEN is strict).
    step_to_c = (jnp.asarray(STEP_ATT1_FLAT) @ c_oh).reshape(16, 81) > 0.5
    # opp_kind passed from the caller (identical construction at the
    # legal_mask_pspace top — keeping one source prevents silent divergence)
    cand_step = (opp_kind & step_to_c).any(axis=0)
    aligned_to_c = (jnp.asarray(ALIGNED_P1) @ c_oh)  # (81,) dir f->c, +1 enc
    dir_oh_c = _dir_onehot(aligned_to_c)
    cap_to_c = (kslide1 * dir_oh_c).sum(axis=1) > 0.5
    btw_to_c = (jnp.asarray(BETWEEN_K_FLAT) @ c_oh).reshape(81, 81) > 0.5
    blocked_to_c = (btw_to_c.astype(jnp.float32) @ occ_p.astype(jnp.float32)) > 0.5
    cand_slide = opp & cap_to_c & ~blocked_to_c
    cand = (cand_step | cand_slide) & (kind != TY.KING) & opp

    # After capturing at c (defender moves from t to c): do we still attack
    # the defender's king? Our pieces are untouched; occupancy loses t.
    step_att_on_k = (own_steps.astype(jnp.float32) @ oksq_oh) > 0.5  # scalar
    aligned_to_ok = (jnp.asarray(ALIGNED_P1) @ oksq_oh)  # (81s,) +1 enc
    dir_oh_ok = _dir_onehot(aligned_to_ok)
    own_mask = own_kind.any(axis=0)
    slider_cap_ok = (kslide0 * dir_oh_ok).sum(axis=1) > 0.5
    s_aligned = own_mask & slider_cap_ok  # (81s,) our slider aimed at oksq
    btw_to_ok = (
        jnp.asarray(BETWEEN_K_FLAT) @ oksq_oh
    ).reshape(81, 81) > 0.5  # (81s, 81)
    b0 = (btw_to_ok & occ_p[None, :]).sum(axis=1)  # (81s,) blockers incl. pawn
    # removing candidate t unblocks s iff t was the only blocker
    contains_t = btw_to_ok & occ_p[None, :]  # (81s, 81t) blocker incidence
    clear_after = (b0[:, None] - contains_t.astype(jnp.int32)) == 0  # (81s, 81t)
    slide_att_on_k_t = (s_aligned[:, None] & clear_after).any(axis=0)  # (81t,)
    att_on_k_after = step_att_on_k | slide_att_on_k_t  # (81t,)
    capture_escape = (cand & ~att_on_k_after).any()

    return ~king_escape & ~capture_escape


# ---------------------------------------------------------------------------
# Action decode + apply (absolute space, incremental Zobrist)
# ---------------------------------------------------------------------------


def decode_action(action: jax.Array, stm: jax.Array):
    """Decode a spatial action id into absolute-space move components.

    Returns (is_drop, from_abs, to_abs, promote, drop_piece). Semantics match
    the reference SpatialActionMapper (spatial_action_mapper.rs:136-271).
    """
    sq, slot = action // 139, action % 139
    is_drop = slot >= 132
    is_knight = (slot >= 128) & (slot < 132)

    # slide decode
    s_promote = (slot >= 64) & (slot < 128)
    s_base = jnp.where(s_promote, slot - 64, slot)
    s_dir = jnp.clip(s_base // 8, 0, 7)
    s_dist = s_base % 8  # 0-indexed distance
    slide_dest = jnp.asarray(FROM_RAY_C)[sq, s_dir, s_dist]

    # knight decode
    k = jnp.clip(slot - 128, 0, 3)
    k_lr = k // 2
    k_promote = (k % 2) == 1
    knight_dest = jnp.maximum(jnp.asarray(T.KNIGHT_TO[0])[sq, k_lr], 0)

    p_from = sq
    p_to = jnp.where(is_drop, sq, jnp.where(is_knight, knight_dest, slide_dest))
    promote = jnp.where(is_knight, k_promote, s_promote) & ~is_drop

    flip = stm.astype(jnp.int32) == 1
    from_abs = jnp.where(flip, 80 - p_from, p_from)
    to_abs = jnp.where(flip, 80 - p_to, p_to)
    drop_piece = jnp.clip(slot - 132, 0, 6)
    return is_drop, from_abs, to_abs, promote, drop_piece


def apply_action(state: GameState, action: jax.Array) -> GameState:
    """Apply a (legal) spatial action; branchless, incremental hash.

    Mirrors make_move semantics (game.rs:134-255) minus the attack-map
    recompute (attack state is rebuilt inside legal_mask_pspace).
    """
    stm = state.stm.astype(jnp.int32)
    board, hands = state.board, state.hands
    is_drop, from_abs, to_abs, promote, drop_piece = decode_action(action, state.stm)

    cell = board[from_abs].astype(jnp.int32)  # mover cell (valid for non-drop)
    cell_c = jnp.maximum(cell, 0)
    captured = board[to_abs].astype(jnp.int32)
    cap_valid = ~is_drop & (captured >= 0)
    captured_c = jnp.maximum(captured, 0)
    cap_kind = captured_c & 15
    cap_base = jnp.where(cap_kind >= 8, cap_kind - 8, cap_kind)  # hand piece idx

    placed_move = jnp.where(promote, cell_c + 8, cell_c)
    placed_drop = drop_piece + 16 * stm
    placed = jnp.where(is_drop, placed_drop, placed_move).astype(jnp.int8)

    # board updates (drop: from_abs == to_abs, first write is a no-op)
    b1 = board.at[from_abs].set(jnp.where(is_drop, board[from_abs], jnp.int8(TY.EMPTY)))
    new_board = b1.at[to_abs].set(placed)

    old_cap = hands[stm, cap_base].astype(jnp.int32)
    old_drop = hands[stm, drop_piece].astype(jnp.int32)
    h1 = hands.at[stm, cap_base].add(jnp.where(cap_valid, 1, 0).astype(jnp.int8))
    new_hands = h1.at[stm, drop_piece].add(jnp.where(is_drop, -1, 0).astype(jnp.int8))

    zp = jnp.asarray(Z.Z_PIECE)
    zh = jnp.asarray(Z.Z_HAND)
    zero2 = jnp.zeros(2, dtype=jnp.uint32)
    h = state.hash_
    h = h ^ jnp.where(is_drop, zero2, zp[cell_c, from_abs])
    h = h ^ jnp.where(cap_valid, zp[captured_c, to_abs], zero2)
    h = h ^ zp[placed.astype(jnp.int32), to_abs]
    h = h ^ jnp.where(
        cap_valid, zh[stm, cap_base, old_cap] ^ zh[stm, cap_base, old_cap + 1], zero2
    )
    h = h ^ jnp.where(
        is_drop, zh[stm, drop_piece, old_drop] ^ zh[stm, drop_piece, jnp.maximum(old_drop - 1, 0)], zero2
    )
    h = h ^ jnp.asarray(Z.Z_STM)

    hash_hist = state.hash_hist.at[state.ply].set(state.hash_)
    check_hist = state.check_hist.at[state.ply].set(state.in_check)

    return state.replace(
        board=new_board,
        hands=new_hands,
        stm=(1 - stm).astype(jnp.int8),
        ply=state.ply + 1,
        hash_=h,
        hash_hist=hash_hist,
        check_hist=check_hist,
    )


# ---------------------------------------------------------------------------
# Rules: repetition, impasse, material
# ---------------------------------------------------------------------------


def repetition_info(state: GameState):
    """(count incl. current, perpetual_check flag) for the current position.

    Matches rules.rs:228-274: perpetual iff every PAST occurrence had the
    side-to-move in check (current ply's check status is not consulted).
    """
    H = state.hash_hist.shape[0]
    past = jnp.arange(H) < state.ply
    match = past & (state.hash_hist == state.hash_[None, :]).all(axis=1)
    count = 1 + match.sum()
    perpetual = match.any() & (~match | state.check_hist).all()
    return count, perpetual


def impasse_check(board: jax.Array, hands: jax.Array):
    """CSA 24-point impasse (rules.rs:286-397). Returns (active, winner)."""
    kind = (board & 15).astype(jnp.int32)
    black = (board >= 0) & (board < 16)
    white = board >= 16
    row = jnp.asarray(T.ROW_OF)
    bk_in = (black & (kind == TY.KING) & (row <= 2)).any()
    wk_in = (white & (kind == TY.KING) & (row >= 6)).any()
    cnt_b = (black & (row <= 2)).sum()
    cnt_w = (white & (row >= 6)).sum()
    vals = jnp.asarray(TY.IMPASSE_VALUE)[kind]
    sb = jnp.where(black, vals, 0).sum() + (
        hands[0].astype(jnp.int32) @ jnp.asarray(TY.HAND_IMPASSE_VALUE)
    )
    sw = jnp.where(white, vals, 0).sum() + (
        hands[1].astype(jnp.int32) @ jnp.asarray(TY.HAND_IMPASSE_VALUE)
    )
    active = bk_in & wk_in & (cnt_b >= 10) & (cnt_w >= 10) & ((sb >= 24) | (sw >= 24))
    winner = jnp.where(
        (sb >= 24) & (sw >= 24), jnp.int8(TY.WINNER_NONE), jnp.where(sb >= 24, jnp.int8(0), jnp.int8(1))
    )
    return active, winner


def material_balance(board: jax.Array, hands: jax.Array, perspective: jax.Array) -> jax.Array:
    """Standard-value material balance from `perspective` (rules.rs:406-460)."""
    kind = (board & 15).astype(jnp.int32)
    vals = jnp.asarray(TY.PIECE_VALUE)[kind]
    color = (board >= 16).astype(jnp.int32)
    occ = board >= 0
    sign = jnp.where(color == perspective.astype(jnp.int32), 1, -1)
    bal = jnp.where(occ, vals * sign, 0).sum()
    hv = jnp.asarray(TY.HAND_VALUE)
    p = perspective.astype(jnp.int32)
    bal = bal + hands[p].astype(jnp.int32) @ hv - hands[1 - p].astype(jnp.int32) @ hv
    return bal


# ---------------------------------------------------------------------------
# Observation encoding (perspective space)
# ---------------------------------------------------------------------------


def observe(
    pboard: jax.Array,
    hands: jax.Array,
    stm: jax.Array,
    ply: jax.Array,
    max_ply: int,
    rep_count: jax.Array,
    in_check: jax.Array,
    num_channels: int,
) -> jax.Array:
    """46/50-channel observation (C, 81) float32.

    Channel layout matches the reference exactly (observation.rs:1-13,
    katago_observation.rs:1-8).
    """
    ch_of = jnp.where(pboard >= 0, jnp.asarray(T.OBS_CHANNEL)[pboard.astype(jnp.int32) & 31], -1)
    piece_planes = (ch_of[None, :] == jnp.arange(28)[:, None]).astype(jnp.float32)

    p = stm.astype(jnp.int32)
    hand_max = jnp.asarray(TY.HAND_MAX).astype(jnp.float32)
    own_hand = hands[p].astype(jnp.float32) / hand_max  # (7,)
    opp_hand = hands[1 - p].astype(jnp.float32) / hand_max
    hand_planes = jnp.concatenate([own_hand, opp_hand])[:, None] * jnp.ones((1, 81), jnp.float32)

    indicator = jnp.where(p == 0, 1.0, 0.0) * jnp.ones((1, 81), jnp.float32)
    move_count = jnp.clip(ply.astype(jnp.float32) / max_ply, 0.0, 1.0) * jnp.ones(
        (1, 81), jnp.float32
    )

    base = jnp.concatenate([piece_planes, hand_planes, indicator, move_count], axis=0)  # (44, 81)

    if num_channels == 46:
        extra = jnp.zeros((2, 81), jnp.float32)
    else:
        prior = rep_count - 1
        rep_planes = jnp.stack(
            [
                jnp.where(prior == 1, 1.0, 0.0),
                jnp.where(prior == 2, 1.0, 0.0),
                jnp.where(prior == 3, 1.0, 0.0),
                jnp.where(prior >= 4, 1.0, 0.0),
            ]
        )[:, None] * jnp.ones((1, 81), jnp.float32)
        check_plane = jnp.where(in_check, 1.0, 0.0) * jnp.ones((1, 81), jnp.float32)
        extra = jnp.concatenate([rep_planes, check_plane, jnp.zeros((1, 81), jnp.float32)], axis=0)
    return jnp.concatenate([base, extra], axis=0)


# ---------------------------------------------------------------------------
# Full environment step (single env)
# ---------------------------------------------------------------------------


@struct.dataclass
class StepOutput:
    obs: jax.Array  # (C, 81) f32 — post-reset observation
    legal_mask: jax.Array  # (11259,) bool — post-reset mask
    reward: jax.Array  # () f32 — from last-mover perspective
    terminated: jax.Array  # () bool
    truncated: jax.Array  # () bool
    terminal_obs: jax.Array  # (C, 81) f32 — pre-reset obs (valid when done)
    current_player: jax.Array  # () int8 — post-reset side to move
    captured: jax.Array  # () uint8 — hand-piece index or 255
    term_reason: jax.Array  # () uint8
    ply_count: jax.Array  # () int32 — pre-reset ply
    material: jax.Array  # () int32 — from last-mover perspective


def position_status(s1: GameState, mask1_flat: jax.Array, max_ply: int):
    """(reason, winner, rep_count) for a just-reached position.

    Termination order matches game.rs:460-499: max-ply -> sennichite/
    perpetual -> impasse -> checkmate/stalemate. `winner` is a color or -1;
    perpetual check awards the VICTIM (current side to move).
    """
    last_mover = (1 - s1.stm).astype(jnp.int8)
    rep_count, perpetual = repetition_info(s1)
    imp_active, imp_winner = impasse_check(s1.board, s1.hands)
    no_moves = ~mask1_flat.any()

    reason = jnp.int8(TY.NOT_TERMINATED)
    winner = jnp.int8(TY.WINNER_NONE)
    reason = jnp.where(no_moves, jnp.int8(TY.CHECKMATE), reason)
    winner = jnp.where(no_moves, last_mover, winner)
    reason = jnp.where(imp_active, jnp.int8(TY.IMPASSE), reason)
    winner = jnp.where(imp_active, imp_winner, winner)
    rep_hit = rep_count >= 4
    reason = jnp.where(
        rep_hit,
        jnp.where(perpetual, jnp.int8(TY.PERPETUAL_CHECK), jnp.int8(TY.REPETITION)),
        reason,
    )
    winner = jnp.where(
        rep_hit, jnp.where(perpetual, s1.stm, jnp.int8(TY.WINNER_NONE)), winner
    )
    hit_max = s1.ply >= max_ply
    reason = jnp.where(hit_max, jnp.int8(TY.MAX_MOVES), reason)
    winner = jnp.where(hit_max, jnp.int8(TY.WINNER_NONE), winner)
    return reason, winner, rep_count


def env_step(
    state: GameState,
    action: jax.Array,
    reset_state: GameState,
    reset_obs: jax.Array,
    reset_mask: jax.Array,
    num_channels: int,
) -> tuple[GameState, StepOutput]:
    """One env step: apply, terminate-check, auto-reset.

    Mirrors VecEnv::apply_moves per-env logic (vec_env.rs:337-459): make
    move -> check_termination -> reward/metadata -> terminal obs -> reset.
    """
    max_ply = state.hash_hist.shape[0] - 1
    last_mover = state.stm

    # capture metadata needs the pre-apply board
    is_drop, _, to_abs, _, _ = decode_action(action, state.stm)
    pre_target = state.board[to_abs].astype(jnp.int32)
    cap_kind = pre_target & 15
    cap_base = jnp.where(cap_kind >= 8, cap_kind - 8, cap_kind)
    captured_meta = jnp.where(
        ~is_drop & (pre_target >= 0), cap_base, 255
    ).astype(jnp.uint8)

    s1 = apply_action(state, action)
    pboard1 = perspective_board(s1.board, s1.stm)
    own_hand1 = s1.hands[s1.stm.astype(jnp.int32)]
    mask1, in_check1, _ = legal_mask_pspace(pboard1, own_hand1)
    mask1_flat = mask1.reshape(-1)

    reason, winner, rep_count = position_status(s1, mask1_flat, max_ply)

    truncated = reason == TY.MAX_MOVES
    terminated = (reason != TY.NOT_TERMINATED) & ~truncated
    done = terminated | truncated

    reward = jnp.where(
        winner >= 0, jnp.where(winner == last_mover, 1.0, -1.0), 0.0
    ).astype(jnp.float32)
    material = material_balance(s1.board, s1.hands, last_mover)

    obs1 = observe(
        pboard1, s1.hands, s1.stm, s1.ply, max_ply, rep_count, in_check1, num_channels
    )

    s1 = s1.replace(in_check=in_check1, reason=reason, winner=winner)

    # Auto-reset: select fresh state / constant startpos outputs where done.
    new_state = jax.tree.map(
        lambda fresh, cur: jnp.where(
            jnp.reshape(done, (1,) * cur.ndim), fresh, cur
        ) if cur.ndim > 0 else jnp.where(done, fresh, cur),
        reset_state,
        s1,
    )
    out_obs = jnp.where(done, reset_obs, obs1)
    out_mask = jnp.where(done, reset_mask, mask1_flat)

    return new_state, StepOutput(
        obs=out_obs,
        legal_mask=out_mask,
        reward=reward,
        terminated=terminated,
        truncated=truncated,
        terminal_obs=obs1,
        current_player=new_state.stm,
        captured=captured_meta,
        term_reason=reason.astype(jnp.uint8),
        ply_count=s1.ply,
        material=material,
    )


def initial_outputs(state: GameState, num_channels: int):
    """(obs, legal_mask, in_check) for a freshly-created state."""
    pboard = perspective_board(state.board, state.stm)
    own_hand = state.hands[state.stm.astype(jnp.int32)]
    mask, in_check, _ = legal_mask_pspace(pboard, own_hand)
    rep_count, _ = repetition_info(state)
    max_ply = state.hash_hist.shape[0] - 1
    obs = observe(
        pboard, state.hands, state.stm, state.ply, max_ply, rep_count, in_check, num_channels
    )
    return obs, mask.reshape(-1), in_check
