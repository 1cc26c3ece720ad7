"""Fine-grained ablation INSIDE legal_mask_pspace: which block burns time.

Each variant computes a subset of the legality pipeline from the evolving
board (states advance via apply_action each step so nothing is hoisted),
and every carry leaf is reduced into the returned scalar so nothing is
dead-code-eliminated.

Variants (cumulative cost = variant - base):
  base          advance only (apply_action)
  checkers      opponent-attack flood + checker detection
  pins          btw_occ matmul + pin mask + pin lines
  board_slots   slots 0-127 (path_clear + promo logic) given dummy allows
  ufz           uchi-fu-zume block alone
  drops         drop mask incl. nifu, given dummy block ray
  full          entire legal_mask_pspace
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from keisei_tpu.engine import core as C  # noqa: E402
from keisei_tpu.engine import tables as T  # noqa: E402
from keisei_tpu.engine import types as TY  # noqa: E402


def scan_time(body, init_carry, t_short, t_long, repeats):
    def make(Tn):
        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=Tn)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(carry))

        return run

    fs, fl = make(t_short), make(t_long)
    float(fs(init_carry)); float(fl(init_carry))
    out = []
    for _ in range(repeats):
        t0 = time.time(); float(fs(init_carry)); ts = time.time() - t0
        t0 = time.time(); float(fl(init_carry)); tl = time.time() - t0
        out.append((tl - ts) / (t_long - t_short))
    return statistics.median(out)


# --- pieces of legal_mask_pspace, lifted for isolation ----------------------


def prelude(pboard):
    own = (pboard >= 0) & (pboard < 16)
    opp = pboard >= 16
    occ = own | opp
    empty = ~occ
    kind = (pboard & 15).astype(jnp.int32)
    kind_eq = kind[None, :] == jnp.asarray(C.KIND_IOTA)[:, None]
    own_kind = kind_eq & own[None, :]
    opp_kind = kind_eq & opp[None, :]
    ksq = jnp.argmax(own & (kind == TY.KING))
    oksq = jnp.argmax(opp & (kind == TY.KING))
    return own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq


def block_checkers(pboard):
    own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq = prelude(pboard)
    opp_steps = C._step_attacks(opp_kind, C.STEP_ATT1_FLAT)
    opp_sliders = C._slider_presence(opp_kind, C.SLIDE_OK1)
    empty_x = empty | (C.SQ_IOTA == ksq)
    opp_att_x = opp_steps | C._flood(opp_sliders, empty_x)
    step_to_k = T.STEP_ATT[:, 1, :, :]
    step_check = (opp_kind & jnp.asarray(step_to_k)[:, :, ksq]).any(axis=0)
    aligned_to_k = jnp.asarray(T.ALIGNED_DIR)[:, ksq]
    btw_to_k = jnp.asarray(T.BETWEEN)[:, ksq, :]
    btw_to_k_blocked = (btw_to_k & occ[None, :]).any(axis=1)
    dir_idx = jnp.where(aligned_to_k >= 0, aligned_to_k, 8)
    slide_cap = jnp.asarray(C.SLIDE_OK1_G)[kind, dir_idx]
    slide_check = opp & slide_cap & ~btw_to_k_blocked
    checkers = step_check | slide_check
    block = (slide_check[:, None] & btw_to_k).any(axis=0)
    return checkers | block | opp_att_x


def block_pins(pboard):
    own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq = prelude(pboard)
    ones81 = jnp.ones(81, dtype=bool)
    d_ks = jnp.asarray(T.ALIGNED_DIR)[ksq, :]
    btw_from_king = jnp.asarray(T.BETWEEN)[ksq, :, :]
    king_to_s_clear = ~(btw_from_king & occ[None, :]).any(axis=1)
    btw_occ = (C.BETWEEN_FLAT @ occ.astype(jnp.float32)).reshape(81, 81) > 0.5
    same_dir = jnp.asarray(T.ALIGNED_DIR) == d_ks[:, None]
    pin_dir_s = jnp.where(d_ks >= 0, (d_ks + 4) % 8, 8)
    slide_t = jnp.asarray(C.SLIDE_OK1_G)[kind]
    pinner_match = slide_t[:, pin_dir_s].T
    pin_t = same_dir & opp[None, :] & pinner_match & ~btw_occ
    pinned = own & (kind != TY.KING) & (d_ks >= 0) & king_to_s_clear & pin_t.any(axis=1)
    line_t = btw_from_king | jnp.eye(81, dtype=bool)
    pin_line = (pin_t.astype(jnp.float32) @ line_t.astype(jnp.float32)) > 0.5
    dest_pin_ok = jnp.where(pinned[:, None], pin_line, ones81[None, :])
    return dest_pin_ok.any(axis=1)


def block_board_slots(pboard):
    own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq = prelude(pboard)
    dest = jnp.asarray(C.FROM_RAY_C)
    valid = jnp.asarray(C.FROM_RAY_VALID)
    empty_at = jnp.where(valid, empty[dest], False)
    blocked_before = jnp.cumsum(~empty_at, axis=-1)
    path_clear = jnp.concatenate(
        [jnp.ones((81, 8, 1), bool), blocked_before[..., :-1] == 0], axis=-1
    )
    move_cap = jnp.asarray(T.MOVE_OK)[kind]
    not_own_dest = jnp.where(valid, ~own[dest], False)
    base = own[:, None, None] & move_cap & valid & path_clear & not_own_dest
    must = jnp.asarray(T.MUST_PROMOTE_AT)[kind[:, None, None], dest]
    canp = jnp.asarray(T.CAN_PROMOTE_KIND)[kind]
    zone_from = jnp.asarray(T.IN_PROMO_ZONE)
    zone_to = jnp.asarray(T.IN_PROMO_ZONE)[dest]
    promo_opt = canp[:, None, None] & (zone_from[:, None, None] | zone_to)
    return (base & ~must).any() | (base & (must | promo_opt)).any()


def block_ufz(pboard):
    own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq = prelude(pboard)
    ufz_sq = jnp.minimum(oksq + 9, 80)
    return C._uchi_fu_zume(own_kind, opp, kind, occ, empty, oksq, ufz_sq)


def block_drops(pboard, own_hand):
    own, opp, occ, empty, kind, own_kind, opp_kind, ksq, oksq = prelude(pboard)
    has_piece = own_hand > 0
    drop_ok = empty[:, None] & has_piece[None, :]
    drop_ok = drop_ok & ~jnp.asarray(T.DEAD_DROP.T)
    pawn_file = own_kind[TY.PAWN].reshape(9, 9).any(axis=0)
    nifu = pawn_file[C.SQ_IOTA % 9]
    return (drop_ok[:, TY.PAWN] & ~nifu).any() | drop_ok.any()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--variants", default="")
    args = p.parse_args()
    N = args.n

    rs = C.init_state(512)
    ro, rm, _ = C.initial_outputs(rs, 50)
    ro, rm = np.asarray(ro), np.asarray(rm)
    states = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x), (N,) + np.shape(x)), rs)
    mask0 = jnp.broadcast_to(jnp.asarray(rm), (N, 11259))
    vapply = jax.vmap(C.apply_action)

    def advance(states, mask, i):
        logits = jnp.where(mask, 0.0, -1e9)
        k = jax.random.fold_in(jax.random.key(0), i)
        a = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
        return vapply(states, a)

    def pb_of(states):
        return jax.vmap(C.perspective_board)(states.board, states.stm)

    def wrap(fn, needs_hand=False):
        def body(carry):
            states, mask, i = carry
            states = advance(states, mask, i)
            pb = pb_of(states)
            if needs_hand:
                oh = jax.vmap(lambda h, s: h[s.astype(jnp.int32)])(states.hands, states.stm)
                out = jax.vmap(fn)(pb, oh)
            else:
                out = jax.vmap(fn)(pb)
            flat = out.reshape(N, -1) if out.ndim > 1 else out.reshape(N, 1)
            return (states, mask | flat.any(axis=1, keepdims=True), i + 1)
        return body

    def body_base(carry):
        states, mask, i = carry
        return (advance(states, mask, i), mask, i + 1)

    def body_full(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        pb = pb_of(states)
        oh = jax.vmap(lambda h, s: h[s.astype(jnp.int32)])(states.hands, states.stm)
        m, chk, _ = jax.vmap(C.legal_mask_pspace)(pb, oh)
        return (states, m.reshape(N, -1), i + 1)

    variants = {
        "base": body_base,
        "checkers": wrap(block_checkers),
        "pins": wrap(block_pins),
        "board_slots": wrap(block_board_slots),
        "ufz": wrap(block_ufz),
        "drops": wrap(block_drops, needs_hand=True),
        "full": body_full,
    }
    only = [v for v in args.variants.split(",") if v]
    for name, body in variants.items():
        if only and name not in only:
            continue
        per = scan_time(body, (states, mask0, jnp.int32(0)), 2, 10, args.repeats)
        print(json.dumps({"variant": name, "N": N, "ms_per_step": round(per * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
