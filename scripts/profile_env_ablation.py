"""Env-step ablation: time isolated pieces of the legality/step pipeline.

Ablation variants (each a T-step scan over batched states, returning one
scalar; per-step time via short/long differencing, median of repeats):

  mask_full     perspective + legal_mask_pspace (incl. uchi-fu-zume)
  mask_noufz    legal_mask with the uchi-fu-zume flood disabled
  flood_only    just the two attack floods on the current position
  apply_only    decode+apply+hash, no legality
  obs_only      observation encoding
  rules_only    repetition + impasse + material
  step_full     the complete env_step

Usage: python scripts/profile_env_ablation.py [--n 256] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from keisei_tpu.engine import core as C  # noqa: E402


def scan_time(body, init_carry, t_short, t_long, repeats):
    def make(T):
        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=T)
            # reduce EVERY carry leaf so nothing is dead-code-eliminated
            return sum(
                jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(carry)
            )

        return run

    fs, fl = make(t_short), make(t_long)
    float(fs(init_carry))
    float(fl(init_carry))
    out = []
    for _ in range(repeats):
        t0 = time.time(); float(fs(init_carry)); ts = time.time() - t0
        t0 = time.time(); float(fl(init_carry)); tl = time.time() - t0
        out.append((tl - ts) / (t_long - t_short))
    return statistics.median(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--variants", default="")
    args = p.parse_args()
    N = args.n

    max_ply = 512
    rs = C.init_state(max_ply)
    ro, rm, _ = C.initial_outputs(rs, 50)
    import numpy as np

    ro, rm = np.asarray(ro), np.asarray(rm)

    states = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x), (N,) + np.shape(x)), rs)
    mask0 = jnp.broadcast_to(jnp.asarray(rm), (N, 11259))

    def random_action(mask, seed_arr):
        logits = jnp.where(mask, 0.0, -1e9)
        k = jax.random.fold_in(jax.random.key(0), seed_arr)
        return jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)

    # --- variant bodies (carry = (states, mask, i)) -------------------------
    # Every variant advances `states` via apply_action so its inputs are
    # loop-dependent (else XLA hoists the component out of the scan and we
    # time nothing). Component cost = variant - apply_only. Random (possibly
    # illegal) actions are fine: all ops are shape-static and data-independent.
    vstep = jax.vmap(partial(C.env_step, reset_state=rs, reset_obs=ro, reset_mask=rm, num_channels=50))
    vapply = jax.vmap(C.apply_action)

    def advance(states, mask, i):
        return vapply(states, random_action(mask, i))

    def b_step_full(carry):
        states, mask, i = carry
        a = random_action(mask, i)
        states, out = vstep(states, a)
        return (states, out.legal_mask, i + 1)

    def mask_from(states):
        pboard = jax.vmap(C.perspective_board)(states.board, states.stm)
        own_hand = jax.vmap(lambda h, s: h[s.astype(jnp.int32)])(states.hands, states.stm)
        return pboard, own_hand

    def b_mask_full(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        pboard, own_hand = mask_from(states)
        m, chk, _ = jax.vmap(C.legal_mask_pspace)(pboard, own_hand)
        return (states, m.reshape(N, -1), i + 1)

    def b_flood_only(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        pboard, own_hand = mask_from(states)

        def one(pb):
            opp = pb >= 16
            kind = (pb & 15).astype(jnp.int32)
            kind_eq = kind[None, :] == jnp.asarray(C.KIND_IOTA)[:, None]
            opp_kind = kind_eq & opp[None, :]
            empty = pb < 0
            sliders = C._slider_presence(opp_kind, C.SLIDE_OK1)
            return C._flood(sliders, empty) | C._flood(sliders, ~empty)

        att = jax.vmap(one)(pboard)
        return (states, mask | att.any(axis=1, keepdims=True), i + 1)

    def b_apply_only(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        return (states, mask, i + 1)

    def b_obs_only(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        pboard, _ = mask_from(states)
        obs = jax.vmap(
            lambda pb, h, s, p: C.observe(pb, h, s, p, max_ply, 1, False, 50)
        )(pboard, states.hands, states.stm, states.ply)
        return (states, mask | (obs.sum() < -1), i + 1)

    def b_rules_only(carry):
        states, mask, i = carry
        states = advance(states, mask, i)
        rep, perp = jax.vmap(C.repetition_info)(states)
        imp, w = jax.vmap(C.impasse_check)(states.board, states.hands)
        mat = jax.vmap(C.material_balance)(states.board, states.hands, states.stm)
        return (states, mask | ((rep + mat)[:, None] < -1), i + 1)

    variants = {
        "step_full": b_step_full,
        "mask_full": b_mask_full,
        "flood_only": b_flood_only,
        "apply_only": b_apply_only,
        "obs_only": b_obs_only,
        "rules_only": b_rules_only,
    }
    run_only = [v for v in args.variants.split(",") if v]
    for name, body in variants.items():
        if run_only and name not in run_only:
            continue
        per_step = scan_time(body, (states, mask0, jnp.int32(0)), 2, 10, args.repeats)
        print(json.dumps({
            "variant": name, "N": N,
            "ms_per_step": round(per_step * 1e3, 3),
            "env_steps_per_s": round(N / per_step, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
