"""Perf regression gate: pin the engine/rollout hot-path numbers.

The reference guards its engine with 4 Criterion microbenchmarks
(shogi-engine/crates/shogi-core/benches/movegen.rs:4-46) that fail review
when they regress. This is the TPU-side equivalent: a one-command gate that
re-measures the hot kernels on the real chip and compares them against the
committed floors in profiles/perf_floors.json.

Benchmarks (all full-rules, b40c256 flagship shapes):
  mask       legal_mask_pspace per step, N=1024  (the engine hot kernel;
             analogue of Criterion `legal_moves_opening`)
  step       complete env_step per step, N=1024  (analogue of
             `make_unmake_cycle` + `attack_map_from_scratch`)
  headline   self-play rollout env-steps/s, N=1024 (bench.py program)
  league     compact split-merge league rollout env-steps/s (--full only;
             compiles a second large program)
  tournament compiled pooled tournament round with full rollout collection,
             b10c128 8 pairings (--full only; the league/concurrent.py path
             training pairings ride since round 4)

Usage:
  python scripts/perf_gate.py            # gate mask/step/headline
  python scripts/perf_gate.py --full     # also gate the league rollout
  python scripts/perf_gate.py --record   # re-measure and rewrite the floors
                                         # (12% margin) — run on a quiet chip
                                         # after an intentional perf change

Process: run before committing anything that touches engine/, env/, models/,
or training/rollout*; a FAIL means the change regressed a pinned kernel past
the noise margin and needs a fix or an explicit floor update (--record) with
justification in the commit message. ci_local.sh does not run this (CI has
no TPU); it is the documented manual gate.

Timing methodology matches bench.py: jitted scan, short/long differencing,
median of repeats (tunnel-safe; ~2% run-to-run).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from keisei_tpu.utils.cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from keisei_tpu.engine import core as C  # noqa: E402

FLOORS_PATH = Path(__file__).resolve().parent.parent / "profiles" / "perf_floors.json"
N = 1024
T_SHORT, T_LONG, REPEATS = 2, 10, 3
RECORD_MARGIN = 0.12  # floors are set 12% below / ceilings 12% above measure


def scan_time(body, init_carry):
    """Median per-step seconds of `body` via short/long scan differencing."""

    def make(T):
        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry, None, length=T)
            return sum(
                jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(carry)
            )

        return run

    fs, fl = make(T_SHORT), make(T_LONG)
    float(fs(init_carry))
    float(fl(init_carry))
    out = []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); float(fs(init_carry)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fl(init_carry)); tl = time.perf_counter() - t0
        out.append((tl - ts) / (T_LONG - T_SHORT))
    return statistics.median(out)


def engine_benches():
    """mask + step per-step milliseconds at N envs."""
    max_ply = 512
    rs = C.init_state(max_ply)
    ro, rm, _ = C.initial_outputs(rs, 50)
    ro, rm = np.asarray(ro), np.asarray(rm)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (N,) + np.shape(x)), rs
    )
    mask0 = jnp.broadcast_to(jnp.asarray(rm), (N, 11259))

    def random_action(mask, i):
        logits = jnp.where(mask, 0.0, -1e9)
        k = jax.random.fold_in(jax.random.key(0), i)
        return jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)

    vstep = jax.vmap(
        partial(C.env_step, reset_state=rs, reset_obs=ro, reset_mask=rm, num_channels=50)
    )
    vapply = jax.vmap(C.apply_action)

    def b_mask(carry):
        states, mask, i = carry
        states = vapply(states, random_action(mask, i))
        pboard = jax.vmap(C.perspective_board)(states.board, states.stm)
        own_hand = jax.vmap(lambda h, s: h[s.astype(jnp.int32)])(states.hands, states.stm)
        m, _, _ = jax.vmap(C.legal_mask_pspace)(pboard, own_hand)
        return (states, m.reshape(N, -1), i + 1)

    def b_step(carry):
        states, mask, i = carry
        states, out = vstep(states, random_action(mask, i))
        return (states, out.legal_mask, i + 1)

    carry0 = (states, mask0, jnp.int32(0))
    return {
        "mask_ms": scan_time(b_mask, carry0) * 1e3,
        "step_ms": scan_time(b_step, carry0) * 1e3,
    }


def rollout_benches(full: bool):
    import bench

    out = {}
    for league in ([False, True] if full else [False]):
        argv = ["--num-envs", str(N)] + (["--league"] if league else [])
        # bench.main prints the JSON line; capture it
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main(argv)
        val = json.loads(buf.getvalue().strip().splitlines()[-1])["value"]
        out["league_steps_s" if league else "headline_steps_s"] = val
    return out


def tournament_bench():
    """Compiled pooled tournament round, b10c128 8 pairings (P=4, E=16) with
    full rollout collection — gates the league/concurrent.py path that
    round-4 moved training pairings onto (docs/profiling-round4.md §2)."""
    from keisei_tpu.league.concurrent import ConcurrentMatchPool
    from keisei_tpu.models.registry import build_model

    model, _ = build_model("se_resnet", {"num_blocks": 10, "channels": 128})
    variables = [
        jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            model.init(jax.random.key(i), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False),
        )
        for i in range(9)
    ]
    pairs = [(variables[i], variables[i + 1]) for i in range(8)]
    pool = ConcurrentMatchPool(model, parallel_matches=4, envs_per_match=16)
    chunks = [pairs[:4], pairs[4:]]
    pool.run_round(chunks[0], seed=0, collect=True)  # compile
    t0 = time.perf_counter()
    for ci, chunk in enumerate(chunks):
        results, _, _ = pool.run_round(chunk, seed=ci + 1, collect=True)
    return {"pooled_round_b10c128_ms": (time.perf_counter() - t0) * 1000.0}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true", help="also gate the league rollout")
    p.add_argument("--record", action="store_true",
                   help="rewrite profiles/perf_floors.json from fresh measures")
    args = p.parse_args()

    measures = {}
    measures.update(engine_benches())
    measures.update(rollout_benches(args.full))
    if args.full:
        measures.update(tournament_bench())

    if args.record:
        floors = {}
        for k, v in measures.items():
            bound = "ceiling" if k.endswith("_ms") else "floor"
            lim = v * (1 + RECORD_MARGIN) if bound == "ceiling" else v * (1 - RECORD_MARGIN)
            # per-benchmark metadata: the pooled-round pin is total ms for
            # a 2-chunk round at 4x16 envs, not a per-step time at N envs
            # (ADVICE r4 — hardcoded unit/n_envs mislabeled it)
            if k == "pooled_round_b10c128_ms":
                unit, n_envs = "ms/round", 4 * 16
            elif k.endswith("_ms"):
                unit, n_envs = "ms/step", N
            else:
                unit, n_envs = "env_steps/s", N
            floors[k] = {
                bound: round(lim, 1),
                "measured": round(v, 1),
                "unit": unit,
                "n_envs": n_envs,
                "recorded": time.strftime("%Y-%m-%d"),
            }
        if FLOORS_PATH.exists():
            old = json.loads(FLOORS_PATH.read_text())
            for k, v in old.items():
                if k not in floors:
                    floors[k] = v  # keep every un-remeasured pin
                    # (e.g. league_steps_s without --full, and the
                    # N=256 matched-batch pins recorded by
                    # scripts/profile_league_scaling.py)
        FLOORS_PATH.write_text(json.dumps(floors, indent=2) + "\n")
        print(f"recorded {len(floors)} pins -> {FLOORS_PATH}")
        for k, v in measures.items():
            print(f"  {k}: {v:.1f}")
        return 0

    if not FLOORS_PATH.exists():
        print(f"no {FLOORS_PATH}; run with --record first", file=sys.stderr)
        return 2
    floors = json.loads(FLOORS_PATH.read_text())
    fail = 0
    for k, v in measures.items():
        pin = floors.get(k)
        if pin is None:
            print(f"[----] {k}: {v:.1f} (no pin)")
            continue
        if "ceiling" in pin:
            ok = v <= pin["ceiling"]
            rel = f"{v:.2f} ms vs ceiling {pin['ceiling']} ms"
        else:
            ok = v >= pin["floor"]
            rel = f"{v:.0f} vs floor {pin['floor']}"
        print(f"[{'PASS' if ok else 'FAIL'}] {k}: {rel} "
              f"(pinned {pin['measured']} on {pin['recorded']})")
        fail |= not ok
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
