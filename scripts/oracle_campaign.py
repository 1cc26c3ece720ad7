#!/usr/bin/env python
"""Deep oracle-vs-JAX equivalence campaign with a rare-rule census.

VERDICT r2 #2: >=1,000 full-length (max_ply 512) playouts plus biased
starts (handicaps, drop-heavy) and scripted rare-rule scenarios, every ply
asserting full legal-mask + hash + termination equivalence between the
scalar oracle and the jitted device engine. The committed artifact
(profiles/oracle-campaign.json + docs/oracle-equivalence.md) reports how
often each rare rule fired; the acceptance bar is >=50 firings per rule
with ZERO divergence.

Runs on the CPU backend (the engines are platform-independent; the chip
stays free for training measurements). Parallelized over processes.

Usage: python scripts/oracle_campaign.py [--playouts 1000] [--max-ply 512]
           [--workers N] [--out profiles/oracle-campaign]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_STEPPERS: dict = {}


def _init_worker():
    from keisei_tpu.utils.platform import force_cpu

    force_cpu()


def _stepper(max_ply: int):
    from keisei_tpu.engine import equiv as E

    if max_ply not in _STEPPERS:
        _STEPPERS[max_ply] = E.make_stepper(max_ply)
    return _STEPPERS[max_ply]


def run_random_chunk(kind: str, seeds: list[int], max_ply: int) -> dict:
    """A batch of random playouts from one start family."""
    import numpy as np

    from keisei_tpu.engine import equiv as E

    census = E.Census()
    failures = []
    stepper = _stepper(max_ply)
    handicap_names = sorted(E.HANDICAPS)
    for seed in seeds:
        rng = np.random.default_rng(seed)
        try:
            if kind == "standard":
                E.drive_equivalence(None, None, 0, max_ply, E.random_policy,
                                    census, stepper=stepper, rng=rng,
                                    name=f"std:{seed}")
            elif kind == "handicap":
                nm = handicap_names[seed % len(handicap_names)]
                board = E.handicap_board(E.HANDICAPS[nm])
                E.drive_equivalence(board, None, 0, max_ply, E.random_policy,
                                    census, stepper=stepper, rng=rng,
                                    name=f"handicap[{nm}]:{seed}")
            else:  # drop_heavy
                board, hands = E.drop_heavy_position()
                E.drive_equivalence(board, hands, 0, max_ply,
                                    E.random_policy, census, stepper=stepper,
                                    rng=rng, name=f"drop:{seed}")
        except Exception:
            failures.append(traceback.format_exc(limit=4))
    return {"census": census.as_dict(), "failures": failures}


def run_scenario_chunk(group: str) -> dict:
    from keisei_tpu.engine import equiv as E
    from keisei_tpu.engine import types as TY

    census = E.Census()
    failures = []

    def drive(sc, max_ply=64):
        mp = sc.get("max_ply", max_ply)
        try:
            E.drive_equivalence(
                sc["board"], sc["hands"], sc["stm"], mp, sc["policy"],
                census, stepper=_stepper(mp),
                expected_reason=sc["expected_reason"],
                expected_winner=sc["expected_winner"], name=sc["name"],
            )
        except Exception:
            failures.append(traceback.format_exc(limit=4))

    if group == "perpetual":
        for c in (2, 3, 4, 5):
            for kind in (TY.ROOK, TY.ROOK + 8):
                for flipped in (False, True):
                    for bk in range(9):
                        if bk in (c - 1, c, c + 1, c + 2):
                            continue
                        drive(E.perpetual_scenario(c, kind, flipped, bk))
    elif group == "sennichite":
        pairs = [(1, 4), (1, 5), (1, 6), (2, 5), (2, 6), (3, 6),
                 (4, 1), (5, 1), (5, 2), (6, 1), (6, 2), (6, 3)]
        for bcol, wcol in pairs:
            for kind in (TY.GOLD, TY.PAWN + 8, TY.SILVER + 8, TY.ROOK):
                for flipped in (False, True):
                    drive(E.sennichite_scenario(bcol, wcol, kind, flipped))
    elif group == "impasse":
        win_pairs = ([(24 + i, 23 - (i % 4)) for i in range(10)]
                     + [(23 - (i % 4), 24 + i) for i in range(10)])
        draw_pairs = [(24, 24), (25, 25), (30, 30)]
        none_pairs = [(23, 23), (22, 23), (18, 18)]
        for v in range(3):
            for b, w in win_pairs + draw_pairs + none_pairs:
                drive(E.impasse_scenario(v, b, w))
    elif group == "uchifuzume":
        for col in (2, 3, 4, 5, 6):
            for prot in ("knight", "psilver"):
                for flipped in (False, True):
                    for ek in (TY.GOLD, TY.PAWN + 8, TY.SILVER + 8):
                        for broken in (None, "edge_cover", "protection"):
                            b, h, s, a, exc = E.uchifuzume_fixture(
                                col, prot, flipped, broken, edge_kind=ek)
                            try:
                                E.check_uchifuzume_fixture(
                                    b, h, s, a, exc, census,
                                    name=f"{col},{prot},{flipped},{broken},{ek}")
                            except Exception:
                                failures.append(traceback.format_exc(limit=4))
    return {"census": census.as_dict(), "failures": failures}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--playouts", type=int, default=1000)
    ap.add_argument("--max-ply", type=int, default=512)
    ap.add_argument("--workers", type=int,
                    default=max(2, min(8, (os.cpu_count() or 4) - 2)))
    ap.add_argument("--out", default="profiles/oracle-campaign")
    args = ap.parse_args()

    _init_worker()
    from keisei_tpu.engine import equiv as E

    t0 = time.monotonic()
    total = E.Census()
    failures: list[str] = []

    # playout mix: 40% standard, 30% handicap ladder, 30% drop-heavy
    n_std = args.playouts * 4 // 10
    n_hc = args.playouts * 3 // 10
    n_dh = args.playouts - n_std - n_hc
    jobs = []
    chunk = 10
    for kind, n, base in (("standard", n_std, 10_000),
                          ("handicap", n_hc, 20_000),
                          ("drop_heavy", n_dh, 30_000)):
        seeds = [base + i for i in range(n)]
        jobs += [("random", kind, seeds[i:i + chunk], args.max_ply)
                 for i in range(0, len(seeds), chunk)]
    jobs += [("scenario", g) for g in
             ("perpetual", "sennichite", "impasse", "uchifuzume")]

    with ProcessPoolExecutor(max_workers=args.workers,
                             initializer=_init_worker) as ex:
        futs = []
        for job in jobs:
            if job[0] == "random":
                futs.append(ex.submit(run_random_chunk, job[1], job[2], job[3]))
            else:
                futs.append(ex.submit(run_scenario_chunk, job[1]))
        done = 0
        for fut in futs:
            res = fut.result()
            c = E.Census()
            for k, v in res["census"].items():
                setattr(c, k, v)
            total.add(c)
            failures += res["failures"]
            done += 1
            if done % 10 == 0 or done == len(futs):
                print(f"[{done}/{len(futs)}] plies={total.plies} "
                      f"playouts={total.playouts} failures={len(failures)}",
                      flush=True)

    wall = time.monotonic() - t0
    report = {
        "playouts_requested": args.playouts,
        "max_ply": args.max_ply,
        "wall_s": round(wall, 1),
        "workers": args.workers,
        "divergences": len(failures),
        "census": total.as_dict(),
        "acceptance": {
            "perpetual_check_wins>=50": total.perpetual_check_wins >= 50,
            "repetition_draws>=50": total.repetition_draws >= 50,
            "impasse_wins>=50": total.impasse_wins >= 50,
            "uchifuzume_exclusions>=50": total.uchifuzume_exclusions >= 50,
            "forced_promotion_positions>=50":
                total.forced_promotion_positions >= 50,
            "zero_divergence": not failures,
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=1)
    if failures:
        with open(args.out + "-failures.txt", "w") as f:
            f.write("\n\n".join(failures))
        print(f"{len(failures)} DIVERGENCES — see {args.out}-failures.txt")
    print(json.dumps(report["acceptance"], indent=1))
    print(json.dumps(report["census"], indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
