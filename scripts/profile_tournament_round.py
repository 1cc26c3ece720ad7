#!/usr/bin/env python
"""Tournament-round cost: sequential per-pairing runner vs pooled chunks.

The round-4 amortized campaign (profiles/amortized-flagship.json) showed
tournament maintenance dominating wall clock: 12,571 s across 24 rounds
(~524 s/round) against a 13.9 s steady training epoch. The round's cost
splits into (a) sequential per-pairing match play for TRAINING pairings —
the reference's shape (keisei/training/tournament.py:352-467 plays one
pairing at a time; concurrent_matches.py pools only what it can) — and
(b) the dynamic trainer's rollout host fetch through the axon tunnel.

This script measures, per architecture, on the live chip:
  1. sequential pairing  (make_match_runner, N=tournament_num_envs,
     collect=True) — the old training-pairing path
  2. pooled round        (ConcurrentMatchPool, P x E, collect in
     {False, "light", True}) — the new path where training pairings ride
     the vmapped stacked-weights batch
  3. the dynamic-trainer record_rollout fetch for each, isolating the
     device->host transfer cost the compact fetch format removes

Writes profiles/tournament-round.json.

Usage:
  python scripts/profile_tournament_round.py [--arch b10c128]
      [--pairings 8] [--parallel 4] [--envs-per-match 16] [--seq-envs 64]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from keisei_tpu.utils.cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


ARCHS = {
    "mlp": ("mlp", {"hidden_sizes": [64]}),
    "b10c128": ("se_resnet", {"num_blocks": 10, "channels": 128}),
    "b40c256": ("se_resnet", {"num_blocks": 40, "channels": 256}),
}


def block(x):
    jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
                 else a, x)
    return x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="b10c128", choices=sorted(ARCHS))
    ap.add_argument("--pairings", type=int, default=8)
    ap.add_argument("--parallel", type=int, default=4)
    ap.add_argument("--envs-per-match", type=int, default=16)
    ap.add_argument("--seq-envs", type=int, default=64)
    ap.add_argument("--max-ply", type=int, default=512)
    ap.add_argument("--out", default="profiles/tournament-round.json")
    args = ap.parse_args()

    from keisei_tpu.league.concurrent import ConcurrentMatchPool
    from keisei_tpu.league.match import make_match_runner
    from keisei_tpu.models.registry import build_model

    name, params = ARCHS[args.arch]
    model, _ = build_model(name, params)
    n_vars = args.pairings + 1
    variables = [
        jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            model.init(jax.random.key(i), jnp.zeros((1, 50, 9, 9), jnp.float32),
                       train=False),
        )
        for i in range(n_vars)
    ]
    pairs = [(variables[i], variables[i + 1]) for i in range(args.pairings)]
    report: dict = {
        "arch": args.arch, "pairings": args.pairings,
        "parallel_matches": args.parallel, "envs_per_match": args.envs_per_match,
        "seq_envs": args.seq_envs, "max_ply": args.max_ply,
    }

    # -- sequential per-pairing (the old training-pairing path) ---------------
    runner = make_match_runner(model, model, num_games=args.seq_envs,
                               max_ply=args.max_ply)
    _res, _ro = runner(*pairs[0], seed=0, collect=True)  # compile
    block(_res)
    t0 = time.perf_counter()
    result, rollout = runner(*pairs[0], seed=1, collect=True)
    block(result)
    seq_play_s = time.perf_counter() - t0
    report["sequential_pairing_play_s"] = round(seq_play_s, 3)
    report["sequential_round_play_s_extrapolated"] = round(
        seq_play_s * args.pairings, 1)

    # host fetch cost for the trainer intake (both sides of one pairing)
    from keisei_tpu.league.dynamic_trainer import DynamicTrainer
    from keisei_tpu.league.config import DynamicConfig

    class _Store:  # record_rollout never touches the store
        db_path = None

    trainer = DynamicTrainer(_Store(), model, DynamicConfig())
    t0 = time.perf_counter()
    trainer.record_rollout(1, rollout, "a")
    trainer.record_rollout(2, rollout, "b")
    report["trainer_fetch_both_sides_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()  # warm path: fixed-cap shapes, chain compiled
    trainer.record_rollout(1, rollout, "a")
    trainer.record_rollout(2, rollout, "b")
    report["trainer_fetch_both_sides_warm_s"] = round(
        time.perf_counter() - t0, 3)
    buf = trainer._buffers.get(1)
    if buf:
        rows = buf[-1]["obs"].shape[0]
        report["trainer_fetch_rows"] = int(rows)
        report["trainer_fetch_bytes_host"] = int(
            sum(a.nbytes for a in buf[-1].values()))
    del rollout, trainer

    # -- pooled chunks (the new path) ----------------------------------------
    pool = ConcurrentMatchPool(model, parallel_matches=args.parallel,
                               envs_per_match=args.envs_per_match,
                               max_ply=args.max_ply)
    n_chunks = math.ceil(args.pairings / args.parallel)
    for mode, label in ((False, "none"), ("light", "light"), (True, "full")):
        chunks = [pairs[i:i + args.parallel]
                  for i in range(0, args.pairings, args.parallel)]
        out = pool.run_round(chunks[0], seed=0, collect=mode)  # compile
        block(out[0])
        t0 = time.perf_counter()
        games = plies = 0
        for ci, chunk in enumerate(chunks):
            out = pool.run_round(chunk, seed=ci + 1, collect=mode)
            results = out[0]
            block(results)
            games += sum(r.games for r in results)
            plies += sum(r.total_plies for r in results)
        dt = time.perf_counter() - t0
        report[f"pooled_round_{label}_s"] = round(dt, 3)
        report[f"pooled_round_{label}_games"] = games
        report[f"pooled_round_{label}_chunks"] = n_chunks
    if report.get("pooled_round_full_s"):
        report["speedup_vs_sequential_round"] = round(
            report["sequential_round_play_s_extrapolated"]
            / report["pooled_round_full_s"], 2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
