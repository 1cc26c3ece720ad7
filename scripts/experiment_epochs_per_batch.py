#!/usr/bin/env python
"""Strength-per-wall-clock: epochs_per_batch ∈ {2,3,4} (round-4 VERDICT #7).

Steady-state is update-dominated (~80% MFU, so the cost is inherent to
how many minibatch passes PPO makes per rollout batch). This experiment
asks the only question that matters: at a FIXED wall-clock budget on the
learning-campaign config, which epochs_per_batch yields the strongest
final model? Fewer passes per batch = faster epochs = more fresh
self-play data per hour; more passes = more reuse of each batch.

Per arm: run the config (identical but for the knob, same seed -> same
init weights) for --minutes of wall clock, checkpoint the final state,
then evaluate every arm's final model against the SHARED epoch-0
baseline and head-to-head between the extreme arms, 256 games each,
Wilson CIs.

Usage:
  python scripts/experiment_epochs_per_batch.py \
      --config configs/learning-campaign.toml --minutes 20 \
      --out profiles/epochs-per-batch.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(cfg_path: str, epb: int, minutes: float, workdir: str) -> dict:
    import tomllib

    from keisei_tpu.training.config import config_from_dict
    from keisei_tpu.training.loop import SelfPlayTrainer

    with open(cfg_path, "rb") as f:
        raw = tomllib.load(f)
    arm_dir = os.path.join(workdir, f"epb{epb}")
    os.makedirs(arm_dir, exist_ok=True)
    raw.setdefault("training", {})["checkpoint_dir"] = os.path.join(
        arm_dir, "ck/")
    raw["training"].setdefault("algorithm_params", {})[
        "epochs_per_batch"] = epb
    raw.setdefault("display", {})["db_path"] = os.path.join(arm_dir, "obs.db")
    raw.setdefault("league", {}).setdefault("storage", {})["league_dir"] = (
        os.path.join(arm_dir, "league/"))
    cfg = config_from_dict(raw, source=cfg_path)

    trainer = SelfPlayTrainer(cfg)
    # shared baseline: every arm starts from the SAME seed-determined init
    base_path = os.path.abspath(os.path.join(workdir, "baseline"))
    if not os.path.isdir(base_path):
        from keisei_tpu.training.checkpoint import save_checkpoint

        save_checkpoint(
            base_path, trainer.state, epoch=0,
            architecture=cfg.model.architecture, rng_key=trainer.rng,
            extra_meta={"model_params": dict(cfg.model.params)},
        )
    budget = minutes * 60.0
    t0 = time.monotonic()
    epochs = 0
    while time.monotonic() - t0 < budget:
        em = trainer.run_epoch()
        epochs += 1
        if epochs % 25 == 0:
            print(f"  epb={epb}: epoch {epochs} "
                  f"wall={time.monotonic() - t0:.0f}s "
                  f"policy={em.policy_loss:.4f}", flush=True)
    trainer.drain_maintenance()
    final_path = trainer.save(os.path.join(arm_dir, "final"))
    wall = time.monotonic() - t0
    steps = epochs * trainer.T * cfg.training.num_games
    return {
        "epochs_per_batch": epb,
        "epochs": epochs,
        "wall_s": round(wall, 1),
        "env_steps": steps,
        "steps_per_s": round(steps / wall, 1),
        "final_checkpoint": os.path.abspath(final_path),
        "baseline_checkpoint": base_path,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/learning-campaign.toml")
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--arms", default="2,3,4")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--workdir", default="/tmp/epb-experiment")
    ap.add_argument("--out", default="profiles/epochs-per-batch.json")
    args = ap.parse_args()

    from keisei_tpu.utils.cache import ensure_compile_cache

    ensure_compile_cache()

    arms = [int(a) for a in args.arms.split(",")]
    os.makedirs(args.workdir, exist_ok=True)
    results = []
    for epb in arms:
        print(f"=== arm epochs_per_batch={epb} ({args.minutes} min)",
              flush=True)
        results.append(run_arm(args.config, epb, args.minutes, args.workdir))
        # incremental artifact: a killed experiment keeps finished arms
        with open(args.out, "w") as f:
            json.dump({"minutes_per_arm": args.minutes,
                       "config": args.config, "arms": results}, f, indent=1)

    from keisei_tpu.league.evaluate import run_evaluation

    evals = []
    for r in results:
        ev = run_evaluation(r["final_checkpoint"], r["baseline_checkpoint"],
                            games=args.games, seed=11)
        evals.append({
            "match": f"epb{r['epochs_per_batch']}-final vs epoch-0",
            "score": round(ev.win_rate_a, 4), "wins": ev.wins_a,
            "losses": ev.wins_b, "draws": ev.draws,
            "wilson_low": round(ev.wilson_low, 4),
            "wilson_high": round(ev.wilson_high, 4),
            "elo_delta": round(ev.elo_delta, 1),
        })
        print(json.dumps(evals[-1]), flush=True)
    if len(results) >= 2:
        a, b = results[0], results[-1]
        ev = run_evaluation(a["final_checkpoint"], b["final_checkpoint"],
                            games=args.games, seed=13)
        evals.append({
            "match": (f"epb{a['epochs_per_batch']}-final vs "
                      f"epb{b['epochs_per_batch']}-final"),
            "score": round(ev.win_rate_a, 4), "wins": ev.wins_a,
            "losses": ev.wins_b, "draws": ev.draws,
            "wilson_low": round(ev.wilson_low, 4),
            "wilson_high": round(ev.wilson_high, 4),
            "elo_delta": round(ev.elo_delta, 1),
        })
        print(json.dumps(evals[-1]), flush=True)

    with open(args.out, "w") as f:
        json.dump({"minutes_per_arm": args.minutes, "config": args.config,
                   "games_per_eval": args.games,
                   "arms": results, "evals": evals}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
