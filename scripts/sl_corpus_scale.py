#!/usr/bin/env python
"""SL pipeline at corpus scale (VERDICT r2 #7): prepare -> train -> curve.

Drives the full supervised pipeline end-to-end on a multi-thousand-game CSA
corpus (see scripts/generate_sl_corpus.py) and commits the evidence the
reference never produced for its own SL path (keisei/sl/prepare.py:110-116
shipped a placeholder encoder; keisei/sl/trainer.py:125-191 never saw real
data):

  1. parse+filter+encode the corpus with the REAL batched encoder,
     reporting positions/s,
  2. train the flagship architecture with a held-out split, logging a
     policy top-1/top-5 + value accuracy curve per epoch,
  3. plot the curve (docs/assets/), write profiles/sl-corpus-scale.json,
  4. optionally (--transition) save the SL checkpoint and resume the RL
     SelfPlayTrainer from it at flagship, running one PPO epoch — the
     sl_to_rl contract (training/transition.py:25-64) exercised at scale.

Usage:
  python scripts/sl_corpus_scale.py --corpus /tmp/sl-corpus
      [--config configs/katago-league.toml] [--epochs 8] [--batch 1024]
      [--transition] [--out profiles/sl-corpus-scale]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# categorical palette (dataviz reference instance, light mode)
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
INK, INK2, GRID = "#1a1a19", "#66655c", "#e3e2da"


def plot_curves(rows: list[dict], path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [r["epoch"] for r in rows]
    fig, (ax, ax2) = plt.subplots(
        1, 2, figsize=(9.6, 3.6), dpi=150, layout="constrained")
    fig.patch.set_facecolor("white")

    series = [("policy_top5", "policy top-5", ORANGE),
              ("policy_top1", "policy top-1", BLUE),
              ("value_acc", "value (W/D/L)", AQUA)]
    for key, label, color in series:
        ys = [r[key] for r in rows]
        ax.plot(epochs, ys, color=color, linewidth=2, label=label)
        ax.annotate(f" {ys[-1]:.1%}", (epochs[-1], ys[-1]), color=color,
                    fontsize=8, va="center")
    ax.set_title("Held-out accuracy vs epoch", fontsize=10, color=INK,
                 loc="left")
    ax.set_ylim(0, 1)
    ax.legend(frameon=False, fontsize=8, loc="lower right", labelcolor=INK)

    ax2.plot(epochs, [r["policy_nll"] for r in rows], color=BLUE, linewidth=2)
    ax2.axhline(np.log(11259), color=INK2, linewidth=1, linestyle=":")
    ax2.annotate("uniform over action space", (epochs[0], np.log(11259)),
                 color=INK2, fontsize=7.5, va="bottom")
    ax2.set_title("Held-out policy NLL vs epoch", fontsize=10, color=INK,
                  loc="left")
    ax2.set_ylim(0, None)

    for a in (ax, ax2):
        a.set_xlabel("epoch", fontsize=8.5, color=INK2)
        a.tick_params(labelsize=8, colors=INK2)
        for side in ("top", "right"):
            a.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            a.spines[side].set_color(GRID)
        a.grid(axis="y", color=GRID, linewidth=0.6)
        a.set_axisbelow(True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    print(f"curve plot -> {path}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/sl-corpus")
    ap.add_argument("--shards", default="/tmp/sl-shards")
    ap.add_argument("--config", default="configs/katago-league.toml")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-frac", type=float, default=0.05)
    ap.add_argument("--min-ply", type=int, default=40)
    ap.add_argument("--skip-prepare", action="store_true",
                    help="reuse existing shards in --shards")
    ap.add_argument("--transition", action="store_true",
                    help="after training, resume the flagship RL trainer "
                         "from the SL checkpoint and run one PPO epoch")
    ap.add_argument("--workdir", default="/tmp/sl-transition")
    ap.add_argument("--out", default="profiles/sl-corpus-scale")
    ap.add_argument("--plot", default="docs/assets/sl-accuracy-curve.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from keisei_tpu.utils.platform import force_cpu

        force_cpu()

    import logging

    logging.basicConfig(level=logging.INFO)

    from keisei_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    report: dict = {"corpus": args.corpus, "config": args.config}
    meta_path = os.path.join(args.corpus, "corpus_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            report["corpus_meta"] = json.load(f)

    # ---- 1. prepare: parse + filter + batched encode ----
    from keisei_tpu.sl.prepare import prepare_sl_data

    if not args.skip_prepare:
        t0 = time.perf_counter()
        summary = prepare_sl_data([args.corpus], args.shards,
                                  min_ply=args.min_ply)
        dt = time.perf_counter() - t0
        report["prepare"] = {
            **summary,
            "wall_s": round(dt, 1),
            "positions_per_s": round(summary["positions"] / dt, 1),
        }
        print(json.dumps(report["prepare"], indent=1), flush=True)

    # ---- 2. train with a held-out split ----
    import tomllib

    from keisei_tpu.sl.dataset import SLDataset
    from keisei_tpu.sl.trainer import SLConfig, SLTrainer

    with open(args.config, "rb") as f:
        model_cfg = tomllib.load(f)["model"]
    arch, params = model_cfg["architecture"], model_cfg["params"]

    ds = SLDataset(args.shards)
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(ds))
    n_eval = max(int(len(ds) * args.eval_frac), args.batch)
    eval_idx, train_idx = perm[:n_eval], perm[n_eval:]
    report["dataset"] = {"positions": len(ds), "train": len(train_idx),
                         "eval": len(eval_idx), "arch": arch,
                         "batch": args.batch, "lr": args.lr}
    print(json.dumps(report["dataset"], indent=1), flush=True)

    cfg = SLConfig(learning_rate=args.lr, batch_size=args.batch,
                   epochs=args.epochs, seed=0)
    tr = SLTrainer(cfg, arch, params, ds, train_indices=train_idx)

    curve: list[dict] = []
    m0 = tr.evaluate(eval_idx)
    curve.append({"epoch": 0, "train_s": 0.0, **m0})
    print(f"epoch 0 (untrained): top1={m0['policy_top1']:.4f} "
          f"top5={m0['policy_top5']:.4f} nll={m0['policy_nll']:.3f} "
          f"value={m0['value_acc']:.4f}", flush=True)
    for e in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        losses = tr.train_epoch()
        train_s = time.perf_counter() - t0
        m = tr.evaluate(eval_idx)
        curve.append({"epoch": e, "train_s": round(train_s, 2),
                      "train_positions_per_s": round(
                          losses["batches"] * args.batch / train_s, 1),
                      **{k: round(v, 5) for k, v in losses.items()},
                      **m})
        print(f"epoch {e}: top1={m['policy_top1']:.4f} "
              f"top5={m['policy_top5']:.4f} nll={m['policy_nll']:.3f} "
              f"value={m['value_acc']:.4f} score_mse={m['score_mse']:.4f} "
              f"({train_s:.1f}s, "
              f"{curve[-1]['train_positions_per_s']:,.0f} pos/s)", flush=True)
    report["curve"] = curve
    plot_curves(curve, args.plot)

    # ---- 3. sl_to_rl at flagship ----
    if args.transition:
        from keisei_tpu.training.config import config_from_dict
        from keisei_tpu.training.loop import SelfPlayTrainer

        with open(args.config, "rb") as f:
            raw = tomllib.load(f)
        os.makedirs(args.workdir, exist_ok=True)
        ckpt_dir = os.path.join(args.workdir, "ck/")
        raw.setdefault("training", {})["checkpoint_dir"] = ckpt_dir
        raw.setdefault("display", {})["db_path"] = os.path.join(
            args.workdir, "obs.db")
        raw.setdefault("league", {}).setdefault("storage", {})[
            "league_dir"] = os.path.join(args.workdir, "league/")
        rl_cfg = config_from_dict(raw, source=args.config)

        # the sl_to_rl contract, post-training half (transition.py:53-64):
        # save phase="sl" checkpoint, resume RL from it explicitly
        os.makedirs(ckpt_dir, exist_ok=True)
        sl_path = tr.save(os.path.join(ckpt_dir, "sl_final"))
        t0 = time.perf_counter()
        rl = SelfPlayTrainer(rl_cfg, resume_from=sl_path)
        em = rl.run_epoch()
        rl.drain_maintenance()
        report["transition"] = {
            "sl_checkpoint": sl_path,
            "resumed_epoch": em.epoch,
            "rollout_s": round(em.rollout_time, 2),
            "update_s": round(em.update_time, 2),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(report["transition"], indent=1), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.out}.json", flush=True)


if __name__ == "__main__":
    main()
