#!/usr/bin/env python
"""Plateau post-mortem: why did the learner stop getting stronger?

Round-4 VERDICT #1(b): the learning campaign's ladder flattens after
epoch ~300-400 and nothing in the repo says which control flatlined. This
script extracts every plateau-relevant trajectory from a campaign DB and
states which signals moved:

  entropy      per-epoch policy entropy (metrics table) — collapse means
               deterministic self-play and a thinning experience stream
  lr           the learning-rate trajectory, REPLAYED from the policy-loss
               series through the exact PlateauScheduler semantics
               (training/loop.py:48-67) with the campaign config's
               factor/patience/min_lr — the DB does not store LR (the
               metrics schema is the reference UI contract), but the
               replay is exact because the scheduler is deterministic in
               the recorded monitor series
  margin       learner Elo minus max-Frontier Elo per epoch (Elo-ceiling
               signal; alert semantics reference tournament.py:163-190)
  winrate      learner score vs its training cohort per epoch — if the
               learner beats the pool at ~100%, gradient signal from
               league play has thinned regardless of Elo bookkeeping
  pool         tier composition over time (transitions-reconstructed)

Usage:
  python scripts/plateau_postmortem.py --db data/learning-campaign/obs.db \
      --config configs/learning-campaign.toml \
      [--json profiles/plateau-postmortem.json] \
      [--md docs/plateau-postmortem.md]
"""

from __future__ import annotations

import argparse
import bisect
import json
import os
import sqlite3
import sys
import tomllib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(db_path: str, sql: str, args=()) -> list[dict]:
    conn = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    conn.row_factory = sqlite3.Row
    try:
        return [dict(r) for r in conn.execute(sql, args)]
    finally:
        conn.close()


# --------------------------------------------------------------------------


def extract_metrics(db_path: str) -> list[dict]:
    return fetch(db_path, "SELECT epoch, policy_loss, value_loss, entropy, "
                          "timestamp FROM metrics ORDER BY epoch")


def replay_lr(metrics: list[dict], factor: float, patience: int,
              min_lr: float, lr0: float) -> dict:
    """Deterministic replay of PlateauScheduler (training/loop.py:48-67)
    over the recorded policy-loss monitor series."""
    best = float("inf")
    bad = 0
    lr = lr0
    series = []
    reductions = []
    for row in metrics:
        v = row["policy_loss"]
        if v is None:
            series.append({"epoch": row["epoch"], "lr": lr})
            continue
        if v < best:
            best, bad = v, 0
        else:
            bad += 1
            if bad > patience:
                bad = 0
                new = max(lr * factor, min_lr)
                if new != lr:
                    reductions.append({"epoch": row["epoch"], "from": lr,
                                       "to": new})
                lr = new
        series.append({"epoch": row["epoch"], "lr": lr})
    floor_epoch = next((s["epoch"] for s in series if s["lr"] <= min_lr), None)
    return {"series": series, "reductions": reductions,
            "min_lr_reached_at_epoch": floor_epoch,
            "final_lr": lr, "initial_lr": lr0}


def learner_vs_pool(db_path: str) -> list[dict]:
    """Per-epoch learner training results: identity, Elo after, score."""
    rows = fetch(db_path, """
        SELECT epoch, entry_a_id, SUM(wins_a) w, SUM(wins_b) l,
               SUM(draws) d, MAX(elo_after_a) elo
        FROM league_results WHERE match_type = 'training'
        GROUP BY epoch ORDER BY epoch""")
    out = []
    for r in rows:
        n = r["w"] + r["l"] + r["d"]
        out.append({
            "epoch": r["epoch"], "learner_id": r["entry_a_id"],
            "learner_elo": r["elo"],
            "score": round((r["w"] + 0.5 * r["d"]) / n, 4) if n else None,
            "games": n,
        })
    return out


def role_timelines(db_path: str, metrics: list[dict]) -> dict[int, list]:
    """entry_id -> [(epoch, role)] chronological, from league_transitions
    (timestamps mapped to epochs via the metrics clock) plus each entry's
    creation role at its created_epoch."""
    clock = [(m["timestamp"], m["epoch"]) for m in metrics if m["timestamp"]]
    clock.sort()
    stamps = [c[0] for c in clock]

    def to_epoch(ts: str) -> int:
        i = bisect.bisect_right(stamps, ts)
        return clock[i - 1][1] if i else 0

    entries = fetch(db_path, "SELECT id, role, created_epoch, created_at "
                             "FROM league_entries")
    timelines: dict[int, list] = {}
    trans = fetch(db_path, "SELECT entry_id, to_role, created_at "
                           "FROM league_transitions ORDER BY id")
    first_transition_at: dict[int, str] = {}
    for t in trans:
        if t["to_role"]:
            timelines.setdefault(t["entry_id"], []).append(
                (to_epoch(t["created_at"]), t["to_role"]))
            first_transition_at.setdefault(t["entry_id"], t["created_at"])
    for e in entries:
        tl = timelines.setdefault(e["id"], [])
        # creation role anchors the timeline when no transition recorded it
        if not tl or tl[0][0] > e["created_epoch"]:
            tl.insert(0, (e["created_epoch"], e["role"] if not tl else tl[0][1]))
    for tl in timelines.values():
        tl.sort()
    return timelines


def role_at(timelines: dict[int, list], entry_id: int, epoch: int):
    tl = timelines.get(entry_id) or []
    role = None
    for ep, r in tl:
        if ep <= epoch:
            role = r
        else:
            break
    return role


def margin_series(db_path: str, metrics: list[dict],
                  learner_rows: list[dict]) -> list[dict]:
    """Learner Elo minus max Frontier Elo per epoch (the ceiling signal)."""
    timelines = role_timelines(db_path, metrics)
    elo_hist = fetch(db_path, "SELECT entry_id, epoch, elo_rating "
                              "FROM elo_history ORDER BY epoch")
    by_epoch: dict[int, dict[int, float]] = {}
    for r in elo_hist:
        by_epoch.setdefault(r["epoch"], {})[r["entry_id"]] = r["elo_rating"]
    out = []
    for lr_row in learner_rows:
        e = lr_row["epoch"]
        elos = by_epoch.get(e)
        if not elos or lr_row["learner_elo"] is None:
            continue
        frontier = [v for eid, v in elos.items()
                    if eid != lr_row["learner_id"]
                    and role_at(timelines, eid, e) == "frontier_static"]
        if not frontier:
            continue
        out.append({
            "epoch": e,
            "learner_elo": round(lr_row["learner_elo"], 1),
            "max_frontier_elo": round(max(frontier), 1),
            "margin": round(lr_row["learner_elo"] - max(frontier), 1),
        })
    return out


def pool_composition(db_path: str, metrics: list[dict],
                     every: int = 50) -> list[dict]:
    """ACTIVE pool by role over time: retirement is a STATUS transition
    (role stays), so exclude entries whose latest status change at or
    before the sample epoch is non-active."""
    clock = [(m["timestamp"], m["epoch"]) for m in metrics if m["timestamp"]]
    clock.sort()
    stamps = [c[0] for c in clock]

    def to_epoch(ts: str) -> int:
        i = bisect.bisect_right(stamps, ts)
        return clock[i - 1][1] if i else 0

    timelines = role_timelines(db_path, metrics)
    status_tl: dict[int, list] = {}
    for t in fetch(db_path, "SELECT entry_id, to_status, created_at "
                            "FROM league_transitions ORDER BY id"):
        if t["to_status"]:
            status_tl.setdefault(t["entry_id"], []).append(
                (to_epoch(t["created_at"]), t["to_status"]))
    entries = fetch(db_path, "SELECT id, created_epoch, status "
                             "FROM league_entries")
    max_epoch = metrics[-1]["epoch"] if metrics else 0
    out = []
    for e in range(0, max_epoch + 1, every):
        counts: dict[str, int] = {}
        for row in entries:
            if row["created_epoch"] > e:
                continue
            status = "active"
            for ep, st in status_tl.get(row["id"], []):
                if ep <= e:
                    status = st
                else:
                    break
            if status != "active":
                continue
            role = role_at(timelines, row["id"], e)
            if role in (None, "retired", "unassigned"):
                continue
            counts[role] = counts.get(role, 0) + 1
        out.append({"epoch": e, **counts})
    return out


def _summarize_pooled_score(rows: list[dict]) -> dict:
    """Learner-vs-pool score by campaign third, POOLING game counts —
    late epochs complete only 2-3 games each (games lengthen as play
    improves), so an unweighted per-epoch mean is dominated by tiny
    samples."""
    if not rows:
        return {"signal": "learner_score_vs_pool", "n": 0}

    def pooled(chunk):
        g = sum(r["games"] for r in chunk if r["games"])
        if not g:
            return None
        s = sum(r["score"] * r["games"] for r in chunk
                if r["score"] is not None and r["games"])
        return round(s / g, 4)

    third = max(1, len(rows) // 3)
    return {"signal": "learner_score_vs_pool",
            "n": sum(r["games"] for r in rows if r["games"]),
            "first": pooled(rows[:third]),
            "mid": pooled(rows[third:2 * third]),
            "last": pooled(rows[2 * third:])}


def summarize(name: str, series: list[float], k: int = 100) -> dict:
    if not series:
        return {"signal": name, "n": 0}
    head = series[:k]
    mid = series[len(series) // 2 - k // 2: len(series) // 2 + k // 2] or head
    tail = series[-k:]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    return {"signal": name, "n": len(series),
            "first": round(mean(head), 4), "mid": round(mean(mid), 4),
            "last": round(mean(tail), 4)}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="data/learning-campaign/obs.db")
    ap.add_argument("--config", default="configs/learning-campaign.toml")
    ap.add_argument("--json", default="profiles/plateau-postmortem.json")
    ap.add_argument("--md", default=None,
                    help="optional markdown report path")
    args = ap.parse_args(argv)

    with open(args.config, "rb") as f:
        raw = tomllib.load(f)
    tc = raw.get("training", {})
    ap_cfg = tc.get("algorithm_params", {})
    factor = tc.get("lr_plateau_factor", 0.5)
    patience = tc.get("lr_plateau_patience", 50)
    min_lr = tc.get("lr_min", 1e-5)
    lr0 = ap_cfg.get("learning_rate", 2e-4)

    metrics = extract_metrics(args.db)
    lr = replay_lr(metrics, factor, patience, min_lr, lr0)
    learner_rows = learner_vs_pool(args.db)
    margins = margin_series(args.db, metrics, learner_rows)
    pool = pool_composition(args.db, metrics)

    report = {
        "db": args.db,
        "config": args.config,
        "epochs": metrics[-1]["epoch"] if metrics else 0,
        "summaries": [
            summarize("entropy", [m["entropy"] for m in metrics
                                  if m["entropy"] is not None]),
            summarize("lr", [s["lr"] for s in lr["series"]]),
            _summarize_pooled_score(learner_rows),
            summarize("ceiling_margin", [m["margin"] for m in margins]),
        ],
        "lr_replay": {k: v for k, v in lr.items() if k != "series"},
        "lr_series_every50": [s for s in lr["series"] if s["epoch"] % 50 == 0],
        "entropy_every50": [
            {"epoch": m["epoch"], "entropy": m["entropy"]}
            for m in metrics if m["epoch"] % 50 == 0],
        "winrate_every50": [r for r in learner_rows if r["epoch"] % 50 == 0],
        "margin_every50": [m for m in margins if m["epoch"] % 50 == 0],
        "pool_composition": pool,
    }
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"summaries": report["summaries"],
                      "lr_replay": report["lr_replay"]}, indent=1))
    print(f"wrote {args.json}")

    if args.md:
        lines = [
            "# Plateau post-mortem (auto-extracted)\n",
            f"Campaign: `{args.db}`, {report['epochs']} epochs. "
            f"Regenerate: `python scripts/plateau_postmortem.py "
            f"--db {args.db} --config {args.config} --md {args.md}`\n",
            "| signal | first | mid | last |",
            "|---|---|---|---|",
        ]
        for s in report["summaries"]:
            if s.get("n"):
                lines.append(f"| {s['signal']} (n={s['n']}) | {s['first']} "
                             f"| {s['mid']} | {s['last']} |")
        lines.append("")
        lr_r = report["lr_replay"]
        lines.append(
            f"LR replay: {len(lr['reductions'])} reductions, floor "
            f"{min_lr} reached at epoch {lr_r['min_lr_reached_at_epoch']} "
            f"(initial {lr_r['initial_lr']}, final {lr_r['final_lr']}).")
        with open(args.md, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.md}")


if __name__ == "__main__":
    main()
