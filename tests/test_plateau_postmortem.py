"""Plateau post-mortem extraction against a synthetic campaign DB."""

import json
import sqlite3
import sys
from pathlib import Path

import pytest

from keisei_tpu import db as kdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import plateau_postmortem as pm  # noqa: E402


@pytest.fixture()
def campaign(tmp_path):
    p = str(tmp_path / "obs.db")
    kdb.init_db(p)
    db = sqlite3.connect(p)
    # learner snapshots 1..3; entry 9 is a frontier anchor from epoch 0
    db.execute("INSERT INTO league_entries (id, architecture, model_params, "
               "checkpoint_path, created_epoch, role) "
               "VALUES (9, 'se_resnet', '{}', 'league/9/w', 0, "
               "'frontier_static')")
    for eid, epoch in [(1, 1), (2, 100), (3, 200)]:
        db.execute(
            "INSERT INTO league_entries (id, architecture, model_params, "
            "checkpoint_path, created_epoch, role) "
            "VALUES (?, 'se_resnet', '{}', ?, ?, 'recent_fixed')",
            (eid, f"league/{eid}/w", epoch))
    # metrics: policy loss hits its minimum early then hovers above it ->
    # the plateau scheduler must halve the LR every patience+1 epochs
    for epoch in range(1, 301):
        pl = 0.01 if epoch == 10 else 0.02
        ent = 4.0 - epoch * 0.01  # decaying entropy
        db.execute(
            "INSERT INTO metrics (epoch, step, policy_loss, entropy, "
            "episodes_completed, timestamp) VALUES (?, ?, ?, ?, 10, ?)",
            (epoch, epoch * 128, pl, ent,
             f"2026-08-20T{epoch // 60:02d}:{epoch % 60:02d}:00Z"))
    # per-epoch training results: learner (latest snapshot) beats cohort,
    # learner elo climbing past the frontier anchor
    for epoch in range(1, 301, 10):
        learner = 1 if epoch < 100 else (2 if epoch < 200 else 3)
        elo = 1000.0 + epoch
        db.execute(
            "INSERT INTO league_results (epoch, entry_a_id, entry_b_id, "
            "match_type, num_games, wins_a, wins_b, draws, elo_after_a) "
            "VALUES (?, ?, 9, 'training', 10, 9, 0, 1, ?)",
            (epoch, learner, elo))
        for eid in (9, learner):
            db.execute(
                "INSERT INTO elo_history (entry_id, epoch, elo_rating) "
                "VALUES (?, ?, ?)", (eid, epoch, 1050.0 if eid == 9 else elo))
    db.commit()
    db.close()
    return p


def test_replay_lr_halves_on_plateau(campaign):
    metrics = pm.extract_metrics(campaign)
    out = pm.replay_lr(metrics, factor=0.5, patience=50, min_lr=1e-5,
                       lr0=2e-4)
    # min at epoch 10, then 50-epoch patience windows -> reductions at
    # ~61, ~112, ... (bad_epochs resets after each reduction)
    assert len(out["reductions"]) >= 4
    assert out["reductions"][0]["epoch"] == 61
    assert out["final_lr"] < 2e-4 / 8
    assert out["series"][-1]["epoch"] == 300


def test_learner_vs_pool_and_margin(campaign):
    metrics = pm.extract_metrics(campaign)
    rows = pm.learner_vs_pool(campaign)
    assert rows and rows[0]["score"] == 0.95  # 9 + 0.5 of 1 draw over 10
    margins = pm.margin_series(campaign, metrics, rows)
    assert margins, "frontier anchor must produce a margin series"
    last = margins[-1]
    assert last["max_frontier_elo"] == 1050.0
    assert last["margin"] == pytest.approx(last["learner_elo"] - 1050.0)
    # the ceiling signal crosses the reference's 200-Elo alert line
    assert any(m["margin"] >= 200 for m in margins)


def test_main_end_to_end(campaign, tmp_path, capsys):
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        "[training]\nlr_plateau_patience = 50\n"
        "[training.algorithm_params]\nlearning_rate = 2e-4\n")
    out_json = tmp_path / "post.json"
    out_md = tmp_path / "post.md"
    pm.main(["--db", campaign, "--config", str(cfg),
             "--json", str(out_json), "--md", str(out_md)])
    report = json.loads(out_json.read_text())
    names = {s["signal"] for s in report["summaries"]}
    assert {"entropy", "lr", "learner_score_vs_pool",
            "ceiling_margin"} <= names
    ent = [s for s in report["summaries"] if s["signal"] == "entropy"][0]
    assert ent["last"] < ent["first"]  # decay visible in the summary
    assert "LR replay" in out_md.read_text()
