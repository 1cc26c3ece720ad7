"""Tests for scripts/learning_report.py (VERDICT r3 #2 evidence tooling).

The extract/render stages are pure sqlite3 + string work, so they are
fully testable against a synthetic campaign DB; the TPU ladder stage is
exercised structurally (rung selection) without playing matches.
Methodology mirror: keisei/training/evaluate.py:22-57 (Wilson/Elo),
keisei/training/historical_gauntlet.py:21-220 (slot-0 trajectory).
"""

import json
import sqlite3
import xml.etree.ElementTree as ET

import pytest

from keisei_tpu import db as kdb

import scripts.learning_report as lr


# --------------------------------------------------------------------------
# stats helpers

def test_wilson_matches_evaluate_module():
    from keisei_tpu.league.evaluate import wilson_interval

    for p, n in [(0.5, 10), (0.9, 100), (0.1, 7), (1.0, 16), (0.0, 3)]:
        lo, hi = lr.wilson(p, n)
        elo, ehi = wilson_interval(p, n)
        assert lo == pytest.approx(elo, abs=1e-9)
        assert hi == pytest.approx(ehi, abs=1e-9)


def test_wilson_zero_games_is_vacuous():
    assert lr.wilson(0.5, 0) == (0.0, 1.0)


def test_elo_of_known_points():
    assert lr.elo_of(0.5) == pytest.approx(0.0, abs=1e-9)
    # 0.75 score -> ~+191 Elo (-400*log10(1/3) exactly)
    assert lr.elo_of(0.75) == pytest.approx(190.848, abs=1e-2)
    # clamped at the extremes, not infinite
    assert lr.elo_of(1.0) < 1300


def test_score_row_draws_count_half():
    r = lr.score_row(6, 2, 4)
    assert r["games"] == 12
    assert r["score"] == pytest.approx((6 + 0.5 * 4) / 12, abs=1e-4)
    assert r["wilson_low"] < r["score"] < r["wilson_high"]


# --------------------------------------------------------------------------
# synthetic campaign DB

@pytest.fixture()
def campaign_db(tmp_path):
    p = str(tmp_path / "obs.db")
    kdb.init_db(p)
    db = sqlite3.connect(p)
    # 3 direct learner snapshots + 1 clone (clones must NOT count as rungs)
    for eid, epoch, parent in [(1, 1, None), (2, 50, None), (3, 100, None),
                               (4, 60, 2)]:
        db.execute(
            "INSERT INTO league_entries (id, architecture, model_params, "
            "checkpoint_path, created_epoch, parent_entry_id) "
            "VALUES (?, 'se_resnet', '{}', ?, ?, ?)",
            (eid, f"league/{eid}/weights", epoch, parent))
        db.execute(
            "INSERT INTO elo_history (entry_id, epoch, elo_rating) "
            "VALUES (?, ?, ?)", (eid, epoch, 1000.0 + eid))
    # slot-0 gauntlet trajectory: learner (entry 3) vs frozen epoch-1
    # snapshot (entry 1), improving over the campaign
    for epoch, w, losses, d in [(50, 8, 6, 2), (75, 11, 3, 2), (100, 14, 1, 1)]:
        db.execute(
            "INSERT INTO gauntlet_results (epoch, entry_id, historical_slot, "
            "historical_entry_id, wins, losses, draws) "
            "VALUES (?, 3, 0, 1, ?, ?, ?)", (epoch, w, losses, d))
    # a slot-1 self-matchup the pooled series must exclude
    db.execute(
        "INSERT INTO gauntlet_results (epoch, entry_id, historical_slot, "
        "historical_entry_id, wins, losses, draws) "
        "VALUES (100, 3, 1, 3, 8, 8, 0)")
    # campaign metrics
    for epoch in range(1, 101):
        db.execute(
            "INSERT INTO metrics (epoch, step, episodes_completed, timestamp) "
            "VALUES (?, ?, 10, ?)",
            (epoch, epoch * 128, f"2026-08-20T00:{epoch % 60:02d}:00Z"))
    db.execute("INSERT INTO league_results (epoch, entry_a_id, entry_b_id, "
               "match_type, num_games, wins_a, wins_b, draws) "
               "VALUES (50, 2, 1, 'calibration', 4, 3, 1, 0)")
    db.commit()
    db.close()
    return p


def test_extract_slot0_trajectory(campaign_db):
    data = lr.extract(campaign_db)
    slot0 = data["gauntlet_vs_epoch0"]
    assert [r["epoch"] for r in slot0] == [50, 75, 100]
    assert all(r["milestone_epoch"] == 1 for r in slot0)
    # improving trajectory preserved in order
    scores = [r["score"] for r in slot0]
    assert scores == sorted(scores)
    assert slot0[-1]["score"] == pytest.approx((14 + 0.5) / 16, abs=1e-4)


def test_extract_pooled_excludes_self_matchups(campaign_db):
    data = lr.extract(campaign_db)
    pooled = {r["epoch"]: r for r in data["gauntlet_pooled"]}
    # epoch 100 has a 16-game self-matchup that must not dilute the pool
    assert pooled[100]["games"] == 16
    assert pooled[100]["wins"] == 14


def test_extract_campaign_summary(campaign_db):
    c = lr.extract(campaign_db)["campaign"]
    assert c["epochs"] == 100
    assert c["episodes"] == 1000
    assert c["snapshots"] == 3          # clone excluded
    assert c["league_results"] == 1
    assert c["gauntlet_rows"] == 4
    assert c["started"] and c["finished"]


def test_extract_snapshot_elo_carries_caveat(campaign_db):
    data = lr.extract(campaign_db)
    elos = data["snapshot_league_elo"]
    assert [e["entry_id"] for e in elos] == [1, 2, 3]
    assert "non-stationary" in data["snapshot_league_elo_caveat"]


def test_extract_is_readonly(campaign_db):
    before = open(campaign_db, "rb").read()
    lr.extract(campaign_db)
    assert open(campaign_db, "rb").read() == before


# --------------------------------------------------------------------------
# ladder rung selection (no TPU needed)

def test_snapshot_rungs_spacing_and_clone_exclusion(campaign_db, tmp_path):
    league = tmp_path / "league"
    for eid in (1, 2, 3, 4):
        (league / str(eid) / "weights").mkdir(parents=True)
    rungs = lr.snapshot_rungs(campaign_db, str(league), every=40)
    # entries 1 (epoch 1), 2 (epoch 50), 3 (epoch 100); clone 4 excluded
    assert [r["entry_id"] for r in rungs] == [1, 2, 3]


def test_snapshot_rungs_skips_deleted_weights(campaign_db, tmp_path):
    league = tmp_path / "league"
    for eid in (1, 3):
        (league / str(eid) / "weights").mkdir(parents=True)
    rungs = lr.snapshot_rungs(campaign_db, str(league), every=40)
    assert [r["entry_id"] for r in rungs] == [1, 3]


def test_snapshot_rungs_always_includes_latest(campaign_db, tmp_path):
    league = tmp_path / "league"
    for eid in (1, 2, 3):
        (league / str(eid) / "weights").mkdir(parents=True)
    # spacing so large only entry 1 qualifies — final snapshot still appended
    rungs = lr.snapshot_rungs(campaign_db, str(league), every=10_000)
    assert rungs[0]["entry_id"] == 1
    assert rungs[-1]["entry_id"] == 3


def test_snapshot_rungs_empty_league_dir_exits(campaign_db, tmp_path):
    with pytest.raises(SystemExit):
        lr.snapshot_rungs(campaign_db, str(tmp_path / "nowhere"), every=40)


# --------------------------------------------------------------------------
# render

def _full_data(campaign_db):
    data = lr.extract(campaign_db)
    data["ladder"] = [
        {"epoch": 1, "entry_id": 1, "wins": 50, "losses": 10, "draws": 4,
         "games": 64, "score": 0.8125, "wilson_low": 0.70, "wilson_high": 0.89,
         "elo_delta": 255.0},
        {"epoch": 50, "entry_id": 2, "wins": 40, "losses": 20, "draws": 4,
         "games": 64, "score": 0.656, "wilson_low": 0.53, "wilson_high": 0.76,
         "elo_delta": 112.0},
    ]
    data["headline"] = {
        "final_epoch": 100, "vs_epoch": 1, "wins": 200, "losses": 40,
        "draws": 16, "games": 256, "score": 0.8125, "wilson_low": 0.76,
        "wilson_high": 0.86, "elo_delta": 255.0,
        "wilson_separated_from_half": True,
        "temperature": 1.0, "max_ply": 512, "seed": 7,
    }
    return data


def test_render_svg_is_valid_xml_with_both_panels(campaign_db):
    svg = lr.render_svg(_full_data(campaign_db))
    root = ET.fromstring(svg)
    joined = " ".join("".join(t.itertext()) for t
                      in root.iter("{http://www.w3.org/2000/svg}text"))
    assert "Gauntlet score vs frozen epoch-0 snapshot" in joined
    assert "Final model vs every snapshot (ladder)" in joined
    assert "Wilson-separated from 50%" in joined
    # one band polygon + data circles per panel
    assert len(root.findall(".//{http://www.w3.org/2000/svg}polygon")) == 2


def test_render_svg_without_ladder_has_single_panel(campaign_db):
    svg = lr.render_svg(lr.extract(campaign_db))
    root = ET.fromstring(svg)
    joined = " ".join(t.text or "" for t
                      in root.iter("{http://www.w3.org/2000/svg}text"))
    assert "Gauntlet score" in joined
    assert "ladder" not in joined


def test_render_md_sections(campaign_db):
    md = lr.render_md(_full_data(campaign_db))
    assert "## Headline: final vs first" in md
    assert "**Wilson-separated from 50%**" in md
    assert "## Final-model ladder" in md
    assert "| 1 | 81.2% |" in md          # ladder table row
    assert "## Why league Elo is not the chart" in md
    assert "scripts/learning_report.py" in md


def test_main_extract_render_end_to_end(campaign_db, tmp_path):
    j = tmp_path / "out.json"
    svg = tmp_path / "assets" / "chart.svg"
    md = tmp_path / "report.md"
    lr.main(["extract", "render", "--db", campaign_db,
             "--json", str(j), "--svg", str(svg), "--md", str(md)])
    data = json.loads(j.read_text())
    assert data["campaign"]["epochs"] == 100
    ET.fromstring(svg.read_text())
    assert md.read_text().startswith("# Learning efficacy")


def test_main_render_merges_prior_ladder_json(campaign_db, tmp_path):
    """`render` alone must keep ladder results from an earlier `ladder` run."""
    j = tmp_path / "out.json"
    j.write_text(json.dumps(_full_data(campaign_db)))
    svg, md = tmp_path / "c.svg", tmp_path / "r.md"
    lr.main(["render", "--db", campaign_db, "--json", str(j),
             "--svg", str(svg), "--md", str(md)])
    assert "Final-model ladder" in md.read_text()


# --------------------------------------------------------------------------
# resume + aggregation (added after the remote-compile outage: rungs must
# survive a killed run and re-runs must reuse them)

def test_eval_result_from_counts_matches_from_match():
    from keisei_tpu.league.evaluate import EvalResult
    from keisei_tpu.league.match import MatchResult

    m = MatchResult(wins_a=10, wins_b=4, draws=2, games=16, total_plies=999)
    a, b = EvalResult.from_match(m), EvalResult.from_counts(10, 4, 2, 16)
    assert a == b
    assert b.win_rate_a == pytest.approx((10 + 1) / 16)


def test_eval_result_from_counts_zero_games():
    from keisei_tpu.league.evaluate import EvalResult

    r = EvalResult.from_counts(0, 0, 0, 0)
    assert r.win_rate_a == 0.0 and (r.wilson_low, r.wilson_high) == (0.0, 1.0)


def test_render_md_reading_line_lists_separated_rungs(campaign_db):
    data = _full_data(campaign_db)
    md = lr.render_md(data)
    # both rungs qualify: epoch-1 wilson_low 0.70 > 0.5, epoch-50 0.53 > 0.5
    assert "Wilson-separated from parity against 2 of 2 rungs" in md
    assert "(epochs 1, 50)" in md
    # all-separated: the noise-floor caveat is for mixed ladders only
    assert "noise floor" not in md
    assert "still climbing" in md
