"""Seed a demo observability DB for dashboard development / UI review.

Populates every table family the WebUI renders: metrics, game snapshots,
training_state, league entries + elo history + transitions + head-to-head +
style profiles, and a finished showcase game with per-move heatmaps so the
board overlay, win-prob graph, and commentary panel have data.

Usage: python scripts/seed_demo_db.py [path.db]
"""

from __future__ import annotations

import json
import math
import random
import sys

# make the repo root importable when run as scripts/<name>.py
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from keisei_tpu.db import core as db_core
from keisei_tpu.db import init_db


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/keisei-demo.db"
    rng = random.Random(7)
    init_db(path)

    # --- metrics ---
    for epoch in range(1, 121):
        t = epoch / 120
        db_core.write_row(path, "metrics", {
            "epoch": epoch, "step": epoch * 128,
            "policy_loss": 2.2 * math.exp(-2.5 * t) + rng.uniform(0, 0.05),
            "value_loss": 1.0 * math.exp(-2 * t) + rng.uniform(0, 0.04),
            "entropy": 6.5 * math.exp(-1.2 * t) + 0.8,
            "win_rate": min(0.9, 0.3 + 0.5 * t) + rng.uniform(-0.03, 0.03),
            "loss_rate": max(0.05, 0.6 - 0.5 * t) + rng.uniform(-0.03, 0.03),
            "black_win_rate": 0.52 + rng.uniform(-0.04, 0.04),
            "white_win_rate": 0.43 + rng.uniform(-0.04, 0.04),
            "draw_rate": 0.05 + rng.uniform(-0.02, 0.02),
            "truncation_rate": 0.1 * math.exp(-t) + rng.uniform(0, 0.02),
            "avg_episode_length": 140 + 60 * t + rng.uniform(-8, 8),
            "gradient_norm": 1.5 * math.exp(-t) + rng.uniform(0, 0.2),
            "episodes_completed": int(400 + rng.uniform(-40, 40)),
        })

    # --- training_state ---
    db_core.execute(
        path,
        "INSERT OR REPLACE INTO training_state (id, config_json, display_name, "
        "model_arch, algorithm_name, started_at, current_epoch, current_step, "
        "checkpoint_path, total_epochs, status, phase, learner_entry_id) "
        "VALUES (1, '{}', 'b40c256 flagship', 'se_resnet', 'katago_ppo', "
        "'2026-08-16T08:00:00Z', 120, 15360, '', 200, 'running', 'rollout', 1)",
    )

    # --- a plausible opening position (startpos after 2 plies) ---
    def startpos_board():
        order = ["lance", "knight", "silver", "gold", "king", "gold", "silver",
                 "knight", "lance"]
        board = [None] * 81
        for c, k in enumerate(order):
            board[c] = {"type": k, "color": "white", "promoted": False,
                        "row": 0, "col": c}
            board[72 + c] = {"type": k, "color": "black", "promoted": False,
                             "row": 8, "col": c}
        board[9 + 1] = {"type": "rook", "color": "white", "promoted": False,
                        "row": 1, "col": 1}
        board[9 + 7] = {"type": "bishop", "color": "white", "promoted": False,
                        "row": 1, "col": 7}
        board[63 + 7] = {"type": "rook", "color": "black", "promoted": False,
                         "row": 7, "col": 7}
        board[63 + 1] = {"type": "bishop", "color": "black", "promoted": False,
                         "row": 7, "col": 1}
        for c in range(9):
            board[18 + c] = {"type": "pawn", "color": "white", "promoted": False,
                             "row": 2, "col": c}
            board[54 + c] = {"type": "pawn", "color": "black", "promoted": False,
                             "row": 6, "col": c}
        return board

    hands = {"black": {"pawn": 2, "silver": 1}, "white": {"pawn": 1}}
    board = startpos_board()
    for gid in range(1, 7):
        db_core.write_row(path, "game_snapshots", {
            "game_id": gid, "board_json": json.dumps(board),
            "hands_json": json.dumps(hands if gid % 2 else {"black": {}, "white": {}}),
            "current_player": "black" if gid % 2 else "white",
            "ply": 20 + gid * 13, "is_over": 0, "result": "in_progress",
            "sfen": "lnsgkgsnl/1r5b1/ppppppppp/9/9/9/PPPPPPPPP/1B5R1/LNSGKGSNL b - 1",
            "in_check": int(gid == 3), "value_estimate": rng.uniform(-0.4, 0.4),
            "move_history_json": json.dumps(["7g7f", "3c3d"]),
            "game_type": "training" if gid < 6 else "demo",
        })

    # --- league: 8 entries across roles ---
    names = ["Aurora Blade", "Quiet Storm", "Iron Tempo", "Paper Crane",
             "Night Harbor", "Ember Line", "Salt Meridian", "Glass Anchor"]
    roles = ["frontier_static", "frontier_static", "dynamic", "dynamic",
             "dynamic", "recent_fixed", "recent_fixed", "dynamic"]
    for i, (nm, role) in enumerate(zip(names, roles), start=1):
        elo = 1000 + i * 35 + rng.uniform(-20, 20)
        db_core.write_row(path, "league_entries", {
            "display_name": nm, "architecture": "se_resnet",
            "model_params": json.dumps({"num_blocks": 40, "channels": 256}),
            "checkpoint_path": f"/tmp/league/{i}", "elo_rating": elo,
            "created_epoch": i * 12, "games_played": 40 + i * 9,
            "role": role, "status": "active",
            "parent_entry_id": max(1, i - 2) if i > 2 else None,
            "lineage_group": f"L{(i % 3) + 1}",
            "flavour_facts": json.dumps(
                ["prefers early rook lifts", "castles late but solidly"]),
            "elo_frontier": elo + rng.uniform(-30, 30),
            "elo_dynamic": elo + rng.uniform(-30, 30),
            "elo_recent": elo + rng.uniform(-30, 30),
            "elo_historical": 1000.0,
            "games_vs_frontier": 10 + i, "games_vs_dynamic": 20 + i,
            "games_vs_recent": 10, "update_count": i * 3,
        })
        for ep in range(i * 12, 121, 6):
            db_core.write_row(path, "elo_history", {
                "entry_id": i, "epoch": ep,
                "elo_rating": 1000 + (elo - 1000) * (ep / 120) + rng.uniform(-12, 12),
            })

    for a in range(1, 9):
        for b in range(a + 1, 9):
            g = rng.randint(4, 30)
            wa = rng.randint(0, g)
            d = rng.randint(0, g - wa)
            db_core.write_row(path, "head_to_head", {
                "entry_a_id": a, "entry_b_id": b, "wins_a": wa,
                "wins_b": g - wa - d, "draws": d, "games": g, "last_epoch": 120,
            })

    # recorded match results (feeds RecentMatches + the W-L-D / Win% columns)
    for epoch in range(96, 121, 6):
        for _ in range(3):
            a, b = rng.sample(range(1, 9), 2)
            g = rng.randint(2, 8)
            wa = rng.randint(0, g)
            d = rng.randint(0, g - wa)
            db_core.write_row(path, "league_results", {
                "epoch": epoch, "entry_a_id": a, "entry_b_id": b,
                "match_type": rng.choice(["tournament", "challenge", "gauntlet"]),
                "role_a": roles[a - 1], "role_b": roles[b - 1],
                "num_games": g, "wins_a": wa, "wins_b": g - wa - d, "draws": d,
                "elo_before_a": 1100, "elo_after_a": 1100 + (wa - (g - wa - d)) * 4,
                "elo_before_b": 1100, "elo_after_b": 1100 - (wa - (g - wa - d)) * 4,
            })

    for i, style in [(1, "Sharp tactical opener"), (3, "Drop-heavy scrapper"),
                     (5, "Patient positional grinder")]:
        db_core.write_row(path, "style_profiles", {
            "checkpoint_id": i, "primary_style": style,
            "recomputed_at": "2026-08-16T10:00:00Z",
            "profile_status": "complete", "games_sampled": 64,
            "commentary_json": json.dumps(
                ["Opens aggressively and trades into won endgames."]),
        })

    for i in range(2, 6):
        db_core.write_row(path, "league_transitions", {
            "entry_id": i, "from_role": "recent_fixed", "to_role": "dynamic",
            "from_status": "active", "to_status": "active",
            "reason": "promoted on review: 62% win rate over 24 games",
        })

    # --- historical milestones + gauntlet + tournament round stats ---
    # (feeds renderTournamentPanel: milestone table + last-gauntlet column)
    for slot, (target_ep, entry_id) in enumerate(
            [(1, 1), (12, 2), (36, 4), (72, 6), (108, 8)]):
        db_core.execute(
            path,
            "INSERT OR REPLACE INTO historical_library (slot_index, "
            "target_epoch, entry_id, actual_epoch, selected_at, selection_mode) "
            "VALUES (?, ?, ?, ?, '2026-08-16T09:00:00Z', 'snap')",
            (slot, target_ep, entry_id, entry_id * 12),
        )
        for ep in (60, 120):
            w = rng.randint(8, 14)
            loss = rng.randint(1, 16 - w)
            db_core.write_row(path, "gauntlet_results", {
                "epoch": ep, "entry_id": 1, "historical_slot": slot,
                "historical_entry_id": entry_id, "wins": w, "losses": loss,
                "draws": 16 - w - loss, "elo_before": 1150.0,
                "elo_after": 1150.0 + (w - loss) * 2.5,
            })
    db_core.execute(
        path,
        "INSERT OR REPLACE INTO tournament_stats (id, round_duration_s, "
        "pairings_requested, pairings_completed, total_games, total_plies, "
        "active_slots, model_load_time_s, model_load_count, games_per_min) "
        "VALUES (1, 48.5, 12, 12, 96, 14200, 8, 3.2, 6, 119.0)",
    )

    # --- showcase: one completed game with heatmaps ---
    qid = db_core.write_row(path, "showcase_queue", {
        "entry_id_1": "1", "entry_id_2": "3", "speed": "normal",
        "status": "running", "requested_at": "2026-08-16T10:00:00Z",
    })
    db_core.write_row(path, "showcase_queue", {
        "entry_id_1": "2", "entry_id_2": "5", "speed": "fast",
        "status": "pending", "requested_at": "2026-08-16T10:05:00Z",
    })
    gid = db_core.write_row(path, "showcase_games", {
        "queue_id": qid, "entry_id_black": "1", "entry_id_white": "3",
        "elo_black": 1180.0, "elo_white": 1105.0,
        "name_black": "Aurora Blade", "name_white": "Iron Tempo",
        "started_at": "2026-08-16T10:00:01Z", "status": "in_progress",
    })
    usis = ["7g7f", "3c3d", "8h2b+", "3a2b", "B*4e", "5a6b", "4e3d", "2b3c"]
    v = 0.05
    for ply, usi in enumerate(usis, start=1):
        mover = "black" if ply % 2 else "white"
        v = max(-0.9, min(0.9, v + rng.uniform(-0.1, 0.25 if mover == "black" else -0.05)))
        heat = {usi: 0.55, "2g2f": 0.2, "6i7h": 0.12}
        heat = {u: p for u, p in heat.items()}
        db_core.write_row(path, "showcase_moves", {
            "game_id": gid, "ply": ply, "action_index": 100 + ply,
            "usi_notation": usi, "move_usi": usi,
            "board_json": json.dumps(board), "hands_json": json.dumps(hands),
            # production rows store the side to move AFTER the move (the
            # runner writes the post-step spectator dict's current_player);
            # lib.js moverOf() derives the mover as its opposite
            "current_player": "white" if mover == "black" else "black",
            "in_check": int(ply == 7),
            "value_estimate": v if mover == "black" else -v,
            "top_candidates": json.dumps(sorted(heat.items(), key=lambda kv: -kv[1])),
            "move_heatmap_json": json.dumps(heat),
            "move_time_ms": rng.randint(200, 900),
            "created_at": "2026-08-16T10:00:02Z",
        })
    db_core.execute(
        path,
        "INSERT OR REPLACE INTO showcase_heartbeat (id, last_heartbeat, runner_pid) "
        "VALUES (1, strftime('%Y-%m-%dT%H:%M:%SZ','now'), 4242)",
    )
    print(f"seeded {path}")


if __name__ == "__main__":
    main()
