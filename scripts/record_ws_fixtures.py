"""Record WS payload fixtures for the dashboard DOM self-test.

Seeds the deterministic demo DB (scripts/seed_demo_db.py), then assembles
one message per server->client type using the SAME db read helpers and
key layout as `WebServer._poll_and_push` / `_poll_showcase`
(keisei_tpu/server/app.py:216-480), validates every message against
protocol_spec.validate_message, and writes the bundle to
keisei_tpu/server/static/selftest-fixtures.json.

The bundle is consumed two ways (reference bar: a colocated vitest per
store/lib, webui/package.json:10-18):
- selftest.html replays the messages through app.js's dispatch() in a real
  browser and asserts each view renders (DOM-level regression harness);
- tests/test_ui_dom_contract.py validates the committed bundle against the
  protocol spec and app.js's dispatch wiring in CI (no JS runtime here).

Usage: python scripts/record_ws_fixtures.py [--db path.db]
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from keisei_tpu import db
from keisei_tpu.db import showcase as sc
from keisei_tpu.server import protocol_spec

STATIC_DIR = pathlib.Path(__file__).resolve().parent.parent / \
    "keisei_tpu" / "server" / "static"


def build_messages(path: str) -> list[dict]:
    """One message per SERVER_MESSAGES type, from the seeded DB."""
    metrics = db.read_metrics_tail(path, 2000)
    games = db.read_game_snapshots(path)
    state = db.read_training_state(path)
    league = db.read_league_data(path)
    elo_hist = db.read_elo_history(path, max_epochs=500)
    t_stats = db.read_tournament_stats(path)
    styles = db.read_style_profiles(path)
    h2h = db.read_head_to_head(path)
    game = sc.read_active_showcase_game(path) or sc.read_latest_showcase_game(path)
    moves = sc.read_showcase_moves_since(path, game["id"], 0) if game else []
    queue = sc.read_queue(path)

    # init: exact key set of app.py:234-253
    init = {
        "type": "init",
        "games": games,
        "metrics": metrics,
        "training_state": state,
        "league_entries": league["entries"],
        "league_results": league["results"],
        "historical_library": league["historical_library"],
        "gauntlet_results": league["gauntlet_results"],
        "transitions": league["transitions"],
        "elo_history": elo_hist,
        "tournament_stats": t_stats,
        "style_profiles": styles,
        "head_to_head": h2h,
        # init carries everything EXCEPT the showcase game so that the
        # showcase_update replay exercises the new-game path in dispatch()
        "showcase": {"game": None, "moves": [], "queue": queue,
                     "sidecar_alive": True},
    }

    # incremental updates, shaped per app.py:276-345 and :433-480
    metrics_update = {"type": "metrics_update", "rows": metrics[-3:]}
    game_update = {"type": "game_update", "snapshots": games[:2]}
    training_status = {
        "type": "training_status",
        "status": (state or {}).get("status"),
        "phase": (state or {}).get("phase", ""),
        "heartbeat_at": (state or {}).get("heartbeat_at"),
        "epoch": (state or {}).get("current_epoch"),
        "step": (state or {}).get("current_step"),
        "episodes": 48000,
        "config_json": (state or {}).get("config_json"),
        "display_name": (state or {}).get("display_name"),
        "model_arch": (state or {}).get("model_arch"),
        "total_epochs": (state or {}).get("total_epochs"),
        "system_stats": {"cpu_percent": 12.5, "mem_percent": 31.0,
                         "accel_util": 88.0},
        "learner_entry_id": (state or {}).get("learner_entry_id"),
    }
    league_update = {
        "type": "league_update",
        "entries": league["entries"],
        "results": league["results"],
        "historical_library": league["historical_library"],
        "gauntlet_results": league["gauntlet_results"],
        "transitions": league["transitions"],
        "elo_history": elo_hist,
        "tournament_stats": t_stats,
        "head_to_head": h2h,
        "style_profiles": styles,
    }
    showcase_status = {"type": "showcase_status", "queue": queue,
                       "active_game_id": game["id"] if game else None,
                       "sidecar_alive": True}
    # split the move list so the second update exercises freshMoves dedup
    showcase_update_1 = {"type": "showcase_update", "game": game,
                         "new_moves": moves[: max(1, len(moves) // 2)]}
    showcase_update_2 = {"type": "showcase_update", "game": game,
                         "new_moves": moves}
    msgs = [
        init, metrics_update, game_update, training_status, league_update,
        showcase_status, showcase_update_1, showcase_update_2,
        {"type": "showcase_match_queued", "entry_id_1": 1, "entry_id_2": 2,
         "speed": "normal"},
        {"type": "showcase_speed_changed", "queue_id": 1, "speed": "fast"},
        {"type": "showcase_match_cancelled", "queue_id": 1},
        {"type": "showcase_error", "error": "selftest synthetic error"},
        {"type": "ping"},
    ]
    return msgs


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out = STATIC_DIR / "selftest-fixtures.json"
    if "--out" in argv:
        i = argv.index("--out")
        out = pathlib.Path(argv[i + 1])
        del argv[i:i + 2]
    if argv[:1] == ["--db"] and len(argv) >= 2:
        path = argv[1]
    else:
        path = str(pathlib.Path(tempfile.mkdtemp()) / "selftest-demo.db")
        import importlib
        seed = importlib.import_module("seed_demo_db")
        old_argv, sys.argv = sys.argv, ["seed_demo_db.py", path]
        try:
            seed.main()
        finally:
            sys.argv = old_argv

    msgs = build_messages(path)
    problems: list[str] = []
    for m in msgs:
        problems += [f"{m['type']}: {p}"
                     for p in protocol_spec.validate_message(m)]
    if problems:
        print("fixture contract violations:")
        for p in problems:
            print(" -", p)
        return 1

    out.write_text(json.dumps({"messages": msgs}, indent=1, sort_keys=True))
    print(f"wrote {out} ({len(msgs)} messages, "
          f"{out.stat().st_size / 1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
