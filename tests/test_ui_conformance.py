"""End-to-end WS protocol conformance against the pinned UI contract.

Drives the REAL dashboard server over a real socket through the full message
cycle the reference Svelte client exercises (reference webui/src/lib/ws.js
handleMessage, :95-222) and validates every received frame against
keisei_tpu/server/protocol_spec.py. This is the executable form of the
"UI-compatibility" claim: if the server drifts from what the reference UI
destructures, these tests fail rather than a panel silently going blank.

No JS runtime exists in this image, so the conformance point is the wire;
DOM-side consistency is pinned separately in tests/test_server.py
(TestStaticUI) and scripts/ui_conformance.py runs this same cycle for CI.
"""

import asyncio
import json

import pytest

from keisei_tpu import db
from keisei_tpu.db import core as db_core
from keisei_tpu.db import showcase as sc
from keisei_tpu.server.app import DashboardServer
from keisei_tpu.server.protocol_spec import (
    CLIENT_COMMANDS,
    SERVER_MESSAGES,
    VALID_SPEEDS,
    validate_message,
)
from keisei_tpu.server.ws_protocol import client_connect


def run(coro):
    return asyncio.run(asyncio.wait_for(coro, 60))


@pytest.fixture
def seeded_db(tmp_path):
    """A DB with at least one row in every family the init payload carries."""
    p = str(tmp_path / "conf.db")
    db.init_db(p)
    db.write_training_state(p, {
        "config_json": "{}", "display_name": "conformance", "model_arch":
        "se_resnet", "algorithm_name": "katago_ppo", "started_at": "t0",
        "status": "training", "current_epoch": 3, "current_step": 300,
        "total_epochs": 10,
    })
    db.write_metrics(p, {"epoch": 1, "step": 100, "policy_loss": 1.25,
                         "value_loss": 0.5, "episodes_completed": 7})
    db.write_game_snapshots(p, [{
        "game_id": 0, "board_json": "[]", "hands_json": "{}",
        "move_history_json": "[]", "current_player": "black", "ply": 4,
        "is_over": 0, "sfen": "startpos", "result": "", "in_check": 0,
    }])
    for i, (name, role) in enumerate(
            [("Alpha", "frontier_static"), ("Beta", "dynamic")]):
        db_core.write_row(p, "league_entries", {
            "display_name": name, "architecture": "se_resnet",
            "model_params": "{}", "checkpoint_path": f"/tmp/e{i}",
            "role": role, "status": "active",
            "elo_rating": 1500.0 + i, "games_played": i,
            "created_epoch": 0, "created_at": "t0",
        })
    db_core.write_row(p, "elo_history", {
        "entry_id": 1, "epoch": 1, "elo_rating": 1500.0,
        "recorded_at": "t0"})
    db_core.write_row(p, "head_to_head", {
        "entry_a_id": 1, "entry_b_id": 2, "games": 2, "wins_a": 1,
        "wins_b": 1, "draws": 0, "last_epoch": 1})
    return p


async def _boot(db_path):
    server = DashboardServer(db_path)
    srv = await server.start("127.0.0.1", 0)
    port = srv.sockets[0].getsockname()[1]
    ws = await client_connect("127.0.0.1", port)
    return srv, ws


async def _recv_conformant(ws, want_type=None, timeout=5):
    """Receive frames, asserting EVERY one conforms, until want_type."""
    while True:
        msg = json.loads(await asyncio.wait_for(ws.recv_text(), timeout))
        violations = validate_message(msg)
        assert not violations, f"protocol violations: {violations}"
        if want_type is None or msg["type"] == want_type:
            return msg


class TestInitCycle:
    def test_init_payload_conforms(self, seeded_db):
        async def scenario():
            srv, ws = await _boot(seeded_db)
            init = await _recv_conformant(ws, "init")
            # every top-level key the reference client destructures
            assert not (SERVER_MESSAGES["init"] - init.keys())
            assert init["metrics"][0]["policy_loss"] == 1.25
            assert {e["elo_rating"] for e in init["league_entries"]} == {1500.0, 1501.0}
            assert init["head_to_head"][0]["entry_a_id"] == 1
            assert init["showcase"]["sidecar_alive"] is False
            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())

    def test_full_delta_cycle(self, seeded_db):
        """metrics -> game -> training_status -> league deltas all conform."""
        async def scenario():
            srv, ws = await _boot(seeded_db)
            await _recv_conformant(ws, "init")

            await asyncio.to_thread(db.write_metrics, seeded_db,
                                    {"epoch": 2, "step": 200,
                                     "policy_loss": 1.0})
            msg = await _recv_conformant(ws, "metrics_update")
            assert msg["rows"][0]["epoch"] == 2

            await asyncio.to_thread(db.write_game_snapshots, seeded_db, [{
                "game_id": 0, "board_json": "[]", "hands_json": "{}",
                "move_history_json": "[]", "current_player": "white",
                "ply": 5, "is_over": 0, "sfen": "x", "result": "",
                "in_check": 0,
            }])
            msg = await _recv_conformant(ws, "game_update")
            assert msg["snapshots"][0]["ply"] == 5

            await asyncio.to_thread(db.write_training_state, seeded_db, {
                "config_json": "{}", "display_name": "conformance",
                "model_arch": "se_resnet", "algorithm_name": "katago_ppo",
                "started_at": "t0", "status": "training",
                "current_epoch": 4, "current_step": 400, "total_epochs": 10,
            })
            msg = await _recv_conformant(ws, "training_status")
            assert msg["epoch"] == 4
            # the client folds ALL of these into its store (ws.js:151-167)
            assert not (SERVER_MESSAGES["training_status"] - msg.keys())

            await asyncio.to_thread(db_core.write_row, seeded_db,
                                    "league_entries", {
                                        "display_name": "Gamma",
                                        "architecture": "se_resnet",
                                        "model_params": "{}",
                                        "checkpoint_path": "/tmp/e2",
                                        "role": "recent_fixed",
                                        "status": "active",
                                        "elo_rating": 1490.0,
                                        "games_played": 0,
                                        "created_epoch": 4,
                                        "created_at": "t1"})
            msg = await _recv_conformant(ws, "league_update", timeout=10)
            assert {e["id"] for e in msg["entries"]} == {1, 2, 3}

            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())


class TestShowcaseCycle:
    def test_status_update_and_game_switch(self, seeded_db):
        async def scenario():
            srv, ws = await _boot(seeded_db)
            await _recv_conformant(ws, "init")

            qid = await asyncio.to_thread(sc.queue_match, seeded_db,
                                          "1", "2", "normal")
            msg = await _recv_conformant(ws, "showcase_status")
            assert msg["queue"][0]["status"] == "pending"
            assert msg["active_game_id"] is None

            gid = await asyncio.to_thread(
                sc.create_showcase_game, seeded_db, queue_id=qid,
                entry_id_black="1", entry_id_white="2")
            for ply in (1, 2):
                await asyncio.to_thread(
                    sc.write_showcase_move, seeded_db, game_id=gid, ply=ply,
                    action_index=ply, usi_notation=f"7g7f#{ply}",
                    board_json="[]", hands_json="{}", current_player="black")
            msg = await _recv_conformant(ws, "showcase_update")
            assert msg["game"]["id"] == gid
            assert [m["ply"] for m in msg["new_moves"]] == [1, 2]

            # incremental cursor: only NEW moves arrive next
            await asyncio.to_thread(
                sc.write_showcase_move, seeded_db, game_id=gid, ply=3,
                action_index=3, usi_notation="2f2e", board_json="[]",
                hands_json="{}", current_player="white")
            msg = await _recv_conformant(ws, "showcase_update")
            assert [m["ply"] for m in msg["new_moves"]] == [3]

            # game ends -> status push with no active game; client clears
            # board state on active_game_id=None (ws.js:207-216)
            await asyncio.to_thread(sc.mark_game_completed, seeded_db, gid,
                                    "black_win", 3)
            msg = await _recv_conformant(ws, "showcase_status", timeout=10)
            assert msg["active_game_id"] is None

            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())

    def test_command_round_trips(self, seeded_db):
        """Every client command and every error branch of the reference
        server contract (reference app.py:498-546)."""
        async def scenario():
            srv, ws = await _boot(seeded_db)
            await _recv_conformant(ws, "init")

            # valid request
            await ws.send_json({"type": "request_showcase_match",
                                "entry_id_1": "1", "entry_id_2": "2",
                                "speed": "slow"})
            msg = await _recv_conformant(ws, "showcase_match_queued")
            assert (msg["entry_id_1"], msg["entry_id_2"]) == ("1", "2")
            assert msg["speed"] in VALID_SPEEDS

            # error branches, in the reference's order of precedence
            for cmd, needle in [
                ({"type": "request_showcase_match", "entry_id_1": "1",
                  "entry_id_2": "2", "speed": "warp"}, "Invalid speed"),
                ({"type": "request_showcase_match", "entry_id_1": "1",
                  "entry_id_2": "", "speed": "fast"}, "required"),
                ({"type": "request_showcase_match", "entry_id_1": "1",
                  "entry_id_2": "1", "speed": "fast"}, "itself"),
                ({"type": "change_showcase_speed", "speed": "warp"},
                 "Invalid speed"),
                ({"type": "change_showcase_speed", "speed": "fast"},
                 "queue_id is required"),
                ({"type": "cancel_showcase_match"}, "queue_id is required"),
            ]:
                assert not (CLIENT_COMMANDS[cmd["type"]]
                            - frozenset(cmd) - {"queue_id", "entry_id_2"})
                await ws.send_json(cmd)
                msg = await _recv_conformant(ws, "showcase_error")
                assert needle in msg["error"], (cmd, msg)

            # speed change + cancel on the real queue entry
            q = await asyncio.to_thread(sc.read_queue, seeded_db)
            qid = q[0]["id"]
            await ws.send_json({"type": "change_showcase_speed",
                                "queue_id": qid, "speed": "fast"})
            msg = await _recv_conformant(ws, "showcase_speed_changed")
            assert msg["queue_id"] == qid and msg["speed"] == "fast"

            await ws.send_json({"type": "cancel_showcase_match",
                                "queue_id": qid})
            msg = await _recv_conformant(ws, "showcase_match_cancelled")
            assert msg["queue_id"] == qid
            status = await asyncio.to_thread(sc.get_queue_status, seeded_db, qid)
            assert status == "cancelled"

            # pong is accepted silently (no reply, connection stays up)
            await ws.send_json({"type": "pong"})
            await asyncio.to_thread(db.write_metrics, seeded_db,
                                    {"epoch": 9, "step": 9,
                                     "policy_loss": 0.1})
            msg = await _recv_conformant(ws, "metrics_update")
            assert msg["rows"][0]["epoch"] == 9

            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())

    def test_queue_full_guard(self, seeded_db):
        from keisei_tpu.server.app import MAX_SHOWCASE_QUEUE_DEPTH

        async def scenario():
            for i in range(MAX_SHOWCASE_QUEUE_DEPTH):
                await asyncio.to_thread(sc.queue_match, seeded_db,
                                        "1", "2", "normal")
            srv, ws = await _boot(seeded_db)
            await _recv_conformant(ws, "init")
            await ws.send_json({"type": "request_showcase_match",
                                "entry_id_1": "1", "entry_id_2": "2",
                                "speed": "fast"})
            msg = await _recv_conformant(ws, "showcase_error")
            assert msg["error"] == "Queue is full"
            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())


class TestSpecInternals:
    """The spec module itself must reject drift, not just pass traffic."""

    def test_unknown_type_rejected(self):
        assert validate_message({"type": "nope"}) == [
            "unknown message type: 'nope'"]

    def test_missing_key_detected(self):
        v = validate_message({"type": "showcase_status", "queue": []})
        assert any("missing keys" in x for x in v)
        assert any("sidecar_alive" in x for x in v)

    def test_row_contract_detected(self):
        v = validate_message({"type": "metrics_update",
                              "rows": [{"id": 1, "epoch": 1}]})
        assert any("policy_loss" in x for x in v)

    def test_showcase_subobject_checked(self):
        base = {k: [] for k in SERVER_MESSAGES["init"]}
        base.update({"type": "init", "training_state": None,
                     "tournament_stats": None, "style_profiles": [],
                     "showcase": {"game": None}})
        v = validate_message(base)
        assert any("init.showcase" in x for x in v)

    def test_seed_demo_db_conforms(self, tmp_path):
        """The demo seeder (used for UI review) produces a fully
        conformant init payload — keeps dev/demo and prod in lockstep."""
        import subprocess
        import sys
        p = str(tmp_path / "demo.db")
        subprocess.run([sys.executable, "scripts/seed_demo_db.py", p],
                       check=True, capture_output=True, cwd=".")

        async def scenario():
            srv, ws = await _boot(p)
            init = await _recv_conformant(ws, "init")
            assert init["games"] and init["metrics"] and init["league_entries"]
            assert init["showcase"]["moves"]
            await ws.close()
            srv.close()
            await srv.wait_closed()
        run(scenario())
