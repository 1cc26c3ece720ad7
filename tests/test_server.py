"""Dashboard server: WS protocol, init payload, incremental push, commands."""

import asyncio
import json

import pytest

from keisei_tpu import db
from keisei_tpu.server.app import DashboardServer
from keisei_tpu.server.ws_protocol import (
    accept_key,
    client_connect,
    encode_frame,
)


@pytest.fixture
def db_path(tmp_path):
    p = str(tmp_path / "obs.db")
    db.init_db(p)
    db.write_training_state(p, {
        "config_json": "{}", "display_name": "t", "model_arch": "mlp",
        "algorithm_name": "katago_ppo", "started_at": "x",
    })
    db.write_metrics(p, {"epoch": 1, "step": 10, "policy_loss": 0.5,
                         "episodes_completed": 3})
    return p


def run(coro):
    return asyncio.run(asyncio.wait_for(coro, 30))


class TestProtocol:
    def test_accept_key_rfc_example(self):
        # RFC 6455 section 1.3 worked example
        assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="

    def test_frame_lengths(self):
        assert encode_frame(0x1, b"x" * 10)[1] == 10
        f = encode_frame(0x1, b"x" * 500)
        assert f[1] == 126
        f = encode_frame(0x1, b"x" * 70000)
        assert f[1] == 127

    def test_oversized_frame_rejected_before_buffering(self):
        """A forged 8-byte length must fail the connection instead of
        buffering gigabytes (memory-exhaustion guard)."""
        import asyncio
        import struct

        from keisei_tpu.server.ws_protocol import WebSocket

        async def scenario():
            reader = asyncio.StreamReader()
            # header claiming an 8 GiB unmasked text frame
            reader.feed_data(bytes([0x81, 127]) + struct.pack(">Q", 8 << 30))

            class _W:  # writer stub; recv path never writes
                def close(self):
                    pass

            ws = WebSocket(reader, _W())
            try:
                await asyncio.wait_for(ws.recv_text(), 5)
            except ConnectionError as e:
                return str(e)
            return None

        msg = run(scenario())
        assert msg and "max_frame_bytes" in msg


@pytest.mark.integration
class TestDashboard:
    def test_healthz_and_host_allowlist(self, db_path):
        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]

            async def http_get(path, host="127.0.0.1"):
                r, w = await asyncio.open_connection("127.0.0.1", port)
                w.write(f"GET {path} HTTP/1.1\r\nHost: {host}\r\n\r\n".encode())
                await w.drain()
                data = await r.read()
                w.close()
                return data

            ok = await http_get("/healthz")
            assert b"200" in ok.split(b"\r\n")[0]
            body = json.loads(ok.split(b"\r\n\r\n", 1)[1])
            assert body["status"] == "ok"
            assert body["training_alive"] in (True, False)

            bad = await http_get("/healthz", host="evil.example.com")
            assert b"403" in bad.split(b"\r\n")[0]
            srv.close()
            await srv.wait_closed()

        run(scenario())

    def test_unix_socket_serving(self, db_path, tmp_path):
        """run.sh --socket parity: the dashboard serves HTTP over a unix
        socket (reference serves uvicorn --uds behind a reverse proxy),
        and a stale socket file from a dead server is replaced."""
        sock = str(tmp_path / "dash.sock")
        open(sock, "w").close()  # stale leftover must not break startup

        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0, unix_socket=sock)
            r, w = await asyncio.open_unix_connection(sock)
            w.write(b"GET /healthz HTTP/1.1\r\nHost: 127.0.0.1\r\n\r\n")
            await w.drain()
            data = await r.read()
            w.close()
            srv.close()
            await srv.wait_closed()
            return data

        data = run(scenario())
        assert b"200" in data.split(b"\r\n")[0]
        body = json.loads(data.split(b"\r\n\r\n", 1)[1])
        assert body["status"] == "ok"

    def test_main_cli_binds_and_serves(self, db_path, tmp_path):
        """server.app.main(): argument wiring through to a live server
        (--unix-socket + --allow-host), torn down by cancelling serve."""
        from keisei_tpu.server import app as app_mod

        sock = str(tmp_path / "cli.sock")

        async def scenario():
            server = DashboardServer(
                db_path,
                allowed_hosts=app_mod.DEFAULT_ALLOWED_HOSTS
                | frozenset({"proxy.internal"}),
            )
            task = asyncio.create_task(
                server.serve_forever("127.0.0.1", 0, unix_socket=sock))
            for _ in range(100):
                if server._server is not None:
                    break
                await asyncio.sleep(0.05)
            r, w = await asyncio.open_unix_connection(sock)
            w.write(b"GET /healthz HTTP/1.1\r\nHost: proxy.internal\r\n\r\n")
            await w.drain()
            data = await r.read()
            w.close()
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass
            return data

        data = run(scenario())
        assert b"200" in data.split(b"\r\n")[0]

    def test_ws_init_and_updates(self, db_path):
        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)

            init = json.loads(await ws.recv_text())
            assert init["type"] == "init"
            assert init["metrics"][0]["policy_loss"] == 0.5
            assert init["training_state"]["model_arch"] == "mlp"
            assert "league_entries" in init and "showcase" in init

            # new metrics row -> metrics_update push within the poll interval
            await asyncio.to_thread(db.write_metrics, db_path, {
                "epoch": 2, "step": 20, "policy_loss": 0.4,
            })
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] not in ("metrics_update",):
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert msg["rows"][0]["epoch"] == 2

            # showcase command round-trip
            await ws.send_json({"type": "request_showcase_match",
                                "entry_id_1": "1", "entry_id_2": "2",
                                "speed": "fast"})
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] not in ("showcase_match_queued", "showcase_error"):
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert msg["type"] == "showcase_match_queued"

            # invalid speed -> error
            await ws.send_json({"type": "request_showcase_match",
                                "entry_id_1": "1", "entry_id_2": "2",
                                "speed": "warp"})
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] != "showcase_error":
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert "Invalid speed" in msg["error"]

            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())

    def test_showcase_status_push(self, db_path):
        from keisei_tpu.db import showcase as sc

        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)
            json.loads(await ws.recv_text())  # init

            await asyncio.to_thread(sc.queue_match, db_path, "1", "2", "normal")
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] != "showcase_status":
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert len(msg["queue"]) == 1
            assert msg["sidecar_alive"] is False
            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())


class TestStaticUI:
    """Consistency checks between the SPA and its HTML shell (no JS runtime
    in the image, so this pins the DOM contract the scripts rely on)."""

    @staticmethod
    def _static_dir():
        import keisei_tpu.server as srv
        from pathlib import Path
        return Path(srv.__file__).parent / "static"

    def test_all_dom_ids_referenced_by_js_exist(self):
        import re
        static = self._static_dir()
        html = (static / "index.html").read_text()
        js = (static / "app.js").read_text()
        html_ids = set(re.findall(r'id="([^"]+)"', html))
        js_ids = set(re.findall(r'getElementById\("([^"]+)"\)', js))
        missing = js_ids - html_ids
        assert not missing, f"app.js references ids missing from index.html: {missing}"

    def test_js_braces_balanced(self):
        """Cheap syntax smoke: delimiters balance outside strings/comments."""
        src = (self._static_dir() / "app.js").read_text()
        # strip comments and string/template literals
        import re
        src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
        src = re.sub(r"(^|[^:])//[^\n]*", r"\1", src)
        src = re.sub(r"`(?:[^`\\]|\\.)*`", "``", src, flags=re.S)
        src = re.sub(r'"(?:[^"\\]|\\.)*"', '""', src)
        src = re.sub(r"'(?:[^'\\]|\\.)*'", "''", src)
        # regex literals (the chart code has none, but be safe about division)
        for o, c in ("{}", "()", "[]"):
            assert src.count(o) == src.count(c), f"unbalanced {o}{c}"

    def test_about_svg_diagrams_are_wellformed(self):
        """The About view embeds inline SVG diagrams inside JS template
        literals, where a malformed attribute would silently break the
        whole <svg> subtree at render time. Parse each as XML and pin
        that every marker reference resolves within ITS OWN svg (ids are
        document-global, and level-gating can hide a sibling diagram)."""
        import re
        import xml.etree.ElementTree as ET
        src = (self._static_dir() / "app.js").read_text()
        svgs = re.findall(r'<svg class="about-svg".*?</svg>', src, re.S)
        assert len(svgs) >= 3  # loop, architecture, residual block
        for svg in svgs:
            ET.fromstring(svg)  # raises on malformed XML / dup attributes
            ids = set(re.findall(r'id="(ab-arr\d*)"', svg))
            refs = set(re.findall(r'url\(#(ab-arr\d*)\)', svg))
            assert refs <= ids, f"marker refs {refs - ids} not defined locally"
        css = (self._static_dir() / "style.css").read_text()
        for cls in ("about-svg", "ab-box", "ab-t", "ab-n", "ab-arrow",
                    "ab-arrhead"):
            assert f".{cls}" in css, f"missing style for .{cls}"

    def test_ws_commands_used_by_ui_are_handled(self):
        static = self._static_dir()
        js = (static / "app.js").read_text()
        import re
        from pathlib import Path
        import keisei_tpu.server.app as appmod
        server_src = Path(appmod.__file__).read_text()
        sent = set(re.findall(r'send\(\{\s*type:\s*"([^"]+)"', js))
        sent |= set(re.findall(r'send\(\{\s*type:\s*"([^"]+)"', js.replace("\n", " ")))
        for cmd in sent - {"pong"}:
            assert f'"{cmd}"' in server_src, f"UI sends unhandled command {cmd!r}"

    # -- lib.js wiring (the pure-helper module unit-tested under node in CI;
    # no JS runtime in this image, so pin the contract structurally) --------

    def _lib_exports(self):
        import re
        src = (self._static_dir() / "lib.js").read_text()
        # helpers may themselves `return {...}` objects; the module export
        # is the LAST return-object in the factory
        rets = re.findall(r"return \{([^}]+)\};", src, flags=re.S)
        assert rets, "lib.js must end with a `return {...}` export object"
        return {n.strip() for n in rets[-1].split(",") if n.strip()}, src

    def test_app_js_only_uses_exported_kt_members(self):
        import re
        exports, _ = self._lib_exports()
        app = (self._static_dir() / "app.js").read_text()
        used = set(re.findall(r"\bKT\.(\w+)", app))
        destructured = re.search(r"const \{([^}]+)\} = KT;", app)
        if destructured:
            used |= {n.strip() for n in destructured.group(1).split(",") if n.strip()}
        missing = used - exports
        assert not missing, f"app.js uses KT members lib.js does not export: {missing}"

    def test_lib_js_is_dom_free(self):
        """lib.js must stay pure so node --test can import it headlessly."""
        _, src = self._lib_exports()
        for banned in ("document.", "getElementById", "localStorage",
                       "WebSocket", "requestAnimationFrame", "canvas"):
            assert banned not in src, f"lib.js references DOM/browser API: {banned}"

    def test_lib_js_loaded_before_app_js(self):
        html = (self._static_dir() / "index.html").read_text()
        i_lib = html.find('src="lib.js"')
        i_app = html.find('src="app.js"')
        assert 0 <= i_lib < i_app, "index.html must load lib.js before app.js"

    def test_every_lib_export_is_unit_tested(self):
        """Mirror of the reference's vitest-per-lib discipline
        (webui/package.json:10-18): each exported helper appears in the
        node:test suite."""
        exports, _ = self._lib_exports()
        tests = (self._static_dir() / "lib.test.mjs").read_text()
        untested = {n for n in exports
                    if n not in ("KANJI", "KANJI_P", "LETTER") and n not in tests}
        assert not untested, f"lib.js exports lack node:test coverage: {untested}"

    def test_lib_js_braces_balanced(self):
        import re
        src = (self._static_dir() / "lib.js").read_text()
        src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
        src = re.sub(r"(^|[^:])//[^\n]*", r"\1", src)
        src = re.sub(r"`(?:[^`\\]|\\.)*`", "``", src, flags=re.S)
        src = re.sub(r'"(?:[^"\\]|\\.)*"', '""', src)
        src = re.sub(r"'(?:[^'\\]|\\.)*'", "''", src)
        for o, c in ("{}", "()", "[]"):
            assert src.count(o) == src.count(c), f"unbalanced {o}{c}"


class TestInitMetricsWindow:
    def test_init_carries_newest_rows_and_lifetime_episodes(
            self, db_path, monkeypatch):
        """Review r2: the init payload must carry the NEWEST metrics window
        (read_metrics_since(0, N) returned rows 1..N, leaving a
        reconnecting client minutes behind on long runs), and the episodes
        counter must be the lifetime SUM, not the window sum."""
        import keisei_tpu.server.app as app_mod
        monkeypatch.setattr(app_mod, "MAX_METRICS_IN_INIT", 4)
        # db_path fixture wrote one row (episodes=3); add 7 more
        for i in range(2, 9):
            db.write_metrics(db_path, {"epoch": i, "step": i * 10,
                                       "policy_loss": 0.1,
                                       "episodes_completed": 1})

        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)
            init = json.loads(await ws.recv_text())
            epochs = [m["epoch"] for m in init["metrics"]]
            assert epochs == [5, 6, 7, 8]  # newest window, ascending
            # trigger a training_status push: episodes = lifetime sum
            await asyncio.to_thread(db.update_training_progress, db_path,
                                    epoch=9, step=1)
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] != "training_status":
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert msg["episodes"] == 3 + 7
            # live updates continue from the newest id (no replay, no gap)
            await asyncio.to_thread(db.write_metrics, db_path,
                                    {"epoch": 9, "step": 90,
                                     "policy_loss": 0.2,
                                     "episodes_completed": 2})
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            while msg["type"] != "metrics_update":
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
            assert [m["epoch"] for m in msg["rows"]] == [9]
            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())


class TestShowcaseFinalMoves:
    def test_completed_game_tail_is_pushed(self, db_path):
        """Review r2: a game that completes between polls must still get its
        final move(s) and completed-game row pushed (the poller only read
        moves for in_progress games, freezing the client one move early)."""
        from keisei_tpu.db import showcase as sc

        def add_move(gid, ply):
            sc.write_showcase_move(
                db_path, game_id=gid, ply=ply, action_index=ply,
                usi_notation=f"m{ply}", board_json="[]", hands_json="[]",
                current_player="black")

        async def scenario():
            qid = sc.queue_match(db_path, "1", "2", "fast")
            gid = sc.create_showcase_game(
                db_path, queue_id=qid, entry_id_black="1", entry_id_white="2")
            add_move(gid, 1)
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)
            init = json.loads(await ws.recv_text())
            assert init["showcase"]["game"]["id"] == gid
            # final move + completion land in the same poll gap
            await asyncio.to_thread(add_move, gid, 2)
            await asyncio.to_thread(sc.mark_game_completed, db_path, gid,
                                    "black_win", 2)
            msg = json.loads(await asyncio.wait_for(ws.recv_text(), 10))
            while not (msg["type"] == "showcase_update"
                       and msg["game"]["id"] == gid
                       and msg["game"]["status"] != "in_progress"):
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 10))
            assert [m["ply"] for m in msg["new_moves"]] == [2]
            assert msg["game"]["status"] == "black_win"  # result lives in status
            assert msg["game"]["total_ply"] == 2
            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())


class TestCommandInputHardening:
    def test_non_numeric_queue_id_gets_error_reply(self, db_path):
        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)
            json.loads(await ws.recv_text())  # init
            for cmd in ({"type": "change_showcase_speed",
                         "queue_id": "abc", "speed": "fast"},
                        {"type": "cancel_showcase_match", "queue_id": "abc"}):
                await ws.send_json(cmd)
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
                while msg["type"] != "showcase_error":
                    msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
                assert "integer" in msg["error"]
            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())

    def test_float_and_bool_queue_ids_rejected(self, db_path):
        """int() coercion would truncate 3.7 -> 3 / accept true -> 1 and
        act on the WRONG queue row while replying success (review r2):
        non-integral JSON ids must get the error reply instead."""
        async def scenario():
            server = DashboardServer(db_path)
            srv = await server.start("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            ws = await client_connect("127.0.0.1", port)
            json.loads(await ws.recv_text())  # init
            for cmd in ({"type": "cancel_showcase_match", "queue_id": 3.7},
                        {"type": "cancel_showcase_match", "queue_id": True},
                        {"type": "change_showcase_speed",
                         "queue_id": 2.5, "speed": "fast"}):
                await ws.send_json(cmd)
                msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
                while msg["type"] != "showcase_error":
                    msg = json.loads(await asyncio.wait_for(ws.recv_text(), 5))
                assert "integer" in msg["error"]
            await ws.close()
            srv.close()
            await srv.wait_closed()

        run(scenario())
