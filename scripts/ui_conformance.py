"""CI conformance gate: server wire protocol vs the pinned UI contract.

Three checks, exit non-zero on any failure:
  1. pytest tests/test_ui_conformance.py — full live-server message cycle
     validated against keisei_tpu/server/protocol_spec.py (the executable
     form of the reference-UI compatibility claim).
  2. Static SPA coverage — keisei_tpu/server/static/app.js must have a
     dispatch case for every push-type the server can emit (a spec type our
     own dashboard silently drops is a dead feature).
  3. Demo-DB drive — seed scripts/seed_demo_db.py into a temp DB, boot the
     real server, and validate the init payload + one full poll interval of
     live traffic frame-by-frame.

Usage: python scripts/ui_conformance.py [--skip-pytest]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import pathlib
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

FAILURES: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    if not ok:
        FAILURES.append(name)


def run_pytest() -> None:
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_ui_conformance.py",
         "-q", "--no-header"],
        capture_output=True, text=True,
        cwd=str(pathlib.Path(__file__).resolve().parent.parent))
    tail = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
    check("live-server message cycle (pytest)", r.returncode == 0, tail)


def check_spa_coverage() -> None:
    from keisei_tpu.server.protocol_spec import SERVER_MESSAGES
    static = (pathlib.Path(__file__).resolve().parent.parent
              / "keisei_tpu" / "server" / "static")
    js = (static / "app.js").read_text()
    handled = set(re.findall(r'case "([a-z_]+)"', js))
    # command replies are request-scoped; the SPA surfaces them via the
    # shared status toast instead of a switch case, so require either form
    push_types = set(SERVER_MESSAGES) - {
        "showcase_match_queued", "showcase_speed_changed",
        "showcase_match_cancelled", "showcase_error",
    }
    missing = push_types - handled
    check("SPA handles every push message type", not missing,
          f"missing cases: {sorted(missing)}" if missing else
          f"{len(push_types)} types covered")
    reply_handled = [t for t in ("showcase_error", "showcase_match_queued",
                                 "showcase_speed_changed",
                                 "showcase_match_cancelled") if t in js]
    check("SPA surfaces command replies", len(reply_handled) == 4,
          f"referenced: {reply_handled}")


async def _drive_demo(db_path: str) -> tuple[int, list[str]]:
    from keisei_tpu.server.app import DashboardServer
    from keisei_tpu.server.protocol_spec import validate_message
    from keisei_tpu.server.ws_protocol import client_connect

    server = DashboardServer(db_path)
    srv = await server.start("127.0.0.1", 0)
    port = srv.sockets[0].getsockname()[1]
    ws = await client_connect("127.0.0.1", port)
    violations: list[str] = []
    n = 0
    try:
        init = json.loads(await asyncio.wait_for(ws.recv_text(), 10))
        violations += validate_message(init)
        n += 1
        if init.get("type") != "init":
            violations.append("first frame was not init")
        for key in ("games", "metrics", "league_entries"):
            if not init.get(key):
                violations.append(f"demo init.{key} is empty")
        # watch one more second of traffic (showcase/status polls)
        end = asyncio.get_event_loop().time() + 1.0
        while asyncio.get_event_loop().time() < end:
            try:
                left = end - asyncio.get_event_loop().time()
                msg = json.loads(await asyncio.wait_for(
                    ws.recv_text(), max(0.05, left)))
                violations += validate_message(msg)
                n += 1
            except asyncio.TimeoutError:
                break
    finally:
        await ws.close()
        srv.close()
        await srv.wait_closed()
    return n, violations


def check_demo_drive() -> None:
    root = pathlib.Path(__file__).resolve().parent.parent
    with tempfile.TemporaryDirectory() as td:
        dbp = str(pathlib.Path(td) / "demo.db")
        r = subprocess.run([sys.executable, "scripts/seed_demo_db.py", dbp],
                           capture_output=True, text=True, cwd=str(root))
        err_tail = (r.stderr.strip() or r.stdout.strip()).splitlines()
        check("demo DB seeds", r.returncode == 0,
              err_tail[-1] if r.returncode and err_tail else "")
        if r.returncode:
            return
        n, violations = asyncio.run(_drive_demo(dbp))
        check("demo-DB live drive conforms", not violations,
              f"{n} frames validated" if not violations else
              "; ".join(violations[:5]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-pytest", action="store_true",
                    help="only the static + demo-drive checks")
    args = ap.parse_args()
    if not args.skip_pytest:
        run_pytest()
    check_spa_coverage()
    check_demo_drive()
    if FAILURES:
        print(f"\n{len(FAILURES)} conformance check(s) FAILED")
        return 1
    print("\nAll conformance checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
