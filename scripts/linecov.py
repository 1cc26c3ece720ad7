"""Dependency-free line coverage for keisei_tpu/ via sys.monitoring (PEP 669).

Neither coverage.py nor pytest-cov is installed in this environment; this
gives the same signal for test-gap hunting with near-zero overhead: each
line event is disabled after its first hit (sys.monitoring.DISABLE), the
same trick coverage.py 7.x uses.

Usage:
    python scripts/linecov.py [pytest args...]        # run suite, write report
    python scripts/linecov.py --report <json>         # re-print a saved report

Writes /tmp/linecov.json {filename: [hit lines]} and prints a per-file
summary of executable-line coverage (executable = lines present in
code.co_lines() of all code objects compiled from the file).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "keisei_tpu")
if REPO not in sys.path:
    sys.path.insert(0, REPO)  # `python scripts/linecov.py` puts scripts/ first
OUT = os.environ.get("LINECOV_OUT", "/tmp/linecov.json")

TOOL = 3  # sys.monitoring tool id (coverage.py uses 1; stay clear)


def _install():
    mon = sys.monitoring
    mon.use_tool_id(TOOL, "linecov")
    hits: dict[str, set[int]] = {}

    def on_line(code, line):
        fn = code.co_filename
        if not fn.startswith(PKG):
            return mon.DISABLE
        hits.setdefault(fn, set()).add(line)
        return mon.DISABLE  # one hit per (code, line) is all we need

    mon.register_callback(TOOL, mon.events.LINE, on_line)
    mon.set_events(TOOL, mon.events.LINE)
    return hits


def _executable_lines(path: str) -> set[int]:
    """All line numbers CPython considers executable in this file."""
    try:
        with open(path, encoding="utf-8") as f:
            src = f.read()
        top = compile(src, path, "exec")
    except (OSError, SyntaxError):
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def report(hits: dict[str, list[int] | set[int]]):
    rows = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            execable = _executable_lines(path)
            if not execable:
                continue
            hit = set(hits.get(path, ())) & execable
            missed = sorted(execable - hit)
            rows.append((len(hit) / len(execable), path, len(hit),
                         len(execable), missed))
    rows.sort()
    total_hit = sum(r[2] for r in rows)
    total = sum(r[3] for r in rows)
    print(f"\n{'cov':>6}  {'hit':>5}/{'exec':<5}  file")
    for frac, path, nh, ne, missed in rows:
        rel = os.path.relpath(path, REPO)
        print(f"{frac * 100:5.1f}%  {nh:5d}/{ne:<5d}  {rel}")
        if frac < 0.95 and missed:
            print(f"        missed: {_ranges(missed)}")
    pct = total_hit / max(total, 1) * 100
    print(f"\nTOTAL {total_hit}/{total} = {pct:.1f}%")
    return pct


def _ranges(lines: list[int]) -> str:
    out, start, prev = [], None, None
    for ln in lines:
        if start is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            out.append(f"{start}-{prev}" if prev > start else f"{start}")
            start = prev = ln
    if start is not None:
        out.append(f"{start}-{prev}" if prev > start else f"{start}")
    s = ",".join(out)
    return s if len(s) < 400 else s[:400] + "..."


def main():
    # --floor N: exit nonzero when total package coverage drops below N%
    # (the CI regression gate; see scripts/ci_local.sh full mode)
    floor = None
    argv = sys.argv[1:]
    if "--floor" in argv:
        i = argv.index("--floor")
        floor = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if len(argv) >= 2 and argv[0] == "--report":
        with open(argv[1]) as f:
            pct = report(json.load(f))
        return 0 if floor is None or pct >= floor else 1
    hits = _install()
    import pytest

    rc = pytest.main(argv)
    sys.monitoring.set_events(TOOL, 0)
    with open(OUT, "w") as f:
        json.dump({k: sorted(v) for k, v in hits.items()}, f)
    print(f"\nline hits written to {OUT}")
    pct = report(hits)
    if floor is not None and pct < floor:
        print(f"COVERAGE FLOOR FAILED: {pct:.1f}% < {floor:.1f}%")
        return rc or 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
