"""Python twin of the dashboard's pure helpers (lib.js).

This is the executable half of a CROSS-LANGUAGE CANARY (the pattern the
reference uses for its Rust observation encoder, test_sl_observation_canary
.py): no JS runtime exists on the TPU dev box, so lib.test.mjs (the node
suite kept for GitHub CI) cannot run here. Instead, every pure helper in
keisei_tpu/server/static/lib.js is re-implemented below with IDENTICAL
semantics, all 41 node tests are ported against this twin in
tests/test_ui_lib_contract.py, and that test pins the normalized source of
lib.js by hash — any edit to lib.js fails the canary until the twin is
re-verified, so the two implementations cannot silently drift.

Functions mirror lib.js line-for-line in behavior, including its edge
cases (loose null handling, identity returns, float tick arithmetic).
"""

from __future__ import annotations

import json
import math
from datetime import datetime, timezone

# -- shogi presentation -------------------------------------------------------

KANJI = {"pawn": "歩", "lance": "香", "knight": "桂", "silver": "銀",
         "gold": "金", "bishop": "角", "rook": "飛", "king": "玉"}
KANJI_P = {"pawn": "と", "lance": "杏", "knight": "圭", "silver": "全",
           "bishop": "馬", "rook": "龍"}
LETTER = {"pawn": "P", "lance": "L", "knight": "N", "silver": "S",
          "gold": "G", "bishop": "B", "rook": "R", "king": "K"}


def piece_char(c: dict, notation: str) -> str:
    if notation == "kanji":
        if c.get("promoted"):
            return KANJI_P.get(c["type"]) or KANJI.get(c["type"])
        return KANJI.get(c["type"])
    return ("+" if c.get("promoted") else "") + LETTER.get(c["type"], "?")


def usi_to_cell(usi) -> int:
    if not isinstance(usi, str) or len(usi) < 2:
        return -1
    file = ord(usi[0]) - 48
    rank = ord(usi[1]) - 97
    if file < 1 or file > 9 or rank < 0 or rank > 8:
        return -1
    return rank * 9 + (9 - file)


def usi_dest_cell(usi) -> int:
    if isinstance(usi, str) and len(usi) >= 4:
        return usi_to_cell(usi[2:4])
    return -1


# -- showcase move semantics --------------------------------------------------


def mover_of(m: dict) -> str:
    return "white" if m.get("current_player") == "black" else "black"


def black_prob(m: dict):
    if m.get("value_estimate") is None:
        return None
    v = m["value_estimate"]
    if mover_of(m) != "black":
        v = -v
    return (v + 1) / 2


def stm_black_prob(g: dict):
    if g.get("value_estimate") is None:
        return None
    v = g["value_estimate"]
    if g.get("current_player") != "black":
        v = -v
    return (v + 1) / 2


def game_status(g: dict) -> str:
    if g.get("is_over"):
        return str(g.get("result") or "").replace("_", " ")
    return f"ply {g.get('ply')}"


def game_advantage(g: dict) -> dict:
    if g.get("value_estimate") is None:
        return {"confident": False, "favours": None}
    v = g["value_estimate"]
    if g.get("current_player") != "black":
        v = -v
    return {"confident": abs(v) > 0.3,
            "favours": "black" if v > 0 else "white"}


def fresh_moves(existing: list, incoming) -> list:
    seen = existing[-1]["ply"] if existing else 0
    return [m for m in (incoming or []) if m["ply"] > seen]


def heat_cells(text):
    try:
        hm = json.loads(text)
    except (TypeError, ValueError):
        return None
    if not hm or not isinstance(hm, dict):
        return None
    vals = [v for v in hm.values()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            and math.isfinite(v)]
    if not vals:
        return None
    mx = max(vals + [1e-9])
    heat: dict = {}
    for usi, p in hm.items():
        cell = usi_dest_cell(usi)
        if cell >= 0:
            heat[cell] = max(heat.get(cell, 0), p / mx)
    return heat


def move_dots(moves) -> list:
    out = []
    prev = None
    for m in moves or []:
        p = black_prob(m)
        if p is None or prev is None:
            out.append(None if p is None else "normal")
            prev = p
            continue
        delta = p - prev
        gain = delta if mover_of(m) == "black" else -delta
        out.append("blunder" if gain <= -0.25 else "mistake" if gain <= -0.10
                   else "brilliant" if gain >= 0.25
                   else "strong" if gain >= 0.10 else "normal")
        prev = p
    return out


def showcase_stats(moves) -> dict:
    def mk():
        return {"captures": 0, "drops": 0, "promotions": 0, "checks": 0}

    s = {"black": mk(), "white": mk(), "plies": len(moves or [])}
    for m in moves or []:
        side = s[mover_of(m)]
        n = m.get("usi_notation") or ""
        if "x" in n:
            side["captures"] += 1
        if "*" in n:
            side["drops"] += 1
        if n.endswith("+"):
            side["promotions"] += 1
        if m.get("in_check"):
            side["checks"] += 1
    return s


def collapse_events(transitions, max_rows: int = 25) -> list:
    out: list = []
    for t in transitions or []:
        label = (f"{t.get('from_role') or ''}>{t.get('to_role') or ''}|"
                 f"{t.get('from_status') or ''}>{t.get('to_status') or ''}")
        last = out[-1] if out else None
        if (last and last.get("entry_id") == t.get("entry_id")
                and last["_label"] == label):
            last["count"] += 1
        else:
            out.append({**t, "count": 1, "_label": label})
            if len(out) > max_rows:
                break
    return out[:max_rows]


# -- league data shaping ------------------------------------------------------


def h2h_for(rows, entry_id) -> list:
    out = []
    for r in rows or []:
        if r.get("entry_a_id") == entry_id:
            out.append({"opp": r["entry_b_id"], "w": r["wins_a"],
                        "l": r["wins_b"], "d": r["draws"], "g": r["games"]})
        elif r.get("entry_b_id") == entry_id:
            out.append({"opp": r["entry_a_id"], "w": r["wins_b"],
                        "l": r["wins_a"], "d": r["draws"], "g": r["games"]})
    return out


def win_rate(r: dict):
    return (r["w"] + 0.5 * r["d"]) / r["g"] if r.get("g") else None


def indicator(alive, status, phase) -> dict:
    if alive:
        if phase == "update":
            return {"cls": "update", "text": "▲ PPO UPDATE"}
        if phase == "rollout":
            return {"cls": "rollout", "text": "▶ ROLLOUT"}
        return {"cls": "alive", "text": "● ALIVE"}
    if status == "completed":
        return {"cls": "stopped", "text": "■ COMPLETED"}
    if status == "paused":
        return {"cls": "stopped", "text": "■ PAUSED"}
    if status == "stopped":
        return {"cls": "stopped", "text": "■ STOPPED"}
    return {"cls": "stale", "text": "◐ STALE — no heartbeat"}


def heartbeat_fresh(iso, now_ms, stale_after_s=None) -> bool:
    if not iso or not isinstance(iso, str):
        return False
    text = iso if (iso.endswith("Z") or "+" in iso) else iso + "Z"
    try:
        dt = datetime.fromisoformat(text)
    except ValueError:
        return False
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    t_ms = dt.timestamp() * 1000
    return (now_ms - t_ms) / 1000 < (30 if stale_after_s is None else stale_after_s)


def config_summary(config_json, model_arch) -> str:
    cfg = safe_parse(config_json, None) if isinstance(config_json, str) \
        else config_json
    if not cfg:
        return model_arch or ""
    arch = model_arch or (cfg.get("model") or {}).get("architecture") or "?"
    lines = [f"Architecture: {arch}"]
    t = cfg.get("training") or {}
    if t.get("algorithm"):
        lines.append(f"Algorithm: {t['algorithm']}")
    if t.get("num_games"):
        lines.append(f"Envs: {t['num_games']}")
    if t.get("steps_per_epoch"):
        lines.append(f"Steps/epoch: {t['steps_per_epoch']}")
    if t.get("max_ply"):
        lines.append(f"Max ply: {t['max_ply']}")
    if (cfg.get("algorithm_params") or {}).get("batch_size"):
        lines.append(f"Batch: {cfg['algorithm_params']['batch_size']}")
    if (cfg.get("league") or {}).get("enabled"):
        lines.append("League: on")
    return "\n".join(lines)


def _finite_number(v) -> bool:
    return (isinstance(v, (int, float)) and not isinstance(v, bool)
            and math.isfinite(v))


def pv_ratio(rows) -> list:
    out = []
    for r in rows or []:
        p, v = r.get("policy_loss"), r.get("value_loss")
        ok = (p is not None and v is not None and _finite_number(p)
              and _finite_number(v) and v != 0)
        out.append([r.get("epoch") or 0, abs(p / v) if ok else None])
    return out


def entry_records(results) -> dict:
    rec: dict = {}

    def get(i):
        return rec.setdefault(i, {"w": 0, "l": 0, "d": 0, "g": 0})

    for r in results or []:
        games = (r.get("wins_a") or 0) + (r.get("wins_b") or 0) + (r.get("draws") or 0)
        a, b = get(r["entry_a_id"]), get(r["entry_b_id"])
        a["w"] += r.get("wins_a") or 0
        a["l"] += r.get("wins_b") or 0
        a["d"] += r.get("draws") or 0
        b["w"] += r.get("wins_b") or 0
        b["l"] += r.get("wins_a") or 0
        b["d"] += r.get("draws") or 0
        a["g"] += games
        b["g"] += games
    return rec


def elo_deltas(elo_history) -> dict:
    hist: dict = {}
    for r in elo_history or []:
        hist.setdefault(r["entry_id"], []).append([r["epoch"], r["elo_rating"]])
    out = {}
    for eid, pts in hist.items():
        pts.sort(key=lambda p: p[0])
        out[eid] = 0 if len(pts) < 2 else pts[-1][1] - pts[-2][1]
    return out


_TIER_ORDER = [
    ("frontier", lambda role: role.startswith("frontier")),
    ("recent", lambda role: role.startswith("recent")),
    ("dynamic", lambda role: role.startswith("dynamic")),
    ("historical", lambda role: role.startswith("historical")),
]


def group_entries_by_tier(entries) -> list:
    groups = [{"tier": tier, "items": []} for tier, _ in _TIER_ORDER]
    other = {"tier": "other", "items": []}
    for e in entries or []:
        role = e.get("role") or ""
        for i, (_, pred) in enumerate(_TIER_ORDER):
            if pred(role):
                groups[i]["items"].append(e)
                break
        else:
            other["items"].append(e)
    if other["items"]:
        groups.append(other)
    return [g for g in groups if g["items"]]


def sort_entries(entries, key, direction, style_of=None, aux=None) -> list:
    records = (aux or {}).get("records") or {}
    deltas = (aux or {}).get("deltas") or {}

    def val(e):
        if key == "name":
            return (e.get("display_name") or f"entry {e['id']}").lower()
        if key == "role":
            return e.get("role") or ""
        if key == "games":
            return e.get("games_played") or 0
        if key == "style":
            return (style_of or {}).get(e["id"]) or ""
        if key == "elo":
            return e.get("elo_rating") or 0
        if key == "record":
            return (records.get(e["id"]) or {"w": 0})["w"]
        if key == "wr":
            r = records.get(e["id"])
            v = win_rate(r) if r else None
            return -1 if v is None else v
        if key == "delta":
            return deltas.get(e["id"]) or 0
        return -(e.get("elo_rating") or 0)

    import functools

    d = 1 if direction == 1 else -1

    def cmp(a, b):
        if a[0] < b[0]:
            return -d
        if a[0] > b[0]:
            return d
        return a[1] - b[1]  # stable: ties keep input order

    decorated = [(val(e), i, e) for i, e in enumerate(entries)]
    return [e for _, _, e in sorted(decorated, key=functools.cmp_to_key(cmp))]


ROLE_INFO = [
    ("frontier", {"icon": "🛡", "label": "Frontier",
                  "cssClass": "role-frontier",
                  "tooltip": "Frontier — strongest fixed checkpoints, "
                             "the bar to clear"}),
    ("recent", {"icon": "✦", "label": "Recent", "cssClass": "role-recent",
                "tooltip": "Recent — the last few snapshots of the "
                           "training policy"}),
    ("dynamic", {"icon": "⚔", "label": "Dynamic", "cssClass": "role-dynamic",
                 "tooltip": "Dynamic — evolving opponents that keep "
                            "learning"}),
    ("historical", {"icon": "📜", "label": "Historical",
                    "cssClass": "role-historical",
                    "tooltip": "Historical — archived milestone policies"}),
]
ROLE_RETIRED = {"icon": "⏸", "label": "Retired", "cssClass": "role-retired",
                "tooltip": "Retired — out of the active pool"}
ROLE_UNKNOWN = {"icon": "?", "label": "Unknown", "cssClass": "role-unknown",
                "tooltip": "Unknown role"}


def _js_round(x):
    # JS Math.round semantics: half-up toward +inf (Python round is half-even)
    return math.floor(x + 0.5)


def role_info(role, status=None) -> dict:
    if status == "retired":
        return ROLE_RETIRED
    for prefix, info in ROLE_INFO:
        if (role or "").startswith(prefix):
            return info
    return ROLE_UNKNOWN


def recent_matches(results, entries, max_rows: int = 30) -> list:
    by_id = {e["id"]: e for e in entries or []}
    clash: dict = {}
    for r in results or []:
        k = "-".join(map(str, sorted([r["entry_a_id"], r["entry_b_id"]])))
        clash[k] = clash.get(k, 0) + 1

    def name(i):
        e = by_id.get(i)
        return (e.get("display_name") or f"entry {i}") if e else f"#{i}"

    rows = sorted(results or [], key=lambda r: -r["id"])[:max_rows]
    out = []
    for r in rows:
        k = "-".join(map(str, sorted([r["entry_a_id"], r["entry_b_id"]])))
        wa, wb, d = r.get("wins_a"), r.get("wins_b"), r.get("draws") or 0
        draw = wa == wb
        a_won = wa > wb
        first = a_won or draw
        ea, eb = by_id.get(r["entry_a_id"]), by_id.get(r["entry_b_id"])
        pre_a = (_js_round(r["elo_before_a"])
                 if r.get("elo_before_a") is not None else None)
        pre_b = (_js_round(r["elo_before_b"])
                 if r.get("elo_before_b") is not None else None)
        d_a = (_js_round(r["elo_after_a"] - r["elo_before_a"])
               if r.get("elo_after_a") is not None
               and r.get("elo_before_a") is not None else 0)
        d_b = (_js_round(r["elo_after_b"] - r["elo_before_b"])
               if r.get("elo_after_b") is not None
               and r.get("elo_before_b") is not None else 0)
        w, l = (wa, wb) if first else (wb, wa)
        total = wa + wb + d
        winner_elo = pre_a if first else pre_b
        loser_elo = pre_b if first else pre_a
        ew, el_ = (ea, eb) if first else (eb, ea)
        out.append({
            "rid": r["id"], "epoch": r.get("epoch"),
            "type": r.get("match_type") or "",
            "aId": r["entry_a_id"], "bId": r["entry_b_id"],
            "aName": name(r["entry_a_id"]), "bName": name(r["entry_b_id"]),
            "wa": wa, "wb": wb, "d": d,
            "winner": "a" if a_won else ("draw" if draw else "b"),
            "clashes": clash.get(k, 0),
            "draw": draw,
            "winnerId": r["entry_a_id"] if first else r["entry_b_id"],
            "loserId": r["entry_b_id"] if first else r["entry_a_id"],
            "winnerName": name(r["entry_a_id"] if first else r["entry_b_id"]),
            "loserName": name(r["entry_b_id"] if first else r["entry_a_id"]),
            "winnerRole": ew.get("role") if ew else None,
            "loserRole": el_.get("role") if el_ else None,
            "winnerStatus": ew.get("status") if ew else None,
            "loserStatus": el_.get("status") if el_ else None,
            "winnerElo": winner_elo, "loserElo": loser_elo,
            "eloWinner": d_a if first else d_b,
            "eloLoser": d_b if first else d_a,
            "w": w, "l": l, "total": total,
            "winPct": _js_round((w / total) * 100) if total > 0 else 0,
            "upset": (not draw and winner_elo is not None
                      and loser_elo is not None
                      and loser_elo - winner_elo >= 100),
        })
    return out


def scorecard(game, entries, displayed_ply, est_total_ply: int = 140):
    if not game:
        return None

    def find(i):
        for e in entries or []:
            if str(e["id"]) == str(i):
                return e
        return None

    def side(i, fallback_name, fallback_elo):
        e = find(i)
        elo = (e["elo_rating"] if e is not None and e.get("elo_rating") is not None
               else fallback_elo if fallback_elo is not None else None)
        return {"id": i,
                "name": (e or {}).get("display_name") or fallback_name or f"#{i}",
                "elo": elo,
                "role": (e or {}).get("role") or None,
                "architecture": (e or {}).get("architecture") or None}

    ply = displayed_ply if displayed_ply is not None else game.get("total_ply") or 0
    return {
        "black": side(game.get("entry_id_black"), game.get("name_black"),
                      game.get("elo_black")),
        "white": side(game.get("entry_id_white"), game.get("name_white"),
                      game.get("elo_white")),
        "progress": max(0, min(1, ply / max(est_total_ply, 1))),
        "status": game.get("status") or "in_progress",
    }


# -- piece-movement legend ----------------------------------------------------

_S, _L, _J = "step", "slide", "jump"
_GOLD_GRID = [[_S, _S, _S], [_S, None, _S], [None, _S, None]]
_MOVE_PATTERNS = {
    "pawn": [[None, _S, None], [None, None, None], [None, None, None]],
    "lance": [[None, _L, None], [None, None, None], [None, None, None]],
    "knight": [[_J, None, _J], [None, None, None], [None, None, None]],
    "silver": [[_S, _S, _S], [None, None, None], [_S, None, _S]],
    "gold": _GOLD_GRID,
    "bishop": [[_L, None, _L], [None, None, None], [_L, None, _L]],
    "rook": [[None, _L, None], [_L, None, _L], [None, _L, None]],
    "king": [[_S, _S, _S], [_S, None, _S], [_S, _S, _S]],
}
_PROMOTED_PATTERNS = {
    "pawn": _GOLD_GRID, "lance": _GOLD_GRID, "knight": _GOLD_GRID,
    "silver": _GOLD_GRID,
    "bishop": [[_L, _S, _L], [_S, None, _S], [_L, _S, _L]],
    "rook": [[_S, _L, _S], [_L, None, _L], [_S, _L, _S]],
}


def move_pattern(kind, promoted):
    if promoted:
        return _PROMOTED_PATTERNS.get(kind)
    return _MOVE_PATTERNS.get(kind)


# -- chart math ---------------------------------------------------------------


def nice_ticks(lo, hi, n: int = 4) -> list:
    if not (_finite_number(lo) and _finite_number(hi)):
        return []
    if lo == hi:
        lo -= 1
        hi += 1
    span = hi - lo
    step0 = span / max(n, 1)
    mag = 10 ** math.floor(math.log10(step0))
    norm = step0 / mag
    step = (5 if norm >= 5 else 2 if norm >= 2 else 1) * mag
    t0 = math.ceil(lo / step) * step
    ticks = []
    t = t0
    while t <= hi + step * 1e-9:
        ticks.append(0 if abs(t) < step * 1e-9 else t)
        t += step
    return ticks


def ema(points, alpha):
    if not alpha > 0 or alpha >= 1:
        return points
    acc = None
    out = []
    for x, y in points:
        if not _finite_number(y):
            out.append([x, y])
            continue
        acc = y if acc is None else alpha * y + (1 - alpha) * acc
        out.append([x, acc])
    return out


def downsample(points, max_n):
    if len(points) <= max_n or max_n < 4:
        return points
    buckets = max_n // 2
    per = len(points) / buckets
    out = []
    for b in range(buckets):
        s = math.floor(b * per)
        e = min(math.floor((b + 1) * per), len(points))
        mn = mx = None
        for i in range(s, e):
            p = points[i]
            if not _finite_number(p[1]):
                continue
            if mn is None or p[1] < mn[1]:
                mn = p
            if mx is None or p[1] > mx[1]:
                mx = p
        if mn is None:
            continue
        if mn is mx:
            out.append(mn)
        elif mn[0] <= mx[0]:
            out.extend([mn, mx])
        else:
            out.extend([mx, mn])
    return out


def nearest_index(points, x) -> int:
    if not points:
        return -1
    lo, hi = 0, len(points) - 1
    while hi - lo > 1:
        mid = (lo + hi) >> 1
        if points[mid][0] < x:
            lo = mid
        else:
            hi = mid
    return lo if abs(points[lo][0] - x) <= abs(points[hi][0] - x) else hi


def time_format(seconds) -> str:
    if not _finite_number(seconds) or seconds < 0:
        return "—"
    d = int(seconds // 86400)
    h = int((seconds % 86400) // 3600)
    m = int((seconds % 3600) // 60)
    s = int(seconds % 60)
    if d:
        return f"{d}d {h}h"
    if h:
        return f"{h}h {m}m"
    if m:
        return f"{m}m {s}s"
    return f"{s}s"


def safe_parse(text, fallback=None):
    if not isinstance(text, str) or not text:
        return fallback
    try:
        v = json.loads(text)
    except ValueError:
        return fallback
    return fallback if v is None else v


# -- metric help (parsed from the REAL lib.js source, so the twin serves
# the exact strings the dashboard shows) -------------------------------------


def _parse_metric_help() -> dict:
    import re
    from pathlib import Path

    src = (Path(__file__).resolve().parent.parent / "keisei_tpu" / "server"
           / "static" / "lib.js").read_text(encoding="utf-8")
    block = src.split("const METRIC_HELP = {", 1)[1].split("};", 1)[0]
    out = {}
    for m in re.finditer(
            r'"(c-[a-z]+)":((?:[^,]|,(?!\n\s*"c-))*)', block):
        out[m.group(1)] = "".join(re.findall(r'"([^"]*)"', m.group(2)))
    return out


METRIC_HELP = _parse_metric_help()


# -- about view ---------------------------------------------------------------

ABOUT_LEVELS = [
    {"id": 1, "label": "Glance", "blurb": "one paragraph, no jargon"},
    {"id": 2, "label": "Curious", "blurb": "how the learning loop works"},
    {"id": 3, "label": "Engineer", "blurb": "inside the network and the data"},
    {"id": 4, "label": "Practitioner", "blurb": "the algorithm and its knobs"},
    {"id": 5, "label": "Researcher",
     "blurb": "framing, hardware mapping, limits"},
]


def clamp_about_level(n) -> int:
    if not _finite_number(n):
        return 1
    # JS Math.round: half-up (Python round() is half-even)
    return min(len(ABOUT_LEVELS), max(1, math.floor(n + 0.5)))


def visible_about_toc(items, level) -> list:
    return [it for it in items if it["minLevel"] <= level]


def group_toc(items) -> list:
    groups: list = []
    for it in items:
        last = groups[-1] if groups else None
        if last and last["section"] == it["section"] and it["section"] is not None:
            last["items"].append(it)
        else:
            groups.append({"section": it["section"], "items": [it]})
    return groups


def fmt(v) -> str:
    a = abs(v)
    if a >= 1e6:
        return f"{v / 1e6:.1f}M"
    if a >= 1000:
        return f"{v / 1000:.1f}k"
    if a >= 10:
        return f"{v:.1f}"
    if a == 0:
        return "0"
    if a < 0.001:
        # JS toExponential(1): "1.0e-4" (no zero-padded exponent)
        mant, exp = f"{v:.1e}".split("e")
        return f"{mant}e{int(exp)}"
    # JS toPrecision(3): 3 significant digits with trailing zeros kept
    decimals = 2 - math.floor(math.log10(a))
    return f"{v:.{decimals}f}"
