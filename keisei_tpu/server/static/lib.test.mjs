/* Unit tests for the dashboard's pure helpers (lib.js), run with
 * `node --test keisei_tpu/server/static/` in CI (ui-unit job) — the
 * counterpart of the reference webui's colocated vitest files
 * (webui/package.json:10-18). On a node-less dev box the wiring contract
 * is pinned structurally by tests/test_server.py::TestStaticUI. */
import { test } from "node:test";
import assert from "node:assert/strict";
import { createRequire } from "node:module";

const require = createRequire(import.meta.url);
const KT = require("./lib.js");

test("usiToCell maps files/ranks row-major from 9a", () => {
  assert.equal(KT.usiToCell("9a"), 0);
  assert.equal(KT.usiToCell("1a"), 8);
  assert.equal(KT.usiToCell("9i"), 72);
  assert.equal(KT.usiToCell("1i"), 80);
  assert.equal(KT.usiToCell("5e"), 4 * 9 + 4);
  assert.equal(KT.usiToCell("0a"), -1);
  assert.equal(KT.usiToCell("5j"), -1);
  assert.equal(KT.usiToCell(""), -1);
  assert.equal(KT.usiToCell(null), -1);
});

test("usiDestCell reads the destination square of board moves and drops", () => {
  assert.equal(KT.usiDestCell("7g7f"), KT.usiToCell("7f"));
  assert.equal(KT.usiDestCell("P*5e"), KT.usiToCell("5e"));
  assert.equal(KT.usiDestCell("7g"), -1);
  assert.equal(KT.usiDestCell(undefined), -1);
});

test("pieceChar honors notation and promotion", () => {
  assert.equal(KT.pieceChar({ type: "pawn" }, "kanji"), "歩");
  assert.equal(KT.pieceChar({ type: "pawn", promoted: true }, "kanji"), "と");
  assert.equal(KT.pieceChar({ type: "gold", promoted: true }, "kanji"), "金");
  assert.equal(KT.pieceChar({ type: "rook" }, "letters"), "R");
  assert.equal(KT.pieceChar({ type: "rook", promoted: true }, "letters"), "+R");
});

test("moverOf is the opponent of current_player", () => {
  assert.equal(KT.moverOf({ current_player: "black" }), "white");
  assert.equal(KT.moverOf({ current_player: "white" }), "black");
});

test("blackProb flips mover-perspective values to black's view", () => {
  // black just moved (white to move) with value 0.5 -> black prob 0.75
  assert.equal(KT.blackProb({ current_player: "white", value_estimate: 0.5 }), 0.75);
  // white just moved with value 0.5 (good for white) -> black prob 0.25
  assert.equal(KT.blackProb({ current_player: "black", value_estimate: 0.5 }), 0.25);
  assert.equal(KT.blackProb({ current_player: "black", value_estimate: null }), null);
  assert.equal(KT.blackProb({ current_player: "black" }), null);
});

test("stmBlackProb treats value as side-to-move perspective (live boards)", () => {
  // black to move, value 0.5 (good for black) -> black prob 0.75
  assert.equal(KT.stmBlackProb({ current_player: "black", value_estimate: 0.5 }), 0.75);
  // white to move, value 0.5 (good for white) -> black prob 0.25
  assert.equal(KT.stmBlackProb({ current_player: "white", value_estimate: 0.5 }), 0.25);
  assert.equal(KT.stmBlackProb({ current_player: "black", value_estimate: null }), null);
  assert.equal(KT.stmBlackProb({ current_player: "black" }), null);
});

test("sortEntries sorts by key/dir, stable, with style lookup", () => {
  const entries = [
    { id: 1, display_name: "b", role: "frontier", elo_rating: 1500, games_played: 10 },
    { id: 2, display_name: "a", role: "dynamic", elo_rating: 1600, games_played: 5 },
    { id: 3, display_name: "c", role: "frontier", elo_rating: 1500, games_played: 20 },
  ];
  assert.deepEqual(KT.sortEntries(entries, "elo", -1).map(e => e.id), [2, 1, 3]);
  assert.deepEqual(KT.sortEntries(entries, "name", 1).map(e => e.id), [2, 1, 3]);
  assert.deepEqual(KT.sortEntries(entries, "games", -1).map(e => e.id), [3, 1, 2]);
  // ties keep input order (stable): 1 before 3 at equal elo ascending
  assert.deepEqual(KT.sortEntries(entries, "elo", 1).map(e => e.id), [1, 3, 2]);
  const styleOf = { 1: "sharp", 2: "calm", 3: "balanced" };
  assert.deepEqual(KT.sortEntries(entries, "style", 1, styleOf).map(e => e.id),
                   [3, 2, 1]);
  // unknown key falls back to elo descending
  assert.deepEqual(KT.sortEntries(entries, "nope", 1).map(e => e.id), [2, 1, 3]);
  // input is not mutated
  assert.deepEqual(entries.map(e => e.id), [1, 2, 3]);
});

test("recentMatches resolves names, winners, and pair clash counts", () => {
  const entries = [
    { id: 1, display_name: "Alpha" }, { id: 2, display_name: "Beta" },
  ];
  const results = [
    { id: 10, epoch: 5, entry_a_id: 1, entry_b_id: 2, wins_a: 3, wins_b: 1,
      draws: 0, match_type: "ladder" },
    { id: 11, epoch: 6, entry_a_id: 2, entry_b_id: 1, wins_a: 2, wins_b: 2,
      draws: 1, match_type: "ladder" },
    { id: 12, epoch: 7, entry_a_id: 1, entry_b_id: 9, wins_a: 0, wins_b: 4,
      draws: 0, match_type: "gauntlet" },
  ];
  const rows = KT.recentMatches(results, entries, 2);
  // newest first, capped at max
  assert.deepEqual(rows.map(r => r.rid), [12, 11]);
  // unknown entry falls back to #id; winner side computed
  assert.equal(rows[0].bName, "#9");
  assert.equal(rows[0].winner, "b");
  assert.equal(rows[1].winner, "draw");
  // clash count spans ALL results for the pair, regardless of a/b order
  assert.equal(rows[1].clashes, 2);
  assert.equal(rows[0].clashes, 1);
  assert.equal(rows[1].aName, "Beta");
});

test("recentMatches winner-perspective: Elo, deltas, win%, upset", () => {
  const entries = [
    { id: 1, display_name: "Alpha", role: "frontier_static",
      status: "active" },
    { id: 2, display_name: "Beta", role: "dynamic", status: "active" },
  ];
  const results = [{
    id: 10, epoch: 5, entry_a_id: 1, entry_b_id: 2,
    wins_a: 1, wins_b: 3, draws: 1, match_type: "ladder",
    elo_before_a: 1712.6, elo_after_a: 1701.2,
    elo_before_b: 1561.4, elo_after_b: 1572.8,
  }];
  const [r] = KT.recentMatches(results, entries, 5);
  // B won from 151 Elo below A: an upset, shown winner-first
  assert.equal(r.winnerName, "Beta");
  assert.equal(r.loserName, "Alpha");
  assert.equal(r.winnerRole, "dynamic");
  assert.equal(r.loserRole, "frontier_static");
  assert.deepEqual([r.winnerElo, r.loserElo], [1561, 1713]);
  assert.deepEqual([r.eloWinner, r.eloLoser], [11, -11]);
  assert.deepEqual([r.w, r.l, r.total], [3, 1, 5]);
  assert.equal(r.winPct, 60);
  assert.equal(r.upset, true);
  assert.equal(r.draw, false);
});

test("recentMatches: draws keep A first; missing Elo degrades", () => {
  const entries = [
    { id: 1, display_name: "Alpha" }, { id: 2, display_name: "Beta" },
  ];
  const [d] = KT.recentMatches(
    [{ id: 3, epoch: 1, entry_a_id: 2, entry_b_id: 1,
       wins_a: 2, wins_b: 2, draws: 0,
       elo_before_a: 1400.0, elo_after_a: 1400.0,
       elo_before_b: 1900.0, elo_after_b: 1900.0 }], entries, 5);
  assert.equal(d.winnerName, "Beta");   // A-side leads on a draw
  assert.equal(d.draw, true);
  assert.equal(d.upset, false);
  assert.deepEqual([d.eloWinner, d.eloLoser], [0, 0]);
  const [m] = KT.recentMatches(
    [{ id: 1, epoch: 0, entry_a_id: 7, entry_b_id: 8,
       wins_a: 2, wins_b: 0, draws: 0 }], [], 5);
  assert.equal(m.winnerElo, null);
  assert.deepEqual([m.eloWinner, m.eloLoser], [0, 0]);
  assert.equal(m.upset, false);
  assert.equal(m.winnerName, "#7");
});

test("roleInfo maps tier prefixes; retired overrides; unknown falls through",
     () => {
  assert.equal(KT.roleInfo("frontier_static", "active").icon, "🛡");
  assert.equal(KT.roleInfo("recent_fixed", null).label, "Recent");
  assert.equal(KT.roleInfo("dynamic", "active").cssClass, "role-dynamic");
  assert.equal(KT.roleInfo("historical", null).icon, "📜");
  assert.equal(KT.roleInfo("frontier_static", "retired").label, "Retired");
  assert.equal(KT.roleInfo("mystery", null).label, "Unknown");
  assert.equal(KT.roleInfo(null, null).label, "Unknown");
});

test("scorecard matches TEXT showcase ids to integer entries", () => {
  const entries = [
    { id: 3, display_name: "Kuro", elo_rating: 1612.4, role: "frontier_static",
      architecture: "se_resnet" },
  ];
  const game = { entry_id_black: "3", entry_id_white: "8",
                 name_white: "Shiro", elo_white: 1500.5,
                 status: "in_progress", total_ply: 70 };
  const sc = KT.scorecard(game, entries, null);
  assert.equal(sc.black.name, "Kuro");
  assert.equal(sc.black.elo, 1612.4);
  assert.equal(sc.black.role, "frontier_static");
  // white missing from league -> game-row fallbacks
  assert.equal(sc.white.name, "Shiro");
  assert.equal(sc.white.elo, 1500.5);
  assert.equal(sc.white.role, null);
  assert.equal(sc.progress, 0.5);          // 70 / 140 default estimate
  // displayed (scrubbed) ply overrides the live total; clamped to [0,1]
  assert.equal(KT.scorecard(game, entries, 35).progress, 0.25);
  assert.equal(KT.scorecard(game, entries, 1000).progress, 1);
  assert.equal(KT.scorecard(null, entries, null), null);
});

test("movePattern encodes shogi movement (promotions = gold except B/R)", () => {
  // promoted pawn/lance/knight/silver all move as gold
  for (const k of ["pawn", "lance", "knight", "silver"])
    assert.deepEqual(KT.movePattern(k, true), KT.movePattern("gold", false));
  // lance slides forward only; pawn steps
  assert.equal(KT.movePattern("lance", false)[0][1], "slide");
  assert.equal(KT.movePattern("pawn", false)[0][1], "step");
  // knight leaps to the two forward-diagonal files
  assert.deepEqual(KT.movePattern("knight", false)[0], ["jump", null, "jump"]);
  // king steps all 8; center always empty
  const king = KT.movePattern("king", false);
  assert.equal(king.flat().filter(v => v === "step").length, 8);
  assert.equal(king[1][1], null);
  // horse = bishop slides + orthogonal steps (8 non-null cells)
  const horse = KT.movePattern("bishop", true);
  assert.equal(horse[0][0], "slide");
  assert.equal(horse[0][1], "step");
  // dragon = rook slides + diagonal steps
  const dragon = KT.movePattern("rook", true);
  assert.equal(dragon[0][1], "slide");
  assert.equal(dragon[0][0], "step");
  // gold/king have no promotion; unknown kinds are null
  assert.equal(KT.movePattern("gold", true), null);
  assert.equal(KT.movePattern("dog", false), null);
});

test("freshMoves drops rows already held (init/poll race dedup)", () => {
  const held = [{ ply: 1 }, { ply: 2 }];
  assert.deepEqual(KT.freshMoves(held, [{ ply: 2 }, { ply: 3 }]),
                   [{ ply: 3 }]);
  assert.deepEqual(KT.freshMoves([], [{ ply: 1 }]), [{ ply: 1 }]);
  assert.deepEqual(KT.freshMoves(held, null), []);
});

test("heatCells normalizes by max prob and keys by destination cell", () => {
  const heat = KT.heatCells(JSON.stringify({ "7g7f": 0.2, "P*5e": 0.4 }));
  assert.equal(heat[KT.usiToCell("5e")], 1);
  assert.equal(heat[KT.usiToCell("7f")], 0.5);
  assert.equal(KT.heatCells("not json"), null);
  assert.equal(KT.heatCells("{}"), null);
  assert.equal(KT.heatCells('{"x":"y"}'), null);
});

test("heatCells keeps the max when two moves share a destination", () => {
  const heat = KT.heatCells(JSON.stringify({ "7g7f": 0.1, "P*7f": 0.4 }));
  assert.equal(heat[KT.usiToCell("7f")], 1);
});

test("h2hFor normalizes both row orientations to the entry's view", () => {
  const rows = [
    { entry_a_id: 1, entry_b_id: 2, wins_a: 3, wins_b: 1, draws: 2, games: 6 },
    { entry_a_id: 3, entry_b_id: 1, wins_a: 4, wins_b: 0, draws: 0, games: 4 },
    { entry_a_id: 2, entry_b_id: 3, wins_a: 9, wins_b: 9, draws: 9, games: 27 },
  ];
  const mine = KT.h2hFor(rows, 1);
  assert.deepEqual(mine, [
    { opp: 2, w: 3, l: 1, d: 2, g: 6 },
    { opp: 3, w: 0, l: 4, d: 0, g: 4 },
  ]);
  assert.equal(KT.winRate(mine[0]), (3 + 1) / 6);
  assert.equal(KT.winRate(mine[1]), 0);
  assert.equal(KT.winRate({ w: 0, l: 0, d: 0, g: 0 }), null);
});

test("niceTicks picks 1/2/5 steps spanning the range", () => {
  assert.deepEqual(KT.niceTicks(0, 10, 4), [0, 2, 4, 6, 8, 10]);
  const t = KT.niceTicks(0, 1, 4);
  assert.ok(t.includes(0) && t.includes(1));
  assert.ok(t.every((x) => x >= 0 && x <= 1));
  const neg = KT.niceTicks(-3, 3, 4);
  assert.ok(neg.includes(0));
  assert.deepEqual(KT.niceTicks(5, 5), KT.niceTicks(4, 6));
  assert.deepEqual(KT.niceTicks(NaN, 1), []);
});

test("ema smooths but passes gaps through", () => {
  const raw = [[0, 0], [1, 10], [2, NaN], [3, 10]];
  const sm = KT.ema(raw, 0.5);
  assert.equal(sm[0][1], 0);
  assert.equal(sm[1][1], 5);
  assert.ok(Number.isNaN(sm[2][1]));
  assert.equal(sm[3][1], 7.5);       // EMA state skipped the gap
  assert.equal(KT.ema(raw, 1), raw); // alpha 1 = identity
});

test("downsample keeps extremes and stays within budget", () => {
  const pts = [];
  for (let i = 0; i < 10000; i++) pts.push([i, Math.sin(i / 50)]);
  pts[5000] = [5000, 99];  // spike must survive
  const ds = KT.downsample(pts, 500);
  assert.ok(ds.length <= 500);
  assert.ok(ds.some(([, y]) => y === 99));
  // x stays sorted so the polyline doesn't zigzag
  for (let i = 1; i < ds.length; i++) assert.ok(ds[i][0] >= ds[i - 1][0]);
  const short = pts.slice(0, 10);  // short input returned as-is
  assert.equal(KT.downsample(short, 500), short);
});

test("nearestIndex binary-searches the closest x", () => {
  const pts = [[0, 0], [10, 0], [20, 0], [35, 0]];
  assert.equal(KT.nearestIndex(pts, -5), 0);
  assert.equal(KT.nearestIndex(pts, 14), 1);
  assert.equal(KT.nearestIndex(pts, 16), 2);
  assert.equal(KT.nearestIndex(pts, 100), 3);
  assert.equal(KT.nearestIndex([], 5), -1);
});

test("fmt is compact across magnitudes", () => {
  assert.equal(KT.fmt(0), "0");
  assert.equal(KT.fmt(1234567), "1.2M");
  assert.equal(KT.fmt(2500), "2.5k");
  assert.equal(KT.fmt(12.34), "12.3");
  assert.equal(KT.fmt(0.5), "0.500");
  assert.equal(KT.fmt(0.0001), "1.0e-4");
});

test("moveDots classifies win-prob swings from the mover's perspective", () => {
  // value_estimate is mover-perspective; current_player is the NEXT mover
  const moves = [
    { current_player: "white", value_estimate: 0.0 },    // black, p=0.50
    { current_player: "black", value_estimate: -0.6 },   // white, p=0.80
    { current_player: "white", value_estimate: 0.84 },   // black, p=0.92
    { current_player: "black", value_estimate: -0.2 },   // white, p=0.60
    { current_player: "white", value_estimate: null },   // missing
    { current_player: "black", value_estimate: 0.0 },    // prev null
  ];
  assert.deepEqual(KT.moveDots(moves),
    ["normal", "blunder", "strong", "brilliant", null, "normal"]);
  assert.deepEqual(KT.moveDots([]), []);
  assert.deepEqual(KT.moveDots(null), []);
});

test("moveDots thresholds: 10 and 25 points, sign by mover", () => {
  const mk = (cp, v) => ({ current_player: cp, value_estimate: v });
  // NOTE: p=0.60 exactly would sit one ulp above the -0.10 threshold
  // (2*0.6-1 rounds to 0.19999999999999996), so use a clear crossing
  const dots = KT.moveDots([
    mk("white", 0.0),            // black, p=0.5
    mk("black", -(2 * 0.61 - 1)), // white, p=0.61 -> white gain -0.11 = mistake
  ]);
  assert.deepEqual(dots, ["normal", "mistake"]);
});

test("showcaseStats tallies captures/drops/promotions/checks per side", () => {
  const mk = (cp, n, chk = 0) => ({ current_player: cp, usi_notation: n, in_check: chk });
  const s = KT.showcaseStats([
    mk("white", "Px7f"),      // black capture
    mk("black", "B*4e"),      // white drop
    mk("white", "Bx3c+", 1),  // black capture + promotion + check
    mk("black", "S-4c="),     // white declined promotion: nothing
    mk("white", "+P-5b"),     // black tokin move: leading + is NOT a promotion
  ]);
  assert.equal(s.plies, 5);
  assert.deepEqual(s.black, { captures: 2, drops: 0, promotions: 1, checks: 1 });
  assert.deepEqual(s.white, { captures: 0, drops: 1, promotions: 0, checks: 0 });
  assert.equal(KT.showcaseStats([]).plies, 0);
  assert.equal(KT.showcaseStats(null).plies, 0);
});

test("collapseEvents merges consecutive same-entry same-kind rows", () => {
  const t = (entry_id, from_role, to_role) => ({ entry_id, from_role, to_role });
  const rows = [
    t(1, "dynamic", "frontier_static"),
    t(1, "dynamic", "frontier_static"),
    t(1, "dynamic", "frontier_static"),
    t(2, "dynamic", "frontier_static"),
    t(1, "dynamic", "frontier_static"),  // non-consecutive: new row
  ];
  const out = KT.collapseEvents(rows);
  assert.equal(out.length, 3);
  assert.equal(out[0].count, 3);
  assert.equal(out[1].entry_id, 2);
  assert.equal(out[2].count, 1);
});

test("collapseEvents distinguishes role vs status transitions and caps", () => {
  const rows = [
    { entry_id: 1, from_role: "dynamic", to_role: "recent_fixed" },
    { entry_id: 1, from_status: "active", to_status: "retired" },
  ];
  const out = KT.collapseEvents(rows);
  assert.equal(out.length, 2);  // different kinds never merge
  const many = Array.from({ length: 60 }, (_, i) => ({ entry_id: i }));
  assert.equal(KT.collapseEvents(many, 25).length, 25);
});

test("timeFormat covers all magnitudes and rejects bad input", () => {
  assert.equal(KT.timeFormat(0), "0s");
  assert.equal(KT.timeFormat(45), "45s");
  assert.equal(KT.timeFormat(3 * 60 + 12), "3m 12s");
  assert.equal(KT.timeFormat(3 * 3600 + 12 * 60), "3h 12m");
  assert.equal(KT.timeFormat(2 * 86400 + 4 * 3600 + 30), "2d 4h");
  assert.equal(KT.timeFormat(-5), "—");
  assert.equal(KT.timeFormat(NaN), "—");
  assert.equal(KT.timeFormat(Infinity), "—");
});

test("safeParse never throws and honors fallback", () => {
  assert.deepEqual(KT.safeParse('{"a":1}'), { a: 1 });
  assert.deepEqual(KT.safeParse("not json", []), []);
  assert.deepEqual(KT.safeParse("", {}), {});
  assert.deepEqual(KT.safeParse(null, "x"), "x");
  assert.deepEqual(KT.safeParse(undefined, 7), 7);
  assert.deepEqual(KT.safeParse("null", 5), 5); // null payload -> fallback
  assert.deepEqual(KT.safeParse("[1,2]"), [1, 2]);
});

test("METRIC_HELP names only chart canvases that exist in index.html", () => {
  // structural: every key follows the chart-canvas id convention; content
  // checks live in tests/test_server.py (DOM id cross-check)
  for (const key of Object.keys(KT.METRIC_HELP)) {
    assert.match(key, /^c-[a-z]+$/);
    assert.ok(KT.METRIC_HELP[key].length > 20);
  }
});

test("pvRatio pairs epochs with |p/v| and nulls bad rows", () => {
  const rows = [
    { epoch: 1, policy_loss: -0.2, value_loss: 0.8 },
    { epoch: 2, policy_loss: 0.3, value_loss: 0 },        // div-by-zero
    { epoch: 3, policy_loss: null, value_loss: 0.5 },     // missing
    { epoch: 4, policy_loss: NaN, value_loss: 0.5 },      // non-finite
    { policy_loss: 0.5, value_loss: -0.5 },               // missing epoch
  ];
  assert.deepEqual(KT.pvRatio(rows), [
    [1, 0.25], [2, null], [3, null], [4, null], [0, 1],
  ]);
  assert.deepEqual(KT.pvRatio([]), []);
  assert.deepEqual(KT.pvRatio(null), []);
});

test("indicator maps liveness/status/phase to badge states", () => {
  assert.deepEqual(KT.indicator(true, "running", "update"),
    { cls: "update", text: "▲ PPO UPDATE" });
  assert.deepEqual(KT.indicator(true, "running", "rollout"),
    { cls: "rollout", text: "▶ ROLLOUT" });
  assert.equal(KT.indicator(true, "running", "init").cls, "alive");
  assert.equal(KT.indicator(false, "completed", "").cls, "stopped");
  assert.equal(KT.indicator(false, "paused", "").cls, "stopped");
  assert.equal(KT.indicator(false, "stopped", "").cls, "stopped");
  // running-but-silent is the stale (warning) state, not stopped
  assert.equal(KT.indicator(false, "running", "rollout").cls, "stale");
  assert.equal(KT.indicator(false, undefined, undefined).cls, "stale");
});

test("heartbeatFresh handles ISO forms, staleness, and garbage", () => {
  const now = Date.parse("2026-08-18T12:00:00Z");
  assert.equal(KT.heartbeatFresh("2026-08-18T11:59:45Z", now), true);
  assert.equal(KT.heartbeatFresh("2026-08-18T11:59:00Z", now), false); // 60s
  // missing Z is treated as UTC (server writes naive-UTC strftime)
  assert.equal(KT.heartbeatFresh("2026-08-18T11:59:45", now), true);
  assert.equal(KT.heartbeatFresh("2026-08-18T11:59:00+00:00", now), false);
  assert.equal(KT.heartbeatFresh(null, now), false);
  assert.equal(KT.heartbeatFresh("not a date", now), false);
  assert.equal(KT.heartbeatFresh(1755518385, now), false); // wrong type
  // custom threshold
  assert.equal(KT.heartbeatFresh("2026-08-18T11:59:00Z", now, 120), true);
});

test("configSummary builds the model-card tooltip", () => {
  const cfg = JSON.stringify({
    training: { algorithm: "katago_ppo", num_games: 256, steps_per_epoch: 128,
                max_ply: 512 },
    algorithm_params: { batch_size: 1024 },
    league: { enabled: true },
  });
  const tip = KT.configSummary(cfg, "se_resnet");
  assert.match(tip, /Architecture: se_resnet/);
  assert.match(tip, /Algorithm: katago_ppo/);
  assert.match(tip, /Envs: 256/);
  assert.match(tip, /Batch: 1024/);
  assert.match(tip, /League: on/);
  // fallbacks
  assert.equal(KT.configSummary(null, "mlp"), "mlp");
  assert.equal(KT.configSummary("not json", "mlp"), "mlp");
  assert.equal(KT.configSummary({}, "mlp"), "Architecture: mlp");
});

test("gameStatus shows result when over, ply otherwise", () => {
  assert.equal(KT.gameStatus({ is_over: 0, ply: 42 }), "ply 42");
  assert.equal(KT.gameStatus({ is_over: 1, result: "black_win_checkmate" }),
               "black win checkmate");
  assert.equal(KT.gameStatus({ is_over: 1, result: null }), "");
});

test("gameAdvantage converts stm value to a black/white confidence dot", () => {
  // side-to-move = black, strong positive value -> black advantage
  assert.deepEqual(
    KT.gameAdvantage({ value_estimate: 0.5, current_player: "black" }),
    { confident: true, favours: "black" });
  // same value from white's perspective favours white
  assert.deepEqual(
    KT.gameAdvantage({ value_estimate: 0.5, current_player: "white" }),
    { confident: true, favours: "white" });
  // |value| <= 0.3 is not confident (reference getAdvantage threshold)
  assert.equal(
    KT.gameAdvantage({ value_estimate: 0.3, current_player: "black" }).confident,
    false);
  assert.equal(
    KT.gameAdvantage({ value_estimate: 0.31, current_player: "black" }).confident,
    true);
  // no estimate -> no dot
  assert.deepEqual(KT.gameAdvantage({ current_player: "black" }),
                   { confident: false, favours: null });
});

test("clampAboutLevel clamps to 1..5 and defaults NaN to 1", () => {
  assert.equal(KT.clampAboutLevel(3), 3);
  assert.equal(KT.clampAboutLevel(0), 1);
  assert.equal(KT.clampAboutLevel(-2), 1);
  assert.equal(KT.clampAboutLevel(99), KT.ABOUT_LEVELS.length);
  assert.equal(KT.clampAboutLevel(NaN), 1);
  assert.equal(KT.clampAboutLevel(2.6), 3);
});

test("visibleAboutToc filters by minLevel", () => {
  const items = [
    { id: "a", minLevel: 1 }, { id: "b", minLevel: 3 }, { id: "c", minLevel: 5 },
  ];
  assert.deepEqual(KT.visibleAboutToc(items, 1).map(i => i.id), ["a"]);
  assert.deepEqual(KT.visibleAboutToc(items, 3).map(i => i.id), ["a", "b"]);
  assert.deepEqual(KT.visibleAboutToc(items, 5).map(i => i.id), ["a", "b", "c"]);
});

test("groupToc groups consecutive same-section items, null stands alone", () => {
  const items = [
    { id: "hero", section: null },
    { id: "x1", section: "L2" }, { id: "x2", section: "L2" },
    { id: "y1", section: "L3" },
    { id: "z1", section: null }, { id: "z2", section: null },
  ];
  const groups = KT.groupToc(items);
  assert.deepEqual(groups.map(g => [g.section, g.items.length]),
    [[null, 1], ["L2", 2], ["L3", 1], [null, 1], [null, 1]]);
});

test("ABOUT_LEVELS is a contiguous 1..N ladder with labels", () => {
  KT.ABOUT_LEVELS.forEach((l, i) => {
    assert.equal(l.id, i + 1);
    assert.ok(l.label.length > 0 && l.blurb.length > 0);
  });
});

test("entryRecords credits both seats of every match", () => {
  const rec = KT.entryRecords([
    { entry_a_id: 1, entry_b_id: 2, wins_a: 3, wins_b: 1, draws: 1 },
    { entry_a_id: 2, entry_b_id: 3, wins_a: 0, wins_b: 2, draws: 0 },
  ]);
  assert.deepEqual(rec[1], { w: 3, l: 1, d: 1, g: 5 });
  assert.deepEqual(rec[2], { w: 1, l: 5, d: 1, g: 7 });
  assert.deepEqual(rec[3], { w: 2, l: 0, d: 0, g: 2 });
  assert.deepEqual(KT.entryRecords([]), {});
});

test("eloDeltas takes the two newest epochs regardless of row order", () => {
  const d = KT.eloDeltas([
    { entry_id: 1, epoch: 5, elo_rating: 1040 },
    { entry_id: 1, epoch: 1, elo_rating: 1000 },
    { entry_id: 1, epoch: 3, elo_rating: 1020 },
    { entry_id: 2, epoch: 1, elo_rating: 990 },
  ]);
  assert.equal(d[1], 20);   // 1040 - 1020, not vs epoch 1
  assert.equal(d[2], 0);    // single point -> no movement
});

test("groupEntriesByTier orders frontier/recent/dynamic/historical/other", () => {
  const groups = KT.groupEntriesByTier([
    { id: 1, role: "dynamic" },
    { id: 2, role: "frontier_static" },
    { id: 3, role: "unassigned" },
    { id: 4, role: "recent_fixed" },
    { id: 5, role: "frontier_static" },
  ]);
  assert.deepEqual(groups.map(g => [g.tier, g.items.map(i => i.id)]), [
    ["frontier", [2, 5]], ["recent", [4]], ["dynamic", [1]], ["other", [3]],
  ]);
});

test("sortEntries supports record/wr/delta keys via aux maps", () => {
  const entries = [{ id: 1, elo_rating: 1000 }, { id: 2, elo_rating: 1100 }];
  const aux = {
    records: { 1: { w: 5, l: 0, d: 0, g: 5 }, 2: { w: 1, l: 4, d: 0, g: 5 } },
    deltas: { 1: -10, 2: 30 },
  };
  assert.deepEqual(KT.sortEntries(entries, "wr", -1, null, aux).map(e => e.id), [1, 2]);
  assert.deepEqual(KT.sortEntries(entries, "delta", -1, null, aux).map(e => e.id), [2, 1]);
  assert.deepEqual(KT.sortEntries(entries, "record", 1, null, aux).map(e => e.id), [2, 1]);
  // entries with no record sort below any win rate
  const bare = KT.sortEntries([{ id: 9 }, ...entries], "wr", -1, null, aux);
  assert.equal(bare[bare.length - 1].id, 9);
});
