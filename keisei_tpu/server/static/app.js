/* keisei-tpu dashboard: vanilla JS client for the WS push protocol
 * (server/app.py). Views: training metrics (canvas charts), live boards,
 * league table + Elo history, showcase with match controls. */
"use strict";

// ---------------------------------------------------------------------------
// state
// ---------------------------------------------------------------------------
const S = {
  metrics: [],          // rows from metrics table (pruned to MAX_POINTS)
  games: new Map(),     // game_id -> snapshot
  training: null,
  league: { entries: [], results: [], transitions: [], eloHistory: [],
            styles: [], h2h: [] },
  showcase: { game: null, moves: [], queue: [], alive: false },
};
const MAX_POINTS = 10000;

// ---------------------------------------------------------------------------
// websocket with reconnect/backoff
// ---------------------------------------------------------------------------
let ws = null, backoff = 500;
function connect() {
  const proto = location.protocol === "https:" ? "wss" : "ws";
  ws = new WebSocket(`${proto}://${location.host}/ws`);
  ws.onopen = () => {
    backoff = 500;
    setConn(true);
  };
  ws.onclose = () => {
    setConn(false);
    setTimeout(connect, backoff);
    backoff = Math.min(backoff * 2, 10000);
  };
  ws.onmessage = (ev) => {
    let msg;
    try { msg = JSON.parse(ev.data); } catch { return; }
    dispatch(msg);
  };
}
function send(obj) { if (ws && ws.readyState === 1) ws.send(JSON.stringify(obj)); }
function setConn(on) {
  const el = document.getElementById("conn");
  el.textContent = on ? "live" : "disconnected";
  el.className = "badge " + (on ? "on" : "off");
}

function dispatch(msg) {
  switch (msg.type) {
    case "init":
      S.metrics = msg.metrics || [];
      S.games = new Map((msg.games || []).map(g => [g.game_id, g]));
      S.training = msg.training_state;
      S.league = {
        entries: msg.league_entries || [], results: msg.league_results || [],
        transitions: msg.transitions || [], eloHistory: msg.elo_history || [],
        styles: msg.style_profiles || [], h2h: msg.head_to_head || [],
      };
      if (msg.showcase) {
        S.showcase.game = msg.showcase.game;
        S.showcase.moves = msg.showcase.moves || [];
        S.showcase.queue = msg.showcase.queue || [];
        S.showcase.alive = !!msg.showcase.sidecar_alive;
      }
      renderAll();
      break;
    case "metrics_update":
      S.metrics.push(...msg.rows);
      if (S.metrics.length > MAX_POINTS) S.metrics.splice(0, S.metrics.length - MAX_POINTS);
      renderCharts(); renderStatus();
      break;
    case "game_update":
      for (const g of msg.snapshots) S.games.set(g.game_id, g);
      renderBoards();
      break;
    case "training_status":
      S.training = Object.assign({}, S.training, msg,
        { current_epoch: msg.epoch, current_step: msg.step });
      renderStatus();
      break;
    case "league_update":
      S.league.entries = msg.entries; S.league.results = msg.results;
      S.league.transitions = msg.transitions; S.league.eloHistory = msg.elo_history;
      S.league.h2h = msg.head_to_head || S.league.h2h;
      if (msg.style_profiles) S.league.styles = msg.style_profiles;
      renderLeague(); fillShowcaseSelectors();
      break;
    case "showcase_status":
      S.showcase.queue = msg.queue || [];
      S.showcase.alive = !!msg.sidecar_alive;
      if (msg.active_game_id === null) S.showcase.game = null;
      renderShowcaseStatus();
      break;
    case "showcase_update":
      S.showcase.game = msg.game;
      S.showcase.moves.push(...(msg.new_moves || []));
      renderShowcase();
      break;
    case "ping":
      send({ type: "pong" });
      break;
  }
}

// ---------------------------------------------------------------------------
// tiny canvas line-chart helper
// ---------------------------------------------------------------------------
function drawChart(canvasId, series, opts = {}) {
  const cv = document.getElementById(canvasId);
  if (!cv) return;
  const dpr = window.devicePixelRatio || 1;
  const w = cv.clientWidth, h = cv.clientHeight;
  if (!w || !h) return;
  cv.width = w * dpr; cv.height = h * dpr;
  const ctx = cv.getContext("2d");
  ctx.scale(dpr, dpr);
  ctx.clearRect(0, 0, w, h);
  const pad = { l: 42, r: 6, t: 6, b: 16 };
  const all = series.flatMap(s => s.points.map(p => p[1])).filter(Number.isFinite);
  if (!all.length) { ctx.fillStyle = "#555"; ctx.fillText("no data", w / 2 - 18, h / 2); return; }
  let lo = Math.min(...all), hi = Math.max(...all);
  if (opts.zero) lo = Math.min(lo, 0);
  if (lo === hi) { lo -= 1; hi += 1; }
  const xs = series.flatMap(s => s.points.map(p => p[0]));
  const x0 = Math.min(...xs), x1 = Math.max(...xs) || 1;
  const X = x => pad.l + (x - x0) / Math.max(x1 - x0, 1) * (w - pad.l - pad.r);
  const Y = y => pad.t + (1 - (y - lo) / (hi - lo)) * (h - pad.t - pad.b);
  // gridlines + labels
  ctx.strokeStyle = "#2c333d"; ctx.fillStyle = "#8b96a5"; ctx.font = "10px system-ui";
  for (let i = 0; i <= 3; i++) {
    const y = lo + (hi - lo) * i / 3;
    ctx.beginPath(); ctx.moveTo(pad.l, Y(y)); ctx.lineTo(w - pad.r, Y(y)); ctx.stroke();
    ctx.fillText(fmt(y), 2, Y(y) + 3);
  }
  for (const s of series) {
    ctx.strokeStyle = s.color; ctx.lineWidth = 1.4; ctx.beginPath();
    let started = false;
    for (const [x, y] of s.points) {
      if (!Number.isFinite(y)) continue;
      if (!started) { ctx.moveTo(X(x), Y(y)); started = true; }
      else ctx.lineTo(X(x), Y(y));
    }
    ctx.stroke();
  }
  if (series.length > 1) {
    let lx = pad.l + 4;
    for (const s of series) {
      ctx.fillStyle = s.color;
      ctx.fillText(s.label || "", lx, pad.t + 9);
      lx += ctx.measureText(s.label || "").width + 14;
    }
  }
}
function fmt(v) {
  const a = Math.abs(v);
  if (a >= 1000) return (v / 1000).toFixed(1) + "k";
  if (a >= 10) return v.toFixed(1);
  return v.toPrecision(3);
}

// ---------------------------------------------------------------------------
// training view
// ---------------------------------------------------------------------------
function card(k, v) {
  return `<div class="card"><div class="k">${k}</div><div class="v">${v}</div></div>`;
}
function renderStatus() {
  const t = S.training || {};
  const sys = t.system_stats || {};
  const last = S.metrics[S.metrics.length - 1] || {};
  const row = document.getElementById("status-row");
  row.innerHTML =
    card("model", t.display_name || t.model_arch || "—") +
    card("status", t.status || "—") +
    card("phase", t.phase || "—") +
    card("epoch", `${t.current_epoch ?? "—"}${t.total_epochs ? " / " + t.total_epochs : ""}`) +
    card("episodes", t.episodes ?? "—") +
    card("draw rate", last.draw_rate != null ? (last.draw_rate * 100).toFixed(1) + "%" : "—") +
    card("ep length", last.avg_episode_length != null ? last.avg_episode_length.toFixed(0) : "—") +
    card("cpu", sys.cpu_percent != null ? sys.cpu_percent + "%" : "—") +
    card("ram", sys.ram_used_gb != null ? `${sys.ram_used_gb}/${sys.ram_total_gb} GB` : "—");
}
function seriesOf(field, color, label) {
  return { color, label, points: S.metrics.map(m => [m.epoch, m[field]]) };
}
function renderCharts() {
  drawChart("c-policy", [seriesOf("policy_loss", "#5aa9e6")]);
  drawChart("c-value", [seriesOf("value_loss", "#e6a95a")]);
  drawChart("c-entropy", [seriesOf("entropy", "#b98ae6")]);
  drawChart("c-winrates", [
    seriesOf("black_win_rate", "#63c57f", "black"),
    seriesOf("white_win_rate", "#e06c75", "white"),
    seriesOf("draw_rate", "#8b96a5", "draw"),
  ], { zero: true });
  drawChart("c-eplen", [seriesOf("avg_episode_length", "#5ae6c8")], { zero: true });
  drawChart("c-gnorm", [seriesOf("gradient_norm", "#e65a8f")]);
}

// ---------------------------------------------------------------------------
// shogi board rendering (snapshot board_json = 81 cells of null | piece dict)
// ---------------------------------------------------------------------------
const KANJI = { pawn: "歩", lance: "香", knight: "桂", silver: "銀", gold: "金",
                bishop: "角", rook: "飛", king: "玉" };
const KANJI_P = { pawn: "と", lance: "杏", knight: "圭", silver: "全",
                  bishop: "馬", rook: "龍" };
function boardHTML(board) {
  let html = '<div class="grid">';
  for (let i = 0; i < 81; i++) {
    const c = board[i];
    if (!c) { html += '<div class="sq"></div>'; continue; }
    const ch = c.promoted ? (KANJI_P[c.type] || KANJI[c.type]) : KANJI[c.type];
    const cls = "sq" + (c.color === "white" ? " w" : "");
    html += `<div class="${cls}"><span class="p${c.promoted ? " promoted" : ""}">${ch}</span></div>`;
  }
  return html + "</div>";
}
function handsHTML(hands) {
  const fmtSide = (h) => Object.entries(h || {})
    .filter(([, n]) => n > 0).map(([k, n]) => `${KANJI[k]}×${n}`).join(" ");
  return `<div class="hands">☗ ${fmtSide(hands.black)} &nbsp; ☖ ${fmtSide(hands.white)}</div>`;
}
function renderBoards() {
  if (!views.boards.classList.contains("active")) return;
  const el = document.getElementById("boards");
  const games = [...S.games.values()].sort((a, b) => a.game_id - b.game_id).slice(0, 12);
  el.innerHTML = games.map(g => {
    const board = JSON.parse(g.board_json || "[]");
    const hands = JSON.parse(g.hands_json || "{}");
    return `<div class="board-card">
      <div class="meta">game ${g.game_id} · ply ${g.ply} · ${g.current_player} to move
        ${g.in_check ? "· <b>check</b>" : ""} ${g.game_type === "demo" ? "· demo" : ""}</div>
      ${boardHTML(board)}${handsHTML(hands)}</div>`;
  }).join("") || '<p style="color:var(--dim)">no live games yet</p>';
}

// ---------------------------------------------------------------------------
// league view
// ---------------------------------------------------------------------------
const ELO_COLORS = ["#5aa9e6", "#63c57f", "#e6a95a", "#e06c75", "#b98ae6",
                    "#5ae6c8", "#e65a8f", "#a9e65a", "#8b96a5", "#e6e65a"];
function renderLeague() {
  const tbody = document.querySelector("#league-table tbody");
  const learnerId = S.training && S.training.learner_entry_id;
  const styleOf = Object.fromEntries(S.league.styles.map(s => [s.checkpoint_id, s.primary_style]));
  tbody.innerHTML = S.league.entries.map(e =>
    `<tr class="${e.id === learnerId ? "learner" : ""}">
      <td>${e.display_name || "entry " + e.id}${e.id === learnerId ? " ◀" : ""}</td>
      <td>${(e.role || "").replace("_static", "").replace("_fixed", "")}</td>
      <td>${Math.round(e.elo_rating)}</td>
      <td>${e.games_played}</td>
      <td>${styleOf[e.id] || ""}</td></tr>`).join("");

  // elo history: one series per entry
  const byEntry = new Map();
  for (const r of S.league.eloHistory) {
    if (!byEntry.has(r.entry_id)) byEntry.set(r.entry_id, []);
    byEntry.get(r.entry_id).push([r.epoch, r.elo_rating]);
  }
  const names = Object.fromEntries(S.league.entries.map(e => [e.id, e.display_name]));
  const series = [...byEntry.entries()].slice(0, 10).map(([id, pts], i) => ({
    color: ELO_COLORS[i % ELO_COLORS.length],
    label: (names[id] || "#" + id).split(" ")[0],
    points: pts,
  }));
  drawChart("c-elo", series);

  document.getElementById("league-events").innerHTML =
    S.league.transitions.slice(0, 25).map(t =>
      `<li>#${t.entry_id} ${t.from_role || ""}${t.to_role ? "→" + t.to_role : ""} ` +
      `${t.from_status ? t.from_status + "→" + t.to_status : ""} — ${t.reason || ""}</li>`
    ).join("");
}

// ---------------------------------------------------------------------------
// showcase view
// ---------------------------------------------------------------------------
function fillShowcaseSelectors() {
  for (const id of ["sc-e1", "sc-e2"]) {
    const sel = document.getElementById(id);
    const cur = sel.value;
    sel.innerHTML = S.league.entries.map(e =>
      `<option value="${e.id}">${e.display_name || "entry " + e.id} (${Math.round(e.elo_rating)})</option>`
    ).join("");
    if (cur) sel.value = cur;
  }
}
function renderShowcaseStatus() {
  const el = document.getElementById("sc-status");
  const g = S.showcase.game;
  el.innerHTML =
    card("sidecar", S.showcase.alive ? "alive" : "offline") +
    card("queue", S.showcase.queue.length) +
    (g ? card("match", `${g.name_black || g.entry_id_black} vs ${g.name_white || g.entry_id_white}`) : "");
}
function renderShowcase() {
  renderShowcaseStatus();
  if (!views.showcase.classList.contains("active")) return;
  const moves = S.showcase.moves;
  const last = moves[moves.length - 1];
  const boardEl = document.getElementById("sc-board");
  if (last) {
    boardEl.innerHTML = boardHTML(JSON.parse(last.board_json)) +
      handsHTML(JSON.parse(last.hands_json));
    const v = last.value_estimate;
    if (v != null) {
      document.getElementById("sc-evalfill").style.width =
        `${Math.round((v + 1) / 2 * 100)}%`;
    }
  } else {
    boardEl.innerHTML = '<p style="color:var(--dim)">no active showcase game</p>';
  }
  document.getElementById("sc-moves").innerHTML =
    moves.map(m => `<li>${m.usi_notation}</li>`).join("");
}

// ---------------------------------------------------------------------------
// navigation + controls
// ---------------------------------------------------------------------------
const views = {};
for (const sec of document.querySelectorAll(".view"))
  views[sec.id.replace("view-", "")] = sec;
for (const btn of document.querySelectorAll("nav button")) {
  btn.onclick = () => {
    document.querySelectorAll("nav button").forEach(b => b.classList.remove("active"));
    document.querySelectorAll(".view").forEach(v => v.classList.remove("active"));
    btn.classList.add("active");
    views[btn.dataset.view].classList.add("active");
    renderAll();
  };
}
document.getElementById("sc-request").onclick = () => send({
  type: "request_showcase_match",
  entry_id_1: document.getElementById("sc-e1").value,
  entry_id_2: document.getElementById("sc-e2").value,
  speed: document.getElementById("sc-speed").value,
});
document.getElementById("sc-cancel").onclick = () => {
  const running = S.showcase.queue.find(q => q.status === "running") ||
                  S.showcase.queue[0];
  if (running) send({ type: "cancel_showcase_match", queue_id: running.id });
};

function renderAll() {
  renderStatus(); renderCharts(); renderBoards(); renderLeague();
  fillShowcaseSelectors(); renderShowcase();
}
window.addEventListener("resize", () => { renderCharts(); renderLeague(); });
connect();
