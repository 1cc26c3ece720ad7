#!/usr/bin/env bash
# Unified launcher: training + dashboard + showcase + tournament sidecars
# with a foreground monitor that restarts dead auxiliaries (reference:
# run.sh monitor loop). Trainer death tears everything down.
#
# Usage:
#   ./run.sh [--config configs/katago-b40c256.toml] [--epochs N]
#            [--port 8765] [--workers N] [--no-showcase] [--stop]
set -euo pipefail

CONFIG="configs/katago-b40c256.toml"
EPOCHS=""
PORT=8765
WORKERS=0
SHOWCASE=1
PIDFILE=".keisei-tpu.pids"
LOGDIR="logs"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --config) CONFIG="$2"; shift 2 ;;
    --epochs) EPOCHS="$2"; shift 2 ;;
    --port) PORT="$2"; shift 2 ;;
    --workers) WORKERS="$2"; shift 2 ;;
    --no-showcase) SHOWCASE=0; shift ;;
    --stop)
      if [[ -f "$PIDFILE" ]]; then
        xargs -r kill < "$PIDFILE" 2>/dev/null || true
        rm -f "$PIDFILE"
        echo "stopped"
      else
        echo "no pidfile"
      fi
      exit 0 ;;
    *) echo "unknown flag: $1" >&2; exit 2 ;;
  esac
done

mkdir -p "$LOGDIR"
if [[ -f "$PIDFILE" ]]; then
  # refuse to clobber a live run's pidfile (a second launch would orphan
  # the first run's processes from --stop/cleanup)
  while read -r pid; do
    if kill -0 "$pid" 2>/dev/null; then
      echo "another run appears active (pid $pid in $PIDFILE) — use --stop first" >&2
      exit 1
    fi
  done < "$PIDFILE"
fi
: > "$PIDFILE"

rewrite_pidfile() {
  # keep only CURRENT process pids: restarts would otherwise accumulate
  # stale entries that the OS may recycle to unrelated processes, which
  # cleanup/--stop would then kill
  {
    [[ -n "${TRAIN_PID:-}" ]] && echo "$TRAIN_PID"
    [[ -n "${DASH_PID:-}" ]] && echo "$DASH_PID"
    [[ -n "${SHOWCASE_PID:-}" ]] && echo "$SHOWCASE_PID"
    local i
    for i in "${!WORKER_PIDS[@]}"; do echo "${WORKER_PIDS[$i]}"; done
  } > "$PIDFILE"
}

# Pull db_path / league_dir out of the TOML (python is the TOML parser we have)
eval "$(python - "$CONFIG" <<'EOF'
import sys, tomllib
cfg = tomllib.load(open(sys.argv[1], "rb"))
db = cfg.get("display", {}).get("db_path", "data/keisei-tpu.db")
lg = cfg.get("league", {}).get("storage", {}).get("league_dir", "league/")
print(f'DB_PATH="{db}"'); print(f'LEAGUE_DIR="{lg}"')
EOF
)"
mkdir -p "$(dirname "$DB_PATH")" "$LEAGUE_DIR"

start_trainer() {
  local args=(--config "$CONFIG")
  [[ -n "$EPOCHS" ]] && args+=(--epochs "$EPOCHS")
  python -m keisei_tpu.training.loop "${args[@]}" \
    >> "$LOGDIR/train.log" 2>&1 &
  TRAIN_PID=$!
  rewrite_pidfile
  echo "trainer: pid $TRAIN_PID (log $LOGDIR/train.log)"
}

start_dashboard() {
  JAX_PLATFORMS=cpu python -m keisei_tpu.server.app --db "$DB_PATH" \
    --host 0.0.0.0 --port "$PORT" --allow-host "$(hostname)" \
    >> "$LOGDIR/dashboard.log" 2>&1 &
  DASH_PID=$!
  rewrite_pidfile
  echo "dashboard: pid $DASH_PID on :$PORT"
}

start_showcase() {
  JAX_PLATFORMS=cpu python -m keisei_tpu.showcase.runner \
    --db "$DB_PATH" --league-dir "$LEAGUE_DIR" \
    >> "$LOGDIR/showcase.log" 2>&1 &
  SHOWCASE_PID=$!
  rewrite_pidfile
  echo "showcase: pid $SHOWCASE_PID"
}

start_worker() {
  local i=$1
  JAX_PLATFORMS=cpu python -m keisei_tpu.league.worker \
    --db "$DB_PATH" --league-dir "$LEAGUE_DIR" --worker-id "worker-$i" \
    >> "$LOGDIR/worker-$i.log" 2>&1 &
  local pid=$!
  WORKER_PIDS[$i]=$pid
  rewrite_pidfile
  echo "tournament worker $i: pid $pid"
}

declare -A WORKER_PIDS
start_trainer
start_dashboard
[[ "$SHOWCASE" == 1 ]] && start_showcase
for ((i = 0; i < WORKERS; i++)); do start_worker "$i"; done

cleanup() {
  echo "shutting down..."
  xargs -r kill < "$PIDFILE" 2>/dev/null || true
  rm -f "$PIDFILE"
}
trap cleanup EXIT INT TERM

# Foreground monitor: trainer death ends the run; dead auxiliaries restart.
while true; do
  sleep 30
  if ! kill -0 "$TRAIN_PID" 2>/dev/null; then
    echo "trainer exited — tearing down"
    exit 0
  fi
  if ! kill -0 "$DASH_PID" 2>/dev/null; then
    echo "dashboard died — restarting"
    start_dashboard
  fi
  if [[ "$SHOWCASE" == 1 ]] && ! kill -0 "$SHOWCASE_PID" 2>/dev/null; then
    echo "showcase died — restarting"
    start_showcase
  fi
  for ((i = 0; i < WORKERS; i++)); do
    if ! kill -0 "${WORKER_PIDS[$i]}" 2>/dev/null; then
      echo "worker $i died — restarting"
      start_worker "$i"
    fi
  done
done
