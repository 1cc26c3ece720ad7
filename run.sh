#!/usr/bin/env bash
# Unified launcher: training + dashboard + showcase + tournament sidecars
# with a foreground monitor that restarts dead auxiliaries (reference:
# run.sh monitor loop). Trainer death tears everything down.
#
# Usage:
#   ./run.sh [--config configs/katago-b40c256.toml] [--epochs N]
#            [--port 8765 | --socket PATH] [--workers N] [--no-showcase]
#            [--resume | --wipe] [--seed CHECKPOINT_DIR] [--stop]
#
# Existing-state handling (reference run.sh:199-230): if the observability
# DB or checkpoint directory already exists, the launcher PROMPTS
# resume/wipe/quit — the trainer's silent auto-resume never decides alone.
# Non-interactive launches must pass --resume or --wipe explicitly.
#
# --seed copies a pre-trained checkpoint into the run's checkpoint dir as a
# warm start (weights only, optimizer discarded, epoch reset — the same
# phase=sl path SL->RL uses), e.g. seeding a league run from a self-play
# checkpoint (reference run.sh --seed).
set -euo pipefail

CONFIG="configs/katago-b40c256.toml"
EPOCHS=""
PORT=8765
SOCKET=""
WORKERS=0
SHOWCASE=1
RESUME=""
SEED_CKPT=""
PIDFILE=".keisei-tpu.pids"
LOGDIR="logs"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --config) CONFIG="$2"; shift 2 ;;
    --epochs) EPOCHS="$2"; shift 2 ;;
    --port) PORT="$2"; SOCKET=""; shift 2 ;;
    --socket) SOCKET="$2"; shift 2 ;;
    --workers) WORKERS="$2"; shift 2 ;;
    --no-showcase) SHOWCASE=0; shift ;;
    --resume) RESUME=1; shift ;;
    --wipe) RESUME=0; shift ;;
    --seed) SEED_CKPT="$2"; shift 2 ;;
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

# Pull db_path / league_dir / checkpoint_dir out of the TOML
eval "$(python - "$CONFIG" <<'EOF'
import sys, tomllib
cfg = tomllib.load(open(sys.argv[1], "rb"))
db = cfg.get("display", {}).get("db_path", "data/keisei-tpu.db")
lg = cfg.get("league", {}).get("storage", {}).get("league_dir", "league/")
ck = cfg.get("training", {}).get("checkpoint_dir", "checkpoints/")
print(f'DB_PATH="{db}"'); print(f'LEAGUE_DIR="{lg}"'); print(f'CKPT_DIR="{ck}"')
EOF
)"

# ---- wipe-or-resume decision (reference run.sh:199-230) ----
has_state=0
[[ -f "$DB_PATH" ]] && has_state=1
if [[ -d "$CKPT_DIR" ]] && compgen -G "$CKPT_DIR/*/keisei_meta.json" > /dev/null; then
  has_state=1
fi
if [[ "$has_state" == 1 && -z "$RESUME" ]]; then
  if [[ ! -t 0 ]]; then
    echo "existing run state found ($DB_PATH / $CKPT_DIR) — pass --resume or --wipe" >&2
    exit 1
  fi
  echo ""
  echo "  Existing run state found:"
  [[ -f "$DB_PATH" ]] && echo "    DB:          $DB_PATH"
  [[ -d "$CKPT_DIR" ]] && echo "    checkpoints: $CKPT_DIR"
  echo ""
  echo "  [r] Resume from existing state"
  echo "  [w] Wipe and start fresh"
  echo "  [q] Quit"
  echo ""
  read -rp "  Choice [r/w/q]: " choice
  case "$choice" in
    r|R) RESUME=1 ;;
    w|W) RESUME=0 ;;
    *) echo "Aborted."; exit 0 ;;
  esac
fi
if [[ "$RESUME" == 0 && "$has_state" == 1 ]]; then
  echo "wiping DB: $DB_PATH"
  rm -f "$DB_PATH" "${DB_PATH}-wal" "${DB_PATH}-shm"
  echo "wiping checkpoints: $CKPT_DIR"
  rm -rf "$CKPT_DIR"
  # league entry weights too: the fresh DB re-issues entry ids 1,2,3..., and
  # stale league/<id>/ dirs from the wiped run would collide with them
  echo "wiping league dir: $LEAGUE_DIR"
  rm -rf "$LEAGUE_DIR"
fi

mkdir -p "$(dirname "$DB_PATH")" "$LEAGUE_DIR" "$CKPT_DIR"

# ---- seed from a pre-trained checkpoint (warm start, weights only) ----
if [[ -n "$SEED_CKPT" ]]; then
  python - "$SEED_CKPT" "$CKPT_DIR" <<'EOF'
import json, os, shutil, sys
seed, ckpt_dir = sys.argv[1], sys.argv[2]
meta_path = os.path.join(seed, "keisei_meta.json")
if not os.path.isfile(meta_path):
    sys.exit(f"--seed {seed}: not a keisei checkpoint (no keisei_meta.json)")
dest = os.path.join(ckpt_dir, "seed_warmstart")
if os.path.exists(dest):
    shutil.rmtree(dest)
shutil.copytree(seed, dest)
meta = json.load(open(os.path.join(dest, "keisei_meta.json")))
# phase=sl -> the trainer loads weights only, discards the optimizer and
# resets the epoch counter (training/loop.py SL warm-start path); epoch 0
# so any real checkpoint the run produces outranks the seed on resume
meta["phase"] = "sl"
meta["epoch"] = 0
json.dump(meta, open(os.path.join(dest, "keisei_meta.json"), "w"))
print(f"seeded warm start: {seed} -> {dest}")
EOF
fi

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
  local args=(--db "$DB_PATH" --allow-host "$(hostname)")
  if [[ -n "$SOCKET" ]]; then
    args+=(--unix-socket "$SOCKET")
  else
    args+=(--host 0.0.0.0 --port "$PORT")
  fi
  JAX_PLATFORMS=cpu python -m keisei_tpu.server.app "${args[@]}" \
    >> "$LOGDIR/dashboard.log" 2>&1 &
  DASH_PID=$!
  rewrite_pidfile
  echo "dashboard: pid $DASH_PID on ${SOCKET:-:$PORT}"
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
