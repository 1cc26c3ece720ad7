#!/usr/bin/env bash
#
# pod-setup.sh — one-shot setup for a fresh Cloud TPU VM (single host or
# one host of a pod slice). TPU-native counterpart of the reference's GPU
# pod-setup.sh (Rust toolchain + CUDA checks -> libtpu + jax[tpu]).
#
# Usage (on each TPU VM host):
#   git clone <repo> keisei-tpu && cd keisei-tpu && ./pod-setup.sh
#
# Multi-host pods: run this on EVERY host (gcloud compute tpus tpu-vm ssh
# --worker=all --command='cd keisei-tpu && ./pod-setup.sh'), then launch
# per docs/ops.md §multi-host.
set -euo pipefail
cd "$(dirname "$0")"

echo "=== keisei-tpu pod setup ==="

# --- Python deps (jax[tpu] pulls the matching libtpu) ---
PY="${PYTHON:-python3}"
if ! "$PY" -c 'import sys; sys.exit(sys.version_info < (3, 11))'; then
    echo "need python >= 3.11 (have $("$PY" -V))" >&2
    exit 1
fi
echo "installing python dependencies..."
"$PY" -m pip install -q --upgrade pip
"$PY" -m pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
"$PY" -m pip install -q -e . pytest pytest-xdist psutil

# --- Verify the TPU is visible ---
echo "verifying TPU..."
"$PY" - <<'EOF'
import jax
devs = jax.devices()
print(f"  backend: {jax.default_backend()}, devices: {len(devs)}")
assert jax.default_backend() == "tpu", "TPU backend not active — check libtpu install"
EOF

# --- Warm the persistent compile cache with the engine step ---
echo "warming compile cache (engine step, ~60-90s first time)..."
"$PY" - <<'EOF'
from keisei_tpu.utils.cache import ensure_compile_cache
ensure_compile_cache()
import jax, jax.numpy as jnp
from keisei_tpu.env.vec_env import EnvCore
core = EnvCore(num_envs=8, max_ply=64, num_channels=50)
step = jax.jit(core.step_fn())
states, obs, mask = core.init()
import numpy as np
a = jnp.asarray(np.argmax(np.asarray(mask), axis=1), jnp.int32)
step(states, a)
print("  engine step compiled ok")
EOF

# --- Fast smoke suite (CPU backend, skips slow marks) ---
echo "running smoke tests..."
JAX_PLATFORMS=cpu "$PY" -m pytest tests/test_jax_engine.py -x -q -m "not slow" | tail -2

echo "=== setup complete — see docs/ops.md for launch recipes ==="
