"""Compile diagnostics: trace/compile times and retrace counts.

The analog of the reference's torch.compile diagnostics
(scripts/benchmark_compile.py + the graph-break/recompile checks in
profile_hotpath.py:86-93 of its findings doc). Under jit the failure mode
is RETRACING (a new compilation per shape/dtype), so this measures:

  1. cold trace+lower+compile time of the flagship programs,
  2. that re-calling with same-shaped fresh arrays does NOT retrace,
  3. per-batch-size compile cost of the model forward.

Usage: python scripts/benchmark_compile.py [--batches 256,1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timed_compile(fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    return t_lower, time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="256,1024")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from keisei_tpu.env.vec_env import EnvCore
    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.rollout import make_selfplay_rollout
    from keisei_tpu.training.value_adapter import get_value_adapter

    model, _ = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    adapter = get_value_adapter("katago")
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
    )

    for N in batches:
        t_lower, t_compile = timed_compile(
            lambda v, o: model.apply(v, o, train=False),
            variables, jnp.zeros((N, 50, 9, 9), jnp.float32),
        )
        print(json.dumps({"program": "model_forward", "N": N,
                          "lower_s": round(t_lower, 2),
                          "compile_s": round(t_compile, 2)}), flush=True)

    N = batches[0]
    env_core = EnvCore(num_envs=N, max_ply=512, num_channels=50)
    rollout = make_selfplay_rollout(env_core, model, adapter, 4)
    env_states, obs, mask = env_core.init()
    t_lower, t_compile = timed_compile(
        lambda v, s, o, m, r: rollout(v, s, o, m, r)[1].rewards.sum(),
        variables, env_states, obs, mask, jax.random.key(1),
    )
    print(json.dumps({"program": "fused_rollout_T4", "N": N,
                      "lower_s": round(t_lower, 2),
                      "compile_s": round(t_compile, 2)}), flush=True)

    # retrace check: same shapes, fresh arrays -> trace count must not grow
    jitted = jax.jit(lambda v, o: model.apply(v, o, train=False).policy_logits.sum())
    traces = 0

    def counting(v, o):
        nonlocal traces
        traces += 1
        return model.apply(v, o, train=False).policy_logits.sum()

    jitted = jax.jit(counting)
    for i in range(3):
        obs_i = jnp.full((N, 50, 9, 9), float(i), jnp.float32)
        float(jitted(variables, obs_i))
    print(json.dumps({"program": "retrace_check", "N": N, "traces": traces,
                      "ok": traces == 1}), flush=True)


if __name__ == "__main__":
    main()
