"""Headline benchmark: self-play env steps/sec/chip with the flagship net.

Runs the fused rollout scan (full-rules engine + SE-ResNet b40c256 masked
policy sampling, the production configuration of keisei-katago.toml) on one
chip and prints ONE JSON line. Baseline: the BASELINE.json north star of
100k env-steps/sec/chip with b40c256 in the loop.

Timing methodology: the axon TPU platform does not block on
block_until_ready, and host transfers ride a slow tunnel — so we time
jitted programs that return a single scalar, and difference a short and a
long run to cancel dispatch/transfer latency.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def time_scalar_fn(fn, *args, **kw):
    """Wall time of fn(*args) -> scalar, after warmup (host fetch forces
    completion)."""
    float(fn(*args, **kw))  # warmup/compile
    t0 = time.time()
    float(fn(*args, **kw))
    return time.time() - t0


def main():
    from keisei_tpu.env.vec_env import EnvCore
    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.rollout import make_selfplay_rollout
    from keisei_tpu.training.value_adapter import get_value_adapter

    N, T_SHORT, T_LONG = 256, 4, 36
    env_core = EnvCore(num_envs=N, max_ply=512, num_channels=50)
    model, _ = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    adapter = get_value_adapter("katago")

    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
    )
    env_states, obs, mask = env_core.init()

    def make_timed(T):
        rollout = make_selfplay_rollout(env_core, model, adapter, T)

        @jax.jit
        def run(variables, env_states, obs, mask, rng):
            carry, traj, next_value, stats = rollout(variables, env_states, obs, mask, rng)
            # single scalar output -> 4-byte host fetch
            return traj.rewards.sum() + next_value.sum()

        return run

    rng = jax.random.key(1)
    t_short = time_scalar_fn(make_timed(T_SHORT), variables, env_states, obs, mask, rng)
    t_long = time_scalar_fn(make_timed(T_LONG), variables, env_states, obs, mask, rng)
    per_step = (t_long - t_short) / (T_LONG - T_SHORT)
    steps_per_sec = N / per_step

    baseline = 100_000.0  # BASELINE.json north star
    print(json.dumps({
        "metric": "self-play env steps/sec/chip (full rules + SE-ResNet b40c256 sampling in loop)",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
