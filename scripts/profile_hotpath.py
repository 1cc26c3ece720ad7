"""Hot-path component benchmarks: model-only / env-only / fused rollout.

TPU-native counterpart of the reference's scripts/profile_hotpath.py
(isolated microbenchmarks of each training-loop component, reference
:1-18). Produces the env-vs-model breakdown at several batch sizes so
optimization work is steered by data, not guesses.

Timing methodology (axon TPU): host transfers ride a slow tunnel and
dispatch latency is high, so every measured program is a jitted scan
returning ONE scalar; we difference a short and a long scan length to
cancel dispatch/fetch overhead, and repeat each measurement taking the
median of per-step times.

Usage:
    python scripts/profile_hotpath.py [--sections model,env,fused]
        [--batches 256,1024,4096] [--repeats 3] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timed_scalar(fn, *args):
    """Wall time of fn(*args) -> scalar (host fetch forces completion)."""
    t0 = time.time()
    float(fn(*args))
    return time.time() - t0


def scan_rate(make_program, args_fn, t_short, t_long, repeats):
    """Median per-step seconds for a T-step scan program.

    make_program(T) -> jitted fn returning a scalar; args_fn() -> its args.
    """
    f_short, f_long = make_program(t_short), make_program(t_long)
    a = args_fn()
    float(f_short(*a))  # compile
    float(f_long(*a))
    samples = []
    for _ in range(repeats):
        ts = timed_scalar(f_short, *a)
        tl = timed_scalar(f_long, *a)
        samples.append((tl - ts) / (t_long - t_short))
    return statistics.median(samples), samples


def section_model(batches, repeats, results):
    """SE-ResNet b40c256 forward (+ masked sampling) throughput."""
    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.value_adapter import get_value_adapter

    model, _ = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    adapter = get_value_adapter("katago")
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
    )

    for N in batches:
        def make_program(T, N=N):
            @jax.jit
            def run(variables, obs, masks, rng):
                # obs must be carried and loop-DEPENDENT, else XLA hoists the
                # forward out of the scan and the measurement is meaningless.
                def body(carry, _):
                    obs, rng, acc = carry
                    rng, k = jax.random.split(rng)
                    out = model.apply(variables, obs, train=False)
                    flat = out.policy_logits.reshape(N, -1).astype(jnp.float32)
                    masked = jnp.where(masks, flat, -1e9)
                    actions = jax.random.categorical(k, masked, axis=-1)
                    v = adapter.scalar_value_blended(out)
                    obs = obs + (v.mean() * 1e-6)
                    return (obs, rng, acc + actions.sum() + v.sum().astype(jnp.int64)), None

                (obs, rng, acc), _ = jax.lax.scan(
                    body, (obs, rng, jnp.int64(0)), None, length=T
                )
                return acc

            return run

        def args_fn(N=N):
            obs = jnp.zeros((N, 50, 9, 9), jnp.float32)
            masks = jnp.zeros((N, 11259), bool).at[:, :30].set(True)
            return (variables, obs, masks, jax.random.key(1))

        per_step, samples = scan_rate(make_program, args_fn, 2, 10, repeats)
        results.append({
            "section": "model_forward_sample", "N": N,
            "ms_per_step": round(per_step * 1e3, 3),
            "samples_per_s": round(N / per_step, 1),
            "runs_ms": [round(s * 1e3, 3) for s in samples],
        })
        print(json.dumps(results[-1]), flush=True)


def section_env(batches, repeats, results):
    """Env-step-only scan: full rules, actions = uniform-random legal."""
    from keisei_tpu.env.vec_env import EnvCore

    for N in batches:
        env_core = EnvCore(num_envs=N, max_ply=512, num_channels=50)
        step = env_core.step_fn()

        def make_program(T, N=N, step=step):
            @jax.jit
            def run(states, mask, rng):
                def body(carry, _):
                    states, mask, rng, acc = carry
                    rng, k = jax.random.split(rng)
                    logits = jnp.where(mask, 0.0, -1e9)
                    actions = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
                    states, out = step(states, actions)
                    return (states, out.legal_mask, rng, acc + out.reward.sum()), None

                (states, mask, rng, acc), _ = jax.lax.scan(
                    body, (states, mask, rng, jnp.float32(0)), None, length=T
                )
                return acc

            return run

        def args_fn(env_core=env_core):
            states, _, mask = env_core.init()
            return (states, mask, jax.random.key(1))

        per_step, samples = scan_rate(make_program, args_fn, 2, 10, repeats)
        results.append({
            "section": "env_step_only", "N": N,
            "ms_per_step": round(per_step * 1e3, 3),
            "env_steps_per_s": round(N / per_step, 1),
            "runs_ms": [round(s * 1e3, 3) for s in samples],
        })
        print(json.dumps(results[-1]), flush=True)


def section_fused(batches, repeats, results):
    """Production fused rollout (env + b40c256 sampling) per-step cost."""
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
        env_core = EnvCore(num_envs=N, max_ply=512, num_channels=50)

        def make_program(T, env_core=env_core):
            rollout = make_selfplay_rollout(env_core, model, adapter, T)

            @jax.jit
            def run(variables, env_states, obs, mask, rng):
                carry, traj, next_value, stats = rollout(
                    variables, env_states, obs, mask, rng
                )
                return traj.rewards.sum() + next_value.sum()

            return run

        def args_fn(env_core=env_core):
            env_states, obs, mask = env_core.init()
            return (variables, env_states, obs, mask, jax.random.key(1))

        per_step, samples = scan_rate(make_program, args_fn, 2, 10, repeats)
        results.append({
            "section": "fused_rollout", "N": N,
            "ms_per_step": round(per_step * 1e3, 3),
            "env_steps_per_s": round(N / per_step, 1),
            "runs_ms": [round(s * 1e3, 3) for s in samples],
        })
        print(json.dumps(results[-1]), flush=True)


SECTIONS = {"model": section_model, "env": section_env, "fused": section_fused}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sections", default="model,env,fused")
    p.add_argument("--batches", default="256,1024,4096")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    batches = [int(b) for b in args.batches.split(",")]
    results = []
    print(f"devices: {jax.devices()}", file=sys.stderr)
    for name in args.sections.split(","):
        SECTIONS[name](batches, args.repeats, results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
