"""Headline benchmark: self-play env steps/sec/chip with the flagship net.

Runs the fused rollout scan (full-rules engine + SE-ResNet b40c256 masked
policy sampling, the production configuration of keisei-katago.toml) on one
chip and prints ONE JSON line. Baseline: the BASELINE.json north star of
100k env-steps/sec/chip with b40c256 in the loop.

Context for the number (measured, scripts/profile_hotpath.py): the b40c256
forward alone saturates at ~23.1k samples/s on TPU v5e (~176 TFLOPS
effective, ~90% of the chip's bf16 peak — the model is at speed-of-light),
so ~23.5k env-steps/s is the physical ceiling for any framework that runs
this network once per ply. This bench measures how close the fused
env+model program gets to that ceiling.

Timing methodology: the axon TPU platform does not block on
block_until_ready and host transfers ride a slow tunnel — so we time
jitted programs that return a single scalar, difference a short and a long
scan length to cancel dispatch/transfer latency, and report the median of
repeated runs (reproducible within ~2% run-to-run).
"""

from __future__ import annotations

import os  # noqa: F401  (kept for callers using os)

from keisei_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

import json
import statistics
import time

import jax
import jax.numpy as jnp

N = 1024  # throughput-optimal batch (model-only plateaus 256 -> 2048)
T_SHORT, T_LONG, REPEATS = 2, 10, 3
BASELINE = 100_000.0  # BASELINE.json north star


def timed(fn, *args):
    t0 = time.perf_counter()  # monotonic: NTP slew cannot skew the diff
    float(fn(*args))  # scalar host fetch forces completion
    return time.perf_counter() - t0


def _measure(make_fn, args, n_envs):
    """Median per-step time via short/long scan differencing."""
    f_short, f_long = make_fn(T_SHORT), make_fn(T_LONG)
    timed(f_short, *args)  # compile
    timed(f_long, *args)
    samples = []
    for _ in range(REPEATS):
        ts = timed(f_short, *args)
        tl = timed(f_long, *args)
        samples.append((tl - ts) / (T_LONG - T_SHORT))
    return n_envs / statistics.median(samples)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="keisei-tpu headline benchmark")
    p.add_argument("--league", action="store_true",
                   help="measure the compact split-merge league rollout "
                   "instead of plain self-play (flagship K=4 cohort)")
    p.add_argument("--mesh", type=int, default=0, metavar="D",
                   help="shard the env batch over a D-device data mesh "
                   "(one command on a real pod; 0 = single device)")
    p.add_argument("--num-envs", type=int, default=N)
    p.add_argument("--quick", action="store_true",
                   help="headline only — skip the league context measurement")
    args_cli = p.parse_args(argv)
    n = args_cli.num_envs

    from keisei_tpu.env.vec_env import EnvCore
    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.rollout import make_selfplay_rollout
    from keisei_tpu.training.value_adapter import get_value_adapter

    env_core = EnvCore(num_envs=n, max_ply=512, num_channels=50)
    model, _ = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    adapter = get_value_adapter("katago")

    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False
    )
    env_states, obs, mask = env_core.init()
    rng = jax.random.key(1)

    mesh = None
    if args_cli.mesh:
        from keisei_tpu.parallel.mesh import make_mesh, replicate, shard_env_batch

        mesh = make_mesh(args_cli.mesh)
        env_states = shard_env_batch(mesh, env_states)
        obs = shard_env_batch(mesh, obs)
        mask = shard_env_batch(mesh, mask)
        variables = replicate(mesh, variables)

    def measure_league():
        from keisei_tpu.training.league_rollout import (
            make_league_rollout, parity_colors, stack_opponent_variables,
        )

        K = 4  # flagship league cohort (configs/katago-league.toml)
        opp_vars = stack_opponent_variables([variables] * K)
        color = parity_colors(n)
        o, c = opp_vars, color
        if mesh is not None:
            from keisei_tpu.parallel.mesh import replicate, shard_env_batch

            o = replicate(mesh, opp_vars)
            c = shard_env_batch(mesh, color)

        def make_timed(T):
            rollout = make_league_rollout(env_core, model, adapter, T, K)

            @jax.jit
            def run(variables, opp_vars, env_states, obs, mask, color, rng):
                carry, traj, next_value, stats = rollout(
                    variables, opp_vars, env_states, obs, mask, color, rng
                )
                return traj.rewards.sum() + next_value.sum()

            return run

        a = (variables, o, env_states, obs, mask, c, rng)
        return _measure(make_timed, a, n), (
            "league split-merge env steps/sec (full rules + b40c256 "
            "learner + K=4 opponent cohort, compact parity-locked)")

    def measure_selfplay():
        def make_timed(T):
            rollout = make_selfplay_rollout(env_core, model, adapter, T)

            @jax.jit
            def run(variables, env_states, obs, mask, rng):
                carry, traj, next_value, stats = rollout(
                    variables, env_states, obs, mask, rng
                )
                # single scalar output -> 4-byte host fetch
                return traj.rewards.sum() + next_value.sum()

            return run

        a = (variables, env_states, obs, mask, rng)
        return _measure(make_timed, a, n), (
            "self-play env steps/sec/chip (full rules + SE-ResNet "
            "b40c256 sampling in loop)")

    def measure_forward_ceiling():
        """Model-only forward throughput: the physical ceiling for any
        framework that runs this network once per ply (the env accounts
        for ~2.6% of step cost; docs/profiling-round3.md §3-4 rules out
        int8 with a full GEMM-rate decomposition)."""
        obs_b = jnp.zeros((n, 50, 9, 9), jnp.float32)

        def make_timed(T):
            def body(carry, _):
                out = model.apply(variables, carry, train=False)
                # feed a cast of the policy head back in so the scan can't
                # collapse to one iteration
                nxt = obs_b + out.policy_logits.mean().astype(jnp.float32)
                return nxt, ()

            @jax.jit
            def run(variables, obs_b):
                final, _ = jax.lax.scan(body, obs_b, None, length=T)
                return final.sum()

            return run

        return _measure(make_timed, (variables, obs_b), n)

    def emit(steps_per_sec, metric, **extra):
        if mesh is not None:
            metric += f" [mesh={args_cli.mesh}]"
        print(json.dumps({
            "metric": metric,
            "value": round(steps_per_sec, 1),
            "unit": "env_steps/s",
            "vs_baseline": round(steps_per_sec / BASELINE, 4),
            **extra,
        }), flush=True)

    if args_cli.league:
        emit(*measure_league())
        return

    # headline measured FIRST so a context-measurement failure can't lose it
    headline = measure_selfplay()

    # roofline context (round-4 VERDICT #5): vs_baseline reads as 78%
    # unexplained headroom without the measured physical ceiling next to it
    roofline = {}
    try:
        ceil = measure_forward_ceiling()
        roofline = {
            "ceiling_steps_per_s": round(ceil, 1),
            "ceiling_fraction": round(headline[0] / ceil, 4),
            "ceiling_note": (
                "model-only b40c256 forward ceiling on this chip (~90% of "
                "bf16 peak; int8 built, measured at parity, and ruled out "
                "— docs/profiling-round3.md §3-4). The headline cannot "
                "exceed this without skipping network evaluations."),
        }
    except Exception as e:  # pragma: no cover - context must not kill bench
        roofline = {"ceiling_error": repr(e)[:200]}

    context = {}
    if not args_cli.quick:
        # round-3 VERDICT #5: the round artifact must carry the full proven
        # story, not just rollout — league steps/s (measured live) plus the
        # committed end-to-end amortized number (rollout+update+maintenance;
        # re-measuring THAT needs a multi-hour training run, so the bench
        # republishes the committed artifact with its provenance). All of it
        # rides the single headline JSON line (the driver contract) as a
        # "context" key rather than extra lines.
        try:
            lv, lm = measure_league()
            context["league_split_merge"] = {
                "metric": lm, "value": round(lv, 1), "unit": "env_steps/s"}
        except Exception as e:  # pragma: no cover - context must not kill bench
            context["league_split_merge"] = {"error": repr(e)[:200]}
        try:
            with open("profiles/amortized-flagship.json") as f:
                am = json.load(f)
            context["amortized_end_to_end"] = {
                "metric": ("end-to-end amortized env steps/sec "
                           "(rollout+update+maintenance, "
                           f"{am['epochs_measured']}-epoch flagship league "
                           "run incl. tournaments/snapshots/checkpoints)"),
                "value": am["amortized_steps_per_s"],
                "steady_steps_per_s": am["steady_steps_per_s"],
                "unit": "env_steps/s",
                "source": "profiles/amortized-flagship.json (committed run)",
            }
        except Exception as e:  # pragma: no cover
            context["amortized_end_to_end"] = {"error": repr(e)[:200]}

    emit(*headline, **roofline, **({"context": context} if context else {}))


if __name__ == "__main__":
    main()
