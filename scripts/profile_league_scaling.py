#!/usr/bin/env python
"""Explain the league rollout's N-scaling (VERDICT r2 #6).

perf_floors.json pinned league at 91% of self-play at N=1024 while N=256
measures parity. The compact league step replaces self-play's ONE
full-batch forward with a learner half-batch forward (fp32) plus K/2
opponent block forwards (bf16). This script measures, on the real chip:

  1. self-play vs league rollout env-steps/s at N in {256, 1024}
  2. isolated b40c256 forward latency at every batch size the two step
     structures use, fp32 and bf16
  3. a predicted league/self-play ratio from the component model
     (sum of partial forwards / one full forward)

and writes profiles/league-scaling.json. If the measured gap matches the
component model, the 9% is the intrinsic cost of splitting one batch-1024
matmul stream into 512+256+256 (MXU efficiency + per-op overheads), not an
implementation bug; the doc records that and the floors get re-pinned at
both N.

Usage: python scripts/profile_league_scaling.py [--out profiles/league-scaling]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rollout_steps_s(n_envs: int, league: bool,
                    t_short: int = 2, t_long: int = 10, repeats: int = 3):
    """Fused rollout throughput via bench.py's short/long scan differencing
    (the per-call fixed costs — dispatch, trajectory allocation, host
    sync — cancel in (t_long - t_short), leaving the pure per-ply rate
    that perf_floors.json pins)."""
    import statistics as st

    import jax
    import jax.numpy as jnp

    from keisei_tpu.env.vec_env import EnvCore
    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.value_adapter import get_value_adapter

    model, _ = build_model("se_resnet", _flagship_params())
    adapter = get_value_adapter("katago")
    env_core = EnvCore(n_envs, 512, 50)
    rng = jax.random.key(0)
    dummy = jnp.zeros((2, 50, 9, 9), jnp.float32)
    variables = model.init(jax.random.key(1), dummy, train=False)
    env_states, obs, mask = env_core.init()

    def build(T):
        if league:
            from keisei_tpu.training.league_rollout import (
                make_league_rollout, parity_colors,
                stack_opponent_variables)

            K = 4
            roll = make_league_rollout(env_core, model, adapter, T, K)
            opp = stack_opponent_variables([
                jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)
                for _ in range(K)
            ])
            colors = parity_colors(n_envs)

            @jax.jit
            def run(k):
                carry, traj, next_value, stats = roll(
                    variables, opp, env_states, obs, mask, colors, k)
                return traj.rewards.sum() + next_value.sum()

            return run
        from keisei_tpu.training.rollout import make_selfplay_rollout

        roll = make_selfplay_rollout(env_core, model, adapter, T)

        @jax.jit
        def run(k):
            carry, traj, next_value, stats = roll(
                variables, env_states, obs, mask, k)
            return traj.rewards.sum() + next_value.sum()

        return run

    f_short, f_long = build(t_short), build(t_long)

    def timed(fn):
        # scalar host fetch: jax.block_until_ready is a no-op through the
        # axon tunnel (docs/profiling-update.md "measurement traps")
        t0 = time.perf_counter()
        float(fn(rng))
        return time.perf_counter() - t0

    timed(f_short)  # compile
    timed(f_long)
    samples = []
    for _ in range(repeats):
        ts, tl = timed(f_short), timed(f_long)
        samples.append((tl - ts) / (t_long - t_short))
    return n_envs / st.median(samples)


def _flagship_params():
    return {"num_blocks": 40, "channels": 256, "se_reduction": 16,
            "global_pool_channels": 128, "policy_channels": 32,
            "value_fc_size": 256, "score_fc_size": 128, "obs_channels": 50}


def forward_ms(batch: int, dtype: str, repeats: int = 3,
               verbose: bool = True, lengths: tuple = (2, 10, 26)):
    """Isolated b40c256 forward latency via scan differencing (the same
    methodology as the rollout numbers: a whole-call timing carries a
    ~30 ms dispatch+sync floor that swamps small batches). `dtype` is the
    WEIGHT dtype — compute is always bf16 (se_resnet.py dtype default);
    bf16 weights only halve the weight-stream HBM reads, exactly the
    difference between learner and opponent forwards in the league step.

    The chain feeds each forward's policy output back into the next
    input at full magnitude (renormalized) so no algebraic simplification
    can sever the iteration dependency, and the measurement self-checks:
    raw per-call walls are printed and the three-length slope must be
    positive and consistent, else the value is reported as NaN. (The first
    committed run of this script produced ~0/negative deltas — the scan
    body had been elided — which the old two-length median silently
    accepted; see docs/league-compact-rollout.md.)"""
    import statistics as st

    import jax
    import jax.numpy as jnp

    from keisei_tpu.models.registry import build_model

    model, _ = build_model("se_resnet", _flagship_params())
    dummy = jnp.zeros((2, 50, 9, 9), jnp.float32)
    variables = model.init(jax.random.key(1), dummy, train=False)
    if dtype == "bf16":
        variables = jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables)
    obs = jax.random.normal(jax.random.key(2), (batch, 50, 9, 9),
                            jnp.float32)

    def build(L):
        def chain(v, o):
            def body(carry, _):
                out = model.apply(v, carry, train=False)
                # fold the policy plane back into the input at O(1)
                # magnitude: (B, 9, 9, 139) -> mean over move types ->
                # (B, 1, 9, 9), broadcast-added then renormalized
                probe = out.policy_logits.astype(jnp.float32)
                plane = probe.mean(axis=-1)[:, None, :, :]
                nxt = carry + plane
                nxt = nxt / (1.0 + jnp.abs(nxt).mean())
                return nxt, None

            final, _ = jax.lax.scan(body, o, None, length=L)
            return final.sum()

        return jax.jit(chain)

    # three lengths: slope consistency is the elision detector (two-length
    # mode skips the consistency cross-check to save a minutes-long tunnel
    # compile; positivity + the printed raw walls still catch elision)
    fns = {L: build(L) for L in lengths}

    def timed(fn):
        # scalar host fetch (block_until_ready no-ops through axon)
        t0 = time.perf_counter()
        float(fn(variables, obs))
        return time.perf_counter() - t0

    for L in lengths:
        timed(fns[L])  # compile
    pairs = list(zip(lengths[:-1], lengths[1:]))
    per_pair = {p: [] for p in pairs}
    for _ in range(repeats):
        raw = {L: timed(fns[L]) for L in lengths}
        if verbose:
            print(f"    raw walls bs={batch}/{dtype}: " + " ".join(
                f"L={L}:{raw[L] * 1000:.1f}ms" for L in lengths),
                flush=True)
        for lo, hi in pairs:
            per_pair[(lo, hi)].append((raw[hi] - raw[lo]) / (hi - lo))
    med = [st.median(per_pair[p]) for p in pairs]
    bad = any(m <= 0 for m in med) or (
        len(med) > 1 and not (0.5 < med[0] / med[1] < 2.0))
    if bad:
        print(f"    WARNING bs={batch}/{dtype}: inconsistent slopes "
              f"{[round(m * 1000, 3) for m in med]} ms/iter — chain elided "
              "or noise-dominated; reporting NaN", flush=True)
        return float("nan")
    return sum(med) / len(med) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="profiles/league-scaling")
    ap.add_argument("--forward-only", action="store_true",
                    help="re-measure only the isolated forwards, merging "
                         "into existing rollout numbers in the output JSON")
    args = ap.parse_args()

    from keisei_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    report: dict = {"rollout": {}, "forward_ms": {}}
    if args.forward_only and os.path.exists(args.out + ".json"):
        with open(args.out + ".json") as f:
            report["rollout"] = json.load(f).get("rollout", {})
    def retry(fn, *a, attempts=3):
        # the axon tunnel's remote-compile endpoint drops transiently
        # (Broken pipe); completed compiles persist in the cache, so a
        # retry resumes instead of starting over
        for i in range(attempts):
            try:
                return fn(*a)
            except Exception as e:
                if i == attempts - 1 or "UNAVAILABLE" not in str(e):
                    raise
                print(f"transient backend error, retrying: {e}", flush=True)
                time.sleep(20)

    for n in () if args.forward_only else (256, 1024):
        sp = retry(rollout_steps_s, n, False)
        print(f"  self-play N={n}: {sp:,.0f}", flush=True)
        lg = retry(rollout_steps_s, n, True)
        report["rollout"][str(n)] = {
            "selfplay_steps_s": round(sp, 1),
            "league_steps_s": round(lg, 1),
            "ratio": round(lg / sp, 4),
        }
        print(f"N={n}: self-play {sp:,.0f} league {lg:,.0f} "
              f"ratio {lg / sp:.3f}", flush=True)

    # component model: self-play step = fwd(N, fp32);
    # league step = fwd(N/2, fp32) + (K/2=2) * fwd(N/4, bf16)
    # exactly the six shapes the two step structures use — every compile
    # here is minutes through the tunnel, so no speculative extras; the
    # first config runs the full three-length elision cross-check, the
    # rest reuse the validated methodology at two lengths
    configs = ((1024, "fp32"), (512, "fp32"), (256, "fp32"),
               (128, "fp32"), (256, "bf16"), (64, "bf16"))
    for i, (batch, dt) in enumerate(configs):
        lens = (2, 10, 26) if i == 0 else (2, 10)
        ms = retry(lambda b, d: forward_ms(b, d, lengths=lens), batch, dt)
        # NaN (elision-check tripped) must not reach json.dump — a bare
        # NaN literal is invalid strict JSON and breaks non-Python readers
        report["forward_ms"][f"{batch}/{dt}"] = (
            round(ms, 3) if math.isfinite(ms) else None)
        print(f"forward bs={batch} {dt}: {ms:.2f} ms", flush=True)

    for n in (256, 1024):
        full = report["forward_ms"][f"{n}/fp32"]
        half = report["forward_ms"][f"{n // 2}/fp32"]
        blk = report["forward_ms"][f"{n // 4}/bf16"]
        finite = all(isinstance(v, (int, float)) and math.isfinite(v)
                     for v in (full, half, blk))  # entries may be None
        pred = full / (half + 2 * blk) if finite and half + 2 * blk > 0 else None
        report["rollout"][str(n)]["predicted_ratio_model"] = (
            round(pred, 4) if pred is not None else None)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
