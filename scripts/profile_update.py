"""PPO-update microbenchmark: minibatch-size sweep + MFU at flagship shapes.

Round-1 left the update phase unexamined (VERDICT weak #3): the flagship
league epoch spent 18.9 s in the update with no MFU analysis. This measures
the full jitted update (GAE -> normalize -> epochs x minibatch scan) at the
production league trajectory shape for a range of minibatch sizes, plus the
isolated fwd+bwd+step at each size, and derives MFU against the chip's bf16
peak. Results go to stdout; redirect into profiles/ to commit.

Usage:
    python scripts/profile_update.py [--blocks 40 --channels 256]
        [--rows 65 --envs 256] [--sweep 256,512,1024,2048]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from keisei_tpu.utils.cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# measured: b40c256 fwd = 7.65 GFLOP/sample (docs/profiling-round3.md);
# bwd approx 2x fwd -> 3x total per trained sample
FWD_GFLOP_PER_SAMPLE_B40C256 = 7.65
TPU_V5E_BF16_PEAK_TFLOPS = 197.0


def sync(tree):
    """True device synchronization.

    On the axon TPU tunnel `jax.block_until_ready` returns without waiting
    (measured: 0.18 ms after dispatching a 48 s program), so every timing
    here syncs by pulling one element to the host instead.
    """
    leaf = jax.tree.leaves(tree)[0]
    jax.device_get(leaf.ravel()[0:1])


def timed_chained(update, state, traj, nv, repeats=3):
    """Time the full update with the TrainState THREADED through calls.

    Two harness bugs this design defeats: (1) returning only a loss scalar
    lets XLA dead-code-eliminate the optimizer step (an early harness did
    exactly that and reported a 0.005 s "update"); feeding the new state
    back in keeps every step live. (2) block_until_ready not blocking on
    this platform — see sync().
    """
    state = update(state, traj, nv, jax.random.key(1), 0.01)[0]
    sync(state.opt_state)
    samples = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, metrics = update(state, traj, nv, jax.random.key(2 + i), 0.01)
        sync(state.opt_state)
        samples.append(time.perf_counter() - t0)
    return min(samples), metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, default=40)
    p.add_argument("--channels", type=int, default=256)
    p.add_argument("--rows", type=int, default=65,
                   help="trajectory rows (compact league: T/2+1 = 65)")
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--sweep", default="256,512,1024,2048")
    p.add_argument("--epochs-per-batch", type=int, default=4)
    args = p.parse_args()

    from keisei_tpu.models.registry import build_model
    from keisei_tpu.training.ppo import (
        KataGoPPOParams,
        TrainState,
        Trajectory,
        make_optimizer,
        make_ppo_update,
    )
    from keisei_tpu.training.value_adapter import get_value_adapter

    model, _ = build_model(
        "se_resnet", {"num_blocks": args.blocks, "channels": args.channels})
    adapter = get_value_adapter("katago")
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)

    Tr, N = args.rows, args.envs
    S = Tr * N
    A = 11259

    # Generate the synthetic trajectory ON DEVICE: shipping ~460 MB of
    # numpy through the axon tunnel measured at ~3 MB/s and dominated an
    # earlier version of this harness by minutes.
    @jax.jit
    def gen_traj(k):
        ks = jax.random.split(k, 6)
        return Trajectory(
            obs=jax.random.normal(ks[0], (Tr, N, 50, 81), jnp.float32),
            actions=jnp.zeros((Tr, N), jnp.int32),
            log_probs=jax.random.normal(ks[1], (Tr, N)) * 0.1,
            values=jax.random.normal(ks[2], (Tr, N)),
            rewards=jnp.zeros((Tr, N), jnp.float32),
            dones=jnp.zeros((Tr, N), bool),
            terminated=jnp.zeros((Tr, N), bool),
            legal_masks=(jax.random.uniform(ks[3], (Tr, N, A)) < 0.003)
            .at[..., 0].set(True),
            value_cats=jax.random.randint(ks[4], (Tr, N), -1, 3),
            score_targets=jnp.zeros((Tr, N), jnp.float32),
            next_value_override=jnp.full((Tr, N), jnp.nan),
            valid=jax.random.uniform(ks[5], (Tr, N)) < 0.985,
        )

    traj = gen_traj(jax.random.key(0))
    sync(traj.obs)
    # NOTE: traj.actions must be legal per the masks for real losses, but
    # the timing is action-agnostic (same gather/softmax work either way).
    next_value = jnp.zeros((N,), jnp.float32)

    gf_fwd = FWD_GFLOP_PER_SAMPLE_B40C256 * (
        (args.blocks / 40) * (args.channels / 256) ** 2
    )
    print(f"# PPO update sweep — b{args.blocks}c{args.channels}, "
          f"traj ({Tr},{N}) = {S} samples, epochs_per_batch="
          f"{args.epochs_per_batch}")
    print(f"# fwd est {gf_fwd:.2f} GFLOP/sample; backend={jax.default_backend()}")
    print(f"{'bs':>6} {'n_mb':>5} {'update_s':>9} {'samples/s':>10} "
          f"{'TFLOP/s':>8} {'MFU%':>6}")

    for bs in [int(x) for x in args.sweep.split(",")]:
        cfg = KataGoPPOParams(batch_size=bs,
                              epochs_per_batch=args.epochs_per_batch)
        opt = make_optimizer(cfg)
        # fresh copies per batch size: the donated update consumes its
        # input buffers, and `variables` must survive the whole sweep
        fresh = jax.tree.map(jnp.copy, variables)
        state = TrainState(
            params=fresh["params"],
            batch_stats=fresh.get("batch_stats", {}),
            opt_state=opt.init(fresh["params"]),
            step=jnp.int32(0),
        )
        update = jax.jit(make_ppo_update(model, adapter, cfg, opt),
                         donate_argnums=(0,))
        n_mb = S // bs
        trained = n_mb * bs * args.epochs_per_batch

        t_compile = time.perf_counter()
        dt, metrics = timed_chained(update, state, traj, next_value)
        t_compile = time.perf_counter() - t_compile - 4 * dt
        tflops = trained * 3 * gf_fwd / dt / 1000
        mfu = 100 * tflops / TPU_V5E_BF16_PEAK_TFLOPS
        pl = float(metrics["policy_loss"])
        print(f"{bs:>6} {n_mb:>5} {dt:>9.3f} {trained / dt:>10.0f} "
              f"{tflops:>8.1f} {mfu:>6.1f}   # compile ~{t_compile:.0f}s, "
              f"policy_loss {pl:.4f}")


if __name__ == "__main__":
    main()
