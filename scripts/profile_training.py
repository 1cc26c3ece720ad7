"""Trace real training epochs with jax.profiler -> TensorBoard/Perfetto.

The analog of the reference's torch.profiler harness
(scripts/profile_training.py:1-16 there): runs a configured trainer for a
few epochs inside a profiler trace so the op-level timeline (fused rollout
scan, PPO update, host gaps) can be inspected with TensorBoard's profile
plugin or ui.perfetto.dev.

Usage:
    python scripts/profile_training.py --config configs/katago-b40c256.toml \
        [--epochs 2] [--logdir /tmp/keisei-trace]
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--logdir", default="/tmp/keisei-tpu-trace")
    p.add_argument("--warmup-epochs", type=int, default=1,
                   help="epochs run before tracing (compile excluded)")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, force=True)

    from keisei_tpu.training.config import load_config
    from keisei_tpu.training.loop import SelfPlayTrainer

    trainer = SelfPlayTrainer(load_config(args.config))
    for _ in range(args.warmup_epochs):  # compile outside the trace
        trainer.run_epoch()

    with jax.profiler.trace(args.logdir):
        for _ in range(args.epochs):
            em = trainer.run_epoch()
            print(f"epoch {em.epoch}: rollout={em.rollout_time:.2f}s "
                  f"update={em.update_time:.2f}s")
    print(f"trace written to {args.logdir} — open with TensorBoard's profile "
          f"plugin or convert to Perfetto")


if __name__ == "__main__":
    main()
