"""Fused Pallas forward vs flax/XLA forward on the real TPU (flagship).

Measures the full b40c256 eval forward (trunk + heads) both ways at the
production rollout batch, plus correctness cross-check at small batch.

Run: python scripts/profile_fused_forward.py [batch]
"""

from __future__ import annotations

import os  # noqa: F401  (kept for callers using os)

# make the repo root importable when run as scripts/<name>.py
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from keisei_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

import statistics
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from keisei_tpu.models.fused_infer import make_fused_forward
from keisei_tpu.models.registry import build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T_SHORT, T_LONG, REPEATS = 1, 3, 3
FLOPS_PER_SAMPLE = 7.65e9


def timed(fn, *args):
    t0 = time.time()
    float(fn(*args))
    return time.time() - t0


def per_step(make_fn):
    f_s, f_l = make_fn(T_SHORT), make_fn(T_LONG)
    timed(f_s), timed(f_l)
    samples = []
    for _ in range(REPEATS):
        ts, tl = timed(f_s), timed(f_l)
        samples.append((tl - ts) / (T_LONG - T_SHORT))
    return statistics.median(samples)


def main():
    model, cfg = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    variables = model.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)

    # --- correctness on-device at small batch ---
    obs_s = (jax.random.normal(jax.random.key(5), (32, 50, 9, 9)) > 0.8
             ).astype(jnp.float32)
    ref = model.apply(variables, obs_s, train=False)
    for bt in (16, 32):
        fwd = make_fused_forward(cfg, batch_tile=bt)
        got = jax.jit(fwd)(variables, obs_s)
        err = float(jnp.abs(got.policy_logits - ref.policy_logits).max())
        import numpy as np
        agree = (np.asarray(got.policy_logits).reshape(32, -1).argmax(1)
                 == np.asarray(ref.policy_logits).reshape(32, -1).argmax(1)).mean()
        print(f"bt={bt}: policy max abs err {err:.3f}, top-1 agreement {agree:.3f}")

    # --- timing: scan of T forwards with a data dependency ---
    obs0 = (jax.random.normal(jax.random.key(6), (B, 50, 9, 9)) > 0.8
            ).astype(jnp.float32)

    def make_flax(T):
        @jax.jit
        def run(variables, obs):
            def step(o, _):
                out = model.apply(variables, o, train=False)
                # fold output back into the input so the scan can't hoist
                d = (out.policy_logits.mean() * 1e-6).astype(jnp.float32)
                return o + d, ()
            o, _ = jax.lax.scan(step, obs, None, length=T)
            return o.sum()
        return lambda: run(variables, obs0)

    def make_fused(bt):
        fwd = make_fused_forward(cfg, batch_tile=bt)

        def mk(T):
            @jax.jit
            def run(variables, obs):
                def step(o, _):
                    out = fwd(variables, o)
                    d = (out.policy_logits.mean() * 1e-6).astype(jnp.float32)
                    return o + d, ()
                o, _ = jax.lax.scan(step, obs, None, length=T)
                return o.sum()
            return lambda: run(variables, obs0)
        return mk

    t_flax = per_step(make_flax)
    print(f"flax/XLA forward B={B}: {t_flax*1e3:.2f} ms "
          f"({B/t_flax:.0f} samples/s, {FLOPS_PER_SAMPLE*B/t_flax/1e12:.1f} TFLOP/s)")
    for bt in (16, 32):
        t_f = per_step(make_fused(bt))
        print(f"fused pallas forward B={B} bt={bt}: {t_f*1e3:.2f} ms "
              f"({B/t_f:.0f} samples/s, {FLOPS_PER_SAMPLE*B/t_f/1e12:.1f} TFLOP/s, "
              f"{t_flax/t_f:.2f}x)")


if __name__ == "__main__":
    main()
