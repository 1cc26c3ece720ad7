"""int8 quantized forward vs bf16 flax forward on the real TPU (flagship).

Run: python scripts/profile_quantized_forward.py [batch]
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
import numpy as np

from keisei_tpu.models.fused_infer import make_quantized_forward
from keisei_tpu.models.registry import build_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T_SHORT, T_LONG, REPEATS = 1, 3, 3
FLOPS_PER_SAMPLE = 7.65e9


def timed(fn):
    t0 = time.time()
    float(fn())
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
    model16, cfg = build_model("se_resnet", {"num_blocks": 40, "channels": 256})
    model32, _ = build_model(
        "se_resnet", {"num_blocks": 40, "channels": 256, "dtype": jnp.float32})
    variables = model16.init(
        jax.random.key(0), jnp.zeros((2, 50, 9, 9), jnp.float32), train=False)

    # --- accuracy vs f32 truth (both paths) at small batch ---
    obs_s = (jax.random.normal(jax.random.key(5), (32, 50, 9, 9)) > 0.8
             ).astype(jnp.float32)
    truth = model32.apply(variables, obs_s, train=False)
    bf16 = model16.apply(variables, obs_s, train=False)
    qfwd = make_quantized_forward(cfg, batch_tile=32)
    got = jax.jit(qfwd)(variables, obs_s)
    t = np.asarray(truth.policy_logits, np.float32).reshape(32, -1)
    for name, out in (("bf16 flax", bf16), ("int8 fused", got)):
        o = np.asarray(out.policy_logits, np.float32).reshape(32, -1)
        rel = np.abs(o - t).max() / np.abs(t).max()
        agree = (o.argmax(1) == t.argmax(1)).mean()
        print(f"{name}: rel-err vs f32 {rel:.4f}, top1-vs-f32 {agree:.3f}")

    # --- timing ---
    obs0 = (jax.random.normal(jax.random.key(6), (B, 50, 9, 9)) > 0.8
            ).astype(jnp.float32)

    def make_flax(T):
        @jax.jit
        def run(variables, obs):
            def step(o, _):
                out = model16.apply(variables, o, train=False)
                d = (out.policy_logits.mean() * 1e-6).astype(jnp.float32)
                return o + d, ()
            o, _ = jax.lax.scan(step, obs, None, length=T)
            return o.sum()
        return lambda: run(variables, obs0)

    def make_q(T):
        @jax.jit
        def run(variables, obs):
            def step(o, _):
                out = qfwd(variables, o)
                d = (out.policy_logits.mean() * 1e-6).astype(jnp.float32)
                return o + d, ()
            o, _ = jax.lax.scan(step, obs, None, length=T)
            return o.sum()
        return lambda: run(variables, obs0)

    t_flax = per_step(make_flax)
    print(f"bf16 flax forward B={B}: {t_flax*1e3:.2f} ms ({B/t_flax:.0f} samples/s)")
    t_q = per_step(make_q)
    print(f"int8 fused forward B={B}: {t_q*1e3:.2f} ms ({B/t_q:.0f} samples/s, "
          f"{t_flax/t_q:.2f}x)")


if __name__ == "__main__":
    main()
