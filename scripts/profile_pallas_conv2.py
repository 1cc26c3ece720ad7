"""Second-pass pallas conv tuning: batch-tile sweep with a raised VMEM cap.

Follow-up to profile_pallas_conv.py (B_T=16 -> 183 TFLOP/s, 1.39x XLA;
B_T=32 OOM'd the default 16 MiB *scoped* vmem cap). Uses the production
ops.conv3x3 kernel which raises vmem_limit_bytes.

Run: python scripts/profile_pallas_conv2.py
"""

from __future__ import annotations

import os  # noqa: F401  (kept for callers using os)

# make the repo root importable when run as scripts/<name>.py
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from keisei_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

import functools
import statistics
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from keisei_tpu.ops.conv3x3 import conv3x3_hwbc

B, C, BLOCKS = 1024, 256, 80
T_SHORT, T_LONG, REPEATS = 1, 3, 3


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


def make_chain(bt, ws, T):
    @jax.jit
    def run():
        x0 = jnp.full((9, 9, B, C), 0.01, jnp.bfloat16)

        def step(x, _):
            for w in ws:
                x = conv3x3_hwbc(x, w, batch_tile=bt) * jnp.bfloat16(0.5)
            return x, ()

        x, _ = jax.lax.scan(step, x0, None, length=T)
        return x.astype(jnp.float32).sum()
    return run


def main():
    kws = jax.random.split(jax.random.key(1), BLOCKS)
    ws = [(jax.random.normal(k, (3, 3, C, C), jnp.float32) * 0.02).astype(jnp.bfloat16)
          for k in kws]
    flops_fwd = 2 * 9 * 81 * B * C * C * BLOCKS
    for bt in (32, 64, 128):
        try:
            t = per_step(functools.partial(make_chain, bt, ws))
            print(f"pallas conv x{BLOCKS} B={B} B_T={bt}: {t*1e3:.2f} ms "
                  f"({flops_fwd/t/1e12:.1f} TFLOP/s)")
        except Exception as e:  # noqa: BLE001
            print(f"B_T={bt}: failed: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
