"""Does the v5e int8 MXU path (2x bf16 peak) exist through Pallas/Mosaic?

docs/profiling-round2.md S7 showed stock XLA int8 dots get NO speedup.
This chains CHAIN dependent square GEMMs *inside* one Pallas kernel (all
operands resident in VMEM, each dot consuming the previous result so
nothing can be CSE'd or hoisted) - a pure MXU-rate measurement.

Run: python scripts/profile_int8_mxu.py
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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = 2048, 512            # square chained GEMMs: (M,K) @ (K,K)
CHAIN = 32                  # dots per kernel call
T_SHORT, T_LONG, REPEATS = 4, 16, 3


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


def _kernel_int8(a_ref, b_ref, o_ref):
    x = a_ref[:]
    for _ in range(CHAIN):
        o = jax.lax.dot_general(x, b_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = (o & 1).astype(jnp.int8)  # depend on o; stay in int8 range
    o_ref[:] = x.astype(jnp.int32)


def _kernel_bf16(a_ref, b_ref, o_ref):
    x = a_ref[:]
    for _ in range(CHAIN):
        o = jax.lax.dot_general(x, b_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = (o * 1e-3).astype(jnp.bfloat16)  # keep magnitudes bounded
    o_ref[:] = x.astype(jnp.float32)


def make(dtype, T):
    kern = _kernel_int8 if dtype == jnp.int8 else _kernel_bf16
    odt = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def call(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, K), odt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    @jax.jit
    def run():
        a = jnp.ones((M, K), dtype)
        b = jnp.ones((K, K), dtype)

        def step(a, _):
            o = call(a, b)
            return (o & 1).astype(jnp.int8) if dtype == jnp.int8 \
                else (o * 1e-6).astype(jnp.bfloat16), ()

        a, _ = jax.lax.scan(step, a, None, length=T)
        return a.astype(jnp.float32).sum()
    return run


def main():
    flops = 2 * M * K * K * CHAIN
    t_bf16 = per_step(lambda T: make(jnp.bfloat16, T))
    print(f"pallas bf16 ({M}x{K})@({K}x{K}) x{CHAIN} in-VMEM: "
          f"{t_bf16*1e3:.3f} ms/step -> {flops/t_bf16/1e12:.1f} TFLOP/s")
    t_int8 = per_step(lambda T: make(jnp.int8, T))
    print(f"pallas int8 ({M}x{K})@({K}x{K}) x{CHAIN} in-VMEM: "
          f"{t_int8*1e3:.3f} ms/step -> {flops/t_int8/1e12:.1f} TOP/s "
          f"(int8/bf16 speedup {t_bf16/t_int8:.2f}x)")


if __name__ == "__main__":
    main()
