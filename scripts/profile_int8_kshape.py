"""int8-vs-bf16 MXU rate as a function of K at the qblock's real shapes.

ops/qblock.py runs tap GEMMs (121*bt, 256) @ (256, 256) and lands at the
bf16 chain rate (no int8 win). Hypothesis: the int8 MXU path packs
multiple K-values per cell, so K=256 starves the array and int8 only
pulls ahead at larger K. This sweeps K at fixed M=3872, N=256.

Chain scheme: x:(M,K) -> o = x @ b:(K,N) -> x' = cast(o @ b2:(N,K)); both
dots are counted in the FLOP total, every dot depends on the previous, and
all shapes are constant so nothing hoists. CHAIN is scaled so per-call
work is constant across K.

Run: python scripts/profile_int8_kshape.py [K ...]
"""

from __future__ import annotations

import os

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _cache = os.path.expanduser("~/.cache/keisei-tpu-jax")
    os.makedirs(_cache, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache

import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N = 3872, 256
T_SHORT, T_LONG, REPEATS = 4, 32, 3


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


def make(dtype, K, chain, T):
    i8 = dtype == jnp.int8
    odt = jnp.int32 if i8 else jnp.float32

    def kern(a_ref, b_ref, b2_ref, o_ref):
        x = a_ref[:]
        for _ in range(chain):
            o = jax.lax.dot_general(x, b_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=odt)
            on = (o & 1).astype(dtype) if i8 else (o * 1e-3).astype(dtype)
            o2 = jax.lax.dot_general(on, b2_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=odt)
            x = (o2 & 1).astype(dtype) if i8 else (o2 * 1e-3).astype(dtype)
        o_ref[:] = x[:, :N].astype(odt)

    def call(a, b, b2):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b, b2)

    @jax.jit
    def run():
        a = jnp.ones((M, K), dtype)
        b = jnp.ones((K, N), dtype)
        b2 = jnp.ones((N, K), dtype)

        def step(s, _):
            o = call(a + s.astype(dtype), b, b2)
            return (o & 1).astype(jnp.int8)[0, 0] if i8 else o[0, 0], ()

        s, _ = jax.lax.scan(step, jnp.zeros((), jnp.int8 if i8 else odt),
                            None, length=T)
        return s.astype(jnp.float32)

    return run


def main():
    ks = [int(x) for x in sys.argv[1:]] or [256, 512, 768, 1024]
    for K in ks:
        chain = max(1, (16 * 512 + K - 1) // K)   # ~constant work per call
        flops = 2 * 2 * M * K * N * chain
        t_b = per_step(lambda T, K=K, c=chain: make(jnp.bfloat16, K, c, T))
        t_i = per_step(lambda T, K=K, c=chain: make(jnp.int8, K, c, T))
        print(f"K={K:5d} (chain {chain:3d}): "
              f"bf16 {flops/t_b/1e12:7.1f} TFLOP/s   "
              f"int8 {flops/t_i/1e12:7.1f} TOP/s   ratio {t_b/t_i:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
