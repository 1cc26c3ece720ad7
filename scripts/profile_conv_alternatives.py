"""Measure conv-algorithm alternatives for the SE-ResNet trunk on TPU.

The direct 3x3 conv path runs at ~90% of v5e's bf16 MXU peak
(docs/profiling-round2.md S1), so further headline gains must come from
doing FEWER MACs or using a FASTER MXU mode:

  a) direct bf16 conv (the production baseline),
  b) Winograd F(2x2,3x3) in pure XLA (1.82x fewer MACs on 9x9 boards:
     25 tiles x 16 products vs 81 cells x 9 taps),
  c) a Pallas int8 matmul microbench (v5e advertises 2x int8 MXU
     throughput; stock XLA dots never reach it - check if Mosaic does).

Methodology matches docs/profiling-round2.md: jitted T-step scans that
return one scalar, per-step = (t_long - t_short)/(T_long - T_short),
median of 3; every carry feeds the next step so nothing hoists.

Run: python scripts/profile_conv_alternatives.py
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

import jax
import jax.numpy as jnp
import numpy as np

B = 1024          # production rollout batch
C = 256           # flagship channels
BLOCKS = 80       # 40 blocks x 2 convs: chain length of the real trunk
T_SHORT, T_LONG, REPEATS = 1, 3, 3


def timed(fn, *args):
    t0 = time.time()
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()), fn(*args))
    return time.time() - t0


def per_step(make_fn):
    f_s, f_l = make_fn(T_SHORT), make_fn(T_LONG)
    timed(f_s)
    timed(f_l)
    samples = []
    for _ in range(REPEATS):
        ts, tl = timed(f_s), timed(f_l)
        samples.append((tl - ts) / (T_LONG - T_SHORT))
    return statistics.median(samples)


# ---------------------------------------------------------------- direct


def direct_conv(x, w):
    """x (B,9,9,C) bf16, w (3,3,C,C) bf16 -> (B,9,9,C) bf16."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


# ------------------------------------------------------- winograd F(2,3)
# Y = A^T [ (G g G^T) . (B^T d B) ] A  with
# B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]   (entries 0/+-1)
# G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
# A^T = [[1,1,1,0],[0,1,-1,-1]]                        (entries 0/+-1)

_G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)


def wino2_weights(w):
    """(3,3,Ci,Co) f32 -> (16,Ci,Co) Winograd-domain kernel, bf16."""
    wt = jnp.einsum("ak,bl,klio->abio", _G, _G, w.astype(jnp.float32))
    return wt.reshape(16, w.shape[2], w.shape[3]).astype(jnp.bfloat16)


def _bt_apply(r):
    # B^T stage: 4 outputs from 4 inputs, adds only
    return [r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]]


def _at_apply(r):
    # A^T stage: 2 outputs from 4 inputs, adds only
    return [r[0] + r[1] + r[2], r[1] - r[2] - r[3]]


def wino2_conv(x, wt):
    """x (B,9,9,C) bf16, wt (16,Ci,Co) bf16 -> (B,9,9,Co) bf16.

    SAME-padded 3x3 conv on a 9x9 board via 5x5 overlapping 4x4 tiles.
    """
    n, _, _, ci = x.shape
    co = wt.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    # u[i][j][n, tx, ty, c] = xp[n, 2tx+i, 2ty+j, c]  (strided slices)
    u = [[xp[:, i:i + 10:2, j:j + 10:2, :] for j in range(4)] for i in range(4)]
    tmp = [[None] * 4 for _ in range(4)]
    for j in range(4):
        t = _bt_apply([u[i][j] for i in range(4)])
        for a in range(4):
            tmp[a][j] = t[a]
    vab = [None] * 16
    for a in range(4):
        t = _bt_apply(tmp[a])
        for b in range(4):
            vab[a * 4 + b] = t[b]
    v = jnp.stack(vab).reshape(16, n * 25, ci)
    m = jax.lax.dot_general(
        v, wt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (16, n*25, co)
    m = m.reshape(4, 4, n, 5, 5, co)
    tmp2 = [[None] * 4 for _ in range(2)]
    for b in range(4):
        t = _at_apply([m[a, b] for a in range(4)])
        for p in range(2):
            tmp2[p][b] = t[p]
    rows = []
    for p in range(2):
        t = _at_apply(tmp2[p])
        rows.append(t)  # rows[p][q]: (n,5,5,co)
    y = jnp.stack([jnp.stack(r) for r in rows])          # (2,2,n,5,5,co)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))             # (n,5,2,5,2,co)
    y = y.reshape(n, 10, 10, co)[:, :9, :9, :]
    return y.astype(jnp.bfloat16)


# ------------------------------------------------------ chained trunk bench


def make_chain(conv_fn, weights, T):
    @jax.jit
    def run():
        x0 = jnp.ones((B, 9, 9, C), jnp.bfloat16) * 0.01

        def step(x, _):
            for w in weights:
                x = conv_fn(x, w)
                # keep magnitudes bounded so the chain can't overflow
                x = x * jnp.bfloat16(0.5)
            return x, ()

        x, _ = jax.lax.scan(step, x0, None, length=T)
        return x.astype(jnp.float32).sum()

    return run


# ------------------------------------------------------ pallas int8 GEMM

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

GM, GK, GN = 4096, 1152, 256  # im2col conv shape: (B_t*81, 9*C_in_chunk) x (., C_out)


def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.int32)


def _mm_kernel_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_pallas_mm(dtype, T):
    TM = 512
    kern = _mm_kernel if dtype == jnp.int8 else _mm_kernel_bf16
    odt = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def mm(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((GM, GN), odt),
            grid=(GM // TM,),
            in_specs=[
                pl.BlockSpec((TM, GK), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GK, GN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, GN), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(a, b)

    @jax.jit
    def run():
        if dtype == jnp.int8:
            a0 = jnp.ones((GM, GK), jnp.int8)
            b0 = jnp.ones((GK, GN), jnp.int8)

            def step(a, _):
                o = mm(a, b0)
                # scalar-couple the output back so the scan can't hoist
                s = (o.sum() % 3).astype(jnp.int8)
                return a + s, ()

            a, _ = jax.lax.scan(step, a0, None, length=T)
            return a.astype(jnp.int32).sum()
        a0 = jnp.ones((GM, GK), jnp.bfloat16)
        b0 = jnp.ones((GK, GN), jnp.bfloat16)

        def step(a, _):
            o = mm(a, b0)
            s = (o.sum() * 1e-9).astype(jnp.bfloat16)
            return a + s, ()

        a, _ = jax.lax.scan(step, a0, None, length=T)
        return a.astype(jnp.float32).sum()

    return run


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.key(0)

    # --- correctness: winograd vs direct, f32 ---
    kx, kw = jax.random.split(key)
    x32 = jax.random.normal(kx, (8, 9, 9, 32), jnp.float32)
    w32 = jax.random.normal(kw, (3, 3, 32, 32), jnp.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x32, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wt32 = jnp.einsum("ak,bl,klio->abio", _G, _G, w32).reshape(16, 32, 32)

    def wino2_f32(x, wt):
        y = wino2_conv(x.astype(jnp.float32), wt.astype(jnp.float32))
        return y
    # quick f32 pass through the bf16-typed function is fine for a tolerance check
    got = wino2_conv(x32.astype(jnp.bfloat16), wt32.astype(jnp.bfloat16))
    err = float(jnp.abs(got.astype(jnp.float32) - ref).max() / jnp.abs(ref).max())
    print(f"winograd-vs-direct rel err (bf16 pipeline): {err:.4f}")

    # --- trunk chain timings ---
    kws = jax.random.split(kw, BLOCKS)
    ws_direct = [jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.02 for k in kws]
    ws_wino = [wino2_weights(w.astype(jnp.float32)) for w in ws_direct]

    t_direct = per_step(functools.partial(make_chain, direct_conv, ws_direct))
    print(f"direct bf16 conv x{BLOCKS}, B={B}: {t_direct*1e3:.2f} ms "
          f"({7.65e9*B/t_direct/1e12:.1f} eff TFLOP/s at direct-conv FLOP count)")

    t_wino = per_step(functools.partial(make_chain, wino2_conv, ws_wino))
    print(f"winograd F(2,3) XLA x{BLOCKS}, B={B}: {t_wino*1e3:.2f} ms "
          f"(speedup vs direct: {t_direct/t_wino:.2f}x)")

    # --- pallas int8 vs bf16 GEMM ---
    flops = 2 * GM * GK * GN
    t_bf16 = per_step(functools.partial(make_pallas_mm, jnp.bfloat16))
    print(f"pallas bf16 GEMM {GM}x{GK}x{GN}: {t_bf16*1e3:.3f} ms "
          f"({flops/t_bf16/1e12:.1f} TFLOP/s)")
    t_int8 = per_step(functools.partial(make_pallas_mm, jnp.int8))
    print(f"pallas int8 GEMM {GM}x{GK}x{GN}: {t_int8*1e3:.3f} ms "
          f"({flops/t_int8/1e12:.1f} TOP/s; int8-vs-bf16 ratio {t_bf16/t_int8:.2f}x)")


if __name__ == "__main__":
    main()
