"""Pallas direct 3x3 conv for the SE-ResNet trunk: correctness + rate.

Design (see docs/profiling-round2.md S1 and the int8/in-VMEM findings):
XLA's implicit-GEMM conv sustains ~133-176 TFLOP/s on this chip, but
chained in-VMEM GEMMs through Mosaic sustain ~278 TFLOP/s - the conv is
leaving ~40% of the MXU on the table. This kernel keeps everything in
VMEM per batch-tile: zero-padded scratch, 9 tap GEMMs (81*B_t, C)@(C, C)
accumulated in f32, one bf16 store.

Layout: activations travel as (9, 9, B, C) - spatial dims are MAJOR axes
so tap slicing needs no relayout of the tiled (minor) dims, and the whole
trunk can stay in this layout (elementwise/BN/SE/heads are layout-agnostic),
so no transposes appear between convs.

Run: python scripts/profile_pallas_conv.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024
C = 256
BLOCKS = 80
B_T = 32
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


# ---------------------------------------------------------------- kernel


def _conv_kernel(x_ref, w_ref, o_ref, xp_ref):
    """x (9,9,B_T,C) bf16, w (3,3,C,C) bf16 -> o (9,9,B_T,C) bf16."""
    bt = x_ref.shape[2]
    ch = x_ref.shape[3]
    xp_ref[...] = jnp.zeros_like(xp_ref)
    xp_ref[1:10, 1:10] = x_ref[...]
    acc = jnp.zeros((81 * bt, ch), jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = xp_ref[di:di + 9, dj:dj + 9]          # (9,9,B_T,C)
            pf = patch.reshape(81 * bt, ch)
            acc = acc + jax.lax.dot_general(
                pf, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(9, 9, bt, ch).astype(jnp.bfloat16)


def pallas_conv(x, w, b_t=B_T):
    """SAME 3x3 conv, activations in (9, 9, B, C) layout."""
    _, _, n, ch = x.shape
    return pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((9, 9, n, ch), jnp.bfloat16),
        grid=(n // b_t,),
        in_specs=[
            pl.BlockSpec((9, 9, b_t, ch), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch, ch), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, 9, b_t, ch), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((11, 11, b_t, ch), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * 81 * n * ch * ch,
            bytes_accessed=2 * (2 * 81 * n * ch) + 2 * 9 * ch * ch,
            transcendentals=0,
        ),
    )(x, w)


def direct_conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def make_chain(conv_fn, weights, T, shape):
    @jax.jit
    def run():
        x0 = jnp.full(shape, 0.01, jnp.bfloat16)

        def step(x, _):
            for w in weights:
                x = conv_fn(x, w) * jnp.bfloat16(0.5)
            return x, ()

        x, _ = jax.lax.scan(step, x0, None, length=T)
        return x.astype(jnp.float32).sum()
    return run


def main():
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)

    # --- correctness vs XLA conv (bf16 in, f32 accumulate) ---
    xs = jax.random.normal(kx, (8, 9, 9, C), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (3, 3, C, C), jnp.float32) * 0.05).astype(jnp.bfloat16)
    ref = direct_conv_nhwc(xs, w).astype(jnp.float32)
    got = pallas_conv(jnp.transpose(xs, (1, 2, 0, 3)), w, b_t=8)
    got = jnp.transpose(got, (2, 0, 1, 3)).astype(jnp.float32)
    err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    print(f"pallas-vs-XLA conv rel err: {err:.5f}")
    assert err < 0.02, "pallas conv mismatch"

    # --- trunk-chain rates ---
    kws = jax.random.split(kw, BLOCKS)
    ws = [(jax.random.normal(k, (3, 3, C, C), jnp.float32) * 0.02).astype(jnp.bfloat16)
          for k in kws]
    flops_fwd = 2 * 9 * 81 * B * C * C * BLOCKS

    t_xla = per_step(functools.partial(make_chain, direct_conv_nhwc, ws, shape=(B, 9, 9, C)))
    print(f"XLA conv x{BLOCKS} B={B}: {t_xla*1e3:.2f} ms "
          f"({flops_fwd/t_xla/1e12:.1f} TFLOP/s)")

    for b_t in (16, 32, 64):
        fn = functools.partial(pallas_conv, b_t=b_t)
        t_pal = per_step(functools.partial(make_chain, fn, ws, shape=(9, 9, B, C)))
        print(f"pallas conv x{BLOCKS} B={B} B_T={b_t}: {t_pal*1e3:.2f} ms "
              f"({flops_fwd/t_pal/1e12:.1f} TFLOP/s; vs XLA {t_xla/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
