"""Bisect the compiled-vs-interpreted divergence in the fused block kernel.

Each debug kernel variant taps a successively later stage of
ops/fused_block._block_kernel and writes it as the output; the same stage
is computed in plain jnp for comparison. Run on TPU.

Run: python scripts/debug_fused_block.py
"""

from __future__ import annotations

import os  # noqa: F401  (kept for callers using os)

# make the repo root importable when run as scripts/<name>.py
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from keisei_tpu.utils.cache import ensure_compile_cache

ensure_compile_cache()

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, BT, C, GPC, SEC = 32, 16, 128, 64, 8
bf16, f32 = jnp.bfloat16, jnp.float32


def conv_ref(x, w):
    """x (9,9,B,C), w (3,3,C,C) -> f32 (9,9,B,C) SAME conv via XLA."""
    xn = jnp.transpose(x, (2, 0, 1, 3)).astype(bf16)
    y = jax.lax.conv_general_dilated(
        xn, w.astype(bf16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    return jnp.transpose(y, (1, 2, 0, 3))


def make_kernel(stage):
    def kernel(x_ref, w1_ref, w2_ref, bn_ref, gp1w_ref, gp1b_ref,
               gp2w_ref, gp2b_ref, o_ref, xp1_ref, xp2_ref):
        bt, ch = x_ref.shape[2], x_ref.shape[3]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in (xp1_ref, xp2_ref):
                r[0] = jnp.zeros_like(r[0])
                r[10] = jnp.zeros_like(r[10])
                r[1:10, 0] = jnp.zeros_like(r[1:10, 0])
                r[1:10, 10] = jnp.zeros_like(r[1:10, 10])

        x = x_ref[...]
        xp1_ref[1:10, 1:10] = x
        acc = jnp.zeros((81 * bt, ch), f32)
        for di in range(3):
            for dj in range(3):
                pf = xp1_ref[di:di + 9, dj:dj + 9].reshape(81 * bt, ch)
                acc = acc + jax.lax.dot_general(
                    pf, w1_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
        if stage == "conv1":
            o_ref[...] = acc.reshape(9, 9, bt, ch).astype(o_ref.dtype)
            return
        h = jnp.maximum(acc * bn_ref[0:1] + bn_ref[1:2], 0.0).reshape(81, bt, ch)
        if stage == "bnrelu":
            o_ref[...] = h.reshape(9, 9, bt, ch).astype(o_ref.dtype)
            return
        xf = x.reshape(81, bt, ch).astype(f32)
        mean = xf.mean(axis=0)
        amax = xf.max(axis=0)
        var = jnp.square(xf - mean[None]).mean(axis=0)
        pool = jnp.concatenate([mean, amax, jnp.sqrt(var + 1e-10)], axis=-1)
        if stage == "pool":
            # broadcast pool (bt, 3C) into the first rows for comparison
            o_ref[...] = jnp.broadcast_to(
                pool[:, :ch][None], (81, bt, ch)).reshape(9, 9, bt, ch).astype(o_ref.dtype)
            return
        g = jnp.maximum(jax.lax.dot_general(
            pool.astype(bf16), gp1w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + gp1b_ref[...], 0.0)
        g2 = jax.lax.dot_general(
            g.astype(bf16), gp2w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + gp2b_ref[...]
        h = h + g2[None]
        if stage == "gpbias":
            o_ref[...] = h.reshape(9, 9, bt, ch).astype(o_ref.dtype)
            return
        xp2_ref[1:10, 1:10] = h.reshape(9, 9, bt, ch).astype(bf16)
        acc2 = jnp.zeros((81 * bt, ch), f32)
        for di in range(3):
            for dj in range(3):
                pf = xp2_ref[di:di + 9, dj:dj + 9].reshape(81 * bt, ch)
                acc2 = acc2 + jax.lax.dot_general(
                    pf, w2_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
        o_ref[...] = acc2.reshape(9, 9, bt, ch).astype(o_ref.dtype)

    return kernel


def run_stage(stage, x, w1, w2, bn, gp1w, gp1b, gp2w, gp2b, interpret):
    const = lambda i: (0, 0)  # noqa: E731
    return pl.pallas_call(
        make_kernel(stage),
        out_shape=jax.ShapeDtypeStruct((9, 9, B, C), f32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((9, 9, BT, C), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, GPC), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GPC), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((GPC, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, 9, BT, C), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((11, 11, BT, C), bf16),
                        pltpu.VMEM((11, 11, BT, C), bf16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, w2, bn, gp1w, gp1b, gp2w, gp2b)


def main():
    ks = jax.random.split(jax.random.key(0), 8)
    x = (jax.random.normal(ks[0], (9, 9, B, C)) * 0.5).astype(bf16)
    w1 = (jax.random.normal(ks[1], (3, 3, C, C)) * 0.05).astype(bf16)
    w2 = (jax.random.normal(ks[2], (3, 3, C, C)) * 0.05).astype(bf16)
    s1 = jnp.exp(jax.random.normal(ks[3], (C,)) * 0.1)
    b1 = jax.random.normal(ks[4], (C,)) * 0.1
    bn = jnp.stack([s1, b1, s1, b1]).astype(f32)
    gp1w = (jax.random.normal(ks[5], (3 * C, GPC)) * 0.1).astype(bf16)
    gp1b = jnp.zeros((1, GPC), f32) + 0.05
    gp2w = (jax.random.normal(ks[6], (GPC, C)) * 0.1).astype(bf16)
    gp2b = jnp.zeros((1, C), f32) + 0.01

    # references in plain jnp (f32 pools like the kernel)
    xf = x.astype(f32)
    c1 = conv_ref(x, w1)
    href = jnp.maximum(c1 * s1 + b1, 0.0)
    mean = xf.mean(axis=(0, 1)); amax = xf.max(axis=(0, 1))
    var = jnp.square(xf - mean[None, None]).mean(axis=(0, 1))
    pool = jnp.concatenate([mean, amax, jnp.sqrt(var + 1e-10)], -1)
    g = jnp.maximum(pool.astype(bf16) @ gp1w, 0 * 1.0)
    g = jnp.maximum((pool.astype(bf16) @ gp1w).astype(f32) + gp1b, 0.0)
    g2 = (g.astype(bf16) @ gp2w).astype(f32) + gp2b
    hg = href + g2[None, None]
    c2 = conv_ref(hg.astype(bf16), w2)

    refs = {
        "conv1": c1,
        "bnrelu": href,
        "pool": jnp.broadcast_to(mean[None, None, :, :], (9, 9, B, C)),
        "gpbias": hg,
        "conv2": c2,
    }
    for stage in ("conv1", "bnrelu", "pool", "gpbias", "conv2"):
        got = run_stage(stage, x, w1, w2, bn, gp1w, gp1b, gp2w, gp2b, False)
        ref = refs[stage]
        err = float(jnp.max(jnp.abs(got - ref)))
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        print(f"{stage:8s}: max abs err {err:10.4f}  (rel {err/scale:.4f})")


if __name__ == "__main__":
    main()
