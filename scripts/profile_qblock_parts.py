"""Where does the int8 qblock's time actually go? In-situ kernel ablations.

Variants of ops/qblock.py's block kernel with parts stripped, timed by
LONG scans (hundreds of block calls per measurement) because sub-ms
short/long differencing through the axon tunnel is unreliable — the
earlier 877 TOP/s int8 chain number came from ~0.5 ms diffs and is
suspect.

Variants:
  full        the real banded block kernel (qblock.quantized_gpbias_block)
  convs       conv GEMMs + minimal requantize only (no pool/SE/bn math)
  novpu       conv GEMMs only, int8 out via & 1 (near-zero VPU work)
  vpuonly     all the VPU math with the GEMMs removed
  bf16gemm    novpu but with bf16 operands/dots (MXU-rate comparison)

Run: python scripts/profile_qblock_parts.py [B]
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


from keisei_tpu.ops.qblock import (  # noqa: E402
    BANDS,
    _ROW_OFFSETS,
    _qconv_rows,
    _quantize_tile,
    _store_banded,
    pack_quantized,
    quantize_conv_weights,
    quantized_gpbias_block,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
CH = 256
BT = int(sys.argv[3]) if len(sys.argv) > 3 else 32
T_SHORT, T_LONG, REPEATS = 16, 128, 3
GOP_PER_BLOCK = 2 * 2 * 9 * 121 * B * CH * CH / 1e9  # counts border tax


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


def _convs_kernel(x_ref, wq1_ref, wq2_ref, o_ref, hbuf_ref, *, vpu, gemm,
                  store=True):
    """Stripped block: optional GEMMs / VPU requantize / banded stores."""
    bt = x_ref.shape[1]
    ch = x_ref.shape[2] // BANDS
    if gemm:
        acc1 = _qconv_rows(x_ref, wq1_ref, bt, ch).reshape(121, bt, ch)
    else:
        acc1 = x_ref[12:133, :, 0:ch].astype(jnp.int32)
    if vpu:
        h = jnp.maximum(acc1.astype(jnp.float32) * 1e-4, 0.0)
        hq, _ = _quantize_tile(h)
    else:
        hq = (acc1 & 1).astype(jnp.int8)
    if store:
        _store_banded(hbuf_ref, hq, ch)
        src2 = hbuf_ref
    else:
        src2 = x_ref
    if gemm:
        acc2 = _qconv_rows(src2, wq2_ref, bt, ch).reshape(121, bt, ch)
    else:
        acc2 = src2[12:133, :, 0:ch].astype(jnp.int32)
    yq = (acc2 & 1 if not vpu else jnp.clip(acc2, -127, 127)).astype(jnp.int8)
    if store:
        _store_banded(o_ref, yq, ch)
    else:
        # consume both values (i8 vector arith is unsupported in Mosaic)
        o_ref[12:133, :, 0:ch] = yq
        o_ref[13:134, :, 0:ch] = hq


def _bf16_kernel(x_ref, wq1_ref, wq2_ref, o_ref, hbuf_ref):
    """Same structure, bf16 operands + f32-accumulate dots."""
    bt = x_ref.shape[1]
    ch = x_ref.shape[2] // BANDS

    def conv(buf_ref, w_ref):
        acc = jnp.zeros((121 * bt, ch), jnp.float32)
        for d, off in enumerate(_ROW_OFFSETS):
            win = buf_ref[12 + off: 133 + off].reshape(121 * bt, BANDS * ch)
            acc = acc + jax.lax.dot_general(
                win, w_ref[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc.reshape(121, bt, ch)

    h = (conv(x_ref, wq1_ref) * 1e-2).astype(jnp.bfloat16)

    def store(ref, v, zero):
        def _z():
            ref[0:12] = jnp.zeros_like(ref[0:12])
            ref[131:145] = jnp.zeros_like(ref[131:145])
        if zero is True:
            _z()
        else:
            pl.when(zero)(_z)
        for b in range(BANDS):
            ref[12 - b: 133 - b, :, b * ch: (b + 1) * ch] = v

    store(hbuf_ref, h, pl.program_id(0) == 0)
    y = (conv(hbuf_ref, wq2_ref) * 1e-2).astype(jnp.bfloat16)
    store(o_ref, y, True)


def make_stripped(variant, T):
    i8 = variant != "bf16gemm"
    dt = jnp.int8 if i8 else jnp.bfloat16
    chb = BANDS * CH

    if variant == "gemm3d":
        kern = _convs3d_kernel
    elif variant == "bf16gemm":
        kern = _bf16_kernel
    else:
        kern = functools.partial(
            _convs_kernel,
            vpu=variant in ("convs", "vpuonly"),
            gemm=variant in ("convs", "novpu", "gemmonly"),
            store=variant not in ("gemmonly",),
        )

    def call(xbuf, wq1, wq2):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((145, B, chb), dt),
            grid=(B // BT,),
            in_specs=[
                pl.BlockSpec((145, BT, chb), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, chb, CH), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, chb, CH), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((145, BT, chb), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((145, BT, chb), dt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xbuf, wq1, wq2)

    @jax.jit
    def run():
        xbuf = jnp.ones((145, B, chb), dt)
        wq1 = jnp.ones((3, chb, CH), dt)
        wq2 = jnp.ones((3, chb, CH), dt)

        def step(x, _):
            return call(x, wq1, wq2), ()

        x, _ = jax.lax.scan(step, xbuf, None, length=T)
        return x.astype(jnp.float32)[0, 0, 0]

    return run


def _qconv_rows3d(buf_ref, wq_ref, bt, ch):
    """Rank-3 window dots: contract channel dim directly, no reshape."""
    acc = None
    for d, off in enumerate(_ROW_OFFSETS):
        win = buf_ref[12 + off: 133 + off]            # (121, bt, 3C)
        dot = jax.lax.dot_general(
            win, wq_ref[d], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # (121, bt, C)
        acc = dot if acc is None else acc + dot
    return acc


def _convs3d_kernel(x_ref, wq1_ref, wq2_ref, o_ref, hbuf_ref):
    """gemmonly but with rank-3 dots (no 2D reshape of the windows)."""
    bt = x_ref.shape[1]
    ch = x_ref.shape[2] // BANDS
    acc1 = _qconv_rows3d(x_ref, wq1_ref, bt, ch)
    hq = (acc1 & 1).astype(jnp.int8)
    acc2 = _qconv_rows3d(x_ref, wq2_ref, bt, ch)
    yq = (acc2 & 1).astype(jnp.int8)
    o_ref[12:133, :, 0:ch] = yq
    o_ref[13:134, :, 0:ch] = hq


def make_dotrate(T, dtype=jnp.int8):
    """Pure dependent-dot chain at the conv's M/K: (3872,768)@(768,768).

    No accumulator adds, no stores beyond the final cast — the raw MXU
    rate Mosaic achieves at these shapes. N=768 (vs the conv's 256) so
    each dot's output feeds the next dot's input with a single cast.
    """
    M, K = 121 * BT, BANDS * CH
    i8 = dtype == jnp.int8
    odt = jnp.int32 if i8 else jnp.float32
    chain = 8

    def kern(x_ref, w_ref, o_ref):
        x = x_ref[:]
        for _ in range(chain):
            o = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=odt)
            x = (o & 1).astype(dtype) if i8 else (o * 1e-3).astype(dtype)
        o_ref[:] = x

    def call(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, K), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    @jax.jit
    def run():
        x = jnp.ones((M, K), dtype)
        w = jnp.ones((K, K), dtype)

        def step(x, _):
            return call(x, w), ()

        x, _ = jax.lax.scan(step, x, None, length=T)
        return x.astype(jnp.float32)[0, 0]

    # report per-"block": scale so the printed ms is per chain-call and the
    # rate column is the honest TOP/s of the measured dots
    return run, 2 * M * K * K * chain / 1e9


def make_full(T):
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (9, 9, B, CH))
    xbuf, sx = pack_quantized(x, BT)
    w = jax.random.normal(rng, (3, 3, CH, CH)) * 0.05
    wq, ws = quantize_conv_weights(w)
    gpc, sec = 64, 16
    args = dict(
        wq1=wq, wq2=wq,
        bn_affine=jnp.ones((4, CH)),
        gp1_w=jnp.ones((3 * CH, gpc)) * 0.01, gp1_b=jnp.zeros((gpc,)),
        gp2_w=jnp.ones((gpc, CH)) * 0.01, gp2_b=jnp.zeros((CH,)),
        se1_w=jnp.ones((CH, sec)) * 0.01, se1_b=jnp.zeros((sec,)),
        se2_w=jnp.ones((sec, 2 * CH)) * 0.01, se2_b=jnp.zeros((2 * CH,)),
    )

    @jax.jit
    def run():
        def step(carry, _):
            buf, s = carry
            buf2, s2 = quantized_gpbias_block(buf, s, batch_tile=BT, **args)
            return (buf2, s2), ()

        (buf, s), _ = jax.lax.scan(step, (xbuf, sx), None, length=T)
        return s[0, 0]

    return run


def main():
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "full", "convs", "novpu", "vpuonly", "bf16gemm"]
    for name in names:
        gop = GOP_PER_BLOCK
        if name in ("dotrate", "dotrate16"):
            dt = jnp.int8 if name == "dotrate" else jnp.bfloat16
            _, gop = make_dotrate(1, dt)
            mk = lambda T, dt=dt: make_dotrate(T, dt)[0]  # noqa: E731
            tag = "raw dot chain"
        else:
            mk = make_full if name == "full" else functools.partial(
                make_stripped, name)
            tag = "incl. border tax"
        t = per_step(lambda T, mk=mk: mk(T))
        rate = gop / t / 1e3  # TOP/s
        print(f"{name:9s}: {t*1e3:7.3f} ms  "
              f"({rate:6.1f} T(FL)OP/s {tag})", flush=True)


if __name__ == "__main__":
    main()
