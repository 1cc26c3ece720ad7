"""int8 fused SE-ResNet block: band-packed K for the int8 MXU fast path.

Motivation (docs/profiling-round2.md S9): Mosaic int8 GEMMs run at ~877
TOP/s on this chip — 3.15x the bf16 rate — but ONLY when the contraction
dim is deep enough (scripts/profile_int8_kshape.py: K=256 runs at ~356
TOP/s; K>=512 unlocks the fast path; the int8 MXU packs multiple
K-values per cell and K=C=256 starves it).

Layout — padded-flat with BANDS channel bands:

    activations: (145, B, BANDS*C) int8
      rows [12, 133) = the 11x11 zero-padded board flattened row-major
      rows [0, 12) and [133, 145) = zero margin
      channel band b (= slice [b*C, (b+1)*C)) at flat row r = x[r + b]

Every 3x3 conv then needs only ceil(9/BANDS) GEMMs: with BANDS=3, one
CONTIGUOUS 121-row window per kernel row di at offset
12 + 11*(di-1) - 1 covers taps (di, dj=0..2) in one (121*B_t, 3C) @
(3C, C) GEMM — K=768 rides the int8 fast path, and no reshape/patch
copies exist at all. The tax is computing 121/81 = 1.49x positions
(border garbage, masked before the nonlinearities); the int8 rate
absorbs it for a ~2x+ net win over the bf16 floor.

Band/wrap-around soundness: output position p accumulates
x[p + 11*(di-1) + (dj-1)] exactly as the direct conv — band b at window
row p+offset reads x[p + offset + b] and offset = 11*(di-1) - 1, b = dj.
A shift that crosses a board-row boundary in flat space lands on a zero
border/margin cell, contributing only to border output positions that
the interior mask kills.

Quantization: weights per-output-channel symmetric int8 (precomputed,
models/fused_infer.py); activations dynamically per batch-tile — each
invocation dequantizes with the incoming tile scale, computes the block
in f32, and emits the next block's int8 input plus its scale. No
calibration pass needed.

Inference-path only; opt-in (the bf16 path stays the default trainer
rollout until an A/B training run validates int8 self-play end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantized_gpbias_block", "pack_quantized", "unpack_dequantized",
           "quantize_conv_weights", "BANDS"]

BANDS = 3
# one window per kernel row di; flat-space offset 11*(di-1) + (0-1)
_ROW_OFFSETS = tuple(11 * (di - 1) - 1 for di in range(3))


def _interior_mask() -> jax.Array:
    """(121, 1, 1) f32: 1 on the 9x9 interior of the 11x11 board."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (121, 1, 1), 0)
    r, c = pos // 11, pos % 11
    inside = (r >= 1) & (r <= 9) & (c >= 1) & (c <= 9)
    return inside.astype(jnp.float32)


def _qconv_rows(buf_ref, wq_ref, bt: int, ch: int) -> jax.Array:
    """3 contiguous-window int8 row GEMMs (K=3C) -> (121*bt, ch) i32."""
    acc = None
    for d, off in enumerate(_ROW_OFFSETS):
        win = buf_ref[12 + off: 133 + off].reshape(121 * bt, BANDS * ch)
        dot = jax.lax.dot_general(
            win, wq_ref[d], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = dot if acc is None else acc + dot
    return acc


def _quantize_tile(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(121, bt, ch) f32 (masked) -> int8 values and the f32 scale used."""
    amax = jnp.max(jnp.abs(v))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _store_banded(ref, yq: jax.Array, ch: int) -> None:
    """Write (121, bt, ch) int8 into a (145, bt, BANDS*ch) banded buffer.

    Band b at flat row r holds yq[r + b - 12]: store slice
    ref[12-b : 133-b, :, b*ch:(b+1)*ch] = yq. Margins (rows [0,12) and
    [131,145)) are deliberately left UNWRITTEN (garbage): every margin
    row only ever contributes to border output positions of the next
    conv (window row w at offset o feeds output w-o, which for all
    margin rows lies outside the 9x9 interior), and the interior mask
    kills those before the pool, the quantizer amax, and the residual.
    Skipping the zero stores saves ~1.3 MB of VPU writes per tile.
    """
    for b in range(BANDS):
        ref[12 - b: 133 - b, :, b * ch: (b + 1) * ch] = yq


def _qblock_kernel(
    x_ref,        # (145,bt,3C) int8 banded padded-flat
    sx_ref,       # (G,1) f32 per-tile input scales        [SMEM, full]
    wq1_ref,      # (3,3C,C) int8 row-packed
    wq2_ref,      # (3,3C,C) int8
    bn_ref,       # (4,C) f32: m1=s1*ws1, b1, m2=s2*ws2, b2 (weight scales
                  #   folded into the BN affine by the host caller)
    gp1w_ref,     # (3C,gpc) bf16
    gp1b_ref,     # (1,gpc) f32
    gp2w_ref,     # (gpc,C) bf16
    gp2b_ref,     # (1,C) f32
    se1w_ref,     # (C,se) bf16
    se1b_ref,     # (1,se) f32
    se2w_ref,     # (se,2C) bf16
    se2b_ref,     # (1,2C) f32
    o_ref,        # (145,bt,3C) int8 banded out
    sy_ref,       # (G,1) f32 out tile scales              [SMEM, full]
    hbuf_ref,     # scratch (145,bt,3C) int8
):
    bt = x_ref.shape[1]
    ch = x_ref.shape[2] // BANDS
    f32, bf16 = jnp.float32, jnp.bfloat16
    mask = _interior_mask()
    i = pl.program_id(0)
    sx = sx_ref[i, 0]

    # global-pool bias from the (dequantized) block input, interior only.
    # Issued BEFORE conv1 so this VPU work has no dependency on the MXU
    # dots and the scheduler is free to overlap them.
    xf = x_ref[12:133, :, 0:ch].astype(f32) * sx      # (121,bt,C) band 0
    xm = xf * mask
    mean = xm.sum(axis=0) / 81.0                      # (bt,C)
    amax = jnp.max(xm, axis=0)                        # x >= 0 post-relu
    var = (jnp.square(xf - mean[None]) * mask).sum(axis=0) / 81.0
    pool = jnp.concatenate([mean, amax, jnp.sqrt(var + 1e-10)], axis=-1)
    g = jnp.maximum(jax.lax.dot_general(
        pool.astype(bf16), gp1w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + gp1b_ref[...], 0.0)
    g2 = jax.lax.dot_general(
        g.astype(bf16), gp2w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + gp2b_ref[...]   # (bt,C)

    # conv1 (int8, K=3C) -> folded dequant+bn affine -> relu
    acc1 = _qconv_rows(x_ref, wq1_ref, bt, ch).reshape(121, bt, ch)
    h = acc1.astype(f32) * (sx * bn_ref[0:1])[None] + bn_ref[1:2][None]
    h = (jnp.maximum(h, 0.0) + g2[None]) * mask

    # requantize h -> banded scratch -> conv2 (int8) -> dequant+bn
    hq, sh = _quantize_tile(h)
    _store_banded(hbuf_ref, hq, ch)
    acc2 = _qconv_rows(hbuf_ref, wq2_ref, bt, ch).reshape(121, bt, ch)
    z = acc2.astype(f32) * (sh * bn_ref[2:3])[None] + bn_ref[3:4][None]

    # SE scale+shift from the masked spatial mean of z
    zmean = (z * mask).sum(axis=0) / 81.0
    se = jnp.maximum(jax.lax.dot_general(
        zmean.astype(bf16), se1w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + se1b_ref[...], 0.0)
    se2 = jax.lax.dot_general(
        se.astype(bf16), se2w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32) + se2b_ref[...]
    scale = jax.nn.sigmoid(se2[:, :ch])
    shift = se2[:, ch:]

    y = jnp.maximum(z * scale[None] + shift[None] + xf, 0.0) * mask
    yq, sy = _quantize_tile(y)
    _store_banded(o_ref, yq, ch)
    sy_ref[i, 0] = sy


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def quantized_gpbias_block(
    xbuf: jax.Array,
    sx: jax.Array,
    wq1: jax.Array,
    wq2: jax.Array,
    bn_affine: jax.Array,
    gp1_w: jax.Array,
    gp1_b: jax.Array,
    gp2_w: jax.Array,
    gp2_b: jax.Array,
    se1_w: jax.Array,
    se1_b: jax.Array,
    se2_w: jax.Array,
    se2_b: jax.Array,
    *,
    batch_tile: int = 32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """int8 GlobalPoolBias block in banded padded-flat layout.

    xbuf (145, B, BANDS*C) int8, sx (B/batch_tile, 1) f32 per-tile input
    scales. bn_affine rows are (m1, b1, m2, b2) with the per-out-channel
    conv weight scales PRE-FOLDED into the multipliers (m = bn_scale *
    weight_scale — see models/fused_infer.py). Returns (ybuf (145, B,
    BANDS*C) int8, sy (B/bt, 1) f32). batch_tile should be a multiple of
    32 (int8 sublane tile).
    """
    _, n, chb = xbuf.shape
    ch = chb // BANDS
    if n % batch_tile:
        raise ValueError(f"B={n} not divisible by batch_tile={batch_tile}")
    bt = batch_tile
    gpc = gp1_w.shape[1]
    sec = se1_w.shape[1]
    f32, bf16, i8 = jnp.float32, jnp.bfloat16, jnp.int8
    const = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    vec = lambda a: a.reshape(1, -1).astype(f32)  # noqa: E731
    ybuf, sy = pl.pallas_call(
        _qblock_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((145, n, chb), i8),
            jax.ShapeDtypeStruct((n // bt, 1), f32),
        ),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((145, bt, chb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (G,1) scales
            pl.BlockSpec((3, BANDS * ch, ch), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BANDS * ch, ch), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * ch, gpc), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpc), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((gpc, ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, sec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sec), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((sec, 2 * ch), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((145, bt, chb), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (G,1) scales
        ),
        scratch_shapes=[pltpu.VMEM((145, bt, chb), i8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * 121 * n * ch * ch,
            bytes_accessed=2 * 145 * n * chb + 2 * 3 * BANDS * ch * ch,
            transcendentals=n * ch,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xbuf, sx.astype(f32),
        wq1, wq2, bn_affine.astype(f32),
        gp1_w.astype(bf16), vec(gp1_b), gp2_w.astype(bf16), vec(gp2_b),
        se1_w.astype(bf16), vec(se1_b), se2_w.astype(bf16), vec(se2_b),
    )
    return ybuf, sy


# ------------------------------------------------------------- host helpers


def quantize_conv_weights(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(3,3,Cin,Cout) f32 -> ((3,3*Cin,Cout) int8 row-packed, (Cout,) f32).

    Per-output-channel symmetric; row d holds [W(d,0); W(d,1); W(d,2)]
    stacked along K so band b of the activation layout (= x shifted by b)
    meets tap dj=b — matching _ROW_OFFSETS.
    """
    w = w.astype(jnp.float32)
    ws = jnp.maximum(jnp.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    cin, cout = w.shape[2], w.shape[3]
    return wq.reshape(3, 3 * cin, cout), ws


def pack_quantized(
    x: jax.Array, batch_tile: int
) -> tuple[jax.Array, jax.Array]:
    """(9,9,B,C) float -> ((145,B,3C) int8 banded, (B/bt,1) f32 scales)."""
    _, _, n, ch = x.shape
    g = n // batch_tile
    xf = x.astype(jnp.float32)
    amax = jnp.abs(xf).reshape(81, g, batch_tile, ch).max(axis=(0, 2, 3))
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)                    # (G,)
    per_b = jnp.repeat(sx, batch_tile)                             # (B,)
    xq = jnp.clip(jnp.round(xf / per_b[None, None, :, None]),
                  -127, 127).astype(jnp.int8)
    flat = jnp.pad(xq, ((1, 1), (1, 1), (0, 0), (0, 0))).reshape(121, n, ch)
    base = jnp.pad(flat, ((12, 12), (0, 0), (0, 0)))               # (145,n,ch)
    bands = [base] + [
        jnp.concatenate([base[b:], jnp.zeros((b, n, ch), jnp.int8)], axis=0)
        for b in range(1, BANDS)
    ]
    return jnp.concatenate(bands, axis=-1), sx.reshape(g, 1)


def unpack_dequantized(
    buf: jax.Array, sy: jax.Array, batch_tile: int
) -> jax.Array:
    """((145,B,3C) int8 banded, (B/bt,1) f32) -> (9,9,B,C) f32 (band 0)."""
    _, n, chb = buf.shape
    ch = chb // BANDS
    center = buf[12:133, :, 0:ch].reshape(11, 11, n, ch)[1:10, 1:10]
    per_b = jnp.repeat(sy[:, 0], batch_tile)
    return center.astype(jnp.float32) * per_b[None, None, :, None]
