"""Fused SE-ResNet GlobalPoolBias block (eval mode) as one Pallas kernel.

One kernel invocation per batch tile computes the reference block
(keisei/training/models/se_resnet.py:40-90; our flax twin
models/se_resnet.py GlobalPoolBiasBlock) entirely in VMEM:

    h   = relu(conv1(x) * s1 + b1) + gp_bias(pool3(x))
    z   = conv2(h) * s2 + b2
    y   = relu(z * sigmoid(se_scale(z)) + se_shift(z) + x)

where (s, b) are the eval-mode BatchNorm affines folded outside the
kernel. Fusing removes every inter-op HBM round-trip XLA makes between
conv1/bn/relu/pool-bias/conv2/bn/SE/residual: HBM traffic per block drops
from ~5 activation passes to exactly 2 (read x, write y), and both convs
run as in-VMEM tap GEMMs (see ops/conv3x3.py for the rate rationale).

Layout contract: activations (9, 9, B, C) - spatial major, so tap slicing
and all reshapes below are free slab concatenations when B_tile is a
multiple of the 16-row bf16 sublane tile.

Inference-path only (no custom VJP): training keeps the XLA/flax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_gpbias_block"]


def _conv_taps(xp_ref, w_ref, bt: int, cin: int, cout: int) -> jax.Array:
    """9 tap GEMMs from an (11,11,bt,cin) padded ref -> (81*bt, cout) f32."""
    acc = jnp.zeros((81 * bt, cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            pf = xp_ref[di:di + 9, dj:dj + 9].reshape(81 * bt, cin)
            acc = acc + jax.lax.dot_general(
                pf, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _zero_borders(xp_ref) -> None:
    xp_ref[0] = jnp.zeros_like(xp_ref[0])
    xp_ref[10] = jnp.zeros_like(xp_ref[10])
    xp_ref[1:10, 0] = jnp.zeros_like(xp_ref[1:10, 0])
    xp_ref[1:10, 10] = jnp.zeros_like(xp_ref[1:10, 10])


def _block_kernel(
    x_ref,        # (9,9,bt,C) bf16
    w1_ref,       # (3,3,C,C) bf16
    w2_ref,       # (3,3,C,C) bf16
    bn_ref,       # (4,C) f32: s1,b1,s2,b2
    gp1w_ref,     # (3C,gpc) bf16
    gp1b_ref,     # (1,gpc) f32
    gp2w_ref,     # (gpc,C) bf16
    gp2b_ref,     # (1,C) f32
    se1w_ref,     # (C,se) bf16
    se1b_ref,     # (1,se) f32
    se2w_ref,     # (se,2C) bf16
    se2b_ref,     # (1,2C) f32
    o_ref,        # (9,9,bt,C) bf16
    xp1_ref,      # scratch (11,11,bt,C) bf16
    xp2_ref,      # scratch (11,11,bt,C) bf16
):
    bt, ch = x_ref.shape[2], x_ref.shape[3]

    @pl.when(pl.program_id(0) == 0)
    def _():
        _zero_borders(xp1_ref)
        _zero_borders(xp2_ref)

    x = x_ref[...]                                   # (9,9,bt,C) bf16
    xp1_ref[1:10, 1:10] = x

    # conv1 + bn1 affine + relu
    acc1 = _conv_taps(xp1_ref, w1_ref, bt, ch, ch)   # (81bt,C) f32
    s1 = bn_ref[0:1]                                 # (1,C)
    b1 = bn_ref[1:2]
    h = jnp.maximum(acc1 * s1 + b1, 0.0).reshape(81, bt, ch)

    # global-pool bias from the block INPUT: mean || max || std
    xf = x.reshape(81, bt, ch).astype(jnp.float32)
    mean = xf.mean(axis=0)                           # (bt,C)
    amax = xf.max(axis=0)
    var = jnp.square(xf - mean[None]).mean(axis=0)
    std = jnp.sqrt(var + 1e-10)
    pool = jnp.concatenate([mean, amax, std], axis=-1)  # (bt,3C)
    g = jnp.maximum(jax.lax.dot_general(
        pool.astype(jnp.bfloat16), gp1w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + gp1b_ref[...], 0.0)
    g2 = jax.lax.dot_general(
        g.astype(jnp.bfloat16), gp2w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + gp2b_ref[...]  # (bt,C)
    h = h + g2[None]

    # conv2 + bn2 affine
    xp2_ref[1:10, 1:10] = h.reshape(9, 9, bt, ch).astype(jnp.bfloat16)
    acc2 = _conv_taps(xp2_ref, w2_ref, bt, ch, ch)
    z = (acc2 * bn_ref[2:3] + bn_ref[3:4]).reshape(81, bt, ch)

    # SE scale + shift from spatial mean of z
    zmean = z.mean(axis=0)                           # (bt,C) f32
    se = jnp.maximum(jax.lax.dot_general(
        zmean.astype(jnp.bfloat16), se1w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + se1b_ref[...], 0.0)
    se2 = jax.lax.dot_general(
        se.astype(jnp.bfloat16), se2w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + se2b_ref[...]  # (bt,2C)
    scale = jax.nn.sigmoid(se2[:, :ch])
    shift = se2[:, ch:]

    y = z * scale[None] + shift[None] + x.reshape(81, bt, ch).astype(jnp.float32)
    o_ref[...] = jnp.maximum(y, 0.0).reshape(9, 9, bt, ch).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def fused_gpbias_block(
    x: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
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
    batch_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Eval-mode GlobalPoolBias block; x (9, 9, B, C) bf16 -> same shape.

    bn_affine is (4, C) f32 rows [s1, b1, s2, b2] with s = scale/sqrt(var+eps),
    b = bias - mean*s (flax BatchNorm eval fold, eps=1e-5).
    """
    _, _, n, ch = x.shape
    if n % batch_tile:
        raise ValueError(f"B={n} not divisible by batch_tile={batch_tile}")
    bt = batch_tile
    gpc = gp1_w.shape[1]
    sec = se1_w.shape[1]
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    const = lambda i: (0, 0)  # noqa: E731
    vec = lambda a: a.reshape(1, -1).astype(f32)  # noqa: E731
    return pl.pallas_call(
        _block_kernel,
        out_shape=jax.ShapeDtypeStruct((9, 9, n, ch), bf16),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((9, 9, bt, ch), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch, ch), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ch, ch), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
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
        out_specs=pl.BlockSpec((9, 9, bt, ch), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((11, 11, bt, ch), bf16),
            pltpu.VMEM((11, 11, bt, ch), bf16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 9 * 81 * n * ch * ch,
            bytes_accessed=2 * 2 * 81 * n * ch + 4 * 9 * ch * ch,
            transcendentals=n * ch,  # sigmoid + sqrt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x.astype(bf16), w1.astype(bf16), w2.astype(bf16),
        bn_affine.astype(f32),
        gp1_w.astype(bf16), vec(gp1_b), gp2_w.astype(bf16), vec(gp2_b),
        se1_w.astype(bf16), vec(se1_b), se2_w.astype(bf16), vec(se2_b),
    )
