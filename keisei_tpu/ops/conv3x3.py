"""Pallas 3x3 SAME convolution for the SE-ResNet trunk (TPU MXU kernel).

Why this exists: XLA's implicit-GEMM conv sustains ~133-176 TFLOP/s on the
attached chip, while chained in-VMEM GEMMs through Mosaic sustain ~278
TFLOP/s (scripts/profile_int8_mxu.py) - the lowering leaves a large
fraction of the MXU idle between taps. This kernel keeps a batch tile
resident in VMEM: zero-padded scratch, nine tap GEMMs (81*B_t, Cin)@(Cin,
Cout) accumulated in f32, one bf16 store.

Layout contract: activations are (9, 9, B, C) - spatial dims MAJOR so tap
slicing never relayouts the tiled minor dims; the whole trunk runs in this
layout (BatchNorm/SE/heads are layout-agnostic), so no transposes appear
between convs (models/se_resnet.py).

Inference-path only: no custom VJP is defined; the training step keeps the
XLA conv (autodiff + known-good). Reference scope: this replaces the conv
work inside the reference's torch.compile'd SE-ResNet forward
(keisei/training/models/se_resnet.py:40-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_hwbc", "pick_batch_tile"]


def _conv_kernel(x_ref, w_ref, o_ref, xp_ref):
    """x (9,9,bt,cin) bf16, w (3,3,cin,cout) bf16 -> o (9,9,bt,cout) bf16."""
    bt, cin = x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[3]

    @pl.when(pl.program_id(0) == 0)
    def _():
        # zero only the border once: the scratch persists across grid
        # steps and every iteration overwrites the full interior (zeroing
        # the whole (11,11) pad each step wasted ~2/3 of the stores)
        xp_ref[0:1] = jnp.zeros_like(xp_ref[0:1])
        xp_ref[10:11] = jnp.zeros_like(xp_ref[10:11])
        xp_ref[1:10, 0:1] = jnp.zeros_like(xp_ref[1:10, 0:1])
        xp_ref[1:10, 10:11] = jnp.zeros_like(xp_ref[1:10, 10:11])

    xp_ref[1:10, 1:10] = x_ref[...]
    acc = jnp.zeros((81 * bt, cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = xp_ref[di:di + 9, dj:dj + 9]          # (9,9,bt,cin)
            pf = patch.reshape(81 * bt, cin)
            acc = acc + jax.lax.dot_general(
                pf, w_ref[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(9, 9, bt, cout).astype(o_ref.dtype)


def pick_batch_tile(n: int, preferred: int = 16) -> int:
    """Largest divisor of n that is <= preferred (pallas grid needs n % bt == 0)."""
    bt = min(preferred, n)
    while n % bt:
        bt -= 1
    return bt


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def conv3x3_hwbc(
    x: jax.Array,
    w: jax.Array,
    *,
    batch_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """SAME 3x3 conv; x (9, 9, B, Cin) bf16, w (3, 3, Cin, Cout) -> bf16.

    B must be divisible by batch_tile (use pick_batch_tile). On non-TPU
    backends pass interpret=True (tests) - the kernel runs interpreted.
    """
    if x.ndim != 4 or x.shape[:2] != (9, 9):
        raise ValueError(f"expected (9, 9, B, Cin), got {x.shape}")
    if w.ndim != 4 or w.shape[:2] != (3, 3) or w.shape[2] != x.shape[3]:
        raise ValueError(f"kernel/activation mismatch: {w.shape} vs {x.shape}")
    _, _, n, cin = x.shape
    cout = w.shape[3]
    if n % batch_tile:
        raise ValueError(f"B={n} not divisible by batch_tile={batch_tile}")
    bt = batch_tile
    return pl.pallas_call(
        _conv_kernel,
        out_shape=jax.ShapeDtypeStruct((9, 9, n, cout), jnp.bfloat16),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((9, 9, bt, cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, 9, bt, cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((11, 11, bt, cin), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * 81 * n * cin * cout,
            bytes_accessed=2 * 81 * n * (cin + cout) + 2 * 9 * cin * cout,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # default scoped cap is 16 MiB; v5e has far more physical VMEM
            # and bigger batch tiles amortize the per-tap patch copies
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
