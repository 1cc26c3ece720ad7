"""Fused Pallas inference forward for the SE-ResNet flagship (eval mode).

`make_fused_forward(cfg)` returns `fwd(variables, obs) -> KataGoOutput`
numerically equivalent (bf16 tolerance) to `model.apply(variables, obs,
train=False)` but with the trunk running as one fused Pallas kernel per
block (ops/fused_block.py) in the (9, 9, B, C) spatial-major layout:

- BatchNorm eval affines are folded outside the kernels (s = scale /
  sqrt(var + eps), b = bias - mean*s) and hoisted out of rollout scans
  since they depend only on the (loop-invariant) variables;
- the input conv uses the standalone Pallas conv (ops/conv3x3.py);
- heads are tiny (<0.3% of FLOPs, BASELINE.md residual-share row) and run
  as plain einsums/denses in the same layout, transposing only the final
  (B, 9, 9, 139) policy tensor.

This is the rollout/inference path; training keeps the flax/XLA forward
(autodiff + BatchNorm batch statistics need the unfused graph).

Reference scope: accelerates the reference's compiled eval forward
(keisei/training/katago_ppo.py:433-459 dual-compile, se_resnet.py:104-159).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops.conv3x3 import conv3x3_hwbc, pick_batch_tile
from ..ops.fused_block import fused_gpbias_block
from .base import KataGoOutput
from .se_resnet import SEResNetParams

_BN_EPS = 1e-5  # flax.linen.BatchNorm default, matching models/se_resnet.py


def _bn_affine(bn_params: Any, bn_stats: Any) -> tuple[jax.Array, jax.Array]:
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    return s, bn_params["bias"] - bn_stats["mean"] * s


def make_fused_forward(
    cfg: SEResNetParams,
    *,
    batch_tile: int | None = None,
    interpret: bool = False,
) -> Callable[[Any, jax.Array], KataGoOutput]:
    """Build the fused eval forward for a se_resnet config.

    batch_tile defaults to pick_batch_tile(B) at call time (multiples of 16
    keep bf16 sublane tiles aligned). interpret=True runs the Pallas kernels
    interpreted (CPU tests).
    """

    def fwd(variables: Any, obs: jax.Array) -> KataGoOutput:
        n = obs.shape[0]
        bt = batch_tile or pick_batch_tile(n)
        p = variables["params"]
        bs = variables["batch_stats"]
        bf16 = jnp.bfloat16
        x = _trunk_input(cfg, p, bs, obs, bt, interpret).astype(bf16)

        for i in range(cfg.num_blocks):
            blk = p[f"block{i}"]
            stats = bs[f"block{i}"]
            s1, b1 = _bn_affine(blk["bn1"], stats["bn1"])
            s2, b2 = _bn_affine(blk["bn2"], stats["bn2"])
            x = fused_gpbias_block(
                x, blk["conv1"]["kernel"], blk["conv2"]["kernel"],
                jnp.stack([s1, b1, s2, b2]),
                blk["gp_fc1"]["kernel"], blk["gp_fc1"]["bias"],
                blk["gp_fc2"]["kernel"], blk["gp_fc2"]["bias"],
                blk["se_fc1"]["kernel"], blk["se_fc1"]["bias"],
                blk["se_fc2"]["kernel"], blk["se_fc2"]["bias"],
                batch_tile=bt, interpret=interpret,
            )

        return _apply_heads(p, bs, x)

    return fwd


def _trunk_input(cfg: SEResNetParams, p: Any, bs: Any, obs: jax.Array,
                 batch_tile: int, interpret: bool) -> jax.Array:
    """Shared bf16/int8 prologue: validate obs, transpose to spatial-major,
    input conv (Pallas), folded input-BN affine + relu -> (9,9,B,C) f32."""
    if (obs.ndim != 4 or obs.shape[1] != cfg.obs_channels
            or obs.shape[2:] != (9, 9)):
        raise ValueError(
            f"expected obs (B, {cfg.obs_channels}, 9, 9), got {obs.shape}")
    f32 = jnp.float32
    x = jnp.transpose(obs, (2, 3, 0, 1)).astype(jnp.bfloat16)
    x = conv3x3_hwbc(x, p["input_conv"]["kernel"],
                     batch_tile=batch_tile, interpret=interpret)
    s, b = _bn_affine(p["input_bn"], bs["input_bn"])
    return jnp.maximum(x.astype(f32) * s + b, 0.0)


def _apply_heads(p: Any, bs: Any, x: jax.Array) -> KataGoOutput:
    """Policy/value/score heads on a (9, 9, B, C) bf16 trunk output."""
    bf16, f32 = jnp.bfloat16, jnp.float32

    # --- policy head: 1x1 convs are pointwise denses in any layout ---
    pol = jnp.einsum("hwbc,co->hwbo", x,
                     p["policy_conv1"]["kernel"][0, 0].astype(bf16))
    s, b = _bn_affine(p["policy_bn1"], bs["policy_bn1"])
    pol = jnp.maximum(pol.astype(f32) * s + b, 0.0).astype(bf16)
    pol = jnp.einsum("hwbo,ok->hwbk", pol,
                     p["policy_conv2"]["kernel"][0, 0].astype(bf16))
    pol = pol.astype(f32) + p["policy_conv2"]["bias"]
    policy = jnp.transpose(pol, (2, 0, 1, 3))          # (B,9,9,139)

    # --- shared global pool -> value / score heads ---
    xf = x.astype(f32)
    mean = xf.mean(axis=(0, 1))
    amax = xf.max(axis=(0, 1))
    var = jnp.square(xf - mean[None, None]).mean(axis=(0, 1))
    pool = jnp.concatenate(
        [mean, amax, jnp.sqrt(var + 1e-10)], axis=-1).astype(bf16)

    def dense(z, name, dtype):
        k = p[name]["kernel"].astype(dtype)
        return z.astype(dtype) @ k + p[name]["bias"].astype(dtype)

    v = jnp.maximum(dense(pool, "value_fc1", bf16), 0)
    value = dense(v, "value_fc2", f32)
    sc = jnp.maximum(dense(pool, "score_fc1", bf16), 0)
    score = dense(sc, "score_fc2", f32)

    return KataGoOutput(
        policy_logits=policy, value_logits=value, score_lead=score)


def make_quantized_forward(
    cfg: SEResNetParams,
    *,
    batch_tile: int = 32,
    interpret: bool = False,
) -> Callable[[Any, jax.Array], KataGoOutput]:
    """int8 trunk inference: dynamic per-tile activation quantization +
    per-output-channel int8 weights on the int8 MXU path (ops/qblock.py).

    Measured AT PARITY with the bf16 flax forward on the attached chip —
    docs/profiling-round3.md has the full decomposition of why (the int8
    MXU runs narrow-N conv dots at the bf16-equivalent rate). Kept as an
    opt-in path: it is the correct starting point if a future toolchain
    reaches full int8 rate. The input conv and all heads stay bf16;
    weight quantization is computed from the (loop-invariant) variables,
    so XLA hoists it out of rollout scans.
    """

    def fwd(variables: Any, obs: jax.Array) -> KataGoOutput:
        from ..ops.qblock import (
            pack_quantized,
            quantize_conv_weights,
            quantized_gpbias_block,
            unpack_dequantized,
        )

        n = obs.shape[0]
        if batch_tile % 32 == 0 and n % batch_tile == 0:
            bt = batch_tile
        else:
            # largest divisor of n that is a multiple of 32 (the int8
            # kernel's (32, 128) sublane tiling requires it); fail with a
            # clear message instead of a Mosaic lowering error deep in
            # the first rollout
            bt = max(
                (d for d in range(32, min(n, 256) + 1, 32) if n % d == 0),
                default=0,
            )
            if bt == 0:
                raise ValueError(
                    f"rollout_forward='int8' needs a batch size divisible "
                    f"by 32 (got {n})")
        p = variables["params"]
        bs = variables["batch_stats"]

        x = _trunk_input(cfg, p, bs, obs, pick_batch_tile(n), interpret)
        buf, sx = pack_quantized(x, bt)
        for i in range(cfg.num_blocks):
            blk = p[f"block{i}"]
            stats = bs[f"block{i}"]
            s1, b1 = _bn_affine(blk["bn1"], stats["bn1"])
            s2, b2 = _bn_affine(blk["bn2"], stats["bn2"])
            wq1, ws1 = quantize_conv_weights(blk["conv1"]["kernel"])
            wq2, ws2 = quantize_conv_weights(blk["conv2"]["kernel"])
            buf, sx = quantized_gpbias_block(
                buf, sx, wq1, wq2,
                # weight scales folded into the BN multipliers (kernel
                # dequantizes acc * (tile_scale * m) + b in one pass)
                jnp.stack([s1 * ws1, b1, s2 * ws2, b2]),
                blk["gp_fc1"]["kernel"], blk["gp_fc1"]["bias"],
                blk["gp_fc2"]["kernel"], blk["gp_fc2"]["bias"],
                blk["se_fc1"]["kernel"], blk["se_fc1"]["bias"],
                blk["se_fc2"]["kernel"], blk["se_fc2"]["bias"],
                batch_tile=bt, interpret=interpret,
            )
        x = unpack_dequantized(buf, sx, bt).astype(jnp.bfloat16)
        return _apply_heads(p, bs, x)

    return fwd
