"""SE-ResNet with KataGo-style global-pooling bias (flax.linen, NHWC).

Architecture parity with the reference (keisei/training/models/
se_resnet.py:40-159): per block conv-BN-ReLU -> + broadcast bias from
FC(mean||max||std of the block INPUT) -> conv-BN -> SE scale+shift ->
residual -> ReLU; heads: policy 1x1 convs -> (B, 9, 9, 139); shared global
pool (B, 3C) -> value FC -> 3 WDL logits and score FC -> 1.

TPU-first deltas: NHWC layout throughout (policy head needs no permute),
bfloat16 compute with float32 params and BatchNorm statistics, and
cross-replica BN sync via an optional `bn_axis_name` (the SPMD analogue of
the reference's SyncBatchNorm wrap, katago_loop.py:494-508).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .base import SPATIAL_MOVE_TYPES, KataGoOutput


@dataclass(frozen=True)
class SEResNetParams:
    num_blocks: int = 40
    channels: int = 256
    se_reduction: int = 16
    global_pool_channels: int = 128
    policy_channels: int = 32
    value_fc_size: int = 256
    score_fc_size: int = 128
    obs_channels: int = 50
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        for f in (
            "num_blocks", "channels", "se_reduction", "global_pool_channels",
            "policy_channels", "value_fc_size", "score_fc_size", "obs_channels",
        ):
            if getattr(self, f) < 1:
                raise ValueError(f"{f} must be >= 1, got {getattr(self, f)}")
        if self.channels // self.se_reduction < 1:
            raise ValueError("channels // se_reduction must be >= 1")


def _global_pool(x: jnp.ndarray) -> jnp.ndarray:
    """mean || max || population-std over spatial dims: (B,H,W,C) -> (B,3C)."""
    mean = x.mean(axis=(1, 2))
    amax = x.max(axis=(1, 2))
    var = ((x - mean[:, None, None, :]) ** 2).mean(axis=(1, 2))
    std = jnp.sqrt(var + 1e-10)
    return jnp.concatenate([mean, amax, std], axis=-1)


class GlobalPoolBiasBlock(nn.Module):
    channels: int
    se_reduction: int
    global_pool_channels: int
    dtype: Any = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        ch = self.channels
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name=name,
        )
        residual = x

        out = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))

        # Global-pool bias from the block INPUT (se_resnet.py:73-78)
        g = _global_pool(x)
        g = nn.Dense(self.global_pool_channels, dtype=self.dtype, name="gp_fc1")(g)
        g = nn.Dense(ch, dtype=self.dtype, name="gp_fc2")(nn.relu(g))
        out = out + g[:, None, None, :]

        out = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)

        # SE with scale + shift (se_resnet.py:82-88)
        se = out.mean(axis=(1, 2))
        se = nn.relu(nn.Dense(ch // self.se_reduction, dtype=self.dtype, name="se_fc1")(se))
        se = nn.Dense(2 * ch, dtype=self.dtype, name="se_fc2")(se)
        scale, shift = jnp.split(se, 2, axis=-1)
        out = out * nn.sigmoid(scale)[:, None, None, :] + shift[:, None, None, :]

        return nn.relu(out + residual)


class SEResNetModel(nn.Module):
    params_cfg: SEResNetParams
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, obs, train: bool = False) -> KataGoOutput:
        p = self.params_cfg
        dt = p.dtype
        if (obs.ndim != 4 or obs.shape[1] != p.obs_channels
                or obs.shape[2:] != (9, 9)):
            raise ValueError(
                f"expected obs (B, {p.obs_channels}, 9, 9), got {obs.shape}"
            )
        x = jnp.transpose(obs, (0, 2, 3, 1)).astype(dt)  # NCHW -> NHWC

        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,
            dtype=dt,
            axis_name=self.bn_axis_name if train else None,
            name=name,
        )

        x = nn.Conv(p.channels, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="input_conv")(x)
        x = nn.relu(bn("input_bn")(x))

        for i in range(p.num_blocks):
            x = GlobalPoolBiasBlock(
                p.channels, p.se_reduction, p.global_pool_channels,
                dtype=dt, bn_axis_name=self.bn_axis_name, name=f"block{i}",
            )(x, train)

        # Policy head: NHWC makes the (B, 9, 9, 139) output layout free.
        pol = nn.Conv(p.policy_channels, (1, 1), use_bias=False, dtype=dt, name="policy_conv1")(x)
        pol = nn.relu(bn("policy_bn1")(pol))
        pol = nn.Conv(SPATIAL_MOVE_TYPES, (1, 1), dtype=dt, name="policy_conv2")(pol)

        pool = _global_pool(x)  # (B, 3C)

        v = nn.relu(nn.Dense(p.value_fc_size, dtype=dt, name="value_fc1")(pool))
        v = nn.Dense(3, dtype=jnp.float32, name="value_fc2")(v)

        s = nn.relu(nn.Dense(p.score_fc_size, dtype=dt, name="score_fc1")(pool))
        s = nn.Dense(1, dtype=jnp.float32, name="score_fc2")(s)

        return KataGoOutput(
            policy_logits=pol.astype(jnp.float32),
            value_logits=v,
            score_lead=s,
        )
