"""Scalar-value baseline architectures: MLP, ResNet, Transformer.

Capability parity with the reference's scalar family (keisei/training/
models/{mlp,resnet,transformer}.py): policy_logits (B, 11259) + tanh value
(B, 1), 50 input channels (the reference registers all architectures at 50
channels — model_registry.py:24-29). Implemented in flax.linen with NHWC
internals and configurable compute dtype.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .base import SPATIAL_ACTION_SPACE, ScalarOutput


def _check_obs(obs, obs_channels):
    if obs.ndim != 4 or obs.shape[1] != obs_channels or obs.shape[2:] != (9, 9):
        raise ValueError(f"expected obs (B, {obs_channels}, 9, 9), got {obs.shape}")


@dataclass(frozen=True)
class MLPParams:
    hidden_sizes: tuple[int, ...] = (1024, 512)
    obs_channels: int = 50
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if any(s <= 0 for s in self.hidden_sizes):
            raise ValueError(f"all hidden_sizes must be > 0, got {self.hidden_sizes}")


class MLPModel(nn.Module):
    params_cfg: MLPParams

    @nn.compact
    def __call__(self, obs, train: bool = False) -> ScalarOutput:
        p = self.params_cfg
        _check_obs(obs, p.obs_channels)
        x = obs.reshape(obs.shape[0], -1).astype(p.dtype)
        for i, size in enumerate(p.hidden_sizes):
            x = nn.Dense(size, dtype=p.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=p.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        policy = nn.Dense(SPATIAL_ACTION_SPACE, dtype=jnp.float32, name="policy_fc")(x)
        value = jnp.tanh(nn.Dense(1, dtype=jnp.float32, name="value_fc")(x))
        return ScalarOutput(policy_logits=policy, value=value)


@dataclass(frozen=True)
class ResNetParams:
    hidden_size: int = 128
    num_layers: int = 6
    obs_channels: int = 50
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.hidden_size <= 0:
            raise ValueError(f"hidden_size must be > 0, got {self.hidden_size}")
        if self.num_layers < 0:
            raise ValueError(f"num_layers must be >= 0, got {self.num_layers}")


class ResNetModel(nn.Module):
    """Plain residual tower, 2-channel policy conv + FC, 1-channel value head."""

    params_cfg: ResNetParams
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, obs, train: bool = False) -> ScalarOutput:
        p = self.params_cfg
        _check_obs(obs, p.obs_channels)
        dt = p.dtype
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, dtype=dt,
            axis_name=self.bn_axis_name if train else None, name=name,
        )
        x = jnp.transpose(obs, (0, 2, 3, 1)).astype(dt)
        x = nn.Conv(p.hidden_size, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="input_conv")(x)
        x = nn.relu(bn("input_bn")(x))
        for i in range(p.num_layers):
            r = x
            x = nn.Conv(p.hidden_size, (3, 3), padding="SAME", use_bias=False, dtype=dt, name=f"conv{i}a")(x)
            x = nn.relu(bn(f"bn{i}a")(x))
            x = nn.Conv(p.hidden_size, (3, 3), padding="SAME", use_bias=False, dtype=dt, name=f"conv{i}b")(x)
            x = bn(f"bn{i}b")(x)
            x = nn.relu(x + r)
        pol = nn.Conv(2, (1, 1), use_bias=False, dtype=dt, name="policy_conv")(x)
        pol = nn.relu(bn("policy_bn")(pol))
        policy = nn.Dense(SPATIAL_ACTION_SPACE, dtype=jnp.float32, name="policy_fc")(
            pol.reshape(pol.shape[0], -1)
        )
        v = nn.Conv(1, (1, 1), use_bias=False, dtype=dt, name="value_conv")(x)
        v = nn.relu(bn("value_bn")(v))
        v = nn.relu(nn.Dense(p.hidden_size, dtype=dt, name="value_fc1")(v.reshape(v.shape[0], -1)))
        value = jnp.tanh(nn.Dense(1, dtype=jnp.float32, name="value_fc2")(v))
        return ScalarOutput(policy_logits=policy, value=value)


@dataclass(frozen=True)
class TransformerParams:
    d_model: int = 128
    nhead: int = 4
    num_layers: int = 4
    obs_channels: int = 50
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.d_model <= 0 or self.nhead <= 0 or self.num_layers <= 0:
            raise ValueError("d_model, nhead, num_layers must be > 0")
        if self.d_model % self.nhead != 0:
            raise ValueError(
                f"d_model ({self.d_model}) must be divisible by nhead ({self.nhead})"
            )


class TransformerModel(nn.Module):
    """Pre-norm transformer over 81 square tokens with learned 2D row/col
    position embeddings; mean-pooled value head."""

    params_cfg: TransformerParams

    @nn.compact
    def __call__(self, obs, train: bool = False) -> ScalarOutput:
        p = self.params_cfg
        _check_obs(obs, p.obs_channels)
        dt = p.dtype
        B = obs.shape[0]
        x = jnp.transpose(obs, (0, 2, 3, 1)).reshape(B, 81, p.obs_channels).astype(dt)
        x = nn.Dense(p.d_model, dtype=dt, name="input_proj")(x)

        row = self.param("row_embed", nn.initializers.normal(0.02), (9, p.d_model))
        col = self.param("col_embed", nn.initializers.normal(0.02), (9, p.d_model))
        pos = (row[:, None, :] + col[None, :, :]).reshape(81, p.d_model)
        x = x + pos[None].astype(dt)

        for i in range(p.num_layers):
            # pre-norm self-attention block
            h = nn.LayerNorm(dtype=dt, name=f"ln_attn{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=p.nhead, dtype=dt, name=f"attn{i}"
            )(h, h)
            x = x + h
            h = nn.LayerNorm(dtype=dt, name=f"ln_mlp{i}")(x)
            h = nn.Dense(4 * p.d_model, dtype=dt, name=f"mlp{i}a")(h)
            h = nn.Dense(p.d_model, dtype=dt, name=f"mlp{i}b")(nn.relu(h))
            x = x + h

        policy = nn.Dense(SPATIAL_ACTION_SPACE, dtype=jnp.float32, name="policy_fc")(
            x.reshape(B, -1)
        )
        pooled = x.mean(axis=1)
        v = nn.relu(nn.Dense(p.d_model, dtype=dt, name="value_fc1")(pooled))
        value = jnp.tanh(nn.Dense(1, dtype=jnp.float32, name="value_fc2")(v))
        return ScalarOutput(policy_logits=policy, value=value)
