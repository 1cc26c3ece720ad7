"""Model registry: architecture name -> (module, params, contract).

Mirrors the reference registry surface (keisei/training/model_registry.py:
24-100): four architectures, all registered at 50 observation channels,
with contract tags 'scalar' (policy + tanh value) and 'katago' (policy +
WDL + score). `build_model` returns (module, params_cfg); parameter
initialization stays with the caller (functional JAX style).
"""

from __future__ import annotations

from dataclasses import fields
from typing import Any

from .scalar import (
    MLPModel,
    MLPParams,
    ResNetModel,
    ResNetParams,
    TransformerModel,
    TransformerParams,
)
from .se_resnet import SEResNetModel, SEResNetParams

# name -> (module_cls, params_cls, contract, obs_channels, uses_batchnorm)
# uses_batchnorm routes bn_axis_name for cross-replica stat syncing — kept
# HERE so registering a new BN architecture is one-stop (forgetting it in
# a build_model name tuple would silently train with unsynced BN stats)
_REGISTRY: dict[str, tuple[Any, Any, str, int, bool]] = {
    "mlp": (MLPModel, MLPParams, "scalar", 50, False),
    "resnet": (ResNetModel, ResNetParams, "scalar", 50, True),
    "transformer": (TransformerModel, TransformerParams, "scalar", 50, False),
    "se_resnet": (SEResNetModel, SEResNetParams, "katago", 50, True),
}

VALID_ARCHITECTURES = frozenset(_REGISTRY)


def get_model_contract(architecture: str) -> str:
    _check(architecture)
    return _REGISTRY[architecture][2]


def get_obs_channels(architecture: str) -> int:
    _check(architecture)
    return _REGISTRY[architecture][3]


def get_params_cls(architecture: str):
    _check(architecture)
    return _REGISTRY[architecture][1]


def validate_model_params(architecture: str, params: dict) -> None:
    """Reject unknown keys; dataclass __post_init__ validates values."""
    _check(architecture)
    params_cls = _REGISTRY[architecture][1]
    valid = {f.name for f in fields(params_cls)}
    unknown = set(params) - valid
    if unknown:
        raise ValueError(
            f"unknown model params for {architecture!r}: {sorted(unknown)} "
            f"(valid: {sorted(valid)})"
        )


def build_model(
    architecture: str, params: dict | None = None, bn_axis_name: str | None = None
):
    """Instantiate (module, params_cfg) for an architecture name.

    bn_axis_name enables cross-replica BatchNorm syncing for the conv
    architectures (ignored by norm-free ones).
    """
    _check(architecture)
    model_cls, params_cls, _, _, uses_bn = _REGISTRY[architecture]
    params = dict(params or {})
    if "hidden_sizes" in params and isinstance(params["hidden_sizes"], list):
        params["hidden_sizes"] = tuple(params["hidden_sizes"])
    validate_model_params(architecture, params)
    cfg = params_cls(**params)
    if uses_bn:
        return model_cls(params_cfg=cfg, bn_axis_name=bn_axis_name), cfg
    return model_cls(params_cfg=cfg), cfg


def _check(architecture: str) -> None:
    if architecture not in _REGISTRY:
        raise ValueError(
            f"unknown architecture {architecture!r}; valid: {sorted(_REGISTRY)}"
        )
