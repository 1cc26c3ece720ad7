"""Model output contracts.

Two contracts, mirroring the reference's dual model families
(keisei/training/models/base.py:21-23 and katago_base.py:14-43):

* KataGo multi-head: policy_logits (B, 9, 9, 139), value_logits (B, 3)
  W/D/L, score_lead (B, 1).
* Scalar: policy_logits (B, 11259), value (B, 1) in [-1, 1] (tanh).

All models take observations as (B, C, 9, 9) float (the VecEnv contract
shape) and transpose to NHWC internally — the TPU-preferred layout. Params
are float32; compute dtype is configurable (bfloat16 by default), replacing
the reference's AMP machinery (katago_base.py:52-75).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

SPATIAL_MOVE_TYPES = 139
SPATIAL_ACTION_SPACE = 81 * 139  # 11,259
OBS_CHANNELS = 50


@dataclass
class KataGoOutput:
    policy_logits: jax.Array  # (B, 9, 9, 139)
    value_logits: jax.Array  # (B, 3) W/D/L
    score_lead: jax.Array  # (B, 1)


@dataclass
class ScalarOutput:
    policy_logits: jax.Array  # (B, 11259)
    value: jax.Array  # (B, 1), tanh-squashed


jax.tree_util.register_dataclass(
    KataGoOutput, data_fields=["policy_logits", "value_logits", "score_lead"], meta_fields=[]
)
jax.tree_util.register_dataclass(
    ScalarOutput, data_fields=["policy_logits", "value"], meta_fields=[]
)
