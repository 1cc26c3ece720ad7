"""Value-head adapters: keep the training loop model-contract-agnostic.

Mirrors the reference's dual-contract abstraction (keisei/training/
value_adapter.py:16-144): a scalar adapter (tanh value + MSE-vs-returns)
and a multi-head adapter (WDL CE + score MSE, scalar value = P(W) - P(L),
optional score blending into the GAE value). Functional (stateless) —
adapters transform model outputs and compute losses.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.base import KataGoOutput, ScalarOutput


@dataclass(frozen=True)
class ScalarValueAdapter:
    """For scalar-contract models: (B, 1) tanh value."""

    contract: str = "scalar"

    def scalar_value(self, out: ScalarOutput) -> jax.Array:
        return out.value[:, 0]

    def scalar_value_blended(self, out: ScalarOutput) -> jax.Array:
        return self.scalar_value(out)

    def value_loss(self, out: ScalarOutput, *, returns, value_cats, score_targets,
                   sample_weight=None):
        del value_cats, score_targets
        sq = (out.value[:, 0] - returns) ** 2
        if sample_weight is None:
            return jnp.mean(sq), jnp.float32(0.0)
        w_sum = jnp.maximum(sample_weight.sum(), 1.0)
        return (sq * sample_weight).sum() / w_sum, jnp.float32(0.0)


@dataclass(frozen=True)
class MultiHeadValueAdapter:
    """For KataGo-contract models: W/D/L logits + score head.

    scalar value = P(win) - P(loss); with score_blend_alpha > 0 the
    (normalized, tanh-squashed) score lead is blended in for GAE targets
    (value_adapter.py:62-126).
    """

    lambda_value: float = 1.5
    lambda_score: float = 0.02
    score_blend_alpha: float = 0.0
    contract: str = "katago"

    def scalar_value(self, out: KataGoOutput) -> jax.Array:
        probs = jax.nn.softmax(out.value_logits.astype(jnp.float32), axis=-1)
        return probs[:, 0] - probs[:, 2]

    def scalar_value_blended(self, out: KataGoOutput) -> jax.Array:
        v = self.scalar_value(out)
        if self.score_blend_alpha > 0.0:
            s = jnp.tanh(out.score_lead[:, 0].astype(jnp.float32))
            v = (1.0 - self.score_blend_alpha) * v + self.score_blend_alpha * s
        return v

    def value_loss(self, out: KataGoOutput, *, returns, value_cats, score_targets,
                   sample_weight=None):
        """(weighted value+score loss, raw score loss) for metrics."""
        del returns
        logits = out.value_logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = value_cats >= 0
        if sample_weight is not None:
            valid = valid & (sample_weight > 0)
        cats = jnp.maximum(value_cats, 0)
        ce = -jnp.take_along_axis(logp, cats[:, None], axis=1)[:, 0]
        n_valid = valid.sum()
        wdl = jnp.where(valid, ce, 0.0).sum() / jnp.maximum(n_valid, 1)
        # graph-connected zero when no labels (katago_ppo.py:46-57)
        wdl = jnp.where(n_valid > 0, wdl, logits.sum() * 0.0)
        sq = (out.score_lead[:, 0].astype(jnp.float32) - score_targets) ** 2
        if sample_weight is None:
            score = jnp.mean(sq)
        else:
            score = (sq * sample_weight).sum() / jnp.maximum(sample_weight.sum(), 1.0)
        return self.lambda_value * wdl + self.lambda_score * score, score


def get_value_adapter(contract: str, **kwargs):
    if contract == "scalar":
        return ScalarValueAdapter()
    if contract == "katago":
        return MultiHeadValueAdapter(**kwargs)
    raise ValueError(f"unknown model contract {contract!r}")
