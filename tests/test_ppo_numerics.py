"""Direct unit tests for the PPO sampling/masking numerics.

These helpers are the single shared implementation every rollout path uses
(ppo.masked_policy_sample docstring); the reference pins the equivalent
block at katago_ppo.py:589-605 (masked softmax sampling with all-False-mask
guards) and katago_loop.py:76-92 (value categories). Bugs here skew
importance ratios silently, so the invariants get direct pins instead of
only transiting through rollout integration tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.models.base import KataGoOutput
from keisei_tpu.training.checkpoint import CheckpointError, jnp_like
from keisei_tpu.training.ppo import (
    KataGoPPOParams,
    compute_value_cats,
    masked_log_softmax,
    masked_policy_sample,
)
from keisei_tpu.training.value_adapter import get_value_adapter

A = 11259  # spatial action space


def _out(rng, batch, score=0.0):
    k1, k2 = jax.random.split(jax.random.key(rng))
    return KataGoOutput(
        policy_logits=jax.random.normal(k1, (batch, 9, 9, 139)),
        value_logits=jax.random.normal(k2, (batch, 3)),
        score_lead=jnp.full((batch, 1), score),
    )


class TestMaskedLogSoftmax:
    def test_illegal_actions_get_negligible_probability(self):
        logits = jnp.zeros((4, A))
        mask = jnp.zeros((4, A), bool).at[:, :10].set(True)
        logp = masked_log_softmax(logits, mask)
        # legal: uniform over the 10 legal actions
        np.testing.assert_allclose(
            np.asarray(logp[:, :10]), np.log(1 / 10), rtol=1e-5)
        assert float(logp[:, 10:].max()) < -1e8 + np.log(A)

    def test_probabilities_sum_to_one_over_legal(self):
        k = jax.random.key(0)
        logits = jax.random.normal(k, (8, A)) * 5
        mask = jax.random.bernoulli(jax.random.key(1), 0.3, (8, A))
        p = jnp.exp(masked_log_softmax(logits, mask))
        np.testing.assert_allclose(
            np.asarray(jnp.where(mask, p, 0.0).sum(-1)), 1.0, rtol=1e-5)

    def test_mask_invariant_to_logit_shift(self):
        logits = jax.random.normal(jax.random.key(2), (2, A))
        mask = jax.random.bernoulli(jax.random.key(3), 0.5, (2, A))
        a = masked_log_softmax(logits, mask)
        b = masked_log_softmax(logits + 123.0, mask)
        np.testing.assert_allclose(
            np.asarray(jnp.where(mask, a - b, 0.0)), 0.0, atol=1e-3)


class TestMaskedPolicySample:
    def test_samples_are_always_legal(self):
        adapter = get_value_adapter("katago")
        out = _out(0, 64)
        mask = jax.random.bernoulli(jax.random.key(4), 0.02, (64, A))
        # guarantee at least one legal action per row (startpos always has >=1)
        mask = mask.at[:, 0].set(True)
        actions, log_probs, values = masked_policy_sample(
            out, mask, jax.random.key(5), adapter)
        picked = np.take_along_axis(
            np.asarray(mask), np.asarray(actions)[:, None], axis=1)[:, 0]
        assert picked.all()
        assert np.isfinite(np.asarray(log_probs)).all()

    def test_log_prob_matches_gather_of_masked_softmax(self):
        adapter = get_value_adapter("katago")
        out = _out(1, 16)
        mask = jnp.ones((16, A), bool)
        actions, log_probs, _ = masked_policy_sample(
            out, mask, jax.random.key(6), adapter)
        flat = out.policy_logits.reshape(16, -1).astype(jnp.float32)
        expect = jnp.take_along_axis(
            masked_log_softmax(flat, mask), actions[:, None], axis=1)[:, 0]
        np.testing.assert_allclose(
            np.asarray(log_probs), np.asarray(expect), rtol=1e-6)

    def test_single_legal_action_is_forced(self):
        adapter = get_value_adapter("katago")
        out = _out(2, 8)
        only = 4321
        mask = jnp.zeros((8, A), bool).at[:, only].set(True)
        actions, log_probs, _ = masked_policy_sample(
            out, mask, jax.random.key(7), adapter)
        assert (np.asarray(actions) == only).all()
        np.testing.assert_allclose(np.asarray(log_probs), 0.0, atol=1e-5)

    def test_scalar_value_is_pwin_minus_ploss(self):
        adapter = get_value_adapter("katago")
        out = _out(3, 8)
        _, _, values = masked_policy_sample(
            out, jnp.ones((8, A), bool), jax.random.key(8), adapter)
        probs = jax.nn.softmax(out.value_logits, axis=-1)
        np.testing.assert_allclose(
            np.asarray(values), np.asarray(probs[:, 0] - probs[:, 2]),
            rtol=1e-5)
        assert float(jnp.abs(values).max()) <= 1.0

    def test_score_blend_moves_value_toward_tanh_score(self):
        plain = get_value_adapter("katago")
        blend = get_value_adapter("katago", score_blend_alpha=0.5)
        out = _out(4, 8, score=3.0)
        _, _, v0 = masked_policy_sample(
            out, jnp.ones((8, A), bool), jax.random.key(9), plain)
        _, _, v1 = masked_policy_sample(
            out, jnp.ones((8, A), bool), jax.random.key(9), blend)
        expect = 0.5 * np.asarray(v0) + 0.5 * np.tanh(3.0)
        np.testing.assert_allclose(np.asarray(v1), expect, rtol=1e-5)


class TestValueCats:
    def test_terminal_rewards_map_to_wdl_cats(self):
        rewards = jnp.asarray([1.0, -1.0, 0.0, 0.5, -0.5])
        terminal = jnp.asarray([True, True, True, True, False])
        cats = compute_value_cats(rewards, terminal)
        # {-1 ignore, 0 win, 1 draw, 2 loss} (katago_loop.py:76-92)
        assert cats.tolist() == [0, 2, 1, 0, -1]
        assert cats.dtype == jnp.int32

    def test_non_terminal_always_ignored(self):
        rewards = jax.random.normal(jax.random.key(10), (32,))
        cats = compute_value_cats(rewards, jnp.zeros(32, bool))
        assert (np.asarray(cats) == -1).all()


class TestJnpLike:
    def test_casts_to_template_dtype(self):
        template = jnp.zeros((3, 2), jnp.bfloat16)
        out = jnp_like(template, np.ones((3, 2), np.float64))
        assert out.dtype == jnp.bfloat16 and out.shape == (3, 2)

    def test_shape_mismatch_is_checkpoint_error(self):
        with pytest.raises(CheckpointError, match="shape"):
            jnp_like(jnp.zeros((3, 2)), np.ones((2, 3)))


class TestParamsValidation:
    """__post_init__ guards (defaults match katago_ppo.py:81-116)."""

    @pytest.mark.parametrize("kwargs,msg", [
        ({"batch_size": 0}, "batch_size"),
        ({"batch_size": -4}, "batch_size"),
        ({"epochs_per_batch": 0}, "epochs_per_batch"),
        ({"gamma": -0.1}, "gamma"),
        ({"gamma": 1.5}, "gamma"),
        ({"gae_lambda": 2.0}, "gae_lambda"),
        ({"clip_epsilon": -0.2}, "clip_epsilon"),
        ({"learning_rate": 0.0}, "learning_rate"),
        ({"grad_clip": 0.0}, "grad_clip"),
    ])
    def test_invalid_values_rejected(self, kwargs, msg):
        with pytest.raises(ValueError, match=msg):
            KataGoPPOParams(**kwargs)

    def test_boundary_values_accepted(self):
        # gamma/lambda of exactly 0 and 1 are valid; clip 0 is valid
        KataGoPPOParams(gamma=0.0, gae_lambda=1.0, clip_epsilon=0.0)
