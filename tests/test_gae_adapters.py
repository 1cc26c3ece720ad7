"""GAE variants and value-adapter contracts: property-level pins.

Complements tests/test_training_core.py's recurrence checks with the edge
semantics the reference encodes implicitly: masked-GAE carry-through
equivalence with compacted sequences, override-survives-done-cut, the
chain-cut/terminated distinction at truncations, alternating-perspective
override fill rules, and both value-adapter loss contracts including the
graph-connected-zero and sample-weight paths (reference gae.py:8-296,
value_adapter.py:16-144, katago_ppo.py:46-57,320-360).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keisei_tpu.models.base import KataGoOutput, ScalarOutput
from keisei_tpu.training.gae import (
    alternating_perspective_overrides,
    compute_gae,
    compute_gae_masked,
)
from keisei_tpu.training.value_adapter import (
    MultiHeadValueAdapter,
    ScalarValueAdapter,
    get_value_adapter,
)

G, L = 0.99, 0.95


def ref_gae(rewards, values, terminated, next_value, cut=None):
    """Plain-python reference recurrence for a single env."""
    T = len(rewards)
    cut = terminated if cut is None else cut
    adv = np.zeros(T)
    carry = 0.0
    for t in reversed(range(T)):
        nv = next_value if t == T - 1 else values[t + 1]
        delta = rewards[t] + G * nv * (1 - terminated[t]) - values[t]
        carry = delta + G * L * (1 - cut[t]) * carry
        adv[t] = carry
    return adv


class TestChainCut:
    def test_truncation_leaks_without_chain_cut(self):
        """The reference's GAE lets the lambda chain cross a truncation
        (only `terminated` cuts); chain_cut=dones stops that. Pin BOTH
        behaviors so the fix stays deliberate."""
        T = 6
        rewards = np.zeros((T, 1), np.float32)
        rewards[2, 0] = 1.0  # reward at the truncated episode's last step
        values = np.zeros((T, 1), np.float32)
        terminated = np.zeros((T, 1))
        dones = np.zeros((T, 1))
        dones[2, 0] = 1.0  # truncation: done but not terminated
        nv = jnp.zeros((1,))

        leaky = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                            jnp.asarray(terminated), nv, G, L)
        cutp = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(terminated), nv, G, L,
                           chain_cut=jnp.asarray(dones))
        # step 1 precedes the truncated step; with the leak its advantage
        # still sees step-3+ deltas — without rewards there those are 0, so
        # inject one to expose the leak
        rewards[4, 0] = 5.0
        leaky2 = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                             jnp.asarray(terminated), nv, G, L)
        cut2 = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(terminated), nv, G, L,
                           chain_cut=jnp.asarray(dones))
        assert float(leaky2[1, 0]) != pytest.approx(float(leaky[1, 0]))
        assert float(cut2[1, 0]) == pytest.approx(float(cutp[1, 0]))

    def test_matches_reference_when_cut_equals_terminated(self):
        rng = np.random.default_rng(3)
        T, N = 12, 4
        rewards = rng.normal(size=(T, N)).astype(np.float32)
        values = rng.normal(size=(T, N)).astype(np.float32)
        term = (rng.random((T, N)) < 0.2).astype(np.float32)
        nv = rng.normal(size=(N,)).astype(np.float32)
        out = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                          jnp.asarray(term), jnp.asarray(nv), G, L)
        for n in range(N):
            np.testing.assert_allclose(
                np.asarray(out)[:, n],
                ref_gae(rewards[:, n], values[:, n], term[:, n], nv[n]),
                rtol=1e-5, atol=1e-5)


class TestMaskedGAE:
    def test_equivalent_to_compacted_sequence(self):
        """Sparse-valid GAE == dense GAE over just the valid slots."""
        rng = np.random.default_rng(0)
        T = 16
        valid = rng.random(T) < 0.6
        valid[T - 1] = True
        rewards = rng.normal(size=T).astype(np.float32) * valid
        values = rng.normal(size=T).astype(np.float32)
        dones = np.zeros(T)
        nv = np.float32(0.37)

        sparse = compute_gae_masked(
            jnp.asarray(rewards)[:, None], jnp.asarray(values)[:, None],
            jnp.asarray(dones)[:, None].astype(bool),
            jnp.asarray(valid)[:, None], jnp.asarray([nv]), G, L)

        idx = np.where(valid)[0]
        dense = ref_gae(rewards[idx], values[idx],
                        np.zeros(len(idx)), nv)
        np.testing.assert_allclose(np.asarray(sparse)[idx, 0], dense,
                                   rtol=1e-5, atol=1e-5)

    def test_invalid_slots_zero_and_pass_carry(self):
        valid = jnp.asarray([True, False, True])[:, None]
        rewards = jnp.asarray([0.0, 99.0, 1.0])[:, None]  # invalid slot noise
        values = jnp.zeros((3, 1))
        adv = compute_gae_masked(rewards, values, jnp.zeros((3, 1), bool),
                                 valid, jnp.zeros((1,)), G, L)
        assert float(adv[1, 0]) == 0.0
        # slot 0 chains THROUGH the invalid slot to slot 2's delta
        expected2 = 1.0
        expected0 = 0.0 + G * L * expected2
        assert float(adv[2, 0]) == pytest.approx(expected2)
        assert float(adv[0, 0]) == pytest.approx(expected0, rel=1e-5)

    def test_override_survives_done_cut(self):
        """A truncation override (-V(terminal)) must bootstrap even though
        done=True would normally zero the bootstrap."""
        rewards = jnp.zeros((1, 1))
        values = jnp.zeros((1, 1))
        dones = jnp.ones((1, 1), bool)
        valid = jnp.ones((1, 1), bool)
        ov = jnp.asarray([[0.8]])
        adv = compute_gae_masked(rewards, values, dones, valid,
                                 jnp.zeros((1,)), G, L,
                                 next_value_override=ov)
        assert float(adv[0, 0]) == pytest.approx(G * 0.8)
        # without the override the done cut zeroes the bootstrap
        adv0 = compute_gae_masked(rewards, values, dones, valid,
                                  jnp.zeros((1,)), G, L)
        assert float(adv0[0, 0]) == 0.0

    def test_done_cuts_chain_between_episodes(self):
        rewards = jnp.asarray([0.0, 1.0])[:, None]
        values = jnp.zeros((2, 1))
        dones = jnp.asarray([True, False])[:, None]
        valid = jnp.ones((2, 1), bool)
        adv = compute_gae_masked(rewards, values, dones, valid,
                                 jnp.zeros((1,)), G, L)
        # step 0 ends an episode: no chain, no bootstrap from step 1
        assert float(adv[0, 0]) == 0.0


class TestAlternatingOverrides:
    def test_fills_negated_next_value(self):
        values = jnp.asarray([[1.0], [2.0], [3.0]])
        term = jnp.zeros((3, 1), bool)
        ov = alternating_perspective_overrides(values, term)
        np.testing.assert_allclose(np.asarray(ov[:-1, 0]), [-2.0, -3.0])
        assert np.isnan(float(ov[-1, 0]))  # final step left to next_value

    def test_respects_existing_and_terminal(self):
        values = jnp.asarray([[1.0], [2.0], [3.0]])
        term = jnp.asarray([[False], [True], [False]])
        existing = jnp.asarray([[0.5], [jnp.nan], [jnp.nan]])
        ov = alternating_perspective_overrides(values, term, existing)
        assert float(ov[0, 0]) == 0.5        # existing override kept
        assert np.isnan(float(ov[1, 0]))     # terminal: no fill
        assert np.isnan(float(ov[2, 0]))


def katago_out(value_logits, score):
    value_logits = jnp.asarray(value_logits, jnp.float32)
    B = value_logits.shape[0]
    return KataGoOutput(policy_logits=jnp.zeros((B, 9, 9, 139)),
                        value_logits=jnp.asarray(value_logits, jnp.float32),
                        score_lead=jnp.asarray(score, jnp.float32))


class TestMultiHeadAdapter:
    def test_scalar_value_is_pwin_minus_ploss(self):
        a = MultiHeadValueAdapter()
        big = 20.0
        out = katago_out([[big, 0, 0], [0, 0, big], [0, big, 0]],
                         [[0.0]] * 3)
        v = np.asarray(a.scalar_value(out))
        assert v[0] == pytest.approx(1.0, abs=1e-6)   # sure win
        assert v[1] == pytest.approx(-1.0, abs=1e-6)  # sure loss
        assert v[2] == pytest.approx(0.0, abs=1e-6)   # sure draw

    def test_score_blend(self):
        a = MultiHeadValueAdapter(score_blend_alpha=0.25)
        out = katago_out([[20.0, 0, 0]], [[100.0]])  # tanh(100) ~ 1
        v = float(a.scalar_value_blended(out)[0])
        assert v == pytest.approx(0.75 * 1.0 + 0.25 * 1.0, abs=1e-4)
        # alpha=0 short-circuits to the raw scalar
        a0 = MultiHeadValueAdapter(score_blend_alpha=0.0)
        assert float(a0.scalar_value_blended(out)[0]) == pytest.approx(1.0, abs=1e-5)

    def test_wdl_ce_ignores_unlabeled(self):
        a = MultiHeadValueAdapter(lambda_value=1.0, lambda_score=0.0)
        out = katago_out([[5.0, 0, 0], [0, 0, 5.0]], [[0.0], [0.0]])
        # cat -1 = unlabeled; only sample 0 (true win, confident) counts
        loss_l, _ = a.value_loss(out, returns=None,
                                 value_cats=jnp.asarray([0, -1]),
                                 score_targets=jnp.zeros((2,)))
        loss_all, _ = a.value_loss(out, returns=None,
                                   value_cats=jnp.asarray([0, 0]),
                                   score_targets=jnp.zeros((2,)))
        assert float(loss_l) < float(loss_all)  # sample 1 predicts loss

    def test_no_labels_graph_connected_zero(self):
        a = MultiHeadValueAdapter(lambda_value=1.0, lambda_score=0.0)
        out = katago_out([[1.0, 2.0, 3.0]], [[0.0]])
        loss, _ = a.value_loss(out, returns=None,
                               value_cats=jnp.asarray([-1]),
                               score_targets=jnp.zeros((1,)))
        assert float(loss) == 0.0
        # and it must be differentiable (graph-connected), not a constant
        def f(logits):
            o = KataGoOutput(policy_logits=jnp.zeros((1, 9, 9, 139)),
                             value_logits=logits,
                             score_lead=jnp.zeros((1, 1)))
            l, _ = a.value_loss(o, returns=None,
                                value_cats=jnp.asarray([-1]),
                                score_targets=jnp.zeros((1,)))
            return l
        g = jax.grad(f)(jnp.asarray([[1.0, 2.0, 3.0]]))
        assert g.shape == (1, 3)  # grad flows (zeros, but defined)

    def test_sample_weight_masks_wdl_and_score(self):
        a = MultiHeadValueAdapter(lambda_value=1.0, lambda_score=1.0)
        out = katago_out([[5.0, 0, 0], [0, 0, 5.0]], [[1.0], [9.0]])
        w = jnp.asarray([1.0, 0.0])
        loss_w, score_w = a.value_loss(out, returns=None,
                                       value_cats=jnp.asarray([0, 2]),
                                       score_targets=jnp.asarray([1.0, 0.0]),
                                       sample_weight=w)
        # weighted: sample 1 (perfect-loss label, score error 81) excluded
        assert float(score_w) == pytest.approx(0.0, abs=1e-6)
        loss_u, score_u = a.value_loss(out, returns=None,
                                       value_cats=jnp.asarray([0, 2]),
                                       score_targets=jnp.asarray([1.0, 0.0]))
        assert float(score_u) == pytest.approx(81.0 / 2, rel=1e-5)
        assert float(loss_w) < float(loss_u)


class TestScalarAdapter:
    def test_mse_and_weighting(self):
        a = ScalarValueAdapter()
        out = ScalarOutput(policy_logits=jnp.zeros((2, 11259)),
                           value=jnp.asarray([[0.0], [1.0]]))
        loss, score = a.value_loss(out, returns=jnp.asarray([1.0, 1.0]),
                                   value_cats=None, score_targets=None)
        assert float(loss) == pytest.approx(0.5)
        assert float(score) == 0.0
        loss_w, _ = a.value_loss(out, returns=jnp.asarray([1.0, 1.0]),
                                 value_cats=None, score_targets=None,
                                 sample_weight=jnp.asarray([1.0, 0.0]))
        assert float(loss_w) == pytest.approx(1.0)

    def test_factory(self):
        assert isinstance(get_value_adapter("scalar"), ScalarValueAdapter)
        assert isinstance(get_value_adapter("katago"), MultiHeadValueAdapter)
        k = get_value_adapter("katago", score_blend_alpha=0.3)
        assert k.score_blend_alpha == 0.3
        with pytest.raises(ValueError):
            get_value_adapter("nope")


class TestAlternatingNegamaxChain:
    """Self-play GAE must negate the lambda-chain carry each ply: row t+1
    is the opponent's TD surprise, worth its NEGATIVE to the mover of row
    t. The reference's un-negated chain (gae.py:151-218 over
    katago_ppo.py:320-360 overrides) credits a mover for the opponent's
    good fortune — deliberate deviation, like the chain-cut fix."""

    def test_lambda1_gamma1_returns_equal_per_mover_outcomes(self):
        # A moves (t0), B moves (t1), A mates (t2, r=+1). At gamma=lam=1
        # the negamax lambda-return IS the exact game outcome per mover:
        # +1 for A's rows, -1 for B's row.
        r = jnp.array([[0.0], [0.0], [1.0]])
        v = jnp.array([[0.2], [-0.1], [0.8]])
        term = jnp.array([[False], [False], [True]])
        ov = jnp.array([[0.1], [-0.8], [jnp.nan]])  # -V[t+1] alternation
        adv = compute_gae(r, v, term, jnp.array([0.0]), 1.0, 1.0,
                          next_value_override=ov, chain_cut=term,
                          alternating=True)
        returns = np.asarray(adv + v)[:, 0]
        np.testing.assert_allclose(returns, [1.0, -1.0, 1.0], atol=1e-6)

    def test_opponent_positive_surprise_hurts_the_mover(self):
        # t0: A moves (r=0, V=0). t1: B moves and WINS (r=+1, V=0).
        # A's move must get a NEGATIVE advantage — the un-negated reference
        # chain gives it +gamma*lam*delta1 ~ +0.94.
        r = jnp.array([[0.0], [1.0]])
        v = jnp.zeros((2, 1))
        term = jnp.array([[False], [True]])
        ov = jnp.array([[-0.0], [jnp.nan]])
        adv = np.asarray(compute_gae(r, v, term, jnp.array([0.0]),
                                     0.99, 0.95, next_value_override=ov,
                                     chain_cut=term, alternating=True))
        assert adv[1, 0] == pytest.approx(1.0)
        assert adv[0, 0] == pytest.approx(-0.99 * 0.95 * 1.0)

    def test_flag_off_matches_reference_recurrence(self):
        # alternating=False keeps the exact reference recurrence for
        # learner-frame layouts
        r = jnp.array([[0.5], [1.0]])
        v = jnp.array([[0.1], [0.2]])
        term = jnp.zeros((2, 1), bool)
        adv = np.asarray(compute_gae(r, v, term, jnp.array([0.3]),
                                     0.9, 0.8, alternating=False))
        d1 = 1.0 + 0.9 * 0.3 - 0.2
        d0 = 0.5 + 0.9 * 0.2 - 0.1
        assert adv[1, 0] == pytest.approx(d1)
        assert adv[0, 0] == pytest.approx(d0 + 0.9 * 0.8 * d1)

    def test_override_survives_terminated_zeroing(self):
        # with use_terminated_for_gae=False callers pass dones (incl.
        # truncations) as `terminated`; an explicit -V(terminal) override
        # IS the bootstrap and must not be zeroed (same contract as
        # compute_gae_masked)
        r = jnp.array([[0.0]])
        v = jnp.array([[0.2]])
        term = jnp.array([[True]])          # truncation passed as done
        ov = jnp.array([[0.5]])             # -V(terminal_obs)
        adv = np.asarray(compute_gae(r, v, term, jnp.array([0.0]),
                                     1.0, 1.0, next_value_override=ov))
        assert adv[0, 0] == pytest.approx(0.0 + 0.5 - 0.2)
