"""Generalized Advantage Estimation as a jittable backward scan.

Semantics pinned to the reference implementation (keisei/training/
gae.py:8-218): `terminated` zeroes the bootstrap (truncations bootstrap
from V(s_next) instead), and `next_value_override` supplies per-cell
bootstrap replacements — NaN cells fall back to the default values[t+1]
shift / final next_value. Used for both truncation-with-auto-reset and
two-player perspective alternation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,  # (T, N)
    values: jax.Array,  # (T, N)
    terminated: jax.Array,  # (T, N) bool or float
    next_value: jax.Array,  # (N,)
    gamma: float,
    lam: float,
    next_value_override: jax.Array | None = None,  # (T, N), NaN = default
    chain_cut: jax.Array | None = None,  # (T, N) episode ends; default = terminated
    alternating: bool = False,  # row t+1 is in the OPPONENT frame of row t
) -> jax.Array:
    """(T, N) advantages via a reversed lax.scan. Non-differentiable.

    `terminated` zeroes the bootstrap (truncations bootstrap instead, via
    values[t+1] or an override). `chain_cut` additionally cuts the
    gamma*lam chain at EVERY episode boundary: with auto-reset envs a
    truncated episode's chain must not accumulate the next (unrelated)
    episode's advantages. The reference's GAE uses `terminated` for both
    roles (gae.py:8-73), leaking the lambda chain across truncations —
    passing dones as chain_cut fixes that while keeping bootstrap parity
    (the same boundary semantics compute_gae_masked already uses).

    `alternating=True` is the no-league self-play layout: consecutive rows
    alternate mover perspective (shogi strictly alternates), so the lambda
    chain must NEGATE the carry each step — delta[t+1] is the opponent's
    TD surprise, worth its negative to the mover of step t (negamax). The
    per-cell -values[t+1] overrides fix only the ONE-step bootstrap; the
    reference adds the un-negated chain on top (gae.py:151-218 +
    katago_ppo.py:320-360), so a winning mover's interior moves inherit
    positively-signed opponent surprises. At gamma=lam=1 the negated chain
    reproduces exact per-mover game outcomes; the un-negated one does not.
    Deliberate deviation, like the chain-cut fix above. An explicit
    override also survives the `terminated` bootstrap zeroing (it IS the
    bootstrap — same contract as compute_gae_masked), which matters when
    callers pass dones as `terminated`.
    """
    rewards = jax.lax.stop_gradient(rewards.astype(jnp.float32))
    values = jax.lax.stop_gradient(values.astype(jnp.float32))
    not_done = 1.0 - terminated.astype(jnp.float32)
    not_cut = (
        not_done if chain_cut is None else 1.0 - chain_cut.astype(jnp.float32)
    )

    next_vals = jnp.concatenate([values[1:], next_value[None].astype(jnp.float32)], axis=0)
    boot = not_done
    if next_value_override is not None:
        ov = jax.lax.stop_gradient(next_value_override.astype(jnp.float32))
        has_ov = ~jnp.isnan(ov)
        next_vals = jnp.where(has_ov, ov, next_vals)
        boot = jnp.where(has_ov, 1.0, not_done)

    delta = rewards + gamma * next_vals * boot - values
    decay = (-1.0 if alternating else 1.0) * gamma * lam * not_cut

    def scan_fn(carry, x):
        d, dk = x
        carry = d + dk * carry
        return carry, carry

    _, adv = jax.lax.scan(
        scan_fn, jnp.zeros_like(next_value, dtype=jnp.float32), (delta, decay), reverse=True
    )
    return adv


def compute_gae_masked(
    rewards: jax.Array,  # (T, N)
    values: jax.Array,  # (T, N)
    dones: jax.Array,  # (T, N) bool — episode boundaries cut the chain
    valid: jax.Array,  # (T, N) bool — False slots are skipped entirely
    next_value: jax.Array,  # (N,)
    gamma: float,
    lam: float,
    next_value_override: jax.Array | None = None,  # (T, N), NaN = default
) -> jax.Array:
    """GAE over a sparsely-valid (T, N) grid.

    The TPU-native replacement for the reference's per-env padded GAE
    (keisei/training/gae.py:76-148, katago_ppo.py:698-763): league-mode
    learner transitions occupy only the slots where a learner move was
    finalized; invalid slots pass the (advantage, next_value) carries
    through unchanged, so each env's valid slots chain together exactly
    like a compacted variable-length sequence. Chain and bootstrap cut at
    `dones` (the reference's padded path uses done as the boundary).
    """
    rewards = jax.lax.stop_gradient(rewards.astype(jnp.float32))
    values = jax.lax.stop_gradient(values.astype(jnp.float32))
    not_done = 1.0 - dones.astype(jnp.float32)
    valid = valid.astype(bool)
    if next_value_override is None:
        ov = jnp.full_like(rewards, jnp.nan)
    else:
        ov = jax.lax.stop_gradient(next_value_override.astype(jnp.float32))

    def scan_fn(carry, x):
        gae_c, nv_c = carry
        r, v, nd, vld, o = x
        has_ov = ~jnp.isnan(o)
        nv = jnp.where(has_ov, jnp.nan_to_num(o), nv_c)
        # an explicit override IS the bootstrap (truncation: -V(terminal)),
        # so it must survive the done-cut that otherwise zeroes it — dones
        # include truncation in league mode (fixes the dead-override bug)
        boot = jnp.where(has_ov, 1.0, nd)
        delta = r + gamma * nv * boot - v
        gae = delta + gamma * lam * nd * gae_c
        adv = jnp.where(vld, gae, 0.0)
        gae_c = jnp.where(vld, gae, gae_c)
        nv_c = jnp.where(vld, v, nv_c)
        return (gae_c, nv_c), adv

    init = (jnp.zeros_like(next_value, jnp.float32), next_value.astype(jnp.float32))
    _, adv = jax.lax.scan(
        scan_fn, init, (rewards, values, not_done, valid, ov), reverse=True
    )
    return adv


def alternating_perspective_overrides(
    values: jax.Array,  # (T, N)
    terminated: jax.Array,  # (T, N)
    existing: jax.Array | None = None,  # (T, N) NaN-sentinel overrides
) -> jax.Array:
    """No-league self-play perspective fix (katago_ppo.py:320-360).

    Every shogi ply alternates side, so values[t+1] is in the opponent's
    frame; for each non-terminal cell without an existing override, set
    override[t] = -values[t+1]. The final step's bootstrap is handled by
    the caller via next_value.
    """
    T = values.shape[0]
    ov = jnp.full_like(values, jnp.nan) if existing is None else existing
    flipped = -values[1:]  # candidate overrides for t in [0, T-1)
    fill = jnp.isnan(ov[:-1]) & ~terminated[:-1].astype(bool)
    ov = ov.at[:-1].set(jnp.where(fill, flipped, ov[:-1]))
    return ov
