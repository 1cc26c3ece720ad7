"""KataGo-style multi-head PPO: fused, fully-jitted update.

Capability parity with the reference algorithm (keisei/training/
katago_ppo.py:81-991): clipped surrogate, W/D/L cross-entropy with
ignore-index, score-MSE, legal-only entropy, global advantage
normalization, grad clipping, entropy-coefficient scheduling.

TPU-first deltas: no CPU rollout buffer / pinned-memory H2D shuffle (the
trajectory lives in HBM), the whole update (GAE -> normalize -> epochs x
minibatches) is ONE jitted program with a `lax.scan` over minibatches, and
bf16 model compute replaces AMP/GradScaler (no loss scaling needed —
gradients are f32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .gae import compute_gae

SCORE_NORMALIZATION = 76.0  # shared with the SL pipeline (sl/dataset.py:32)


@dataclass(frozen=True)
class KataGoPPOParams:
    """Hyperparameters; defaults match the reference (katago_ppo.py:81-116)."""

    learning_rate: float = 2e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_epsilon: float = 0.2
    epochs_per_batch: int = 4
    batch_size: int = 256
    lambda_policy: float = 1.0
    lambda_value: float = 1.5
    lambda_score: float = 0.02
    lambda_entropy: float = 0.01
    score_normalization: float = SCORE_NORMALIZATION
    grad_clip: float = 1.0
    entropy_decay_epochs: int = 0
    score_blend_alpha: float = 0.0
    use_terminated_for_gae: bool = True

    def __post_init__(self):
        if self.batch_size <= 0:
            raise ValueError(f"batch_size must be > 0, got {self.batch_size}")
        if self.epochs_per_batch <= 0:
            raise ValueError(f"epochs_per_batch must be > 0, got {self.epochs_per_batch}")
        if not 0.0 <= self.gamma <= 1.0:
            raise ValueError(f"gamma must be in [0, 1], got {self.gamma}")
        if not 0.0 <= self.gae_lambda <= 1.0:
            raise ValueError(f"gae_lambda must be in [0, 1], got {self.gae_lambda}")
        if self.clip_epsilon < 0.0:
            raise ValueError(f"clip_epsilon must be >= 0, got {self.clip_epsilon}")
        if self.learning_rate <= 0.0:
            raise ValueError(f"learning_rate must be > 0, got {self.learning_rate}")
        if self.grad_clip <= 0.0:
            raise ValueError(f"grad_clip must be > 0, got {self.grad_clip}")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # () int32


@struct.dataclass
class Trajectory:
    """(T, N, ...) rollout storage — the device-resident analogue of the
    reference's CPU KataGoRolloutBuffer (katago_ppo.py:128-388)."""

    obs: jax.Array  # (T, N, C, 81) f32
    actions: jax.Array  # (T, N) i32
    log_probs: jax.Array  # (T, N) f32
    values: jax.Array  # (T, N) f32
    rewards: jax.Array  # (T, N) f32
    dones: jax.Array  # (T, N) bool
    terminated: jax.Array  # (T, N) bool
    legal_masks: jax.Array  # (T, N, A) bool
    value_cats: jax.Array  # (T, N) i32: -1 ignore / 0 W / 1 D / 2 L
    score_targets: jax.Array  # (T, N) f32 (normalized)
    next_value_override: jax.Array  # (T, N) f32, NaN = default bootstrap
    # League mode only: False slots hold no learner transition (split-merge
    # finalization is sparse in time). None = every slot valid (self-play).
    valid: jax.Array | None = None


def make_optimizer(cfg: KataGoPPOParams):
    """Grad-clip + Adam with injectable learning rate (for plateau sched)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )


def get_learning_rate(opt_state) -> float:
    return float(opt_state[1].hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    opt_state[1].hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def masked_log_softmax(flat_logits: jax.Array, mask: jax.Array) -> jax.Array:
    masked = jnp.where(mask, flat_logits, -1e9)
    return jax.nn.log_softmax(masked, axis=-1)


def compute_value_cats(rewards: jax.Array, terminal: jax.Array) -> jax.Array:
    """{-1 ignore, 0 win, 1 draw, 2 loss} from exact terminal rewards
    (katago_loop.py:76-92)."""
    cats = jnp.where(rewards > 0, 0, jnp.where(rewards < 0, 2, 1))
    return jnp.where(terminal, cats, -1).astype(jnp.int32)


def make_ppo_update(model, adapter, cfg: KataGoPPOParams, optimizer):
    """Build the jitted update: GAE -> advantage norm -> epochs x minibatches.

    The returned function is pure; jit it (or shard_map it) at the call
    site. Samples beyond the last full minibatch within each epoch
    permutation are dropped (static shapes; with T*N a multiple of
    batch_size nothing is dropped).
    """

    def loss_fn(params, batch_stats, mb, entropy_coeff):
        variables = {"params": params, "batch_stats": batch_stats}
        out, updates = model.apply(
            variables, mb["obs"], train=True, mutable=["batch_stats"]
        )
        B = mb["obs"].shape[0]
        flat = out.policy_logits.reshape(B, -1).astype(jnp.float32)
        logp_all = masked_log_softmax(flat, mb["legal_masks"])
        new_logp = jnp.take_along_axis(logp_all, mb["actions"][:, None], axis=1)[:, 0]

        # sample weights: 1 everywhere in self-play; 0 for the empty
        # split-merge slots in league mode
        w = mb.get("weights")
        if w is None:
            w = jnp.ones((B,), jnp.float32)
        w_sum = jnp.maximum(w.sum(), 1.0)

        ratio = jnp.exp(new_logp - mb["old_log_probs"])
        adv = mb["advantages"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.clip_epsilon, 1 + cfg.clip_epsilon) * adv
        policy_loss = -(jnp.minimum(surr1, surr2) * w).sum() / w_sum

        probs = jnp.exp(logp_all)
        safe_logp = jnp.where(mb["legal_masks"], logp_all, 0.0)
        entropy = ((-(probs * safe_logp).sum(axis=-1)) * w).sum() / w_sum

        value_score_loss, score_loss = adapter.value_loss(
            out,
            returns=mb["returns"],
            value_cats=mb["value_cats"],
            score_targets=mb["score_targets"],
            sample_weight=w,
        )

        loss = cfg.lambda_policy * policy_loss + value_score_loss - entropy_coeff * entropy
        aux = {
            "policy_loss": policy_loss,
            "value_loss": value_score_loss,
            "score_loss": score_loss,
            "entropy": entropy,
            "batch_stats": updates["batch_stats"],
        }
        return loss, aux

    def minibatch_step(carry, mb, entropy_coeff):
        params, batch_stats, opt_state = carry
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, mb, entropy_coeff
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "policy_loss": aux["policy_loss"],
            "value_loss": aux["value_loss"],
            "score_loss": aux["score_loss"],
            "entropy": aux["entropy"],
            "gradient_norm": grad_norm,
        }
        return (params, aux["batch_stats"], opt_state), metrics

    def update(state: TrainState, traj: Trajectory, next_value, rng, entropy_coeff):
        T, N = traj.rewards.shape
        S = T * N

        if traj.valid is not None:
            # league split-merge: sparse learner slots, done-bounded chains
            from .gae import compute_gae_masked

            advantages = compute_gae_masked(
                traj.rewards, traj.values, traj.dones, traj.valid, next_value,
                cfg.gamma, cfg.gae_lambda, traj.next_value_override,
            )
            weights = traj.valid.reshape(S).astype(jnp.float32)
        else:
            terminated = traj.terminated if cfg.use_terminated_for_gae else traj.dones
            # alternating=True: the fused self-play rollout stores EVERY ply,
            # mover-perspective, so the lambda chain is negamax (gae.py)
            advantages = compute_gae(
                traj.rewards, traj.values, terminated, next_value,
                cfg.gamma, cfg.gae_lambda, traj.next_value_override,
                chain_cut=traj.dones, alternating=True,
            )
            weights = None
        returns = advantages + traj.values
        adv_flat = advantages.reshape(S)
        if weights is None:
            adv_flat = (adv_flat - adv_flat.mean()) / (adv_flat.std() + 1e-8)
        else:
            n_v = jnp.maximum(weights.sum(), 1.0)
            mean = (adv_flat * weights).sum() / n_v
            var = (((adv_flat - mean) ** 2) * weights).sum() / n_v
            adv_flat = (adv_flat - mean) / (jnp.sqrt(var) + 1e-8)
            adv_flat = adv_flat * weights  # invalid slots contribute nothing

        data = {
            "obs": traj.obs.reshape(S, *traj.obs.shape[2:]),
            "actions": traj.actions.reshape(S),
            "old_log_probs": traj.log_probs.reshape(S),
            "advantages": adv_flat,
            "returns": returns.reshape(S),
            "legal_masks": traj.legal_masks.reshape(S, -1),
            "value_cats": traj.value_cats.reshape(S),
            "score_targets": traj.score_targets.reshape(S),
        }
        if weights is not None:
            data["weights"] = weights

        n_mb = S // cfg.batch_size
        if n_mb == 0:
            # fail loudly: zero minibatches would run zero update steps and
            # emit NaN metrics while epochs keep logging (a silent-dead run).
            # Reachable via configs whose batch_size exceeds the trajectory —
            # the compact league rollout halves S to (T/2+1)*N.
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds the {S}-sample "
                f"trajectory; no minibatch would run — lower "
                f"algorithm_params.batch_size or raise steps/num_games"
            )
        carry = (state.params, state.batch_stats, state.opt_state)
        all_metrics = []
        for _ in range(cfg.epochs_per_batch):
            rng, k = jax.random.split(rng)
            perm = jax.random.permutation(k, S)[: n_mb * cfg.batch_size]
            idx = perm.reshape(n_mb, cfg.batch_size)

            def scan_body(c, ix):
                mb = {k2: v[ix] for k2, v in data.items()}
                # obs reshaped to the model's (B, C, 9, 9) contract
                mb["obs"] = mb["obs"].reshape(ix.shape[0], -1, 9, 9)
                return minibatch_step(c, mb, entropy_coeff)

            carry, m = jax.lax.scan(scan_body, carry, idx)
            all_metrics.append(m)

        params, batch_stats, opt_state = carry
        metrics = {
            k2: jnp.concatenate([m[k2] for m in all_metrics]).mean()
            for k2 in all_metrics[0]
        }
        new_state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return update


def masked_policy_sample(out, legal_masks, rng, adapter):
    """(actions, log_probs, values) from a model output: legal-masked
    categorical sample + per-action log-prob + blended scalar value.

    The single shared implementation of the sampling block every rollout
    path uses (self-play, league compact, league dynamic, generic select)
    — the mask fill value, sampling dtype, and log-prob gather must stay
    identical across paths or importance ratios silently skew (review r2
    dedup: this block had drifted into four copies)."""
    B = legal_masks.shape[0]
    flat = out.policy_logits.reshape(B, -1).astype(jnp.float32)
    masked = jnp.where(legal_masks, flat, -1e9)
    actions = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    logp_all = jax.nn.log_softmax(masked, axis=-1)
    log_probs = jnp.take_along_axis(logp_all, actions[:, None], axis=1)[:, 0]
    values = adapter.scalar_value_blended(out)
    return actions, log_probs, values


def make_select_actions(model, adapter):
    """Rollout-time action selection: masked categorical + scalar value."""

    def select(variables, obs, legal_masks, rng):
        out = model.apply(variables, obs, train=False)
        return masked_policy_sample(out, legal_masks, rng, adapter)

    return select


def entropy_coeff_schedule(cfg: KataGoPPOParams, epoch: int, warmup_epochs: int = 0,
                           warmup_coeff: float | None = None) -> float:
    """Host-side entropy coefficient schedule (warmup + linear decay).

    Matches the reference (katago_ppo.py:500-516): whenever
    entropy_decay_epochs > 0, the coefficient decays linearly from the
    warmup level to lambda_entropy over that many post-warmup epochs —
    including with warmup_epochs=0, where the reference starts the decay
    from its warmup_entropy default rather than silently ignoring the
    decay setting (review r2: the old warmup>0 gate made a configured
    decay a no-op unless warmup was also on)."""
    base = cfg.lambda_entropy
    start = warmup_coeff if warmup_coeff is not None else base
    if warmup_epochs > 0 and epoch < warmup_epochs:
        return start
    if cfg.entropy_decay_epochs > 0:
        k = epoch - warmup_epochs
        if k < cfg.entropy_decay_epochs:
            frac = k / cfg.entropy_decay_epochs
            return start + (base - start) * frac
    return base
