"""Frozen A-vs-B matches, batched over the fused TPU environment.

TPU-native replacement for the reference's match utilities
(keisei/training/match_utils.py:76-335): N games run in parallel in one
jitted scan — each step does ONE forward per model over the whole batch
and selects per-env by seat, so there is no dynamic partitioning and no
host crossing inside a chunk. Win attribution is vectorized from
last-mover rewards (match_utils.py:261-272). Colors alternate across the
batch (A is Black in even envs).

Each env plays exactly one counted game; the env auto-resets afterwards
and further transitions are ignored via a `done_seen` carry. The host
loops over fixed-size chunks and stops early once every env has finished.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..env.vec_env import EnvCore


class ModelCache:
    """Arch-keyed flax-module memoization shared by every match consumer
    (in-process tournament, historical gauntlet, workers).

    One module instance per (architecture, params) combination: flax
    modules are stateless descriptors, so a single instance can serve any
    number of entries/weight trees, and a shared cache keeps jit caches
    warm across consumers instead of each class re-deriving the same
    key-format + build_model memoization (review r2 dedup)."""

    def __init__(self):
        self._models: dict[str, object] = {}

    def model_for(self, entry) -> tuple[object, str]:
        """(module, cache-key) for an OpponentEntry-like object."""
        from ..models.registry import build_model

        key = f"{entry.architecture}:{sorted(entry.model_params.items())}"
        if key not in self._models:
            self._models[key] = build_model(
                entry.architecture, entry.model_params)[0]
        return self._models[key], key


@dataclass
class MatchResult:
    wins_a: int
    wins_b: int
    draws: int
    games: int
    total_plies: int

    @property
    def score_a(self) -> float:
        return (self.wins_a + 0.5 * self.draws) / max(self.games, 1)


@dataclass
class MatchRollout:
    """Device-resident transitions collected during a match, for Dynamic-entry
    online training (reference match_utils.py rollout collection). All arrays
    are (T, N, ...); `mover_color` is the seat that chose each action and
    `rewards` are last-mover perspective."""

    obs: jax.Array | None  # (T, N, C, 81) f32 (None in light collection)
    actions: jax.Array  # (T, N) i32
    legal_masks: jax.Array | None  # (T, N, A) bool (None in light collection)
    rewards: jax.Array  # (T, N) f32
    dones: jax.Array  # (T, N) bool
    captured: jax.Array  # (T, N) u8 — hand-piece index or 255
    term_reason: jax.Array  # (T, N) u8
    mover_color: jax.Array  # (T, N) i32
    a_color: jax.Array  # (N,) i32 — seat assignment for side attribution


def _make_chunk(env_core: EnvCore, model_a, model_b, chunk_steps: int, temperature: float):
    env_step = env_core.step_fn()
    N = env_core.num_envs
    C = env_core.num_channels

    def forward(model, variables, obs, masks, rng):
        out = model.apply(variables, obs.reshape(N, C, 9, 9), train=False)
        flat = out.policy_logits.reshape(N, -1).astype(jnp.float32)
        masked = jnp.where(masks, flat / temperature, -1e9)
        return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)

    def chunk(vars_a, vars_b, env_states, obs, masks, a_color, done_seen, result, plies, rng):
        def body(carry, _):
            env_states, obs, masks, done_seen, result, plies, rng = carry
            rng, ka, kb = jax.random.split(rng, 3)
            act_a = forward(model_a, vars_a, obs, masks, ka)
            act_b = forward(model_b, vars_b, obs, masks, kb)
            stm = env_states.stm.astype(jnp.int32)
            actions = jnp.where(stm == a_color, act_a, act_b)

            env_states, out = env_step(env_states, actions)
            done = out.terminated | out.truncated
            fresh = done & ~done_seen
            # winner color from last-mover reward (match_utils.py:261-272)
            win_color = jnp.where(
                out.reward > 0, stm, jnp.where(out.reward < 0, 1 - stm, -1)
            )
            r = jnp.where(win_color < 0, 0, jnp.where(win_color == a_color, 1, -1))
            result = jnp.where(fresh, r, result)
            plies = jnp.where(fresh, out.ply_count, plies)
            done_seen = done_seen | done
            ys = (obs, actions, masks, out.reward, done, stm,
                  out.captured, out.term_reason)
            return (env_states, out.obs, out.legal_mask, done_seen, result, plies, rng), ys

        carry = (env_states, obs, masks, done_seen, result, plies, rng)
        carry, ys = jax.lax.scan(body, carry, None, length=chunk_steps)
        return carry, ys

    return jax.jit(chunk)


def play_match(
    model_a,
    vars_a,
    model_b,
    vars_b,
    *,
    num_games: int = 64,
    max_ply: int = 512,
    num_channels: int = 50,
    chunk_steps: int = 64,
    temperature: float = 1.0,
    seed: int = 0,
    env_core: EnvCore | None = None,
    chunk_fn=None,
    collect: bool | str = False,
) -> MatchResult | tuple[MatchResult, MatchRollout]:
    """Play `num_games` A-vs-B games; A holds Black in even-indexed envs.

    Pass a prebuilt (env_core, chunk_fn) pair to reuse compilations across
    matches (the tournament loop does this). With collect=True, also return
    the full (T, N) transition record for Dynamic-entry training;
    collect="light" keeps only the small per-step arrays (for feature
    extraction) and drops observations/masks chunk by chunk.
    """
    core = env_core or EnvCore(num_games, max_ply, num_channels)
    N = core.num_envs
    chunk = chunk_fn or _make_chunk(core, model_a, model_b, chunk_steps, temperature)

    env_states, obs, masks = core.init()
    a_color = jnp.asarray(np.arange(N) % 2, jnp.int32)
    done_seen = jnp.zeros(N, bool)
    result = jnp.zeros(N, jnp.int32)
    plies = jnp.zeros(N, jnp.int32)
    rng = jax.random.key(seed)

    collected = []
    max_chunks = -(-max_ply // chunk_steps) + 1
    # pipelined early-exit (see ConcurrentMatchPool.run_round): check the
    # flag from LAG chunks back so the host round trip overlaps device
    # work; over-run chunks are benign (auto-reset games, frozen results)
    LAG = 2
    done_flags = []
    for i in range(max_chunks):
        (env_states, obs, masks, done_seen, result, plies, rng), ys = chunk(
            vars_a, vars_b, env_states, obs, masks, a_color, done_seen,
            result, plies, rng,
        )
        if collect == "light":
            collected.append((None, *ys[1:2], None, *ys[3:]))
        elif collect:
            collected.append(ys)
        done_flags.append(done_seen)
        if i >= LAG and bool(done_flags[i - LAG].all()):
            break

    done_np = np.asarray(done_seen)
    res_np = np.asarray(result)[done_np]
    match_result = MatchResult(
        wins_a=int((res_np == 1).sum()),
        wins_b=int((res_np == -1).sum()),
        draws=int((res_np == 0).sum()),
        games=int(done_np.sum()),
        total_plies=int(np.asarray(plies)[done_np].sum()),
    )
    if not collect:
        return match_result
    cat = [
        None if parts[0] is None else jnp.concatenate(parts, axis=0)
        for parts in zip(*collected)
    ]
    rollout = MatchRollout(
        obs=cat[0], actions=cat[1], legal_masks=cat[2], rewards=cat[3],
        dones=cat[4], mover_color=cat[5], captured=cat[6],
        term_reason=cat[7], a_color=a_color,
    )
    return match_result, rollout


def make_match_runner(
    model_a, model_b, *, num_games: int, max_ply: int = 512,
    num_channels: int = 50, chunk_steps: int = 64, temperature: float = 1.0,
):
    """Compile once, then run many (vars_a, vars_b, seed) matches — the
    shape the tournament loop needs (architectures fixed per runner,
    weights swapped per pairing without retracing)."""
    core = EnvCore(num_games, max_ply, num_channels)
    chunk = _make_chunk(core, model_a, model_b, chunk_steps, temperature)

    def run(vars_a, vars_b, seed: int = 0, collect: bool = False):
        return play_match(
            model_a, vars_a, model_b, vars_b,
            num_games=num_games, max_ply=max_ply, num_channels=num_channels,
            chunk_steps=chunk_steps, temperature=temperature, seed=seed,
            env_core=core, chunk_fn=chunk, collect=collect,
        )

    return run
