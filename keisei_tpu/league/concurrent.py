"""ConcurrentMatchPool: P pairings play simultaneously in one device batch.

Capability parity with the reference's slot-partitioned pool
(keisei/training/concurrent_matches.py:171-625): `parallel_matches` slots x
`envs_per_match` lanes inside one batched environment. The reference
interleaves per-slot model forwards on a shared GPU; here each slot owns a
static env block and every step runs ONE vmapped forward over the 2P
stacked weight sets (a-side and b-side per slot) — one env step advances
every game of every pairing at once, so a round costs max-game-length
steps instead of sum-over-pairings(game length), and the program size /
compile time do not scale with P.

All pairings in a pool share one architecture (weights swap per round
without retracing); heterogeneous-architecture pairings fall back to the
sequential per-pairing runner in LeagueTournament.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..env.vec_env import EnvCore
from .match import MatchResult


@dataclass
class RoundStats:
    pairings: int
    games: int
    total_plies: int
    steps: int


class ConcurrentMatchPool:
    def __init__(
        self,
        model,
        parallel_matches: int = 4,
        envs_per_match: int = 16,
        max_ply: int = 512,
        num_channels: int = 50,
        chunk_steps: int = 64,
        temperature: float = 1.0,
    ):
        self.model = model
        self.P = parallel_matches
        self.E = envs_per_match
        self.N = self.P * self.E
        self.max_ply = max_ply
        self.chunk_steps = chunk_steps
        self.temperature = temperature
        self.core = EnvCore(self.N, max_ply, num_channels)
        self._chunk = self._build_chunk()

    def _build_chunk(self):
        env_step = self.core.step_fn()
        P, E, N = self.P, self.E, self.N
        C = self.core.num_channels
        A = self.core.action_space
        model = self.model
        temperature = self.temperature

        def block_forward(variables, obs, masks, rng):
            out = model.apply(variables, obs.reshape(E, C, 9, 9), train=False)
            flat = out.policy_logits.reshape(E, -1).astype(jnp.float32)
            masked = jnp.where(masks, flat / temperature, -1e9)
            return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)

        vmapped_forward = jax.vmap(block_forward)

        def chunk(stacked_a, stacked_b, env_states, obs, masks, a_color,
                  done_seen, result, plies, rng):
            # One vmapped forward over all 2P weight sets instead of 2P
            # unrolled forwards: the HLO carries ONE copy of the trunk
            # (grouped convs over the stacked kernels), so compile time and
            # program size stop scaling with P — the unrolled flagship
            # chunk (8 x b40c256 in a 64-step scan body) took >10 min of
            # XLA compile — and each conv sees a 2P*E effective batch
            # instead of E, which the MXU tiles far better.
            stacked_ab = jax.tree.map(
                lambda xa, xb: jnp.concatenate([xa, xb]), stacked_a, stacked_b)

            def body(carry, _):
                env_states, obs, masks, done_seen, result, plies, rng = carry
                rng, k = jax.random.split(rng)
                keys = jax.random.split(k, 2 * P)
                obs_p = obs.reshape(P, E, -1)
                masks_p = masks.reshape(P, E, A)
                # key layout matches the historical unrolled order
                # (a-side p -> keys[2p], b-side p -> keys[2p+1])
                keys_ab = jnp.concatenate([keys[0::2], keys[1::2]])
                acts = vmapped_forward(
                    stacked_ab,
                    jnp.concatenate([obs_p, obs_p]),
                    jnp.concatenate([masks_p, masks_p]),
                    keys_ab,
                )
                act_a = acts[:P].reshape(N)
                act_b = acts[P:].reshape(N)
                stm = env_states.stm.astype(jnp.int32)
                actions = jnp.where(stm == a_color, act_a, act_b)

                env_states, out = env_step(env_states, actions)
                done = out.terminated | out.truncated
                fresh = done & ~done_seen
                win_color = jnp.where(
                    out.reward > 0, stm, jnp.where(out.reward < 0, 1 - stm, -1)
                )
                r = jnp.where(win_color < 0, 0,
                              jnp.where(win_color == a_color, 1, -1))
                result = jnp.where(fresh, r, result)
                plies = jnp.where(fresh, out.ply_count, plies)
                done_seen = done_seen | done
                carry = (env_states, out.obs, out.legal_mask, done_seen,
                         result, plies, rng)
                return carry, None

            carry = (env_states, obs, masks, done_seen, result, plies, rng)
            carry, _ = jax.lax.scan(body, carry, None, length=self.chunk_steps)
            return carry

        return jax.jit(chunk)

    def run_round(self, pairings, seed: int = 0) -> tuple[list[MatchResult], RoundStats]:
        """pairings: list of (vars_a, vars_b) pytrees, at most P; shorter
        rounds are padded with the last pairing (pad results discarded)."""
        if not pairings:
            return [], RoundStats(0, 0, 0, 0)
        if len(pairings) > self.P:
            raise ValueError(f"{len(pairings)} pairings > pool capacity {self.P}")
        real = len(pairings)
        padded = list(pairings) + [pairings[-1]] * (self.P - real)
        stacked_a = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[0] for p in padded])
        stacked_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[p[1] for p in padded])

        env_states, obs, masks = self.core.init()
        a_color = jnp.asarray(np.arange(self.N) % 2, jnp.int32)
        done_seen = jnp.zeros(self.N, bool)
        result = jnp.zeros(self.N, jnp.int32)
        plies = jnp.zeros(self.N, jnp.int32)
        rng = jax.random.key(seed)

        steps = 0
        max_chunks = -(-self.max_ply // self.chunk_steps) + 1
        for _ in range(max_chunks):
            env_states, obs, masks, done_seen, result, plies, rng = self._chunk(
                stacked_a, stacked_b, env_states, obs, masks, a_color,
                done_seen, result, plies, rng,
            )
            steps += self.chunk_steps
            if bool(done_seen.all()):
                break

        done_np = np.asarray(done_seen).reshape(self.P, self.E)
        res_np = np.asarray(result).reshape(self.P, self.E)
        ply_np = np.asarray(plies).reshape(self.P, self.E)
        results = []
        for p in range(real):
            d = done_np[p]
            r = res_np[p][d]
            results.append(MatchResult(
                wins_a=int((r == 1).sum()),
                wins_b=int((r == -1).sum()),
                draws=int((r == 0).sum()),
                games=int(d.sum()),
                total_plies=int(ply_np[p][d].sum()),
            ))
        stats = RoundStats(
            pairings=real,
            games=sum(r.games for r in results),
            total_plies=sum(r.total_plies for r in results),
            steps=steps,
        )
        return results, stats
